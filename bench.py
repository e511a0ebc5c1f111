"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE compact JSON line as the FINAL stdout line: {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: sec, ...}, "sf": ...}.
The driver tail-captures stdout, so this line must stay small enough to
survive the capture window (r5's line, carrying vs_prev deltas + host
fingerprint, outgrew it and the official record came back "parsed": null).
The full payload — per-query timings, vs_prev deltas, host fingerprint —
is written to BENCH_DETAIL.json in the repo root and committed.

Each query runs against the noop sink (`format("noop")`) so the full plan
executes — count() alone would let Catalyst prune projections and
under-report the work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_bridge_spark.registry import load_all
from data_bridge_spark.session import get_spark

# the headline set: one representative per operator family, heaviest first
HEADLINE = (
    "flagship_report",
    "agg_report",
    "join_inner",
    "join_left",
    "join_range",
    "join_range_binned",
    "window_rank",
    "window_running",
    "sort_topk",
    "agg_rollup",
    "dedup_exact",
    "dedup_minhash",
    "dedup_minhash_pairs",
    "dedup_verified_pairs",
    "text_chunks",
    "sim_topk",
    "text_quality",
    "win_session",
    "win_tumbling",
    "events_pivot",
    "scd2_merge",
    "pipeline_stream_query",
    "tpch_q3_shipping",
    "tpch_q5_local_volume",
    "tpch_q18_large_orders",
    "text_lm_score",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q21_waiting",
    "fk_integrity_audit",
    "embed_quantize",
    "corpus_prep_pipeline",
    "dq_drift",
    "events_rolling_active",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_cnt",
    "tpch_q20_promotion_supplier",
    "text_decontaminate_bloom",
    "snapshot_diff",
    "table_checksum",
    # r7 additions: feature-engineering family + rank-based drift
    "feature_target_encode_loo",
    "feature_quantile_bucket",
    "stats_mannwhitney",
    "text_collocations",
)


def _prev_round_timings() -> tuple[str, dict[str, float], float | None] | None:
    """Latest BENCH_r{N}.json in the repo root, for per-query regression
    deltas — plus that round's single-thread cpu_probe_ms (from the
    archived docs/BENCH_DETAIL_r{N}.json) so deltas can be normalized for
    VM placement before anything is called a regression."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    # newest parseable round wins: a round whose driver record came back
    # "parsed": null (r5) carries no per-query map, so fall through to the
    # next-newest that does
    for n, path in sorted(rounds, reverse=True):
        # a round whose official record is unparseable may have a committed
        # hand-reconstruction (r5: BENCH_r05_RECONSTRUCTED.json, rebuilt from
        # the captured tail + r4-delta map)
        recon = path.replace(".json", "_RECONSTRUCTED.json")
        for candidate in (path, recon):
            try:
                with open(candidate) as f:
                    data = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            # the driver records {"parsed": <our JSON line>, ...}; accept both
            if "queries" not in data and isinstance(data.get("parsed"), dict):
                data = data["parsed"] or {}
            queries = data.get("queries")
            if queries:
                probe = None
                try:
                    with open(
                        os.path.join(here, "docs", f"BENCH_DETAIL_r{n:02d}.json")
                    ) as f:
                        probe = json.load(f).get("host", {}).get("cpu_probe_ms")
                except (OSError, json.JSONDecodeError):
                    pass
                return os.path.basename(candidate), dict(queries), probe
    return None


def normalized_flags(
    timings: dict[str, float],
    prev_q: dict[str, float],
    probe_ratio: float | None,
) -> tuple[float, float | None, dict[str, float], list[str]]:
    """Placement-normalized regression flags (r10; rebased on the
    median in r11).

    The expectation each query is judged against is the MEDIAN observed
    per-query ratio — a placement estimate that one genuinely regressed
    query cannot move (unlike the total ratio, which the regression
    itself inflates), so per-query plan regressions stand out as
    OUTLIERS under any host placement.

    The single-thread md5 probe is recorded as a diagnostic but no
    longer participates in the applied ratio: two consecutive rounds
    proved it uncorrelated with 32-thread JVM throughput in BOTH
    directions (r10: probe 2.04x slower, wall 7.5% FASTER; r11: probe
    1.9x faster, wall 12% slower). The r10->r11 interim rule
    applied = min(probe, median) mass-flagged 30+ diffless queries the
    moment a fast-probe host ran normally — an over-convicting gate is
    as useless as one that can only acquit. Known limitation, accepted:
    ANY regression touching >=50% of the timed queries — not just a
    perfectly uniform one — moves the median itself and is partially
    (at >=50%) or fully (uniform) absorbed into the expectation, so
    this statistic alone cannot convict broad regressions (e.g. a
    session-config mistake). The machine defense for that case is the
    complementary raw_total_flag() band below (r12, verdict item 4);
    the manual defenses remain the per-file diff discipline (risers in
    diffless files are placement, by construction) and the cross-round
    raw totals the verdicts audit every round.

    Returns (applied_ratio, median_observed, delta_normalized, flagged).
    Pure function of its inputs so tests can inject regressions under
    synthetic fast/slow hosts and junk probes (tests/test_bench_flags.py).
    """
    common = [n for n in timings if n in prev_q]
    # sub-100ms priors jitter past any ratio; exclude from the estimate
    ratios = sorted(
        timings[n] / prev_q[n] for n in common if prev_q[n] > 0.1
    )
    # true median (r12, ADVICE): the upper-middle element gave the gate
    # a small systematic leniency on even-length lists
    if not ratios:
        median_obs = None
    elif len(ratios) % 2:
        median_obs = ratios[len(ratios) // 2]
    else:
        median_obs = (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
    applied = median_obs if median_obs is not None else (probe_ratio or 1.0)
    norm = {n: round(timings[n] - prev_q[n] * applied, 3) for n in common}
    # chase-list: >1.5x the placement-expected time AND >0.3s absolute
    # (sub-second queries jitter past any ratio band)
    flagged = sorted(
        n
        for n in common
        if timings[n] > 1.5 * prev_q[n] * applied and norm[n] > 0.3
    )
    return applied, median_obs, norm, flagged


RAW_TOTAL_BAND = 1.35  # placement drift observed across rounds is 1.1-1.7x,
# but the band judges the PROBE-EXONERATED ratio, not the raw one


def raw_total_flag(
    total_now: float,
    prev_totals: list[float],
    probe_ratio: float | None,
) -> tuple[float | None, bool]:
    """Complementary uniform-regression gate (r12, verdict item 4).

    normalized_flags() judges each query against the median observed
    ratio, so a regression touching >=50% of queries moves its own
    expectation and escapes. This statistic has no such blind spot: it
    compares the RAW total against the MEDIAN of the last <=3 rounds'
    totals — a per-round scalar no single round can move — and flags
    when the ratio exceeds RAW_TOTAL_BAND after probe exoneration.

    The probe can only EXONERATE, never convict (same asymmetry the
    per-query gate settled on): a genuinely slow host whose probe also
    reads slow (ratio > 1) has its allowance raised to the probe, so
    a 2x-slow placement stays clean; a junk-FAST probe (r11: 0.53 on a
    1.12x host) is ignored rather than used to tighten the band. Known
    limitation, accepted: a genuinely slow placement whose probe reads
    fast (the r11 inversion, at >1.35x drift) is falsely flagged — the
    flag is a CHASE signal for the verdict, adjudicated against the
    per-file diff evidence (a uniform riser with a zero-diff operator
    tree is placement; one with a touched session.py/registry is real),
    not a conviction. Pure function for tests (test_bench_flags.py).

    Returns (ratio_vs_median_prev or None, flagged).
    """
    # last 3 ROUNDS chronologically (prev_totals is oldest-first), then
    # sorted for the median — sorting first would pick the 3 largest
    prevs = sorted([t for t in prev_totals if t and t > 0][-3:])
    if not prevs or total_now <= 0:
        return None, False
    mid = len(prevs) // 2
    med_prev = (
        prevs[mid]
        if len(prevs) % 2
        else (prevs[mid - 1] + prevs[mid]) / 2
    )
    ratio = total_now / med_prev
    allowance = max(probe_ratio, 1.0) if probe_ratio else 1.0
    return round(ratio, 4), (ratio / allowance) > RAW_TOTAL_BAND


def _prev_round_totals() -> list[float]:
    """Totals of the last rounds' official bench records, oldest-first,
    for the raw-total band (reconstructed files accepted, unparseable
    rounds skipped — same reading rules as _prev_round_timings)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    totals: list[float] = []
    for n, path in sorted(rounds):
        for candidate in (path, path.replace(".json", "_RECONSTRUCTED.json")):
            try:
                with open(candidate) as f:
                    data = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if "value" not in data and isinstance(data.get("parsed"), dict):
                data = data["parsed"] or {}
            if isinstance(data.get("value"), (int, float)) and data["value"] > 0:
                totals.append(float(data["value"]))
                break
    return totals


def _archive_official_detail() -> None:
    """Self-maintaining per-round detail archive: if the repo-root
    BENCH_DETAIL.json is the driver's OFFICIAL run for some round
    (its total matches BENCH_r{N}.json's parsed value) and that round
    has no archived copy yet, snapshot it to docs/BENCH_DETAIL_r{N}.json
    BEFORE this run overwrites the root file. This is what preserves each
    round's cpu_probe_ms for the next round's normalization — local
    mid-round bench runs don't match any official total and are never
    archived."""
    import glob
    import re
    import shutil

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            cur = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, json.JSONDecodeError):
            continue
        if parsed.get("value") == cur.get("value") and parsed.get("value"):
            dst = os.path.join(
                here, "docs", f"BENCH_DETAIL_r{int(m.group(1)):02d}.json"
            )
            if not os.path.exists(dst):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copyfile(os.path.join(here, "BENCH_DETAIL.json"), dst)


def main() -> None:
    _archive_official_detail()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    loadavg_at_start = round(os.getloadavg()[0], 2)
    registry = load_all()
    spark = get_spark("bench")

    # warm the JVM once — codegen, shuffle infra, broadcast machinery —
    # so timings measure the engine, not first-query initialization.
    # Each headline query runs once at the smallest SF first: same plan
    # shapes, so whole-stage-codegen compilation is amortized out of the
    # timed runs (standard steady-state benching practice).
    warm_dir = "/root/testdata/sf0.001"
    warm_sf = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in HEADLINE:
        registry[name].fn(spark, warm_sf).write.format("noop").mode("overwrite").save()
    # also touch every TARGET-sf table once (footers + page cache): the
    # codegen warmup above runs at the small SF, so without this the first
    # timed query pays the target files' first-read cost alone.
    from data_bridge_spark.catalog import TABLE_NAMES, Tables

    t = Tables(spark, sf_dir)
    for name in TABLE_NAMES:
        t.table(name).write.format("noop").mode("overwrite").save()

    # timed runs, keep the min: the local machine is shared/noisy and a
    # single sample can be 2x off; min-of-n reports engine capability.
    # Sub-second queries get extra samples — at that scale scheduler
    # jitter is ±0.15 s, which min-of-2 doesn't filter (the r2 bench's
    # one "regression", text_quality +0.14 s, was exactly this).
    # Several operators localCheckpoint intermediate tables (LSH band
    # tables, CC/PageRank loop states, the bigram-LM pair relation); every
    # fn() call creates fresh blocks that outlive the query, so a 26-query
    # sweep accumulates gigabytes of dead blocks and the LAST queries pay
    # the GC bill (r3: text_lm_score 6.9 s under the driver vs 2.5 s on a
    # clean session).  Dropping dead persisted RDDs between queries
    # isolates each timing without hiding any per-query checkpoint cost —
    # each sample still creates and pays for its own blocks. The
    # unpersist is blocking so cleanup can't bleed into the next timed
    # sample (it runs outside the timed region).
    from data_bridge_spark.session import drop_dead_blocks as _ddb

    def _drop_dead_blocks() -> None:
        _ddb(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        samples: list[float] = []
        while len(samples) < 2 or (min(samples) < 1.0 and len(samples) < 4):
            _drop_dead_blocks()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
    _drop_dead_blocks()

    total = round(sum(timings.values()), 3)
    # compact line: exactly what the driver spec asks for, nothing more —
    # r5's line grew past the driver's tail-capture window and the official
    # record came back "parsed": null.  Forensics payload goes to
    # BENCH_DETAIL.json (committed) instead.
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = dict(out)
    # host fingerprint for cross-round drift forensics: identical plans
    # measured on different VM placements can differ 1.3-1.7x (see SCALE.md
    # "Bench environment note"); loadavg is sampled BEFORE the bench's own
    # work inflates it
    # single-thread CPU microprobe: a fixed md5 loop timed once. Rounds
    # land on different VM placements whose single-core speed differs
    # 1.1-1.7x (r9 forensic: loadavg at start is ANTI-correlated with
    # totals across the committed BENCH_DETAIL history — placement, not
    # load, dominates). The probe lets a future round divide out the
    # placement delta instead of chasing phantom uniform "regressions".
    import hashlib

    t0 = time.perf_counter()
    h = b"x"
    for _ in range(200_000):
        h = hashlib.md5(h).digest()
    cpu_probe_ms = round((time.perf_counter() - t0) * 1000, 1)
    detail["host"] = {
        "cpus": os.cpu_count(),
        "loadavg_1m_at_start": loadavg_at_start,
        "cpu_probe_ms": cpu_probe_ms,
    }
    prev = _prev_round_timings()
    if prev is not None:
        prev_file, prev_q, prev_probe = prev
        common = [n for n in timings if n in prev_q]
        vs_prev: dict[str, object] = {
            "file": prev_file,
            "delta_sec": {n: round(timings[n] - prev_q[n], 3) for n in common},
        }
        # Placement normalization (r10): raw cross-round deltas are
        # dominated by which VM the round landed on, not by plan changes —
        # the committed BENCH_DETAIL history shows loadavg ANTI-correlated
        # with totals (r9: loadavg 9.0 ran FASTER than idle runs) while
        # the single-thread probe tracks them. Reading rule: judge a query
        # only on delta_sec_normalized — raw delta_sec is forensics. The
        # normalized delta scales the prior round's time by
        # probe_ratio = probe_now / probe_prev (expected time on THIS
        # host), so a query is flagged only when it is slow relative to
        # what this placement should deliver.
        probe_ratio = (
            round(cpu_probe_ms / prev_probe, 4) if prev_probe else None
        )
        applied, median_obs, norm, flagged = normalized_flags(
            timings, prev_q, probe_ratio
        )
        vs_prev["cpu_probe_ratio"] = probe_ratio
        vs_prev["median_observed_ratio"] = (
            round(median_obs, 4) if median_obs is not None else None
        )
        vs_prev["applied_ratio"] = round(applied, 4)
        vs_prev["delta_sec_normalized"] = norm
        vs_prev["flagged_normalized"] = flagged
        # uniform-regression band (r12): raw total vs median of the last
        # 3 rounds' totals, probe-exonerated — the statistic the
        # per-query median gate is structurally blind to
        rt_ratio, rt_flag = raw_total_flag(
            total, _prev_round_totals(), probe_ratio
        )
        vs_prev["raw_total_vs_last3_median"] = rt_ratio
        vs_prev["raw_total_flagged"] = rt_flag
        detail["vs_prev"] = vs_prev
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    # the compact line MUST be the final stdout line (driver tail-capture)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
