"""The placement-normalized bench gate must CONVICT without
over-convicting (r11).

r10's gate scaled expectations by the raw single-thread probe ratio, so
a host whose probe read 2x slower gave every query a 2x allowance — an
injected regression could never be flagged there (the r10 verdict's
bench item). The first r11 fix, min(probe, median), restored conviction
but over-convicted the moment a FAST-probe host ran normally (live in
r11: probe ratio 0.53, wall 1.12x → 30+ diffless queries flagged). The
gate now judges every query against the median observed per-query
ratio alone — a placement estimate one regressed query cannot move —
and records the probe as a diagnostic. These tests inject a 3x
regression into a synthetic 12-query round and require it flagged under
a 1x probe, a 2x probe (probe overstating — the r10 failure mode), a
genuinely 2x-slow host, and a junk-fast probe (the r11 failure mode) —
and require clean runs to stay unflagged in all four.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import normalized_flags, raw_total_flag  # noqa: E402

PREV = {f"q{i}": 2.0 for i in range(12)}


def _now(host_factor: float, regressed: str | None = None) -> dict:
    t = {n: v * host_factor for n, v in PREV.items()}
    if regressed:
        t[regressed] = PREV[regressed] * host_factor * 3.0
    return t


def test_regression_flagged_under_1x_probe():
    applied, med, norm, flagged = normalized_flags(_now(1.0, "q5"), PREV, 1.0)
    assert flagged == ["q5"]
    assert abs(applied - 1.0) < 0.05


def test_regression_flagged_under_2x_probe_fast_host():
    # the r10 failure mode: probe says 2.04x, actual wall is ~1x —
    # the old gate gave q5 a 2x allowance and acquitted it
    applied, med, norm, flagged = normalized_flags(
        _now(1.0, "q5"), PREV, 2.04
    )
    assert flagged == ["q5"]
    assert applied <= 1.05  # clamped to the median, not the probe


def test_regression_flagged_on_genuinely_slow_host():
    # host really is 2x slower AND q5 regressed 3x on top of that
    applied, med, norm, flagged = normalized_flags(
        _now(2.0, "q5"), PREV, 2.04
    )
    assert flagged == ["q5"]
    assert 1.9 <= applied <= 2.04  # slow host keeps its allowance


def test_clean_runs_unflagged():
    for host, probe in [(1.0, 1.0), (1.0, 2.04), (2.0, 2.04), (0.5, 2.0)]:
        applied, med, norm, flagged = normalized_flags(
            _now(host), PREV, probe
        )
        assert flagged == [], (host, probe, flagged)


def test_clean_run_fast_probe_host_not_mass_flagged():
    # the r11 live failure: the probe read 1.9x FASTER (ratio 0.53)
    # while wall ran 12% slower — min(probe, median) gave every query a
    # 0.53x expectation and flagged 30+ queries in diffless files
    applied, med, norm, flagged = normalized_flags(_now(1.12), PREV, 0.53)
    assert flagged == [], flagged
    assert abs(applied - 1.12) < 0.05


def test_regression_flagged_under_junk_fast_probe():
    applied, med, norm, flagged = normalized_flags(
        _now(1.12, "q5"), PREV, 0.53
    )
    assert flagged == ["q5"]


def test_no_probe_falls_back_to_median():
    applied, med, norm, flagged = normalized_flags(
        _now(1.5, "q5"), PREV, None
    )
    assert flagged == ["q5"]
    assert abs(applied - 1.5) < 0.05


def test_true_median_even_length():
    # (r12, ADVICE) even-length ratio lists must average the two middle
    # elements — the old upper-middle pick was systematically lenient.
    # 4 queries with ratios 1.0, 1.0, 2.0, 2.0: true median 1.5, the old
    # rule returned 2.0 and would have granted a 2x allowance.
    prev = {f"q{i}": 2.0 for i in range(4)}
    now = {"q0": 2.0, "q1": 2.0, "q2": 4.0, "q3": 4.0}
    applied, med, norm, flagged = normalized_flags(now, prev, 1.0)
    assert abs(med - 1.5) < 1e-9


# --- raw-total band: the uniform-regression gate (r12, verdict item 4) ---
# normalized_flags' median expectation is structurally blind to a
# regression touching >=50% of queries; raw_total_flag compares the raw
# total to the median of the last 3 rounds' totals, with the probe able
# to EXONERATE (slow host) but never convict.

LAST3 = [40.0, 42.0, 41.0]  # median 41.0


def test_uniform_regression_flagged_on_1x_host():
    # every query 1.5x slower, probe says the host is normal: the
    # per-query gate absorbs this into its median; the band convicts
    ratio, flagged = raw_total_flag(41.0 * 1.5, LAST3, 1.0)
    assert flagged
    assert abs(ratio - 1.5) < 0.01
    # and the per-query gate really is blind to it — the pairing that
    # makes the band necessary
    _, _, _, pq_flags = normalized_flags(_now(1.5), PREV, 1.0)
    assert pq_flags == []


def test_genuinely_slow_host_stays_clean():
    # 2x wall with a 2.04x probe: placement, exonerated
    ratio, flagged = raw_total_flag(41.0 * 2.0, LAST3, 2.04)
    assert not flagged


def test_clean_run_stays_clean():
    ratio, flagged = raw_total_flag(41.5, LAST3, 1.0)
    assert not flagged


def test_junk_fast_probe_cannot_tighten_band():
    # the r11 inversion: probe 0.53 on a 1.12x host — a probe < 1 is
    # ignored, and 1.12 is inside the band anyway
    ratio, flagged = raw_total_flag(41.0 * 1.12, LAST3, 0.53)
    assert not flagged


def test_uniform_regression_flagged_despite_junk_fast_probe():
    ratio, flagged = raw_total_flag(41.0 * 1.5, LAST3, 0.53)
    assert flagged


def test_regression_on_top_of_slow_host_flagged():
    # host 2x (probe agrees) AND a uniform 1.5x regression: 3x total,
    # exonerated to 1.47 — still past the band
    ratio, flagged = raw_total_flag(41.0 * 3.0, LAST3, 2.04)
    assert flagged


def test_band_uses_last3_chronological_not_largest():
    # totals history 60, 60, 60, then three fast rounds 40, 42, 41: the
    # band must judge against the RECENT median (41), not the 3 largest
    ratio, flagged = raw_total_flag(41.0 * 1.5, [60.0, 60.0, 60.0] + LAST3, 1.0)
    assert flagged
    assert abs(ratio - 1.5) < 0.01


def test_band_no_history_no_flag():
    ratio, flagged = raw_total_flag(41.0, [], 1.0)
    assert ratio is None and not flagged
