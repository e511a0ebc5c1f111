"""Semantic tests for the training-data-prep operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.registry import load_all

REG = load_all()


def test_split_is_stable_and_partition_independent(spark, sf_dir):
    a = {(r.doc_id, r.split) for r in REG["split_train_test"].fn(spark, sf_dir).collect()}
    b = {(r.doc_id, r.split) for r in REG["split_train_test"].fn(spark, sf_dir).collect()}
    assert a == b
    train = sum(1 for _, s in a if s == "train")
    assert 0.7 < train / len(a) < 0.9  # ~80/20


def test_pack_sequences_respects_budget(spark, sf_dir):
    df = REG["pack_sequences"].fn(spark, sf_dir)
    totals = (
        df.groupBy("pack_group", "bin_id")
        .agg(F.sum("used_tokens").alias("total"))
        .collect()
    )
    assert totals and all(r.total <= 512 for r in totals)
    # packing should do materially better than one-doc-per-bin
    n_docs = df.count()
    n_bins = df.select("pack_group", "bin_id").distinct().count()
    assert n_bins < n_docs


def test_stratified_sample_hits_fractions(spark, sf_dir):
    out = REG["sample_stratified"].fn(spark, sf_dir)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {
        r.lang: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fractions = {"en": 0.3, "es": 0.8, "fr": 0.8, "de": 0.8, "zh": 1.0}
    for lang, frac in fractions.items():
        ratio = got.get(lang, 0) / full[lang]
        assert abs(ratio - frac) < 0.25, f"{lang}: {ratio} vs {frac}"


def test_dq_report_passes_on_clean_data(spark, sf_dir):
    rows = {r.check_name: r for r in REG["dq_report"].fn(spark, sf_dir).collect()}
    assert rows["rowcount"].passed and rows["rowcount"].observed > 0
    assert rows["null_custkey"].passed
    assert rows["orphan_orders"].passed
    assert rows["negative_price"].passed


def test_dq_drift_is_a_distance(spark, sf_dir):
    """tv_dist is one value in [0, 1] corpus-wide; per-window shares
    each sum to 1 (counts partition the window exactly)."""
    rows = REG["dq_drift"].fn(spark, sf_dir).collect()
    assert rows
    tvs = {r["tv_dist"] for r in rows}
    assert len(tvs) == 1
    tv = tvs.pop()
    assert 0.0 <= tv <= 1.0
    assert abs(sum(r["share_a"] for r in rows) - 1.0) < 1e-12
    assert abs(sum(r["share_b"] for r in rows) - 1.0) < 1e-12
    # the exact-decimal numerator reproduces the float definition
    approx = 0.5 * sum(abs(r["share_a"] - r["share_b"]) for r in rows)
    assert abs(tv - approx) < 1e-9


def test_stratified_hash_sample_is_partitioning_invariant(spark, sf_dir):
    """Bit-determinism doctrine: the hash-decided stratified sample is a
    pure function of (key, lang), so ANY repartitioning of the input —
    round-robin 3, hash-by-lang 7, coalesce 1 — yields the identical
    doc set. (sampleBy's RNG stream is partitioning-dependent by
    construction; that variant's contract is statistical, pinned below.)"""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from data_bridge_spark.operators.mlprep import _hash_pct

    def sample(df):
        pct = _hash_pct(F.col("doc_id"), "strat-")
        rate = (
            F.when(F.col("lang") == "en", 30)
            .when(F.col("lang") == "zh", 100)
            .otherwise(80)
        )
        return {(r.doc_id, r.lang) for r in df.filter(pct < rate).select("doc_id", "lang").collect()}

    base = sample(docs)
    assert base
    assert sample(docs.repartition(3)) == base
    assert sample(docs.repartition(7, "lang")) == base
    assert sample(docs.coalesce(1)) == base


def test_stratified_rng_sample_keeps_fractions_under_repartitioning(spark, sf_dir):
    """sample_stratified (sampleBy) promises per-stratum STATISTICS, not a
    stable row set — its docstring points determinism-needing callers at
    the hash variant. Pin the statistical half: after an adversarial
    repartition the per-language fractions still land."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(11)
    fractions = {"en": 0.3, "es": 0.8, "fr": 0.8, "de": 0.8, "zh": 1.0}
    out = docs.sampleBy("lang", fractions, seed=42)
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, frac in fractions.items():
        ratio = got.get(lang, 0) / full[lang]
        assert abs(ratio - frac) < 0.25, f"{lang}: {ratio} vs {frac}"


def test_contamination_spans_consistent_with_filter(spark, sf_dir):
    """The span audit must agree with the boolean filter it explains:
    summing distinct shared trigrams per (doc, bench) pair can only
    OVERCOUNT the per-doc distinct count (a trigram shared with two
    bench docs counts twice in the pair grain), never undercount, and
    the set of flagged docs is identical; fractions are in (0, 1]."""
    spans = REG["text_contamination_spans"].fn(spark, sf_dir)
    flat = REG["text_decontaminate"].fn(spark, sf_dir)
    rows = spans.collect()
    assert rows
    assert all(0 < r.frac_contaminated <= 1.0 for r in rows)
    per_doc_pairs = {}
    for r in rows:
        per_doc_pairs[r.doc_id] = per_doc_pairs.get(r.doc_id, 0) + r.n_shared
    per_doc_flat = {r.doc_id: r.n_shared for r in flat.collect()}
    assert set(per_doc_pairs) == set(per_doc_flat)
    assert all(per_doc_pairs[d] >= per_doc_flat[d] for d in per_doc_flat)


def test_quota_sample_caps_and_is_partitioning_invariant(spark, sf_dir):
    """Every source contributes at most Q docs; hash order makes the kept
    doc set invariant under input repartitioning."""
    out = REG["corpus_quota_sample"].fn(spark, sf_dir)
    per_source = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_source and all(n <= 200 for n in per_source.values())
    base = {(r.doc_id, r.source) for r in out.collect()}
    from data_bridge_spark.operators.corpus import corpus_quota_sample as _  # noqa: F401
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    key = F.md5(F.concat(F.lit("quota-"), F.col("doc_id").cast("string")))
    from pyspark.sql import Window as W2
    w = W2.partitionBy("source").orderBy(key, F.col("doc_id"))
    again = {
        (r.doc_id, r.source)
        for r in docs.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 200)
        .collect()
    }
    assert again == base


def test_split_leakage_free_cluster_atomic(spark, sf_dir):
    """The leakage contract itself: no LSH candidate pair (near-dup
    evidence edge) may straddle the train/test boundary — and the split
    must still be usable (both sides populated, stable across re-runs)."""
    from data_bridge_spark.catalog import Tables
    from data_bridge_spark.operators.dedup import lsh_candidate_pairs

    out = {
        r.doc_id: (r.cluster_label, r.split)
        for r in REG["split_leakage_free"].fn(spark, sf_dir).collect()
    }
    docs = Tables(spark, sf_dir).documents
    pairs = lsh_candidate_pairs(docs).select("id_a", "id_b").collect()
    assert pairs, "test corpus should contain near-dup candidate edges"
    for p in pairs:
        assert out[p.id_a][1] == out[p.id_b][1], (
            f"near-dup pair {p.id_a}/{p.id_b} straddles the split"
        )
    sides = {s for _, s in out.values()}
    assert sides == {"train", "test"}
    again = {
        r.doc_id: (r.cluster_label, r.split)
        for r in REG["split_leakage_free"].fn(spark, sf_dir).collect()
    }
    assert out == again


def test_markov_transition_rows_normalize(spark, sf_dir):
    out = REG["events_markov_transitions"].fn(spark, sf_dir).collect()
    assert out
    by_cur: dict[str, float] = {}
    for r in out:
        assert 0.0 < r.p <= 1.0 and r.n >= 1
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-9, (cur, total)


def test_stats_ks_matches_direct_computation(spark, sf_dir):
    """Triple-check the distributed two-level prefix-sum CDF against a
    direct single-machine KS computation on the same rows (the oracle
    already cross-checks DuckDB; this pins the math independently)."""
    from data_bridge_spark.catalog import Tables
    from data_bridge_spark.operators.insights import _KS_A, _KS_B

    row = REG["stats_ks"].fn(spark, sf_dir).collect()[0]
    ev = Tables(spark, sf_dir).events.select("event_type", "value").collect()
    a = sorted(r.value for r in ev if r.event_type == _KS_A)
    b = sorted(r.value for r in ev if r.event_type == _KS_B)
    assert (row.n_a, row.n_b) == (len(a), len(b))
    import bisect

    ks = max(
        abs(bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b))
        for v in set(a) | set(b)
    )
    assert abs(row.ks_stat - ks) < 1e-12
    assert row.crit_05 > 0 and row.reject_05 == (row.ks_stat > row.crit_05)


def test_term_lift_recomputes_from_raw_counts(spark, sf_dir):
    """Every reported lift must equal the ratio recomputed from raw
    whitespace-token counts; ranks must be 1..k per source."""
    import collections

    from data_bridge_spark.catalog import Tables

    out = REG["text_term_lift"].fn(spark, sf_dir).collect()
    assert out
    docs = Tables(spark, sf_dir).documents.select("source", "text").collect()
    n_ts: collections.Counter = collections.Counter()
    for r in docs:
        for w in r.text.lower().split(" "):
            n_ts[(r.source, w)] += 1
    n_s = collections.Counter()
    n_t = collections.Counter()
    for (src, w), c in n_ts.items():
        n_s[src] += c
        n_t[w] += c
    n = sum(n_ts.values())
    per_source = collections.defaultdict(list)
    for r in out:
        expect = (n_ts[(r.source, r.term)] / n_s[r.source]) / (n_t[r.term] / n)
        assert r.n_ts == n_ts[(r.source, r.term)]
        assert abs(r.lift - expect) < 1e-9, (r.source, r.term)
        per_source[r.source].append(r.rk)
    for src, rks in per_source.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_scaling_curve_subset_is_registered():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scaling_curve",
        os.path.join(os.path.dirname(__file__), "..", "tools", "scaling_curve.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    missing = [n for n in mod.SUBSET if n not in REG]
    assert not missing, f"scaling_curve SUBSET names not in registry: {missing}"


def test_prefix_sum_ops_partitioning_invariant(spark, sf_dir):
    """stats_ks and agg_gini replace global ordered windows with a
    bucketed two-level prefix sum — their outputs must be bit-identical
    under different shuffle partitioning (the engine's determinism
    doctrine applied to the distributed-CDF machinery)."""
    for name in ("stats_ks", "agg_gini"):
        fn = REG[name].fn
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        a = [tuple(r) for r in fn(spark, sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = [tuple(r) for r in fn(spark, sf_dir).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        assert sorted(map(repr, a)) == sorted(map(repr, b)), name


def test_profile_skew_approx_tracks_exact_counts(spark, sf_dir):
    """The frequent-items sketch must recover true heavy hitters: every
    returned estimate within 5% of the exact count, and the returned
    set's worst exact count at least 80% of the true k-th count."""
    rows = REG["profile_skew_approx"].fn(spark, sf_dir).collect()
    assert rows
    exact = {
        r.user_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for r in rows:
        assert abs(r.n_approx - exact[r.user_id]) <= max(1, 0.05 * exact[r.user_id])
    kth = sorted(exact.values(), reverse=True)[: len(rows)][-1]
    assert min(exact[r.user_id] for r in rows) >= 0.8 * kth


def test_bucketed_prefix_sum_degenerate_single_value(spark):
    """width_bucket returns NULL when min == max; the shared prefix-sum
    helper must coalesce that uniform case into one bucket instead of
    dropping every row through the offsets join (review finding)."""
    from data_bridge_spark.operators.insights import _bucketed_prefix_sums

    df = spark.createDataFrame([(5.0, 2), (5.0, 3)], "v double, c long").groupBy(
        "v"
    ).agg(F.sum("c").alias("c"))
    out = _bucketed_prefix_sums(df, "v", ("c",)).collect()
    assert len(out) == 1 and out[0]["run_c"] == 5
