"""Semantic assertions on individual operators (beyond the oracle hash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_bridge_spark.registry import load_all

REG = load_all()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def test_window_rank_bounded_per_group(spark, sf_dir):
    rows = run("window_rank", spark, sf_dir).groupBy("o_custkey").count().collect()
    assert rows and all(r["count"] <= 3 for r in rows)


def test_dedup_exact_unique_fingerprints(spark, sf_dir):
    df = run("dedup_exact", spark, sf_dir)
    assert df.count() == df.select("fp").distinct().count()


def test_sim_topk_shape(spark, sf_dir):
    df = run("sim_topk", spark, sf_dir)
    rows = df.collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == set(range(10))
    for probe, rs in by_probe.items():
        assert len(rs) == 5
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rk)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.cand_id != probe for r in rs)
        assert all(-1.0 <= r.cos_sim <= 1.0 for r in rs)


def test_sessionization_gap_property(spark, sf_dir):
    # within any session, span < gap would be too strict; but the session
    # start of session N+1 must be > 30 min after the end of session N
    df = run("win_session", spark, sf_dir)
    rows = df.orderBy("user_id", "session_id").collect()
    prev = {}
    for r in rows:
        if r.user_id in prev:
            gap = (r.session_start - prev[r.user_id]).total_seconds()
            assert gap > 1800, f"sessions closer than gap for user {r.user_id}"
        prev[r.user_id] = r.session_end


def test_minhash_pairs_are_ordered_unique(spark, sf_dir):
    df = run("dedup_minhash_pairs", spark, sf_dir)
    assert df.filter(F.col("id_a") >= F.col("id_b")).count() == 0
    assert df.count() == df.distinct().count()


def test_lsh_topk_is_subset_of_bucket(spark, sf_dir):
    # every LSH candidate must share the probe's sign-bucket by construction;
    # spot-check determinism: two runs produce identical results
    a = sorted(map(tuple, run("sim_topk_lsh", spark, sf_dir).collect()))
    b = sorted(map(tuple, run("sim_topk_lsh", spark, sf_dir).collect()))
    assert a == b


def test_mm_features_schema_and_determinism(spark, sf_dir):
    df = run("mm_features", spark, sf_dir)
    assert df.columns == ["doc_id", "n_bytes", "first_byte", "mean_byte"]
    rows = {r.doc_id: r for r in df.collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    # byte length must equal utf-8 length of the text payload
    for doc_id, text in list(docs.items())[:20]:
        assert rows[doc_id].n_bytes == len(text.encode("utf-8"))
