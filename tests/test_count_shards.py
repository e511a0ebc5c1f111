"""Pin the rows-only count-shard lane (tools/count_shards.py, r12).

The lane's claim — N injected per-shard oracle COUNTs sum exactly to
the full oracle count — rests on (a) the injection builder refusing a
drifted marker, (b) the registered oracles still containing each
spec'd marker exactly once, and (c) the injected predicate actually
partitioning the pair stream. (a)/(b) are assert-level pins; (c) is an
end-to-end sum-vs-full check per query at sf0.001, run in-process via
shard_count (no subprocess fan-out — the tool's process isolation is
an OOM-containment measure, not a semantic one).
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from count_shards import INJECTIONS, shard_count  # noqa: E402
from shard_check import build_injected_oracle  # noqa: E402

from data_bridge_spark.registry import load_all  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_injection_refuses_missing_marker():
    with pytest.raises(AssertionError, match="exactly once"):
        build_injected_oracle("SELECT 1", "ON nothing", "x", 0, 4)


def test_injection_refuses_duplicated_marker():
    with pytest.raises(AssertionError, match="exactly once"):
        build_injected_oracle(
            "a JOIN b ON k = k JOIN c ON k = k", "ON k = k", "x", 0, 4
        )


def test_specs_match_live_oracles_exactly_once():
    # an oracle rewrite that keeps semantics but moves/renames the ON
    # clause must fail HERE, not silently change what the lane measures
    reg = load_all()
    for name, spec in INJECTIONS.items():
        assert reg[name].oracle.count(spec["marker"]) == 1, name


def test_digest_lane_refuses_double_columns():
    # dedup_ppjoin's jaccard is DOUBLE — its VARCHAR cast is not
    # engine-portable, so the sql-digest shard lane must refuse it
    # (RowDigest shards are its lane)
    from count_shards import _digest_cols

    with pytest.raises(AssertionError, match="unsupported"):
        _digest_cols({"id_a": "bigint", "jaccard": "double"})


def test_digest_shards_match_engine(monkeypatch):
    # end-to-end value check of the sharded sql-digest lane at sf0.001:
    # per-shard oracle digests equal the engine's single grouped-digest
    # execution, and their n's partition the full count
    monkeypatch.setenv("SELFCHECK_DUCK_MEM", "2GB")
    monkeypatch.setenv("SELFCHECK_DUCK_THREADS", "4")
    from count_shards import engine_shard_digests, shard_digest

    n = 4
    name = "link_blocked_pairs"
    engine = engine_shard_digests(name, SF_DIR, n)
    total = 0
    for k in range(n):
        odig = shard_digest(name, SF_DIR, k, n)
        edig = engine.get(k, {key: 0 for key in odig})
        assert edig == odig, (k, edig, odig)
        total += odig["n"]
    assert total == sum(d["n"] for d in engine.values())
    assert total > 0


@pytest.mark.parametrize("name", sorted(INJECTIONS))
def test_shard_counts_partition_full_count(name, monkeypatch):
    monkeypatch.setenv("SELFCHECK_DUCK_MEM", "2GB")
    monkeypatch.setenv("SELFCHECK_DUCK_THREADS", "4")
    n = 4
    total = sum(shard_count(name, SF_DIR, k, n) for k in range(n))
    con = duckdb.connect()
    for t in ("documents", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    full = con.execute(
        f"SELECT COUNT(*) FROM ({load_all()[name].oracle})"
    ).fetchone()[0]
    con.close()
    assert total == full
    assert full > 0  # the fixture must actually exercise the join
