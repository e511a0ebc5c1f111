"""Partitioned-layout write + pruned reads: the scan-side features that
decide whether a 100 TB table is readable at all.

- Static partition pruning: a literal filter on the partition column is
  resolved at planning time — the scan's ``PartitionFilters`` carries it
  and only matching ``col=value/`` directories are listed.
- Dynamic partition pruning (DPP): a join against a *filtered* dimension
  prunes fact partitions at runtime — the scan node carries a
  ``dynamicpruning`` subquery instead of reading every partition and
  filtering post-join.
- ``sortWithinPartitions`` layout: rows inside each file arrive sorted,
  so parquet min/max row-group stats are selective on the sort column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_bridge_spark.sinks.writers import write_partitioned_table
from tests.conftest import plan_string


@pytest.fixture(scope="module")
def part_orders(spark, sf_dir, tmp_path_factory):
    """orders partitioned by priority, sorted inside files by custkey."""
    path = str(tmp_path_factory.mktemp("lake") / "orders_by_priority")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = write_partitioned_table(
        orders, path, partition_cols=["o_orderpriority"], sort_cols=["o_custkey"]
    )
    assert n == orders.count()
    return path


_scan_desc = plan_string


def test_static_partition_pruning(spark, part_orders):
    df = spark.read.parquet(part_orders).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = _scan_desc(df)
    assert "PartitionFilters" in plan
    # the partition predicate lives in PartitionFilters, not a post-scan Filter
    assert "o_orderpriority" in plan.split("PartitionFilters")[1][:200]
    # and values are correct
    assert df.filter(F.col("o_orderpriority") != "1-URGENT").count() == 0
    assert df.count() > 0


def test_dynamic_partition_pruning(spark, sf_dir, part_orders):
    """A selective dim filter must reach the partitioned fact scan as a
    runtime dynamicpruning subquery, not as a post-join filter."""
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try:
        # DPP's planner heuristic wants a SELECTIVE predicate on the dim
        # side — an unfiltered dim would legitimately read every partition
        dim = spark.createDataFrame(
            [("1-URGENT", 1), ("2-HIGH", 2)], "o_orderpriority STRING, rank INT"
        ).filter(F.col("rank") == 1)
        fact = spark.read.parquet(part_orders)
        joined = fact.join(dim, "o_orderpriority")
        plan = _scan_desc(joined).lower()
        assert "dynamicpruning" in plan, plan
        assert (
            joined.count()
            == fact.filter(F.col("o_orderpriority") == "1-URGENT").count()
        )
    finally:
        # the session is shared suite-wide — leave no non-default confs
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")


def test_sort_within_partitions_layout(spark, part_orders):
    """Each output file is internally sorted by the sort column, so its
    row-group min/max stats are selective."""
    import glob
    import os

    files = glob.glob(os.path.join(part_orders, "o_orderpriority=*", "part-*.parquet"))
    assert files
    probe = spark.read.parquet(files[0]).select("o_custkey").collect()
    vals = [r.o_custkey for r in probe]
    assert vals == sorted(vals)


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """The non-partition-column complement to DPP: a selective filter on
    one shuffle-join side injects a runtime BloomFilter on the other, so
    fact rows that cannot match are dropped at the scan, pre-shuffle.
    The applicationSideScanSizeThreshold default is 10GB — right for a
    real cluster, far above any local test table — so the test lowers it
    to prove the rewrite itself engages."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "bloomfilter" in plan or "bloom_filter" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_runner_lake_destination(spark, sf_dir, tmp_path):
    """The pipeline runtime's lake delivery: config -> runner -> Hive-
    partitioned table, and the written layout partition-prunes on read."""
    from data_bridge_spark.plans.models import LoadStep, Stream, TransformStep
    from data_bridge_spark.plans.runner import StreamRunner

    stream = Stream(
        name="lake_stream",
        sources=[
            {
                "protocol": "file",
                "name": "orders_src",
                "path": f"{sf_dir}/orders.parquet",
                "format": "parquet",
            }
        ],
        destinations=[
            {"protocol": "lake", "name": "lake", "base_path": str(tmp_path)}
        ],
        steps=[
            {
                "step_type": "extract",
                "name": "pull",
                "source": "orders_src",
                "output": "orders",
            },
            LoadStep(
                name="ship",
                destination="lake",
                input="orders",
                file_name="orders_tbl",
                format="parquet",
                partition_by=["o_orderpriority"],
                sort_by=["o_custkey"],
            ),
        ],
    )
    result = StreamRunner(spark, stream).run()
    assert result.status == "success", result
    n_src = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert result.dest_responses[0].records_processed == n_src

    df = spark.read.parquet(str(tmp_path / "orders_tbl")).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = _scan_desc(df)
    assert "PartitionFilters" in plan
    assert "o_orderpriority" in plan.split("PartitionFilters")[1][:200]


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    """The salted layout write leaves many files per partition; compaction
    collapses them and the row multiset is unchanged."""
    import glob
    import os

    from data_bridge_spark.sinks.writers import compact_partitioned_table

    path = str(tmp_path / "events_tbl")
    events = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # simulate streaming/salted fragmentation: 20 writer tasks each leave
    # a file in every partition directory
    events.repartition(20).write.partitionBy("o_orderpriority").parquet(path)
    files_before = glob.glob(os.path.join(path, "*", "part-*.parquet"))
    before = spark.read.parquet(path).groupBy("o_orderkey").count().count()

    n = compact_partitioned_table(
        spark, path, partition_cols=["o_orderpriority"], sort_cols=["o_custkey"]
    )
    files_after = glob.glob(os.path.join(path, "*", "part-*.parquet"))
    assert len(files_after) < len(files_before)
    assert n == events.count()
    after = spark.read.parquet(path)
    assert after.count() == events.count()
    assert after.groupBy("o_orderkey").count().count() == before


def test_upsert_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """upsert_partitioned_table: updated keys replaced, partition
    neighbors kept, new partitions created — and untouched partition
    directories byte-stable (same files, same mtimes)."""
    import os

    from data_bridge_spark.sinks.writers import upsert_partitioned_table

    path = str(tmp_path / "orders_upsert")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_partitioned_table(orders, path, partition_cols=["o_orderpriority"])

    def snapshot(part):
        d = os.path.join(path, f"o_orderpriority={part}")
        return sorted((f, os.stat(os.path.join(d, f)).st_mtime_ns) for f in os.listdir(d))

    untouched_before = snapshot("5-LOW")

    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    some_keys = [r.o_orderkey for r in urgent.limit(5).collect()]
    updates = (
        urgent.filter(F.col("o_orderkey").isin(some_keys))
        .withColumn("o_totalprice", F.lit(0.0))
        .unionByName(
            spark.createDataFrame(
                [(999_000_001, "9-SYNTH", 1.5)],
                "o_orderkey long, o_orderpriority string, o_totalprice double",
            )
        )
    )
    n = upsert_partitioned_table(
        spark, updates, path, partition_cols=["o_orderpriority"], key_cols=["o_orderkey"]
    )
    after = spark.read.parquet(path)
    # replaced keys carry the update, partition neighbors survive
    assert after.filter(F.col("o_orderkey").isin(some_keys))
    got = {r.o_orderkey: r.o_totalprice for r in after.filter(F.col("o_orderkey").isin(some_keys)).collect()}
    assert got == {k: 0.0 for k in some_keys}
    assert after.filter(F.col("o_orderpriority") == "1-URGENT").count() == urgent.count()
    # the new partition exists with its row
    assert after.filter(F.col("o_orderpriority") == "9-SYNTH").count() == 1
    # total = old + inserts; n = rewritten rows (touched partitions only)
    assert after.count() == orders.count() + 1
    assert n == urgent.count() + 1
    # untouched partition: identical files, identical mtimes
    assert snapshot("5-LOW") == untouched_before


def test_upsert_multilevel_partitions_swap_leaf_only(spark, sf_dir, tmp_path):
    """Two-level layout (priority/status): an upsert touching one
    (priority, status) leaf must leave the SIBLING status directory under
    the same priority byte-identical — the leaf-walk must swap at depth 2,
    not replace the whole priority dir."""
    import os

    from data_bridge_spark.sinks.writers import upsert_partitioned_table

    path = str(tmp_path / "orders_two_level")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    write_partitioned_table(
        orders, path, partition_cols=["o_orderpriority", "o_orderstatus"]
    )

    def snapshot(prio, status):
        d = os.path.join(path, f"o_orderpriority={prio}", f"o_orderstatus={status}")
        return sorted((f, os.stat(os.path.join(d, f)).st_mtime_ns) for f in os.listdir(d))

    target = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "F")
    )
    sibling_before = snapshot("1-URGENT", "O")
    other_prio_before = snapshot("5-LOW", "F")

    keys = [r.o_orderkey for r in target.limit(3).collect()]
    updates = target.filter(F.col("o_orderkey").isin(keys)).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    upsert_partitioned_table(
        spark,
        updates,
        path,
        partition_cols=["o_orderpriority", "o_orderstatus"],
        key_cols=["o_orderkey"],
    )
    after = spark.read.parquet(path)
    assert after.count() == orders.count()
    got = {r.o_orderkey: r.o_totalprice for r in after.filter(F.col("o_orderkey").isin(keys)).collect()}
    assert got == {k: -1.0 for k in keys}
    # sibling leaf under the SAME priority and a different priority: untouched
    assert snapshot("1-URGENT", "O") == sibling_before
    assert snapshot("5-LOW", "F") == other_prio_before


def test_upsert_cross_partition_move_is_the_documented_caveat(spark, sf_dir, tmp_path):
    """A key moving partitions WITHOUT a tombstone duplicates (classic
    Hive-upsert caveat) — pin that default so a change that silently
    alters semantics trips a test; the supported path for key moves is
    emit_tombstones + upsert(tombstones=...), tested below."""
    from data_bridge_spark.sinks.writers import upsert_partitioned_table

    path = str(tmp_path / "orders_move")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_partitioned_table(orders, path, partition_cols=["o_orderpriority"])
    victim = orders.filter(F.col("o_orderpriority") == "1-URGENT").limit(1).collect()[0]
    moved = spark.createDataFrame(
        [(victim.o_orderkey, "5-LOW", -9.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    upsert_partitioned_table(
        spark, moved, path, partition_cols=["o_orderpriority"], key_cols=["o_orderkey"]
    )
    after = spark.read.parquet(path).filter(F.col("o_orderkey") == victim.o_orderkey)
    # both the old row (untouched partition) and the moved row exist
    assert after.count() == 2
    assert set(r.o_orderpriority for r in after.collect()) == {"1-URGENT", "5-LOW"}


def test_upsert_with_tombstones_moves_key_without_duplicating(spark, sf_dir, tmp_path):
    """emit_tombstones + upsert(tombstones=...): a key that changes its
    partition value lands ONLY in the new partition — the old leaf is
    rewritten without it (closing the caveat the test above pins for the
    tombstone-less call)."""
    from data_bridge_spark.sinks.writers import (
        emit_tombstones,
        upsert_partitioned_table,
        write_partitioned_table,
    )

    path = str(tmp_path / "orders_move_ts")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_partitioned_table(orders, path, partition_cols=["o_orderpriority"])
    victim = orders.filter(F.col("o_orderpriority") == "1-URGENT").limit(1).collect()[0]
    moved = spark.createDataFrame(
        [(victim.o_orderkey, "5-LOW", -9.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    ts = emit_tombstones(
        spark, moved, path, partition_cols=["o_orderpriority"], key_cols=["o_orderkey"]
    )
    ts_rows = [tuple(r) for r in ts.collect()]
    assert ts_rows == [(victim.o_orderkey, "1-URGENT")]
    # a non-moving update must emit NO tombstone
    stay = spark.createDataFrame(
        [(victim.o_orderkey, "1-URGENT", -9.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    assert emit_tombstones(
        spark, stay, path, partition_cols=["o_orderpriority"], key_cols=["o_orderkey"]
    ).count() == 0

    upsert_partitioned_table(
        spark,
        moved,
        path,
        partition_cols=["o_orderpriority"],
        key_cols=["o_orderkey"],
        tombstones=ts,
    )
    after = spark.read.parquet(path).filter(F.col("o_orderkey") == victim.o_orderkey)
    rows = after.collect()
    assert len(rows) == 1
    assert rows[0].o_orderpriority == "5-LOW" and rows[0].o_totalprice == -9.0
    # nothing else was lost from the old partition
    assert (
        spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT").count()
        == orders.filter(F.col("o_orderpriority") == "1-URGENT").count() - 1
    )


def test_upsert_tombstone_empties_singleton_partition(spark, tmp_path):
    """If the moved key was its old partition's ONLY row, the merged
    output writes no leaf for it — the upsert must still remove the live
    leaf, or the stale row survives."""
    from data_bridge_spark.sinks.writers import (
        emit_tombstones,
        upsert_partitioned_table,
        write_partitioned_table,
    )

    path = str(tmp_path / "singleton_move")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, p string, v double"
    )
    write_partitioned_table(base, path, partition_cols=["p"])
    moved = spark.createDataFrame([(2, "a", 21.0)], "k long, p string, v double")
    ts = emit_tombstones(spark, moved, path, partition_cols=["p"], key_cols=["k"])
    upsert_partitioned_table(
        spark, moved, path, partition_cols=["p"], key_cols=["k"], tombstones=ts
    )
    after = spark.read.parquet(path)
    assert sorted(tuple(r) for r in after.collect()) == [(1, 10.0, "a"), (2, 21.0, "a")]
    import os

    assert not os.path.isdir(os.path.join(path, "p=b"))


def test_upsert_tombstone_cleanup_escaped_and_null_partitions(spark, tmp_path):
    """Partition values Spark Hive-escapes on disk (':' -> %3A) and NULL
    (-> __HIVE_DEFAULT_PARTITION__) must still get their emptied leaves
    removed after a tombstoned key move: the cleanup derives the leaf
    names from a Spark write of the touched tuples, not a raw f-string,
    so the on-disk and constructed names can never diverge."""
    import os

    from data_bridge_spark.sinks.writers import (
        emit_tombstones,
        upsert_partitioned_table,
        write_partitioned_table,
    )

    path = str(tmp_path / "escaped_move")
    base = spark.createDataFrame(
        [(1, "a:b", 10.0), (2, "keep", 20.0), (3, None, 30.0)],
        "k long, p string, v double",
    )
    write_partitioned_table(base, path, partition_cols=["p"])
    # pin the on-disk layout this test exists to exercise
    assert os.path.isdir(os.path.join(path, "p=a%3Ab"))
    assert os.path.isdir(os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__"))

    moved = spark.createDataFrame(
        [(1, "keep", 11.0), (3, "keep", 31.0)], "k long, p string, v double"
    )
    ts = emit_tombstones(spark, moved, path, partition_cols=["p"], key_cols=["k"])
    assert sorted((tuple(r) for r in ts.collect()), key=lambda t: t[0]) == [
        (1, "a:b"),
        (3, None),
    ]
    upsert_partitioned_table(
        spark, moved, path, partition_cols=["p"], key_cols=["k"], tombstones=ts
    )
    after = spark.read.parquet(path)
    assert sorted(tuple(r) for r in after.collect()) == [
        (1, 11.0, "keep"),
        (2, 20.0, "keep"),
        (3, 31.0, "keep"),
    ]
    # the emptied escaped and NULL leaves are gone — no stale rows survive
    assert not os.path.isdir(os.path.join(path, "p=a%3Ab"))
    assert not os.path.isdir(os.path.join(path, "p=__HIVE_DEFAULT_PARTITION__"))
