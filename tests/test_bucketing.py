"""Bucketed-table co-located join: the write-side partitioning investment
that removes the join shuffle entirely (SURVEY §4 'Partitioning & shuffle').

Both sides bucketed by the join key into the same bucket count → the
sort-merge join reads pre-bucketed data and the physical plan contains no
Exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    # uses the session's default warehouse dir (static conf); tables are
    # dropped afterwards and ./spark-warehouse is gitignored
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it is still correct
        expected = (
            spark.table("b_orders")
            .groupBy()
            .count()
            .collect()[0][0]
        )
        assert joined.count() == expected  # every order matches exactly one customer
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


@pytest.fixture(scope="module")
def warehouse_li(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders2")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders2")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders2")


def test_bucketed_join_inner_shape_zero_exchanges(warehouse_li):
    # join_inner's fact-fact shape (lineitem JOIN orders ON orderkey) over
    # bucketed tables: filter still pushes to the scan, and the join runs
    # with ZERO exchanges — the write-side investment a 100 TB fact join
    # amortizes over every downstream query
    spark = warehouse_li
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("b_lineitem").filter(F.col("l_shipdate") < "1995-06-01")
        joined = li.join(
            spark.table("b_orders2"), F.col("l_orderkey") == F.col("o_orderkey")
        ).select("o_orderkey", "l_linenumber", "o_orderstatus", "l_quantity")
        qe = joined._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join_inner still shuffles:\n{plan}"
        assert "PushedFilters" in qe.toString() or "l_shipdate" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_on_bucket_key_zero_exchanges(warehouse_li):
    # bucketing satisfies the aggregation's distribution requirement too:
    # groupBy on the bucket key needs no shuffle at all
    spark = warehouse_li
    agg = spark.table("b_orders2").groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed group-by still shuffles:\n{plan}"


def test_max_partition_bytes_controls_scan_splits(spark):
    # spark.sql.files.maxPartitionBytes is the knob that sizes scan
    # partitions to executor memory at 100 TB; assert it actually fans the
    # same file into more input splits when lowered
    sf01 = "/root/testdata/sf0.1"
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        wide = spark.read.parquet(f"{sf01}/lineitem.parquet").rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        narrow = spark.read.parquet(f"{sf01}/lineitem.parquet").rdd.getNumPartitions()
        assert narrow > wide, (wide, narrow)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
