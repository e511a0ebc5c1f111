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
