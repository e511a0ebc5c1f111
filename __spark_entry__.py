"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``data_bridge_spark.registry``: every operator from
SURVEY.md §2 registers its Spark plan builder and its DuckDB oracle SQL
there; this module just re-exports the registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_bridge_spark.registry import load_all, oracles, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    load_all()
    from data_bridge_spark.registry import REGISTRY

    return REGISTRY["flagship_report"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted ⇒ rows-only)."""
    return oracles()
