"""Query registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2 registers one named query here together
with its DuckDB oracle SQL (or ``oracle=None`` for genuinely
non-SQL-expressible ops → the driver records a rows-only check).
``__spark_entry__.py`` simply re-exports this registry.

Determinism contract for oracle-matched queries (the driver compares
row-count + schema + order-insensitive value hash):
- every computed column is aliased identically in Spark and SQL;
- double aggregates go through ``functions.exact`` (decimal-exact);
- any top-k / rank has a total tiebreak order;
- timestamps stay NTZ/naive on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "REGISTRY", "register", "load_all", "spark_queries", "oracles"]


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}

# operator modules that self-register on import
_MODULES = (
    "data_bridge_spark.operators.relational",
    "data_bridge_spark.operators.aggregates",
    "data_bridge_spark.operators.windows",
    "data_bridge_spark.operators.scalars",
    "data_bridge_spark.operators.dedup",
    "data_bridge_spark.operators.similarity",
    "data_bridge_spark.operators.text",
    "data_bridge_spark.operators.events",
    "data_bridge_spark.operators.multimodal",
    "data_bridge_spark.operators.extras",
    "data_bridge_spark.operators.sqlapi",
    "data_bridge_spark.operators.analytics",
    "data_bridge_spark.operators.warehouse",
    "data_bridge_spark.operators.mlprep",
    "data_bridge_spark.operators.graph",
)


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in load_all().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in load_all().values() if q.oracle is not None}
