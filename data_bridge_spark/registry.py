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
    "data_bridge_spark.operators.enrich",
    "data_bridge_spark.operators.corpus",
    "data_bridge_spark.operators.timeseries",
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


# Driver-evidence rotation: the external correctness driver oracles the
# FIRST 50 queries in `load_all()` order.  Rounds 1-2 evidenced the first
# 50 registration-order names; round 3 rotates the remaining oracled
# queries (plus the re-fixed `cast_map`) into the window so every oracled
# operator accumulates a hard driver row.  Names absent from this tuple
# follow in plain registration order; unknown names here raise.
_DRIVER_WINDOW: tuple[str, ...] = (
    "cast_map",  # red in r1/r2 (decimal hash canonicalization); fixed in r3 — keep in window
    # — never driver-checked before round 3 (oracled) —
    "text_pii_mask",
    "win_tumbling",
    "win_sliding",
    "win_session",
    "asof_last_purchase",
    "events_funnel",
    "asof_merge_pandas",
    "events_pivot",
    "mm_binary_meta",
    "mm_frame_sample",
    "mm_features",
    "join_range",
    "join_range_binned",
    "filter_step_param",
    "agg_cube",
    "agg_median",
    "window_range_frame",
    "window_first_last",
    "unpivot_measures",
    "scalar_hash",
    "text_shingles",
    "join_skew_salted",
    "sink_partitioned",
    "sink_csv",
    "skyline_pareto",
    "skyline_grid",
    "udtf_expand",
    "sql_cte",
    "sql_correlated",
    "pipeline_stream_query",
    "text_top_terms",
    "sort_global",
    "scalar_null",
    "scalar_tz",
    "agg_misc",
    "agg_collect",
    "agg_stats",
    "agg_histogram",
    "join_full",
    "join_cross",
    "scalar_struct",
    "scd2_merge",
    "split_train_test",
    "shuffle_deterministic",
    "mix_weighted",
    "dq_report",
    "mlprep_pipeline",
    "graph_pagerank",
    "graph_triangles",
)


def load_all() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise KeyError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in load_all().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in load_all().values() if q.oracle is not None}
