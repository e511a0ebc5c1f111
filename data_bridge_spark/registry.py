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
    "data_bridge_spark.operators.linkage",
    "data_bridge_spark.operators.insights",
    "data_bridge_spark.operators.features",
    "data_bridge_spark.operators.tpch",
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
# FIRST `_DRIVER_SLOTS` queries in `load_all()` order, so registration
# order is the lever that decides which queries accumulate hard driver
# evidence each round.  Rather than hand-pinning a window per round, the
# order is derived from the committed `CORRECTNESS_r*.json` snapshots the
# driver itself writes: oracled queries whose LATEST driver row failed
# come first (a fix must re-prove itself), then oracled queries with no
# value-level driver row yet (registration order), then evidenced-green
# queries stalest-evidence-first, then rows-only queries.  With no
# snapshot files present this degrades to plain registration order.
_DRIVER_SLOTS = 50


def _driver_evidence() -> dict[str, tuple[int, bool]]:
    """name -> (latest_round_seen, latest_row_was_green_value_match).

    A row with ``err == 'no_oracle'`` is a rows-only check, not value
    evidence — for a query that has an oracle it counts as unevidenced.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    evidence: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err") == "no_oracle":
                continue
            green = bool(
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            )
            prev = evidence.get(name)
            if prev is None or rnd >= prev[0]:
                evidence[name] = (rnd, green)
    return evidence


def _driver_order(registry: dict[str, Query]) -> list[str]:
    evidence = _driver_evidence()
    reg_pos = {n: i for i, n in enumerate(registry)}

    def key(name: str) -> tuple:
        q = registry[name]
        ev = evidence.get(name)
        if q.oracle is None:
            group = 3  # rows-only: never spend an oracle slot on it
        elif ev is not None and not ev[1]:
            group = 0  # latest driver row red — re-prove the fix first
        elif ev is None:
            group = 1  # oracled but no value-level driver row yet
        else:
            group = 2  # evidenced green — stalest evidence first
        staleness = ev[0] if (group == 2 and ev is not None) else 0
        return (group, staleness, reg_pos[name])

    return sorted(registry, key=key)


def load_all() -> dict[str, Query]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return {n: REGISTRY[n] for n in _driver_order(REGISTRY)}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in load_all().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in load_all().values() if q.oracle is not None}
