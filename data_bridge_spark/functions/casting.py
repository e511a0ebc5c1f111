"""Declared-schema casting: the reference's dtype map, re-typed for Spark.

The reference resolves a SQL-comment column map against the source DB
catalog and applies a fixed OpenEdge→pandas dtype dictionary with
``df.astype`` (reference ``app/utils/extractor.py:104,122-206``). Here the
same declared map becomes Catalyst casts / an explicit ``StructType`` —
notably SQL ``numeric`` maps to ``DecimalType`` (exact, distributable)
instead of the reference's boxed-object workaround
(``extractor.py:193``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["SQL_TYPE_TO_SPARK", "spark_type_for", "apply_cast_map", "parse_comment_map"]

# source-SQL type name → Spark type (the reference's table at
# extractor.py:182-206, target column re-derived for Spark).
SQL_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "character": T.StringType(),
    "varchar": T.StringType(),
    "lvarchar": T.StringType(),
    "bit": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "numeric": T.DecimalType(38, 18),
    "real": T.FloatType(),
    "float": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),
    "time": T.DayTimeIntervalType(),
    "timestamp_timezone": T.TimestampType(),
    "varbinary": T.BinaryType(),
    "lvarbinary": T.BinaryType(),
}

_NUMERIC_WITH_ARGS = re.compile(r"^numeric\((\d+)\s*,\s*(\d+)\)$")

# the reference's comment-map grammar: --[ TABLE-COLUMN-ALIAS MAP ] ... --[ END MAP ]
# with lines "-- table.column -> alias: type" (extractor.py:122-147 intent,
# simplified to a grammar that round-trips).
_MAP_BLOCK = re.compile(r"--\[\s*TABLE-COLUMN-ALIAS MAP\s*\](.*?)--\[\s*END MAP\s*\]", re.S)
_MAP_LINE = re.compile(r"--\s*([\w.]+)\s*->\s*(\w+)\s*:\s*([\w(),]+)")


def spark_type_for(sql_type: str) -> T.DataType:
    s = sql_type.strip().lower()
    m = _NUMERIC_WITH_ARGS.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if s not in SQL_TYPE_TO_SPARK:
        # reference defaults unknown columns to varchar (extractor.py:168-169)
        return T.StringType()
    return SQL_TYPE_TO_SPARK[s]


def parse_comment_map(sql: str) -> dict[str, tuple[str, str]]:
    """Parse the declared map block out of a SQL file.

    Returns ``{source_column: (alias, sql_type)}``. Unlike the reference,
    a query with no map block is fine (``extractor.py:136-137`` crashes).
    """
    block = _MAP_BLOCK.search(sql)
    if not block:
        return {}
    return {
        src: (alias, sql_type)
        for src, alias, sql_type in _MAP_LINE.findall(block.group(1))
    }


def apply_cast_map(df: DataFrame, cast_map: dict[str, str]) -> DataFrame:
    """Cast (and keep) the mapped columns: ``{column: sql_type_name}``."""
    cols: list[Column] = []
    for name in df.columns:
        if name in cast_map:
            cols.append(F.col(name).cast(spark_type_for(cast_map[name])).alias(name))
        else:
            cols.append(F.col(name))
    return df.select(*cols)
