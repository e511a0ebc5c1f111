"""Pytest pin for the CSV fidelity contract (sinks/writers.py:CSV_NULL_TOKEN /
CSV_WRITE_OPTIONS / CSV_READ_OPTIONS and _canon_partition_values).

The contract was established in r9 when the edge-values fixture found that
Spark's CSV defaults (a) conflate NULL with the empty string on read,
(b) split records at embedded newlines without multiLine, and (c) silently
fold an empty-string partition key into __HIVE_DEFAULT_PARTITION__. Until
now the contract was enforced only by the edgevals SWEEP — this file makes
it a unit gate: it fails the moment either options dict loses a key, the
token changes semantics, or the partition-key canonicalization is dropped
(r10, verdict item 5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from data_bridge_spark.sinks.writers import (
    CSV_NULL_TOKEN,
    CSV_READ_OPTIONS,
    CSV_WRITE_OPTIONS,
    write_partitioned_table,
    write_table,
)

SCHEMA = StructType(
    [StructField("k", StringType(), False), StructField("v", StringType(), True)]
)

# one row per fidelity hazard the contract must carry through a round trip
HOSTILE = [
    Row(k="newline", v="line1\nline2"),
    Row(k="crlf", v="a\r\nb"),
    Row(k="empty", v=""),
    Row(k="null", v=None),
    Row(k="separators", v="a|b,c\td"),
    Row(k="quotes", v='say "hi", then \'bye\''),
    Row(k="astral", v="\U0001F600\U0001D518 unicode"),
    Row(k="pipe_soup", v="a|b\nc,d"),
]


def _roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "rt_csv")
    n = write_table(df, path, fmt="csv")
    assert n == df.count()
    got = spark.read.options(**CSV_READ_OPTIONS).schema(SCHEMA).csv(path)
    return {r["k"]: r["v"] for r in got.collect()}


def test_contract_keys_pinned():
    """The paired options ARE the contract: a reader without multiLine
    splits embedded newlines; either side without the \\N nullValue
    conflates NULL with ''. Losing any key must fail loudly here, not in
    a scale sweep."""
    assert CSV_NULL_TOKEN == "\\N"
    assert CSV_WRITE_OPTIONS["nullValue"] == CSV_NULL_TOKEN
    assert CSV_WRITE_OPTIONS["header"] == "true"
    assert CSV_READ_OPTIONS["nullValue"] == CSV_NULL_TOKEN
    assert CSV_READ_OPTIONS["multiLine"] == "true"
    assert CSV_READ_OPTIONS["header"] == "true"


def test_roundtrip_hostile_values(spark, tmp_path):
    df = spark.createDataFrame(HOSTILE, SCHEMA)
    vals = _roundtrip(spark, df, tmp_path)
    expected = {r["k"]: r["v"] for r in HOSTILE}
    assert vals == expected, {
        k: (vals.get(k), expected[k]) for k in expected if vals.get(k) != expected[k]
    }
    # the two findings that created the contract, asserted by name:
    assert vals["empty"] == "" and vals["null"] is None  # '' vs NULL round trip
    assert vals["newline"] == "line1\nline2"  # multiLine keeps one record


def test_single_file_roundtrip_hostile_values(spark, tmp_path):
    """single_file=True is the reference's per-delivery CSV path (A11) —
    same contract through the coalesce(1) + move lane."""
    df = spark.createDataFrame(HOSTILE, SCHEMA)
    path = str(tmp_path / "one.csv")
    n = write_table(df, path, fmt="csv", single_file=True)
    assert n == len(HOSTILE) and os.path.isfile(path)
    got = spark.read.options(**CSV_READ_OPTIONS).schema(SCHEMA).csv(path)
    assert {r["k"]: r["v"] for r in got.collect()} == {
        r["k"]: r["v"] for r in HOSTILE
    }


def test_residual_null_token_conflation_is_exactly_as_documented(spark, tmp_path):
    """The ONE residual conflation the contract accepts (documented at
    CSV_NULL_TOKEN): a genuine string value '\\N' reads back as NULL.
    Pinning it means any change — fixing it, or widening it — shows up
    here instead of silently shifting behavior."""
    df = spark.createDataFrame(
        [Row(k="literal_token", v="\\N"), Row(k="real_null", v=None)], SCHEMA
    )
    vals = _roundtrip(spark, df, tmp_path)
    assert vals["literal_token"] is None  # the documented trade
    assert vals["real_null"] is None


def test_partition_key_empty_string_canonicalizes_to_null(spark, tmp_path):
    """_canon_partition_values: '' in a string partition KEY is
    canonicalized to NULL at write time (Hive layout cannot tell them
    apart — both land in __HIVE_DEFAULT_PARTITION__), so layout, pruning
    filters, and read-back all agree. Value-bearing '' belongs in data
    columns, which test_roundtrip_hostile_values proves survive."""
    path = str(tmp_path / "part_tbl")
    nullable_k = StructType(
        [StructField("k", StringType(), True), StructField("v", StringType(), True)]
    )
    df = spark.createDataFrame(
        [Row(k="", v="was_empty"), Row(k=None, v="was_null"), Row(k="a", v="kept")],
        nullable_k,
    )
    n = write_partitioned_table(df, path, partition_cols=["k"], fmt="parquet")
    assert n == 3
    got = spark.read.parquet(path)
    rows = {r["v"]: r["k"] for r in got.collect()}
    assert rows == {"was_empty": None, "was_null": None, "kept": "a"}
    # exactly two leaf dirs: k=a and the Hive default-partition dir
    leaves = sorted(d for d in os.listdir(path) if d.startswith("k="))
    assert leaves == ["k=__HIVE_DEFAULT_PARTITION__", "k=a"]


def test_reader_options_used_by_source_lane(spark, tmp_path):
    """The source-side CSV lane (sources/readers.py) must read with the
    same paired options the sink writes with — write through the sink,
    read through a reader configured ONLY by CSV_READ_OPTIONS, and get
    value equality on the hostile corpus (this is what breaks if the two
    dicts ever drift apart)."""
    df = spark.createDataFrame(HOSTILE, SCHEMA)
    path = str(tmp_path / "src_csv")
    write_table(df, path, fmt="csv")
    back = (
        spark.read.options(**CSV_READ_OPTIONS)
        .schema(SCHEMA)
        .csv(path)
        .withColumn("src", F.lit("csv"))
    )
    assert back.where(F.col("v").isNull()).count() == 1  # only the true NULL
    assert back.count() == len(HOSTILE)
