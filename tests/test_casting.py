"""Unit tests for the declared-schema cast layer (SURVEY §2A9)."""

from __future__ import annotations

from pyspark.sql import types as T

from data_bridge_spark.functions.casting import (
    apply_cast_map,
    parse_comment_map,
    spark_type_for,
)


def test_dtype_dictionary_translation():
    # the reference's OpenEdge→pandas table (extractor.py:182-206),
    # re-targeted at Spark types
    assert spark_type_for("varchar") == T.StringType()
    assert spark_type_for("bit") == T.BooleanType()
    assert spark_type_for("integer") == T.IntegerType()
    assert spark_type_for("bigint") == T.LongType()
    assert spark_type_for("numeric") == T.DecimalType(38, 18)
    assert spark_type_for("numeric(12,2)") == T.DecimalType(12, 2)
    assert spark_type_for("real") == T.FloatType()
    assert spark_type_for("float") == T.DoubleType()
    assert spark_type_for("date") == T.DateType()
    assert spark_type_for("timestamp") == T.TimestampNTZType()
    assert spark_type_for("timestamp_timezone") == T.TimestampType()


def test_unknown_type_defaults_to_string():
    # reference extractor.py:168-169 defaults unknown to varchar
    assert spark_type_for("blorp") == T.StringType()


def test_parse_comment_map():
    sql = """
    --[ TABLE-COLUMN-ALIAS MAP ]
    -- students.id -> student_id: integer
    -- students.bday -> birth_date: date
    --[ END MAP ]
    SELECT * FROM students
    """
    m = parse_comment_map(sql)
    assert m == {
        "students.id": ("student_id", "integer"),
        "students.bday": ("birth_date", "date"),
    }


def test_parse_no_map_is_ok():
    # reference extractor.py:136-137 crashes on map-less queries; we don't
    assert parse_comment_map("SELECT 1") == {}


def test_apply_cast_map(spark):
    df = spark.createDataFrame([(1, "2.5", "x")], "a int, b string, c string")
    out = apply_cast_map(df, {"a": "bigint", "b": "numeric(10,2)"})
    types = dict(out.dtypes)
    assert types == {"a": "bigint", "b": "decimal(10,2)", "c": "string"}
    row = out.collect()[0]
    assert row.a == 1 and str(row.b) == "2.50" and row.c == "x"


def test_dec_to_double_matches_duckdb_past_2_53(spark):
    """The 2^53 contract directly: for decimals whose unscaled value
    exceeds 2^53 — where Spark's native cast (one correct rounding) and
    DuckDB's CAST (unscaled→double, then divide) differ by an ulp —
    dec_to_double must equal DuckDB bit-for-bit, and below 2^53 all
    three forms must agree.  27864155010.941591 is a measured case where
    the two algorithms genuinely diverge (caught by the sf1 slice)."""
    import duckdb

    from pyspark.sql import functions as F

    from data_bridge_spark.functions.exact import dec_to_double

    vals = [
        "27864155010.941593",   # past 2^53, algorithms happen to agree
        "27864155010.941591",   # past 2^53, algorithms DISAGREE (1 ulp)
        "12345678.901234",      # under 2^53: all forms identical
        "-27864155010.941591",  # sign symmetry
    ]
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT CAST(CAST('{v}' AS DECIMAL(38,6)) AS DOUBLE)"
        ).fetchone()[0]
        got = (
            spark.range(1)
            .select(dec_to_double(F.lit(v).cast("decimal(38,6)"), 6).alias("d"))
            .collect()[0]
            .d
        )
        assert got == duck, (v, got.hex(), duck.hex())
        if abs(float(v)) < 2**53 / 1e6:
            native = (
                spark.range(1)
                .select(F.lit(v).cast("decimal(38,6)").cast("double").alias("d"))
                .collect()[0]
                .d
            )
            assert got == native == duck
