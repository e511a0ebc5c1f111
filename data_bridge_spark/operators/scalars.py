"""Scalar expression operators (SURVEY.md §2B18-B22, A8-A9, C6-C7).

Everything here is a Catalyst expression (whole-stage codegen, no Python
in the hot path) except ``udf_pandas``, which deliberately exercises the
Arrow-vectorized escape hatch the reference's TransformFunc surface maps
onto.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.functions.casting import apply_cast_map
from data_bridge_spark.functions.vectors import cosine_similarity, l2_norm
from data_bridge_spark.registry import register


@register(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           SUBSTRING(c_name, 10, 9) AS cust_num,
           CONCAT_WS('/', c_mktsegment, c_name) AS seg_name,
           REPLACE(c_name, 'Customer#', 'C') AS short_name,
           REGEXP_REPLACE(SUBSTRING(c_name, 10, 9), '^0+', '') AS trimmed_num
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (the reference's mailing-list name/email munging,
    sample.config.yaml:162-184, done in pandas there — JVM expressions
    here)."""
    t = Tables(spark, sf_dir)
    name = F.col("c_name")
    return t.customer.select(
        "c_custkey",
        F.upper(name).alias("name_upper"),
        F.length(name).alias("name_len"),
        F.substring(name, 10, 9).alias("cust_num"),
        F.concat_ws("/", F.col("c_mktsegment"), name).alias("seg_name"),
        F.regexp_replace(name, "Customer#", "C").alias("short_name"),
        F.regexp_replace(F.substring(name, 10, 9), "^0+", "").alias("trimmed_num"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           STRFTIME(o_orderdate, '%Y%m%d') AS yyyymmdd,
           CAST(CASE WHEN MONTH(o_orderdate) > 7 THEN YEAR(o_orderdate) + 1
                ELSE YEAR(o_orderdate) END AS INTEGER) AS school_year
    FROM orders
    """,
    tags=("scalar", "date"),
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalars incl. the reference's two macros as expressions:
    YYYYMMDD (macros.py:13-16, %Y%m%d intent) and SCHOOL_YEAR
    (macros.py:4-11: after July → year+1)."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.date_format(d, "yyyyMMdd").alias("yyyymmdd"),
        F.when(F.month(d) > 7, F.year(d) + 1).otherwise(F.year(d)).alias("school_year"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           ABS(l_extendedprice - l_quantity * 1000.0) AS abs_diff,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_extendedprice / 10000.0) AS BIGINT) AS price_band,
           SQRT(l_quantity) AS qty_sqrt,
           CAST(l_quantity AS INTEGER) % 5 AS qty_mod
    FROM lineitem
    WHERE l_partkey <= 500
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic scalars (the reference's grade averaging/thresholds were
    pandas math, SURVEY §2B20). Elementwise IEEE double ops are
    bit-deterministic — no decimal guard needed row-wise."""
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_partkey") <= 500).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000.0).alias("abs_diff"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 10000.0).alias("price_band"),
        F.sqrt(F.col("l_quantity")).alias("qty_sqrt"),
        (F.col("l_quantity").cast("integer") % 5).alias("qty_mod"),
    )


@register(
    "scalar_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'delinquent'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY') THEN 1 ELSE 0 END AS industrial
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def scalar_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions — the at-risk / high-achiever split and the
    school-year if/else (reference macros.py:6-10) as CASE WHEN."""
    t = Tables(spark, sf_dir)
    bal = F.col("c_acctbal")
    return t.customer.select(
        "c_custkey",
        F.when(bal < 0, "delinquent").when(bal < 5000, "standard").otherwise("premium").alias("tier"),
        F.when(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), 1).otherwise(0).alias("industrial"),
    )


@register(
    "scalar_json",
    oracle="""
    -- json_valid guard: Spark's get_json_object is total (malformed JSON
    -- yields NULL) while DuckDB's json_extract_string THROWS — the guard
    -- gives the oracle the engine's own total semantics (r9 edgevals)
    SELECT event_id, event_type,
           CAST(CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS INTEGER) AS prop_k
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("scalar", "json"),
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload (SURVEY §2C6) —
    `get_json_object` pushes no Python, stays codegen'd."""
    t = Tables(spark, sf_dir)
    return t.events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("integer").alias("prop_k"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           SQRT(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2
    FROM embeddings
    """,
    tags=("scalar", "array"),
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embedding: array<float> (SURVEY §2C7) — size,
    element access, L2 norm via a sequential JVM-side fold."""
    t = Tables(spark, sf_dir)
    emb = F.col("embedding")
    return t.embeddings.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_val"),
        l2_norm(emb).alias("l2"),
    )


@register(
    "cast_map",
    oracle="""
    SELECT CAST(l_orderkey AS INTEGER) AS order_id,
           CAST(l_linenumber AS BIGINT) AS line_no,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty,
           CAST(l_shipdate AS DATE) AS ship_day,
           CAST(l_returnflag AS VARCHAR) AS flag
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
    tags=("cast", "schema"),
)
def cast_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-map casting (reference extractor.py:104,122-206): the
    OpenEdge dtype dictionary re-targeted at Spark types; numeric becomes
    exact DecimalType rather than the reference's boxed object.

    The DecimalType(18,2) cast is the operator under test, but the
    comparison column is re-emitted as DOUBLE on both engines: Spark and
    DuckDB render the *same* decimal value through different client types
    (``Decimal('23.00')`` vs float64), so any value hash over the raw
    decimal diverges while the values agree (r1/r2 driver red row).  The
    quantities are integral (x.00), so the double round-trip is exact.
    """
    t = Tables(spark, sf_dir)
    projected = t.lineitem.filter(F.col("l_orderkey") <= 2000).select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("qty"),
        F.col("l_shipdate").alias("ship_day"),
        F.col("l_returnflag").alias("flag"),
    )
    casted = apply_cast_map(
        projected,
        {
            "order_id": "integer",
            "line_no": "bigint",
            "qty": "numeric(18,2)",
            "ship_day": "date",
            "flag": "varchar",
        },
    )
    return casted.withColumn("qty", F.col("qty").cast("double"))


@register(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS total_charge
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    tags=("udf",),
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF escape hatch (reference TransformFunc = arbitrary pandas,
    models.py:225-230): an Arrow-vectorized pandas_udf. Elementwise double
    math in numpy matches SQL engines bit-for-bit, so this one is
    oracle-checkable. Kept off hot paths everywhere else."""

    @F.pandas_udf("double")
    def total_charge(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        total_charge("l_extendedprice", "l_discount", "l_tax").alias("total_charge"),
    )


@register(
    "udf_grouped_pandas",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
           ) AS INTEGER) AS price_rank
    FROM orders
    WHERE o_custkey <= 100
    """,
    tags=("udf", "grouped"),
)
def udf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): whole group in, whole group
    out — the distributed form of the reference's per-table pandas
    TransformFunc (models.py:225-230). The group computation here (a
    deterministic in-group rank) is chosen to be oracle-checkable; any
    pandas logic slots into the same shape. One shuffle on the group key,
    Arrow batches across the Python boundary."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["price_rank"] = (pdf.index + 1).astype("int32")
        return pdf[["o_custkey", "o_orderkey", "price_rank"]]

    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_custkey") <= 100)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(rank_group, schema="o_custkey long, o_orderkey long, price_rank int")
    )


@register(
    "sim_cosine_pair",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
           / (SQRT(list_aggregate(list_transform(a.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
              * SQRT(list_aggregate(list_transform(b.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 100
    """,
    tags=("similarity", "array"),
)
def sim_cosine_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between consecutive vectors — validates
    the vector expression kernel (functions/vectors.py) against the oracle
    before it's used inside top-k (SURVEY §2C3)."""
    t = Tables(spark, sf_dir)
    a = t.embeddings.alias("a").filter(F.col("vec_id") < 100)
    b = t.embeddings.alias("b")
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
    )


@register(
    "scalar_hof",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS ws FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(ws, w -> len(w) > 4)) AS INT) AS n_long,
           CAST(CASE WHEN ws IS NULL THEN NULL
                ELSE list_reduce(list_prepend(0, list_transform(ws, w -> len(w))), (a, b) -> a + b)
                END AS BIGINT) AS total_chars,
           CASE WHEN ws IS NULL THEN NULL
                ELSE COALESCE(array_to_string(list_transform(list_filter(ws, w -> len(w) > 4), w -> upper(w)), '|'), '')
                END AS long_upper
    FROM toks
    """,
    tags=("scalar", "array", "hof"),
)
def scalar_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform / filter / aggregate
    (fold) — run inside codegen on the JVM: per-token work without
    exploding row counts or leaving whole-stage codegen, the idiom that
    replaces a Python tokenize-UDF loop at 100 TB.  The fold seeds with a
    long 0 so the sum is integer arithmetic end-to-end; DuckDB mirrors
    with list lambdas.  The transformed array is serialized to a '|'
    joined string at the output edge: the driver's canonicalizer cannot
    sort list-valued pandas columns (r3 driver error), and the HOF chain
    under test runs before the join."""
    t = Tables(spark, sf_dir)
    ws = F.split(F.lower(F.col("text")), " ")
    long_words = F.filter(ws, lambda w: F.length(w) > 4)
    return t.documents.select(
        "doc_id",
        F.size(long_words).alias("n_long"),
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("total_chars"),
        F.array_join(F.transform(long_words, lambda w: F.upper(w)), "|").alias(
            "long_upper"
        ),
    )
