"""SQL-API operators: the same Catalyst plans reached through spark.sql
(CTEs, correlated subqueries) — parity surface for users who write SQL
against the engine instead of DataFrames, plus NULL/timezone semantics
and corpus-level text aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.registry import register

_CTE_BODY = """
    WITH customer_totals AS (
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS total_spent
        FROM orders
        GROUP BY o_custkey
    ),
    segment_stats AS (
        SELECT c.c_mktsegment,
               COUNT(*) AS n_customers,
               {revenue} AS segment_revenue
        FROM customer c
        JOIN customer_totals t ON c.c_custkey = t.o_custkey
        GROUP BY c.c_mktsegment
    )
    SELECT * FROM segment_stats
"""
# The interior stays exact DECIMAL (r10: no double->decimal->double seam
# inside the aggregation tree — integer arithmetic, any addition order).
# The TERMINAL value is collapsed to DOUBLE with the functions/exact.py
# doctrine (r13): emitting raw DECIMAL(38,6) made sql_cte the only query
# whose output type diverges in the driver's hash normalization (a
# collected Spark Decimal('...970000') vs a DuckDB fetch that transits
# float64 — CORRECTNESS_r12 49/50). The collapse uses the proven
# engine-identical pairing from sql_pivot / dsum: Spark spells the
# conversion in DuckDB's own unscaled/divide form (one rounding of the
# unscaled integer, one IEEE division — bit-identical to DuckDB's native
# CAST(decimal AS DOUBLE) at ANY magnitude, including past the 2^53
# unscaled boundary the sf10 sweep crossed), while the oracle text keeps
# the native cast.
_CTE_SQL = _CTE_BODY.format(
    revenue="CAST(CAST(SUM(t.total_spent) * 1000000 AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0"
)
_CTE_ORACLE = _CTE_BODY.format(revenue="CAST(SUM(t.total_spent) AS DOUBLE)")


@register(
    "sql_cte",
    oracle=_CTE_ORACLE,
    tags=("sql",),
)
def sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE query through the SQL front end — the same text modulo
    the decimal->double spelling runs on Spark and the oracle; Catalyst
    plans it exactly like the DataFrame form (one shuffle per
    aggregation, join in between)."""
    Tables(spark, sf_dir).view("orders", "customer")
    return spark.sql(_CTE_SQL)


@register(
    "sql_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > (
        SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("sql", "subquery"),
)
def sql_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (no per-row re-execution), the rewrite that makes
    this shape viable at scale. AVG compares (not returns), so float
    averaging is safe here."""
    Tables(spark, sf_dir).view("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > (
            SELECT 2 * AVG(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "pipeline_stream_query",
    oracle="""
    WITH stats AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(o_totalprice) AS avg_price
        FROM orders GROUP BY o_custkey
    ),
    segments AS (
        SELECT c.c_custkey, c.c_name, s.avg_price
        FROM customer c JOIN stats s ON c.c_custkey = s.o_custkey
        WHERE s.avg_price > 150000 OR s.avg_price < 100000
    )
    SELECT c_custkey, c_name,
           'cust' || CAST(c_custkey AS VARCHAR) || '@example.com' AS email
    FROM segments
    WHERE c_custkey % 10 <> 0
    """,
    tags=("pipeline", "integration"),
)
def pipeline_stream_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's example_stream as ONE lazy plan through the
    pipeline runtime (plans/runner.py): extract → segment on a per-key
    aggregate → union of branches → suppression filter → email synthesis.
    Because the runner keeps every step lazy, Catalyst fuses all steps;
    the oracle pins the whole pipeline's semantics end-to-end."""
    from data_bridge_spark.functions.exact import davg
    from data_bridge_spark.plans.models import ExtractStep, Stream, TransformStep
    from data_bridge_spark.plans.runner import StreamRunner

    def segment(inputs):
        orders, customers = inputs["orders"], inputs["customers"]
        stats = orders.groupBy("o_custkey").agg(davg("o_totalprice", "avg_price"))
        joined = customers.join(stats, customers.c_custkey == stats.o_custkey)
        both = joined.filter((F.col("avg_price") > 150000) | (F.col("avg_price") < 100000))
        return {"segments": both.select("c_custkey", "c_name", "avg_price")}

    def mailing(inputs):
        kept = inputs["segments"].filter(F.col("c_custkey") % 10 != 0)
        return {
            "mailing_list": kept.select(
                "c_custkey",
                "c_name",
                F.concat(F.lit("cust"), F.col("c_custkey").cast("string"), F.lit("@example.com")).alias(
                    "email"
                ),
            )
        }

    stream = Stream(
        name="example_stream_query",
        sources=[{"protocol": "file", "name": "wh", "path": sf_dir}],
        steps=[
            ExtractStep(name="e1", source="wh", table="orders.parquet", output="orders"),
            ExtractStep(name="e2", source="wh", table="customer.parquet", output="customers"),
            TransformStep(name="seg", input=["orders", "customers"], output=["segments"], function=segment),
            TransformStep(name="mail", input=["segments"], output=["mailing_list"], function=mailing),
        ],
    )
    runner = StreamRunner(spark, stream)
    runner.run()
    return runner.step_outputs["mailing_list"]


@register(
    "text_top_terms",
    oracle="""
    SELECT token, n FROM (
        SELECT token, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC) AS rk
        FROM (SELECT unnest(string_split(LOWER(text), ' ')) AS token FROM documents)
        WHERE token <> ''
        GROUP BY token
    ) WHERE rk <= 20
    """,
    tags=("text", "topk"),
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term frequency top-k: explode → count → top-20 with a
    total tiebreak. The shape of vocabulary building: partial counts
    map-side, one shuffle on token, TakeOrdered for the k."""
    t = Tables(spark, sf_dir)
    tokens = t.documents.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
        .select("token", "n")
    )


@register(
    "sort_global",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey ASC
    """,
    tags=("sort",),
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total global sort (no limit): Spark range-partitions by sample,
    sorts partitions independently — the scalable total order. (The
    oracle comparison is order-insensitive; the ORDER BY documents
    intent and exercises RangePartitioning.)"""
    t = Tables(spark, sf_dir)
    return t.supplier.select("s_suppkey", "s_name", "s_acctbal").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )


@register(
    "scalar_null",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null,
           CAST(o_orderstatus = 'P' AS INTEGER) AS is_pending,
           IFNULL(CASE WHEN o_totalprice > 300000 THEN o_totalprice END, 0.0) AS big_price
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("scalar", "null"),
)
def scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics scalars: NULLIF/COALESCE/IFNULL and NULL-producing
    CASE — three-valued logic handled identically to the oracle."""
    t = Tables(spark, sf_dir)
    status = F.col("o_orderstatus")
    price = F.col("o_totalprice")
    return t.orders.filter(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.coalesce(F.nullif(status, F.lit("P")), F.lit("PENDING")).alias("status_norm"),
        # NOT the flipped `WHEN status != 'P' THEN price`: for NULL status
        # that form yields NULL while the stated CASE falls to ELSE price
        # (three-valued logic — NULL = 'P' is not-true, so ELSE fires)
        F.when(status == "P", F.lit(None)).otherwise(price).alias("price_or_null"),
        (status == "P").cast("integer").alias("is_pending"),
        F.ifnull(F.when(price > 300000, price), F.lit(0.0)).alias("big_price"),
    )


@register(
    "scalar_tz",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_utc,
           strftime(timezone('America/Chicago', timezone('UTC', ts)),
                    '%Y-%m-%d %H:%M:%S') AS ts_chicago,
           CAST((epoch(timezone('America/Chicago', timezone('UTC', ts)))
                 - epoch(ts)) / 3600 AS INTEGER) AS utc_offset_hours
    FROM events WHERE event_id < 500
    """,
    tags=("scalar", "timezone"),
)
def scalar_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversions for the reference's timestamp_timezone type
    (ref extractor.py:201 pins America/Chicago): NTZ event times
    interpreted as UTC instants, rendered in Chicago local time, with the
    UTC offset derived per-row (CST/CDT across DST). Local times render
    as strings second-precision on both engines, so the oracle pins the
    tz-database application itself rather than engine-specific timestamp
    rendering."""
    t = Tables(spark, sf_dir)
    ts = F.col("ts")
    chicago = F.convert_timezone(F.lit("UTC"), F.lit("America/Chicago"), ts)
    return t.events.filter(F.col("event_id") < 500).select(
        "event_id",
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("ts_utc"),
        F.date_format(chicago, "yyyy-MM-dd HH:mm:ss").alias("ts_chicago"),
        ((F.unix_micros(chicago.cast("timestamp")) - F.unix_micros(ts.cast("timestamp"))) / 3600_000_000)
        .cast("int")
        .alias("utc_offset_hours"),
    )


@register(
    "sql_pivot",
    # DuckDB's PIVOT emits dynamic columns; the oracle uses the portable
    # CASE-sum form with the same decimal-exact measures and 0-fill
    oracle="""
    SELECT o_orderstatus,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS urgent,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS medium,
           CAST(COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW'    THEN CAST(o_totalprice AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS low
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("sql", "pivot"),
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-syntax PIVOT (the `FROM ... PIVOT (agg FOR col IN (...))`
    clause) — API parity for users who pivot in SQL text rather than via
    DataFrame .pivot() (events_pivot/events_pivot_dynamic cover that
    path). Same engine contract: explicit value list (plan-time schema),
    decimal-exact sums collapsed to double, absent cells 0-filled. The
    physical plan is the identical single partial-agg Expand the
    DataFrame form produces."""
    Tables(spark, sf_dir).view("orders")
    # The decimal->double collapse uses the unscaled/divide form (the SQL
    # spelling of functions/exact.py dec_to_double): Spark's native
    # CAST(decimal AS DOUBLE) drifts an ulp from DuckDB once the unscaled
    # value passes 2^53, which the big status x priority cells do at sf1.
    return spark.sql("""
        SELECT o_orderstatus,
               CAST(CAST(COALESCE(urgent_d, 0) * 1000000 AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0 AS urgent,
               CAST(CAST(COALESCE(medium_d, 0) * 1000000 AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0 AS medium,
               CAST(CAST(COALESCE(low_d, 0) * 1000000 AS DECIMAL(38,0)) AS DOUBLE) / 1000000.0 AS low
        FROM (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18,6)) AS p
            FROM orders
        )
        PIVOT (
            SUM(p) FOR o_orderpriority IN (
                '1-URGENT' AS urgent_d, '3-MEDIUM' AS medium_d, '5-LOW' AS low_d
            )
        )
    """)


@register(
    "sql_lateral_explode",
    oracle="""
    SELECT doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT doc_id, unnest(string_split(LOWER(text), ' ')) AS term
        FROM documents
    ) t
    WHERE doc_id < 50
    GROUP BY doc_id, t.term
    """,
    tags=("sql", "lateral", "explode"),
)
def sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode through the SQL front end — the HiveQL-
    lineage table-generating-function syntax (API parity with the
    DataFrame F.explode path used throughout text/*). Per-doc term
    counts over a bounded doc slice; the Generate node pipelines inside
    the scan stage, one exchange for the count."""
    Tables(spark, sf_dir).view("documents")
    return spark.sql("""
        SELECT doc_id, term, COUNT(*) AS n
        FROM documents
        LATERAL VIEW explode(split(lower(text), ' ')) x AS term
        WHERE doc_id < 50
        GROUP BY doc_id, term
    """)
