"""Analytics depth: ordered collection aggregates, moment statistics with
deterministic arithmetic, histograms, full/cross joins, nested types.

Moment statistics (stddev/corr) are computed from exact decimal power
sums rather than the built-in estimators: streaming variance algorithms
(Welford etc.) give partition-order-dependent low bits, while
sqrt((Σx² − (Σx)²/n)/(n−1)) over exact sums is bit-identical in any
engine and any partitioning — same philosophy as functions/exact.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.functions.exact import dec_to_double, dsum
from data_bridge_spark.registry import register


# keyspan for the argmin/argmax tiebreak composite: orderkey must stay
# below it (holds to a 1000-shard key-shifted upscale); price-cents
# (≤ 5e7) × span + key ≤ 5e17 stays inside int64
_ARG_KEYSPAN = 10_000_000_000


@register(
    "agg_misc",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
           ARG_MIN(o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
                       * {_ARG_KEYSPAN} + o_orderkey) AS cheapest_order,
           ARG_MAX(o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
                       * {_ARG_KEYSPAN} + o_orderkey) AS priciest_order
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean/argmin-style aggregates: count_if, bool_and/or,
    min_by/max_by (DuckDB arg_min/arg_max). The argmin/argmax ordering is
    a composite exact integer (price-cents × keyspan + orderkey), so TIED
    prices resolve to a deterministic orderkey in both engines — the sf1
    key-shifted decade replicates every price across shards, which turned
    the previous bare-price ordering into an engine-dependent coin flip
    (caught by the round-6 full sf1 sweep; the old docstring's "values
    are distinct-enough" held only below that scale)."""
    t = Tables(spark, sf_dir)
    # the composite needs 128-bit room: boundary prices (1e8 -> 1e10 in
    # cents) times the keyspan overflow int64 on both engines. Spark
    # rides DECIMAL(38,0) (exact); DuckDB rides HUGEINT — its
    # DECIMAL(38,0) x int product silently loses exactness near width 38
    # (caught by the fuzz fixture's boundary prices)
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    composite = cents.cast("decimal(38,0)") * F.lit(_ARG_KEYSPAN) + F.col("o_orderkey")
    return t.orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.min_by("o_orderkey", composite).alias("cheapest_order"),
        F.max_by("o_orderkey", composite).alias("priciest_order"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(c_custkey)), ',') AS customer_ids,
           string_agg(c_mktsegment, ',' ORDER BY c_custkey) AS segments
    FROM customer
    WHERE c_nationkey <= 5
    GROUP BY c_nationkey
    """,
    tags=("agg", "collect"),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates with deterministic order: collect_list is
    partition-order-dependent, so the array is sorted (and the string agg
    ordered by key) before leaving the operator.  The sorted id array is
    serialized to a CSV string at the output edge: the driver's value
    canonicalizer sorts pandas object columns, and raw Python lists are
    unhashable there (r3 driver error) — the collect/sort semantics under
    test are unchanged."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.filter(F.col("c_nationkey") <= 5)
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_custkey")), ",").alias(
                "customer_ids"
            ),
            # count-guard: array_join skips NULL elements exactly like
            # string_agg, EXCEPT over an all-NULL group where string_agg
            # is NULL and array_join is '' — restore the NULL
            F.when(
                F.count("c_mktsegment") > 0,
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("c_custkey", "c_mktsegment"))
                        ),
                        lambda s: s["c_mktsegment"],
                    ),
                    ",",
                ),
            ).alias("segments"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))
                          * CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
                / NULLIF(COUNT(*) - 1, 0)) AS qty_stddev,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))
                     * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
           / NULLIF(COUNT(*) - 1, 0) AS qty_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev + covariance from exact decimal power sums — the
    deterministic form of STDDEV_SAMP/COVAR_SAMP (built-in streaming
    estimators have partition-order-dependent low bits)."""
    t = Tables(spark, sf_dir)
    q6 = F.col("l_quantity").cast("decimal(18,6)")
    d4 = F.col("l_discount").cast("decimal(8,4)")
    n = F.count(F.lit(1))
    sum_q = dec_to_double(F.sum(q6), 6)
    sum_qq = dec_to_double(F.sum(q6 * q6), 12)
    sum_qd = dec_to_double(F.sum(q6 * d4), 10)
    sum_d = dec_to_double(F.sum(F.col("l_discount").cast("decimal(18,6)")), 6)
    return t.lineitem.groupBy("l_returnflag").agg(
        n.alias("n"),
        # NULLIF(n-1): sample stddev/covar of a single observation is
        # NULL in standard SQL (and ANSI Spark would otherwise raise
        # DIVIDE_BY_ZERO); guarded identically in the oracle
        F.sqrt((sum_qq - sum_q * sum_q / n) / F.nullif(n - 1, F.lit(0))).alias("qty_stddev"),
        ((sum_qd - sum_q * sum_d / n) / F.nullif(n - 1, F.lit(0))).alias("qty_disc_covar"),
    )


@register(
    "agg_histogram",
    oracle="""
    -- DuckDB has no width_bucket; arithmetic equivalent for 10 buckets
    -- over [0, 500000), with width_bucket's under/overflow clamp (bucket
    -- 0 below min, 11 at/above max) so out-of-range values agree too.
    -- NULL must stay NULL: DuckDB's GREATEST ignores NULLs (GREATEST(
    -- NULL,0)=0) while Spark's width_bucket(NULL)=NULL, so the clamp is
    -- guarded — the all-NULL degenerate fixture caught the divergence.
    SELECT CAST(CASE WHEN o_totalprice IS NULL THEN NULL
                ELSE LEAST(GREATEST(FLOOR(o_totalprice / 50000) + 1, 0), 11) END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the single-pass
    distribution profile (vs sorting for exact quantiles)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.withColumn(
            "bucket", F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(10))
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "join_full",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS nation_key,
           a.n_customers, b.n_suppliers
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_suppliers
                     FROM supplier GROUP BY s_nationkey) b
      ON a.k = b.k
    """,
    tags=("join", "outer"),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with key coalescing — union of two keyed summaries
    keeping unmatched rows from both sides."""
    t = Tables(spark, sf_dir)
    cust = t.customer.groupBy(F.col("c_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = t.supplier.groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cust.join(supp, cust.k == supp.k, "full_outer").select(
        F.coalesce(cust.k, supp.k).alias("nation_key"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region, s.o_orderstatus AS status
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join for dimension scaffolding (every region × every status,
    e.g. to densify sparse report grids). Both sides tiny by construction;
    the plan is a broadcast nested loop."""
    t = Tables(spark, sf_dir)
    statuses = t.orders.select("o_orderstatus").distinct()
    return t.region.crossJoin(statuses).select(
        F.col("r_name").alias("region"), F.col("o_orderstatus").alias("status")
    )


@register(
    "scalar_struct",
    oracle="""
    SELECT event_id,
           struct_extract(s, 'et') AS et,
           struct_extract(s, 'val') AS val
    FROM (
        SELECT event_id, {'et': event_type, 'val': value} AS s
        FROM events WHERE event_id < 300
    )
    """,
    tags=("scalar", "struct"),
)
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field extraction (nested types the reference
    never had, SURVEY §1.4 'absent: arrays/nested')."""
    t = Tables(spark, sf_dir)
    s = F.struct(F.col("event_type").alias("et"), F.col("value").alias("val"))
    return t.events.filter(F.col("event_id") < 300).select(
        "event_id",
        s.getField("et").alias("et"),
        s.getField("val").alias("val"),
    )


@register(
    "agg_moments",
    oracle="""
    WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(q) AS BIGINT) AS s1,
               CAST(SUM(q * q) AS BIGINT) AS s2,
               CAST(SUM(q * q * q) AS BIGINT) AS s3,
               CAST(SUM(q * q * q * q) AS BIGINT) AS s4
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag
    ),
    d AS (
        SELECT l_returnflag, n,
               CAST(s1 AS DOUBLE) / n AS mean,
               CAST(s2 AS DOUBLE) / n AS md2,
               CAST(s3 AS DOUBLE) / n AS md3,
               CAST(s4 AS DOUBLE) / n AS md4
        FROM s
    ),
    m AS (
        SELECT l_returnflag, n, mean,
               md2 - mean * mean AS m2,
               md3 - 3.0 * mean * md2 + 2.0 * mean * mean * mean AS m3,
               md4 - 4.0 * mean * md3 + 6.0 * mean * mean * md2
                   - 3.0 * mean * mean * mean * mean AS m4
        FROM d
    )
    SELECT l_returnflag, n, mean,
           m2 AS variance_pop,
           m3 / NULLIF(m2 * SQRT(m2), 0) AS skewness,
           m4 / NULLIF(m2 * m2, 0) - 3.0 AS kurtosis_ex
    FROM m
    """,
    tags=("agg", "stats", "moments"),
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group from exact
    integer power sums — the 3rd/4th-moment extension of agg_stats.
    l_quantity values are integral, so q, q², q³, q⁴ sum exactly in
    64-bit integers (max Σq⁴ ≈ 4e13 at sf1, far under 2⁶³ and under
    2⁵³ for the double conversion) — the sums are order-insensitive and
    the moment formulas are elementwise double math on the collapsed
    scalars, mirrored operation-for-operation in the oracle. sqrt is
    IEEE-754 correctly-rounded (unlike pow/log, which differ between
    libm implementations last-ulp), so the skewness normalization is
    safe cross-engine. One shuffle, map-side partial aggregation."""
    t = Tables(spark, sf_dir)
    q = F.col("l_quantity").cast("long")
    s = t.lineitem.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    n = F.col("n")
    d = s.select(
        "l_returnflag",
        "n",
        (F.col("s1").cast("double") / n).alias("mean"),
        (F.col("s2").cast("double") / n).alias("md2"),
        (F.col("s3").cast("double") / n).alias("md3"),
        (F.col("s4").cast("double") / n).alias("md4"),
    )
    mean, md2, md3, md4 = F.col("mean"), F.col("md2"), F.col("md3"), F.col("md4")
    m = d.select(
        "l_returnflag",
        "n",
        "mean",
        (md2 - mean * mean).alias("m2"),
        (md3 - F.lit(3.0) * mean * md2 + F.lit(2.0) * mean * mean * mean).alias("m3"),
        (
            md4
            - F.lit(4.0) * mean * md3
            + F.lit(6.0) * mean * mean * md2
            - F.lit(3.0) * mean * mean * mean * mean
        ).alias("m4"),
    )
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    return m.select(
        "l_returnflag",
        "n",
        "mean",
        m2.alias("variance_pop"),
        # zero variance (constant group / single row): skewness and
        # kurtosis are undefined -> NULL, matching the oracle's NULLIF
        (m3 / F.nullif(m2 * F.sqrt(m2), F.lit(0.0))).alias("skewness"),
        (m4 / F.nullif(m2 * m2, F.lit(0.0)) - F.lit(3.0)).alias("kurtosis_ex"),
    )
