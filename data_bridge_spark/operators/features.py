"""Feature-engineering operators — the transform stage of a training-data
pipeline: scaling, encoding, bucketing, and the hashing trick, plus the
rank-based drift test that guards them.

These extend the reference's data-movement surface (its users hand-roll
these in pandas after extraction) with the distributed equivalents a
100 TB feature pipeline needs. Every operator follows the repo doctrine:
decimal-exact sums (`functions/exact.py`), no runtime libm
transcendentals except IEEE-correctly-rounded sqrt/division, NULLIF
guards on every data-dependent denominator (empty/degenerate inputs
yield NULL on BOTH engines, never NULL-vs-Inf), and total tiebreak
orders anywhere a rank appears.

Scale shapes: per-column statistics are single tiny aggregate rows
broadcast back over the fact table (one pass + one map-side join — the
classic fit/transform split); quantile bucketing reuses the distributed
two-level prefix sum (`insights._bucketed_prefix_sums`) instead of a
single-partition global window; target encoding shuffles once on the
join key and once on the (low-cardinality) category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.functions.exact import dec, dec_to_double, dmoney
from data_bridge_spark.operators.insights import _bucketed_prefix_sums
from data_bridge_spark.registry import register

# The one-hot / hashing domain for c_mktsegment — the "fitted vocabulary".
# Discovery (a bounded distinct over the low-cardinality column, same
# pattern as events_pivot_dynamic) can surface a subset on sparse input
# but never a value outside this domain; the output schema is built from
# the static list so it stays stable either way.
_SEGMENTS_STATIC = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

_FH_SEED = "fh-v1"
_FH_BUCKETS = 64


@register(
    "feature_standardize",
    oracle="""
    WITH s AS (
        SELECT COUNT(c_acctbal) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4)) * CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS sxx
        FROM customer
    )
    SELECT c.c_custkey, c.c_acctbal,
           (c.c_acctbal - s.sx / s.n)
               / NULLIF(SQRT((s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)) * s.n / NULLIF(s.n - 1, 0)), 0.0)
               AS z_acctbal
    FROM customer c CROSS JOIN s
    """,
    tags=("features", "scaling"),
)
def feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization of a numeric column — the fit/transform
    split as one plan: a single aggregate row (count, exact-decimal sum,
    exact-decimal sum of squares) is broadcast back over the table and
    the scale is applied map-side. Two scans, zero shuffles beyond the
    partial agg — the right 100 TB shape (at cluster scale the stats row
    is the persisted "fitted scaler").

    Determinism: sums are decimal-exact (order-insensitive), converted
    via `dec_to_double` (bit-identical to DuckDB's cast); the variance
    is then a fixed sequence of IEEE ops on identical doubles. Sample
    variance (n-1) with NULLIF guards for n<=1; sd==0 yields NULL z for
    a constant column on both engines."""
    t = Tables(spark, sf_dir)
    stats = t.customer.agg(
        F.count("c_acctbal").alias("n"),
        dec_to_double(F.sum(dec("c_acctbal")), 6).alias("sx"),
        dec_to_double(F.sum(dmoney("c_acctbal") * dmoney("c_acctbal")), 8).alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    var = (
        (F.col("sxx") / F.col("n") - mean * mean)
        * F.col("n")
        / F.nullif(F.col("n") - 1, F.lit(0))
    )
    return (
        t.customer.crossJoin(F.broadcast(stats))
        .select(
            "c_custkey",
            "c_acctbal",
            ((F.col("c_acctbal") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))).alias(
                "z_acctbal"
            ),
        )
    )


@register(
    "feature_minmax",
    oracle="""
    WITH s AS (
        SELECT MIN(o_totalprice) AS vmin, MAX(o_totalprice) AS vmax FROM orders
    )
    SELECT o.o_orderkey, o.o_totalprice,
           (o.o_totalprice - s.vmin) / NULLIF(s.vmax - s.vmin, 0.0) AS scaled_price
    FROM orders o CROSS JOIN s
    """,
    tags=("features", "scaling"),
)
def feature_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max scaling to [0,1]: broadcast (min, max) scalar, map-side
    transform. Min/max are exact value picks (no FP accumulation), the
    rescale is the same two IEEE ops on both engines; a constant column
    (range 0) yields NULL via the NULLIF guard rather than NULL-vs-Inf
    divergence."""
    t = Tables(spark, sf_dir)
    rng = t.orders.agg(
        F.min("o_totalprice").alias("vmin"), F.max("o_totalprice").alias("vmax")
    )
    return t.orders.crossJoin(F.broadcast(rng)).select(
        "o_orderkey",
        "o_totalprice",
        (
            (F.col("o_totalprice") - F.col("vmin"))
            / F.nullif(F.col("vmax") - F.col("vmin"), F.lit(0.0))
        ).alias("scaled_price"),
    )


@register(
    "feature_onehot",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS oh_automobile,
           CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END AS oh_building,
           CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END AS oh_furniture,
           CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END AS oh_household,
           CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END AS oh_machinery
    FROM customer
    """,
    tags=("features", "encoding"),
)
def feature_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot encoding of a low-cardinality categorical: the vocabulary
    is DISCOVERED at plan time (one column-pruned bounded distinct — the
    fit step, same pattern as events_pivot_dynamic) and verified against
    the declared domain; output columns come from the static domain so
    the schema is stable even on sparse input. Pure map-side CASE flags
    after discovery — zero shuffles over the fact table; NULL category
    rows get all-zero flags on both engines."""
    t = Tables(spark, sf_dir)
    discovered = sorted(
        r[0]
        for r in t.customer.select("c_mktsegment").distinct().collect()
        if r[0] is not None
    )
    assert set(discovered) <= set(_SEGMENTS_STATIC), discovered
    return t.customer.select(
        "c_custkey",
        *[
            F.when(F.col("c_mktsegment") == seg, 1)
            .otherwise(0)
            .alias(f"oh_{seg.lower()}")
            for seg in _SEGMENTS_STATIC
        ],
    )


@register(
    "feature_quantile_bucket",
    oracle="""
    WITH per_v AS (
        SELECT o_totalprice AS v, COUNT(*) AS cnt FROM orders GROUP BY 1
    ),
    run AS (
        SELECT v, SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt
        FROM per_v
    ),
    tot AS (SELECT COUNT(*) AS n FROM orders)
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(((r.run_cnt - 1) * 10) // t.n + 1 AS INTEGER) AS decile
    FROM orders o JOIN run r ON o.o_totalprice = r.v CROSS JOIN tot t
    """,
    tags=("features", "binning"),
)
def feature_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) bucketing — rank-based, tie-stable: equal
    values always land in the same bucket (value-grain cumulative count,
    not row-grain NTILE whose tie placement is arbitrary), and every
    bucket edge is pure integer arithmetic — no FP anywhere, so the
    assignment is bit-free exact on both engines.

    Scale shape: the textbook form is a global ordered window (one
    partition holding every distinct value); this plan reuses the
    distributed two-level prefix sum (`_bucketed_prefix_sums`, shared
    with stats_ks/agg_gini) so the cumulative counts run per range
    bucket in parallel, then one equi-join on the value assigns rows —
    AQE broadcasts the distinct-value side when it is small."""
    t = Tables(spark, sf_dir)
    per_v = t.orders.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    run = _bucketed_prefix_sums(per_v, "v", ("cnt",)).select("v", "run_cnt")
    tot = t.orders.agg(F.count(F.lit(1)).alias("n"))
    return (
        t.orders.join(run, F.col("o_totalprice") == F.col("v"))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "o_totalprice",
            # integral `div` (never a double round-trip): exact at any n
            (F.expr("((run_cnt - 1) * 10) div n") + 1).cast("int").alias("decile"),
        )
    )


@register(
    "feature_target_encode_loo",
    oracle="""
    WITH j AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               CAST(o.o_totalprice AS DECIMAL(18,6)) AS p
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    s AS (
        SELECT segment, COUNT(*) AS n, SUM(p) AS sp FROM j GROUP BY segment
    )
    SELECT j.o_orderkey, j.segment,
           CAST(s.sp - j.p AS DOUBLE) / NULLIF(s.n - 1, 0) AS loo_avg_price
    FROM j JOIN s USING (segment)
    """,
    tags=("features", "encoding"),
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the leakage-free mean encoder: each
    order's segment is encoded as the mean target over every OTHER row of
    the segment, (sum - own)/(n-1), so a row never sees its own label.
    The subtraction runs in exact decimal (order-insensitive), the final
    division is one IEEE op on identical operands; a singleton category
    yields NULL via NULLIF on both engines.

    Scale shape: one equi-join orders->customer (AQE picks broadcast when
    the dim fits), one partial-agg shuffle on the low-cardinality
    category, then the 5-row stats table broadcasts back — the fact table
    is never re-shuffled for the transform."""
    t = Tables(spark, sf_dir)
    j = (
        t.orders.join(
            t.customer, t.orders.o_custkey == t.customer.c_custkey
        ).select(
            "o_orderkey",
            F.col("c_mktsegment").alias("segment"),
            dec("o_totalprice").alias("p"),
        )
    )
    s = j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("p").alias("sp")
    )
    return j.join(F.broadcast(s), "segment").select(
        "o_orderkey",
        "segment",
        (
            dec_to_double(F.col("sp") - F.col("p"), 6)
            / F.nullif(F.col("n") - 1, F.lit(0))
        ).alias("loo_avg_price"),
    )


@register(
    "feature_hashing",
    oracle=f"""
    SELECT c_custkey, feat, bucket, CAST(1 - 2 * (CAST(('0x' || substr(h, 9, 1)) AS BIGINT) % 2) AS INTEGER) AS sign
    FROM (
        SELECT c_custkey, 'mktsegment' AS feat,
               MD5('{_FH_SEED}:mktsegment=' || c_mktsegment) AS h,
               CAST(CAST(('0x' || substr(MD5('{_FH_SEED}:mktsegment=' || c_mktsegment), 1, 8)) AS BIGINT) % {_FH_BUCKETS} AS INTEGER) AS bucket
        FROM customer
        UNION ALL
        SELECT c_custkey, 'nation' AS feat,
               MD5('{_FH_SEED}:nation=' || CAST(c_nationkey AS VARCHAR)) AS h,
               CAST(CAST(('0x' || substr(MD5('{_FH_SEED}:nation=' || CAST(c_nationkey AS VARCHAR)), 1, 8)) AS BIGINT) % {_FH_BUCKETS} AS INTEGER) AS bucket
        FROM customer
    )
    """,
    tags=("features", "hashing"),
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical values map to a fixed 64-bucket
    feature space via a content hash, with a +-1 sign bit from an
    independent hash nibble (the signed variant that keeps collision bias
    zero-mean). Pure per-row expressions — zero shuffles, unbounded
    vocabulary, no fitted dictionary to store: exactly why this is the
    100 TB encoder of last resort. Hash = md5(seed:feat=value), the same
    engine-portable determinism primitive as split_train_test; a NULL
    value propagates NULL bucket/sign on both engines (md5(NULL)=NULL)."""
    t = Tables(spark, sf_dir)

    def lane(feat: str, value: F.Column) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{_FH_SEED}:{feat}="), value))
        return F.struct(
            F.lit(feat).alias("feat"),
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _FH_BUCKETS)
            .cast("int")
            .alias("bucket"),
            (1 - 2 * (F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2))
            .cast("int")
            .alias("sign"),
        )

    lanes = F.array(
        lane("mktsegment", F.col("c_mktsegment")),
        lane("nation", F.col("c_nationkey").cast("string")),
    )
    return t.customer.select(
        "c_custkey", F.explode(lanes).alias("f")
    ).select("c_custkey", "f.feat", "f.bucket", "f.sign")
