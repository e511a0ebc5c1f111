"""TPC-H-suite analogues beyond Q1/Q3/Q5 (see insights.py): the
remaining canonical warehouse plan shapes, adapted to this schema
(no l_commitdate/l_receiptdate/c_phone/p_container — filters are
re-targeted at the columns that exist; the plan shape each query
exists to exercise is preserved).

Each query is the textbook representative of one optimizer pattern:
pure pushdown scan-agg (Q6), multi-fact nation-pair join with an OR
pair predicate (Q7), returned-revenue top-k (Q10), conditional
line counts (Q12), left-outer count distribution (Q13), conditional
ratio (Q14), decorrelated per-group-average subquery (Q17),
HAVING-on-sum semi-join (Q18), and scalar-subquery + anti-join
(Q22). All double aggregation goes through functions/exact.py
decimal machinery (see that module's docstring for the 2^53 /
double-rounding rules the oracles rely on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_bridge_spark.catalog import Tables
from data_bridge_spark.functions.exact import dec, dfactor, dmoney
from data_bridge_spark.registry import register

# shared oracle fragment: the exact-decimal discounted-revenue sum,
# collapsed to scale 6 (inputs carry <= 4 real decimals) before the
# double cast so DuckDB's unscaled-int conversion can't double-round
_REV_SQL = """CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
             * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(18,6))
        AS DOUBLE)"""


def _rev() -> F.Column:
    """Spark twin of _REV_SQL."""
    return (
        F.sum(dmoney("l_extendedprice") * (1 - dfactor("l_discount")))
        .cast("decimal(18,6)")
        .cast("double")
    )


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))
                         * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(18,6))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("tpch", "agg", "pushdown"),
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure pushdown
    showcase — one scan, three range predicates, one product-sum, no
    join and no group-by. All three filters reach the parquet scan as
    PushedFilters (min/max row-group pruning skips most of the file at
    scale) and the single-row answer comes back through a partial+final
    agg with no shuffle of data rows. The 100 TB shape: I/O-bound,
    embarrassingly parallel, network traffic O(partitions)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum(dmoney("l_extendedprice") * dfactor("l_discount"))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_N_A, _N_B = "NATION_1", "NATION_2"


@register(
    "tpch_q7_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
           {_REV_SQL} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = '{_N_A}' AND n2.n_name = '{_N_B}')
       OR (n1.n_name = '{_N_B}' AND n2.n_name = '{_N_A}')
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between two nations by
    year, in both directions — the OR-of-pairs predicate that defeats
    naive single-sided pushdown. Plan: supplier and both nation copies
    broadcast; the pair restriction collapses the supplier broadcast to
    two nations' worth of rows *before* the fact join, so the lineitem
    side is semi-filtered by the broadcast hash join itself. The two
    fact-fact joins shuffle on orderkey/custkey; the OR predicate rides
    the final broadcast joins rather than forcing a cartesian."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == _N_A) & (F.col("cust_nation") == _N_B)
    ) | ((F.col("supp_nation") == _N_B) & (F.col("cust_nation") == _N_A))
    return (
        t.lineitem.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(_rev().alias("revenue"))
    )


@register(
    "tpch_q10_returns",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
           c.c_acctbal AS acctbal,
           {_REV_SQL} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "topk"),
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter. The quarter filter pushes into the
    orders scan and the returnflag filter into lineitem (both
    PushedFilters — at scale each kills ~95% of its fact before any
    shuffle); nation is broadcast; the top-20 is TakeOrdered with a
    custkey tiebreak, so no global sort. The per-customer grouping key
    deliberately carries the display columns (name, nation, acctbal) —
    they are functionally dependent on custkey, so the group count is
    unchanged and no second join is needed to re-attach them."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        t.customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .agg(_rev().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_late_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 365 DAY
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    tags=("tpch", "join", "agg", "conditional"),
)
def tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue (shipping-mode priority, re-targeted): lines
    shipped more than a year after ordering, split into high- vs
    low-priority counts per return flag (the schema has no
    l_commitdate/l_receiptdate/l_shipmode, so "late" is
    shipdate > orderdate + 365d and the pivot key is returnflag — the
    conditional-count pattern is the point). The year window pushes
    into the lineitem scan; the cross-table lateness predicate can only
    run post-join, which is exactly where Catalyst places it; the two
    CASE counts collapse in one partial agg."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 365 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "join", "agg", "distribution"),
)
def tpch_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed
    exactly N orders — the left-outer + double-aggregation shape (a
    customer with no orders must survive as c_count = 0, which an inner
    join would silently drop; COUNT(o_orderkey) ignores the null the
    outer join manufactures). Two shuffles: custkey for the outer-join
    count, then c_count for the distribution — the second one moves
    only |customers| rows collapsed to |distinct counts|."""
    t = Tables(spark, sf_dir)
    c_orders = (
        t.customer.join(
            t.orders, F.col("o_custkey") == F.col("c_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q14_promo",
    oracle="""
    WITH s AS (
        SELECT
          CAST(CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(15,4))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,4)))
                    ELSE CAST(0 AS DECIMAL(23,8)) END) AS DECIMAL(18,6))
               AS DOUBLE) AS promo_revenue,
          CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DECIMAL(18,6))
               AS DOUBLE) AS total_revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
    )
    SELECT promo_revenue, total_revenue,
           100.0 * promo_revenue / total_revenue AS promo_pct
    FROM s
    """,
    tags=("tpch", "join", "agg", "conditional"),
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): share of revenue from promo-type
    parts in a two-month window — the conditional-ratio pattern. One
    fact-dim join (part side shuffles here; at a scale where part fits
    executors it broadcasts — left to AQE's runtime stats rather than
    forced), both sums in a single partial agg, ratio computed on the
    two collapsed doubles (elementwise, bit-deterministic). The CASE
    arms stay decimal so the conditional sum is exactly the filtered
    sum."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-03-01").cast("timestamp_ntz"))
    )
    disc = dmoney("l_extendedprice") * (1 - dfactor("l_discount"))
    s = (
        li.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", disc).otherwise(
                    F.lit(0).cast("decimal(23,8)")
                )
            )
            .cast("decimal(18,6)")
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc).cast("decimal(18,6)").cast("double").alias("total_revenue"),
        )
    )
    return s.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_pct"
        ),
    )


@register(
    "tpch_q17_small_qty",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                      / COUNT(l_quantity)) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_lines,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,2))) AS DECIMAL(38,2))
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < a.qty_cut
    GROUP BY p.p_brand
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue locked in
    orders below 20% of a part's average order quantity — the
    correlated-average subquery, decorrelated the way Catalyst itself
    rewrites it: aggregate the inner query per key, equi-join it back,
    filter. The fact joins its own per-part aggregate on partkey (one
    shuffle each side, AQE-balanced); the 0.2x threshold is double math
    on an exact-decimal average so both engines compute the identical
    cut. Grouped by brand (the canonical query's single-brand filter is
    a parameter choice, not a plan feature)."""
    t = Tables(spark, sf_dir)
    part_avg = (
        t.lineitem.groupBy(F.col("l_partkey").alias("pa_key"))
        .agg(
            (
                F.lit(0.2)
                * (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity"))
            ).alias("qty_cut")
        )
    )
    return (
        t.lineitem.join(part_avg, F.col("l_partkey") == F.col("pa_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(19,2)"))
                .cast("decimal(38,2)")
                .cast("double")
                / 7.0
            ).alias("avg_yearly"),
        )
    )


_Q18_MIN_QTY = 300.0


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > {_Q18_MIN_QTY}
    )
    SELECT c.c_name AS name, c.c_custkey AS custkey,
           o.o_orderkey AS orderkey, o.o_orderdate AS orderdate,
           o.o_totalprice AS totalprice, b.sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, orderkey ASC
    LIMIT 100
    """,
    tags=("tpch", "join", "agg", "having"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    clears a threshold, with their customers — the HAVING-on-sum
    pre-aggregation shape. The lineitem aggregate runs FIRST and the
    HAVING collapses it to a tiny key set (p99 of sum_qty is ~262, the
    cut is 300), so the subsequent joins move almost nothing — the
    aggregate acts as its own semi-join filter. Top-100 by order value
    with an orderkey tiebreak via TakeOrdered."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_MIN_QTY)
    )
    return (
        big.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(100)
    )


_Q22_CUTOFF = "2000-01-01 00:00:00"


@register(
    "tpch_q22_dormant",
    oracle=f"""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(c_acctbal) AS cut
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nationkey,
           COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(18,2))
                AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.cut
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF}'
      )
    GROUP BY c.c_nationkey
    """,
    tags=("tpch", "join", "agg", "anti", "subquery"),
)
def tpch_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue (global sales opportunity): wealthy-but-
    dormant customers per nation — above-average account balance, no
    recent orders (the schema has no c_phone, so "dormant since the
    cutoff" replaces the country-code filter; the scalar-subquery +
    anti-join plan shape is the point). The global average is a 1-row
    aggregate broadcast against the customer scan (the nested-loop
    join is against one row — allowlisted in the plan audit); the NOT
    EXISTS is a left-anti join against recent orders pre-filtered at
    the scan. Balance sums collapse at scale 2 (the inputs' true
    scale) before the double cast."""
    t = Tables(spark, sf_dir)
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias("cut")
    )
    recent = t.orders.filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF.split(" ")[0]).cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        t.customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("cut"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("totacctbal"),
        )
    )
