"""Exact (order-insensitive) aggregation helpers.

Floating-point SUM/AVG results depend on addition order, which differs
between Spark's parallel partial aggregation and any single-threaded
oracle. The reference dodged this by keeping SQL ``numeric`` boxed as
Python ``object`` (reference ``app/utils/extractor.py:193``); the Spark-
native answer is DecimalType: cast measures to decimal, aggregate exactly
(integer arithmetic → any addition order gives the same result), then cast
the final value back to double. Both Spark and DuckDB convert the same
exact decimal to the same IEEE double, so hash comparisons are stable no
matter how many partitions the plan ran on.

The casts are JVM-side Catalyst expressions — no UDFs, whole-stage codegen
keeps working, and the parquet scan still prunes/pushes down.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec", "dec_to_double", "dsum", "davg", "dmul_sum", "dmoney", "dfactor", "MONEY", "FACTOR"]

# 18 digits / 6 decimal places fits every measure in the test schema
# (prices < 1e7) while keeping products within DecimalType's 38-digit cap:
# d(18,6) * d(18,6) = d(37,12).
_PREC, _SCALE = 18, 6

# For decimal *products*, operands must stay narrow: DuckDB caps the
# product's width at max(operand widths) and silently loses exactness once
# w1+w2 nears 38, so money×factor uses DECIMAL(15,4) × DECIMAL(8,4)
# (product DECIMAL(23,8) — exact in both engines).
#
# Decimal→double caveat: DuckDB converts decimal to double by converting
# the unscaled int to double and dividing by 10^scale — TWO roundings
# once the unscaled value exceeds 2^53 — while Spark/Java round once from
# the exact decimal. Below 2^53-unscaled the two algorithms agree bit-for
# -bit (the unscaled int is exact in double and IEEE division is
# correctly rounded); above it they differ by an ulp. Round 5 handled
# this by keeping unscaled values under 2^53; the sf1 scaling decade
# broke that invariant (sum_charge's unscaled hit 2.8e16), so the final
# conversion now REPLICATES DuckDB's unscaled/divide form on the Spark
# side (`dec_to_double`) — identical by construction at ANY magnitude
# that fits decimal(38,·), which is the actual 100 TB contract.
MONEY = "decimal(15,4)"
FACTOR = "decimal(8,4)"
MONEY_SQL = "DECIMAL(15,4)"
FACTOR_SQL = "DECIMAL(8,4)"


def dec_to_double(c: Column, scale: int = _SCALE) -> Column:
    """Decimal → double exactly the way DuckDB's CAST(d AS DOUBLE) does
    it: unscaled integer → double (one correct rounding in each engine),
    then ONE IEEE division by 10^scale. Bit-identical to Spark's native
    single-rounding cast for unscaled values under 2^53 and — unlike the
    native cast — still engine-identical above it. ``scale`` must be the
    operand's decimal scale (the multiply by 10^scale is exact: it only
    shifts the scale down to 0)."""
    unscaled = (c * (10**scale)).cast("decimal(38,0)")
    return unscaled.cast("double") / F.lit(float(10**scale))


def dmoney(col: Column | str) -> Column:
    """Narrow decimal for price-like values used inside products."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dfactor(col: Column | str) -> Column:
    """Narrow decimal for rate-like values (discount/tax) inside products."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(FACTOR)


def dec(col: Column | str, precision: int = _PREC, scale: int = _SCALE) -> Column:
    """Cast a (double) column to an exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive SUM of a double column, returned as double."""
    out = dec_to_double(F.sum(dec(col)), _SCALE)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive AVG: exact decimal sum, double division by count.

    (Decimal division rules differ between engines; double division of two
    identical operands does not.)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = dec_to_double(F.sum(dec(c)), _SCALE) / F.count(c)
    return out.alias(alias) if alias else out


def dmul_sum(a: Column | str, b: Column | str, alias: str | None = None) -> Column:
    """SUM(a*b) with narrow decimal factors: exact product then exact sum.

    money(15,4) × factor(8,4) carries scale 8 — the conversion uses the
    matching 10^8 unscale factor."""
    out = dec_to_double(F.sum(dmoney(a) * dfactor(b)), 8)
    return out.alias(alias) if alias else out
