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

__all__ = ["dec", "dsum", "davg", "dmul_sum", "dmoney", "dfactor", "MONEY", "FACTOR"]

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
# the unscaled int and dividing by 10^scale — TWO roundings once the
# unscaled value exceeds 2^53, i.e. an off-by-one-ulp double. Spark/Java
# round once (correctly). Therefore every aggregate result is collapsed to
# a scale-≤6 decimal whose unscaled value fits in 2^53 *before* the final
# double cast (exact for our ≤2-decimal inputs).
MONEY = "decimal(15,4)"
FACTOR = "decimal(8,4)"
MONEY_SQL = "DECIMAL(15,4)"
FACTOR_SQL = "DECIMAL(8,4)"


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
    out = F.sum(dec(col)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive AVG: exact decimal sum, double division by count.

    (Decimal division rules differ between engines; double division of two
    identical operands does not.)
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(dec(c)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dmul_sum(a: Column | str, b: Column | str, alias: str | None = None) -> Column:
    """SUM(a*b) with narrow decimal factors: exact product then exact sum."""
    out = F.sum(dmoney(a) * dfactor(b)).cast("double")
    return out.alias(alias) if alias else out
