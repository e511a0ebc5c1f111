"""Vector (array<float>) expressions — JVM-side, no UDFs.

For the `embeddings.embedding` column (SURVEY.md §2C3/C7). All math is
done with ``F.zip_with`` / ``F.aggregate`` over the array, which Catalyst
evaluates inside codegen; elements are cast to double so the sequential
left fold matches the oracle's sequential list reduction bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity"]


def _fold_sum(arr: Column) -> Column:
    # Sequential left fold in doubles: deterministic, order-stable.
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double result)."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
