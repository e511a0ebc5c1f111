from data_bridge_spark.functions.exact import davg, dec, dmul_sum, dsum
from data_bridge_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "davg",
    "dec",
    "dmul_sum",
    "dsum",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
