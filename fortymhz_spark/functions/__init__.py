from fortymhz_spark.functions.exact import davg, dec, dsum, money, factor
from fortymhz_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from fortymhz_spark.functions.dt import event_time_seconds

__all__ = [
    "davg",
    "dec",
    "dsum",
    "money",
    "factor",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "event_time_seconds",
]
