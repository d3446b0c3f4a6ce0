from pgvectorscale_spark.functions.distance import (
    cosine_distance,
    dot_product,
    inner_product_distance,
    l2_distance_squared,
    l2_normalize,
    matryoshka_slice,
)

__all__ = [
    "cosine_distance",
    "dot_product",
    "inner_product_distance",
    "l2_distance_squared",
    "l2_normalize",
    "matryoshka_slice",
]
