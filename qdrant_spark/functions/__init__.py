from qdrant_spark.functions.distances import (
    cosine,
    distance,
    dot,
    euclid,
    larger_is_better,
    manhattan,
    maxsim,
    sparse_dot,
)

__all__ = [
    "cosine",
    "distance",
    "dot",
    "euclid",
    "larger_is_better",
    "manhattan",
    "maxsim",
    "sparse_dot",
]
