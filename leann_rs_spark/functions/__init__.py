from leann_rs_spark.functions.vector import (
    dot,
    cosine,
    l2_norm,
    l2_normalize,
)
from leann_rs_spark.functions.text import tokenize, hash64, char_shingles

__all__ = [
    "dot",
    "cosine",
    "l2_norm",
    "l2_normalize",
    "tokenize",
    "hash64",
    "char_shingles",
]
