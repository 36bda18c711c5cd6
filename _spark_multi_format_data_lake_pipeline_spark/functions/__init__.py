from .vectors import cosine_similarity, dot, l2_norm
from .text import tokens, token_count, distinct_token_count, stopword_ratio

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "tokens",
    "token_count",
    "distinct_token_count",
    "stopword_ratio",
]
