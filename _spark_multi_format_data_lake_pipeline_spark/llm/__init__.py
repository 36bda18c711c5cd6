from .dedup import exact_dedup_keepers, minhash_signatures, minhash_near_dup_pairs, simhash
from .similarity import topk_cosine, lsh_bucket_bits

__all__ = [
    "exact_dedup_keepers",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash",
    "topk_cosine",
    "lsh_bucket_bits",
]
