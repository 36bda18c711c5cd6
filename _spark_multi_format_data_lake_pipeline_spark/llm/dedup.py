"""Deduplication operators for training-data pipelines (SURVEY.md §2 Part B
"LLM-data extensions"): exact, MinHash+LSH near-dup, SimHash.

Scale design
------------
- Exact dedup: hash-groupBy on sha256(text) — one shuffle keyed by a
  64-hex string, uniform by construction (no skew), works at any SF.
- MinHash near-dup: the textbook shingle→minhash→band→bucket-join pipeline.
  Candidate generation is a self-join on (band_id, band_hash) buckets, so
  cost is sum over buckets of |bucket|² — NOT O(n²). ``max_bucket`` caps
  pathological buckets (boilerplate text) exactly like production dedup
  pipelines do; dropped buckets are a documented recall trade-off.
- SimHash: pure map-stage fingerprint; near-dup = fingerprints within small
  Hamming distance, found via band-exact match on fingerprint chunks.

Everything below is built-in higher-order functions (xxhash64 / transform /
aggregate / array_min) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: universal-hash modulus. With a,b,h < 2^31 the
# product a*h stays under 2^62 — no int64 overflow, so ANSI mode (Spark 4
# default, kept ON for oracle parity) never trips. 31-bit min-hash values
# are plenty for signature purposes (collision p ≈ 1e-7 per shingle set).
_P = (1 << 31) - 1


def _perm_constants(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the permutation family."""
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _P), rnd.randrange(0, _P)) for _ in range(num_perm)]


def exact_dedup_keepers(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One representative (min id) per distinct text; adds the content hash
    and the number of copies. Reference-style dedup via hash-groupBy."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "content_sha256", "n_copies")
    )


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles, lowercased."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    m = F.size(toks)
    idx = F.sequence(F.lit(0), m - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(m >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    grams_col: str = "grams",
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures.

    Formulated as explode → hash-once → num_perm MIN aggregates, NOT as
    nested array lambdas: each shingle is xxhash64'd exactly once, the
    permutations are cheap affine maps of that one hash, and Spark's
    partial aggregation computes per-task mins map-side before the shuffle.
    Docs with no shingles produce no signature (and thus no candidates).
    """
    g = df.select(id_col, F.explode(grams_col).alias("_gram")).select(
        id_col, F.pmod(F.xxhash64("_gram"), F.lit(_P)).alias("_gh")
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("_gh") + F.lit(b), F.lit(_P))).alias(f"_m{i}")
        for i, (a, b) in enumerate(_perm_constants(num_perm, seed))
    ]
    return g.groupBy(id_col).agg(*aggs).select(
        id_col, F.array(*[f"_m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with the estimated
    Jaccard similarity (fraction of agreeing signature positions).

    bands×rows = num_perm; with 16 bands of 4 rows the S-curve midpoint is
    (1/16)^(1/4) ≈ 0.5 — tuned to the default threshold.
    """
    rows_per_band = num_perm // bands
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("grams"),
    )
    sig = minhash_signatures(shingled, "id", "grams", num_perm)

    band_idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
        )
    )
    banded = sig.select("id", "sig", band_idx.alias("band", "band_hash"))

    # cap pathological buckets (boilerplate): documented recall trade-off
    bucket_sizes = banded.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("_bsz"))
    banded = banded.join(
        bucket_sizes.filter(F.col("_bsz") <= max_bucket).drop("_bsz"),
        ["band", "band_hash"],
        "inner",
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = agree.cast("double") / F.lit(float(num_perm))
    return (
        cand.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(text: Column | str, bits: int = 64) -> Column:
    """SimHash fingerprint of whitespace tokens as a bigint.

    Map-only: per bit position j, sum ±1 contributions of token hashes,
    then pack sign bits. All higher-order built-ins, no UDF.
    """
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit positions are Python ints (shift amounts must be literals in
    # PySpark), so loop driver-side while the math stays JVM-side
    def vote_merge(j: int):
        # factory, not `j=j` default: PySpark counts default params in arity
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("int")

    fp = F.lit(0).cast("bigint")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0), vote_merge(j))
        # two's-complement weight for the top bit keeps the result in int64
        weight = -(1 << (bits - 1)) if j == bits - 1 else (1 << j)
        fp = fp + F.when(vote > 0, F.lit(weight).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return fp
