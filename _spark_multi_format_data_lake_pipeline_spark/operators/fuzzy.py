"""Fuzzy entity matching: blocked edit-distance candidate pairs.

Entity resolution at scale never scores all pairs — it BLOCKS first
(group rows by a cheap deterministic key: a category column, a phonetic
code, a sorted-token prefix) and scores pairs only within a block, the
same prune-then-score shape as the LSH/prefix-filter near-dup family
(llm/dedup.py) applied to short strings instead of documents.

Scale shape: the self-equi-join on the block key is the only data-sized
shuffle; fan-out is sum over blocks of k_b*(k_b-1)/2, bounded by the
largest block — pick blocking keys with bounded cardinality-per-block
(brand, zip prefix, soundex), and split oversized blocks with a
secondary key before pairing (same guidance as the LSH bucket cap,
except edit distance tolerates no dropped pairs, so SPLIT, don't drop).
``levenshtein`` runs JVM-side (whole-stage codegen, no Python); Spark's
max-distance short-circuit (the 3-arg form) bails out of the DP matrix
early for far-apart strings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, distance) for all within-block pairs
    with ``0 < levenshtein <= max_distance`` (exact duplicates are the
    exact-dedup family's job — this operator surfaces NEAR-misses) and
    id_a < id_b. Deterministic: no sampling, no dropped blocks."""
    blocks = list(block_cols)
    a = df.select(
        *blocks,
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = df.select(
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in blocks:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    # 3-arg levenshtein: stops the DP early once the running minimum
    # exceeds the threshold (returns -1), turning the common far-apart
    # case from O(len^2) into O(len * max_distance)
    dist = F.levenshtein("name_a", "name_b", max_distance)
    return (
        a.join(b, cond)
        .withColumn("distance", dist)
        .filter(
            (F.col("distance") >= 0)
            & (F.col("distance") <= max_distance)
            & (F.col("name_a") != F.col("name_b"))
        )
        .select("id_a", "id_b", "name_a", "name_b", F.col("distance").cast("int"))
    )
