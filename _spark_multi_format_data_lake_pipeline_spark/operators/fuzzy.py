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
    id_a < id_b. Deterministic: no sampling, no dropped blocks.

    Two lossless prunes keep the DP off the hot path:

    - distinct-VALUE pairing: the expensive comparison runs on distinct
      (block, name) pairs, then the verdicts expand back to row pairs by
      joining the id lists — with 20k rows but 1.6k distinct names
      (sf0.1 part) that is ~150x fewer DP calls for an identical result
      (the attribute-level-dedup ER optimization; measured 5.6s -> well
      under 1s on the q188 benchmark);
    - length filter in the join condition: edit distance >=
      |len(a) - len(b)| (each insert/delete moves length by 1), so
      far-apart names never reach the DP at all."""
    blocks = list(block_cols)
    rows = df.select(*blocks, F.col(id_col).alias("_rid"), F.col(name_col).alias("_rname"))
    names = rows.select(*blocks, F.col("_rname").alias("name_a")).distinct()
    other = names.select(
        *[F.col(c).alias(f"_b_{c}") for c in blocks],
        F.col("name_a").alias("name_b"),
    )
    cond = F.col("name_a") < F.col("name_b")  # unordered value pairs, once each
    for c in blocks:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    cond = cond & (
        F.abs(F.length("name_a") - F.length("name_b")) <= max_distance
    )
    # 3-arg levenshtein: stops the DP early once the running minimum
    # exceeds the threshold (returns -1), turning the common far-apart
    # case from O(len^2) into O(len * max_distance)
    dist = F.levenshtein("name_a", "name_b", max_distance)
    npairs = (
        names.join(other, cond)
        .withColumn("distance", dist)
        .filter((F.col("distance") >= 0) & (F.col("distance") <= max_distance))
        .select(*blocks, "name_a", "name_b", "distance")
    )
    # expand value pairs back to id pairs; names re-align to the id
    # order (id_a < id_b is the output contract, and name_a must be
    # id_a's name — the value-pair lexicographic order was internal)
    left = rows.select(*blocks, F.col("_rid").alias("_ida"), F.col("_rname").alias("name_a"))
    right = rows.select(
        *[F.col(c).alias(f"_r_{c}") for c in blocks],
        F.col("_rid").alias("_idb"),
        F.col("_rname").alias("_nb"),
    )
    rcond = F.col("name_b") == F.col("_nb")
    for c in blocks:
        rcond = rcond & (F.col(c) == F.col(f"_r_{c}"))
    expanded = npairs.join(left, [*blocks, "name_a"]).join(right, rcond)
    flip = F.col("_ida") > F.col("_idb")
    return expanded.select(
        F.when(flip, F.col("_idb")).otherwise(F.col("_ida")).alias("id_a"),
        F.when(flip, F.col("_ida")).otherwise(F.col("_idb")).alias("id_b"),
        F.when(flip, F.col("name_b")).otherwise(F.col("name_a")).alias("name_a"),
        F.when(flip, F.col("name_a")).otherwise(F.col("name_b")).alias("name_b"),
        F.col("distance").cast("int"),
    )
