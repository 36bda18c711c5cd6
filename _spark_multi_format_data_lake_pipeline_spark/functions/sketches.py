"""Mergeable count-min sketch built from plain DataFrame ops (SURVEY.md §2
Part B LLM-data extensions; companion to the q101 HLL distinct-count
sketch).

A CMS is a depth×width counter matrix: item x increments cell
``(d, hash_d(x) mod width)`` for each of ``depth`` independent hash lanes;
the frequency estimate is the MIN over lanes of the probed cells — never
an underestimate, overestimate bounded by ~2N/width with probability
1 - 2^-depth.

Expressed relationally the matrix is just ``(d, pos) -> cnt`` rows, so
it inherits Spark's scale story for free: building is one map + one
groupBy (partial aggregation does the heavy lifting map-side), sketches
of shards MERGE by unioning and re-summing (exercised in tests), and the
whole thing stays in codegen — no UDF, no driver state. At 100 TB you
build per-day sketches incrementally and answer "how often does this
token/url/ngram appear corpus-wide" from kilobytes of counters instead
of a full scan.

Hash lanes come from ``xxhash64(value, lane)`` — engine-specific, so CMS
queries are rows-only in the oracle gate (same policy as MinHash/HLL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Sketch the multiset ``df[col]`` into ``(d, pos, cnt)`` counters.

    One exploded row per (input row × lane), then counted; the explode
    never materializes item strings — only lane structs. Output is at
    most depth*width rows regardless of input size.
    """
    lanes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias(
                    "pos"
                ),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(lanes).alias("l"))
        .groupBy(F.col("l.d").alias("d"), F.col("l.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union shard sketches into one (counters add cell-wise)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Estimated count per probe row: MIN over lanes of the probed cells.

    A missing cell means no inserted item ever hashed there, so its
    count is 0 (left join + coalesce). depth/width MUST match the build.
    """
    lanes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias(
                    "pos"
                ),
            )
            for d in range(depth)
        ]
    )
    probed = probes.select(F.col(col), F.explode(lanes).alias("l")).select(
        col, F.col("l.d").alias("d"), F.col("l.pos").alias("pos")
    )
    return (
        probed.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
