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

Hash lanes come from ``xxhash64(value, lane)`` by default — engine-specific,
so those CMS queries are rows-only in the oracle gate (same policy as
MinHash/HLL). ``lane="sha256"`` swaps in a sha2-derived lane that DuckDB can
recompute hex-for-hex (the q134 epoch-shuffle pattern), which is how the
q135 twin gets the whole counter matrix hash-checked cross-engine; xxhash64
stays the default because it is one JVM intrinsic per lane vs sha256's hex
round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lane_pos(col: str, d: int, width: int, lane: str) -> Column:
    """Counter position of ``col`` in hash lane ``d``."""
    if lane == "xxhash64":
        return F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width))
    if lane == "sha256":
        # first 8 hex chars of sha256("{d}:{value}") — reproducible as
        # CAST(('0x' || substr(sha256(d || ':' || v), 1, 8)) AS BIGINT) in
        # ANSI SQL, so an oracle can rebuild identical counters
        return F.pmod(
            F.conv(
                F.substring(
                    F.sha2(F.concat(F.lit(f"{d}:"), F.col(col)), 256), 1, 8
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(width),
        )
    raise ValueError(f"unknown CMS lane hash {lane!r}")


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 8192,
    lane: str = "xxhash64",
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
                _lane_pos(col, d, width, lane).alias("pos"),
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
    lane: str = "xxhash64",
) -> DataFrame:
    """Estimated count per probe row: MIN over lanes of the probed cells.

    A missing cell means no inserted item ever hashed there, so its
    count is 0 (left join + coalesce). depth/width/lane MUST match the
    build.
    """
    lanes = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                _lane_pos(col, d, width, lane).alias("pos"),
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


# ---------------------------------------------------------------------------
# Explicit HLL register table (oracle-checkable twin of hll_sketch_agg)
# ---------------------------------------------------------------------------
#
# Spark's hll_sketch_agg (q101) emits a datasketches binary no other engine
# can parse, so the driver can only row-count it. These functions build the
# SAME sketch structure as plain rows: hash each value with sha256 (hex
# prefix → 32-bit int, the q134 cross-engine pattern), low p bits pick a
# register, rho = leading-zero count of the remaining (32-p)-bit suffix + 1
# (computed as (32-p+1) - length(bin(w)) — bin() exists in both Spark and
# DuckDB and length(bin(w)) == floor(log2(w)) + 1 exactly, no FP), and a
# register table is just groupBy(bucket).max(rho). Partials merge by MAX —
# the identical mergeability story as the binary sketch, but every
# intermediate is an integer row an oracle can rebuild.


def hll_register_partials(
    df: DataFrame, col: str, partial_col: Column | str, p: int = 6
) -> DataFrame:
    """Per-partition HLL registers: (partial, bucket, rho) with one row per
    (partial value, non-empty register). ``partial_col`` is the shard key
    (a day, a file, a batch id); at 100 TB each ingest increment computes
    its own partials and history is never rescanned."""
    nbits = 32 - p
    h = F.conv(
        F.substring(F.sha2(F.col(col).cast("string"), 256), 1, 8), 16, 10
    ).cast("bigint")
    bucket = F.pmod(h, F.lit(1 << p)).cast("int")
    w = F.floor(h / F.lit(1 << p)).cast("bigint")
    rho = (
        F.when(w > 0, F.lit(nbits + 1) - F.length(F.bin(w)))
        .otherwise(F.lit(nbits + 1))
        .cast("int")
    )
    part = F.col(partial_col) if isinstance(partial_col, str) else partial_col
    return (
        df.select(part.alias("partial"), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("partial", "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_registers(partials: DataFrame) -> DataFrame:
    """Union partial register tables into one: registers merge by MAX."""
    return partials.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_registers(register_rows, p: int = 6) -> float:
    """Driver-side estimate from a collected register table (tests only):
    standard HLL harmonic mean with the small-range linear-counting
    correction. The distributed path keeps registers as rows; estimation
    is O(m) and belongs wherever the answer is consumed."""
    import math

    m = 1 << p
    regs = [0] * m
    for r in register_rows:
        regs[r["bucket"]] = max(regs[r["bucket"]], r["rho"])
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / sum(2.0 ** -x for x in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw
