"""Deterministic weighted sampling (Efraimidis–Spirakis A-ES) without RNG
state.

``df.sample`` draws from a seeded RNG whose stream depends on the
partitioning, so the "same" sample changes whenever the cluster shape or
file splits change. For corpus experiments ("sample 50k docs weighted by
quality, forever") the selection must be a pure function of the data.
A-ES gives exactly that: each row's key is u^(1/w) with u a uniform
derived from a content hash; the global (or per-group) top-k by key is a
weighted sample without replacement, identical on any engine and any
partitioning. Heavier rows get proportionally larger keys, so inclusion
probability follows the weights.

Engine-portable: sha256 is bit-identical everywhere; the float key is
used only for ORDERING (libm pow may differ in the last ulp across
engines — orderings are stable, exact bits are not), so callers should
not emit the key itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def aes_key(id_col: Column | str, weight_col: Column | str) -> Column:
    """The A-ES priority key u^(1/w): u in (0, 1] from the first 8 hex
    chars of sha256(id), w the row weight (must be > 0)."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = F.conv(F.substring(F.sha2(idc.cast("string"), 256), 1, 8), 16, 10).cast(
        "bigint"
    )
    u = (h + F.lit(1)).cast("double") / F.lit(4294967296.0)
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    by: str | None = None,
) -> DataFrame:
    """Top-``k`` rows by A-ES key — globally, or per ``by`` group.

    Deterministic and partitioning-independent (ties broken by id).
    Scale: the per-group form is one shuffle on ``by`` with
    WindowGroupLimit pruning to k rows per partition map-side before the
    exchange; the global form adds a single k-row reduction. The key
    column is dropped from the output (see module note on ulp
    portability).
    """
    key = aes_key(id_col, weight_col).alias("__aes_key")
    parts = [by] if by is not None else []
    win = Window.partitionBy(*parts).orderBy(
        F.desc("__aes_key"), F.asc(id_col)
    )
    return (
        df.withColumn("__aes_key", key)
        .withColumn("__aes_rk", F.row_number().over(win))
        .filter(F.col("__aes_rk") <= k)
        .drop("__aes_key", "__aes_rk")
    )


def epoch_shard_order(
    df: DataFrame, id_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Deterministic epoch shuffle: adds ``shard`` (training shard in
    [0, n_shards)) and ``pos`` (1-based order within the shard).

    Training pipelines need each epoch's data order to be (a) pseudo-
    random, (b) different per epoch, and (c) exactly reproducible for
    restarts and audits. ``orderBy(rand(seed))`` fails (c) — Spark's RNG
    stream depends on partitioning. This is instead a pure function of
    (seed, id): shard and order both derive from sha256(seed:id), so a
    new seed re-deals membership and order (the next epoch) while any
    engine, partitioning, or cluster shape reproduces the same deal.

    Scale: one shuffle on ``shard``; the within-shard sort handles
    ~N/n_shards rows per partition — pick n_shards so a shard fits an
    executor (the same sizing rule as any partitioned write). The hash
    ordering also declusters whatever locality the source had (adjacent
    ids land in different shards and far-apart positions).

    Raises when the input already has a ``shard``/``pos``/``__h`` column:
    withColumn would silently overwrite caller data otherwise.
    """
    clash = [c for c in ("shard", "pos", "__h") if c in df.columns]
    if clash:
        raise ValueError(
            f"epoch_shard_order would overwrite existing column(s) {clash}; "
            "rename or drop them before sharding"
        )
    h = F.sha2(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")), 256
    )
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    )
    win = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(win))
        .drop("__h")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Train/val/test assignment that cannot leak duplicate content across
    splits: every document's split derives from the CANONICAL id of its
    exact-dedup group (min id per sha256(text)), so all copies of a text
    land in the same split — splitting by raw doc id would put byte-
    identical near-test examples into train. Returns (id, canonical_id,
    split) with split in {'train','val','test'}.

    Deterministic on any engine/partitioning (sha-derived, like
    hash_bucket); one shuffle on the content sha (uniform key — the same
    cost profile as exact dedup) with the group min computed as a window,
    then a map-only bucket assignment. For near-dup-safe splits, feed the
    canonical ids from dedup_groups (connected components) instead.
    """
    from ..functions.text import hash_bucket

    sha = F.sha2(F.col(text_col), 256)
    canonical = F.min(id_col).over(Window.partitionBy(sha))
    b = hash_bucket(canonical, buckets)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col),
        canonical.alias("canonical_id"),
        split.alias("split"),
    )


def deterministic_negative_samples(
    candidates: DataFrame,
    positives: DataFrame,
    query_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """k hard-to-argue-with negatives per query for contrastive training:
    from ``candidates`` (query, candidate-id pairs the caller already
    blocked/filtered — NEVER an unconstrained cross join at scale; use a
    shard/ANN-bucket pre-filter), drop every (query, id) in ``positives``
    (anti-join — a positive must never leak in as a negative), then keep
    the k candidates with the smallest sha256(query:id) — a deterministic,
    seedless, engine-independent draw (same family as ``aes_key`` /
    ``hash_bucket``: re-running on any cluster, any partitioning, any
    engine reproduces the exact sample, which is what makes training
    data auditable). Returns (query, id, neg_rank 1..k).

    Scale shape: anti-join on (query, id) + one per-query top-k window
    (WindowGroupLimit pushes k below the shuffle); parallelism = query
    cardinality."""
    key = F.sha2(
        F.concat_ws(":", F.col(query_col).cast("string"), F.col(id_col).cast("string")),
        256,
    )
    neg = candidates.join(positives.select(query_col, id_col), [query_col, id_col], "left_anti")
    w = Window.partitionBy(query_col).orderBy(key, id_col)
    return (
        neg.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(query_col, id_col, F.col("neg_rank").cast("int"))
    )
