"""Similarity search over embedding columns (SURVEY.md §2 Part B
"Similarity search": brute-force cosine top-k baseline + LSH-bucketed
scale path).

Scale design
------------
- ``topk_cosine``: a map stage (JVM-side cosine per row) + TakeOrdered —
  no shuffle at all. The right baseline for one query vector over any SF:
  on a 1000-executor cluster this is a single pass over the embedding
  table with a k-row result.
- ``lsh_bucket_bits``: random-hyperplane signatures. Partition the table by
  bucket once (a single shuffle, amortized over all queries), then a query
  probes only its own bucket — the classic recall/cost dial. Hyperplanes
  are seeded-deterministic so bucketing is reproducible.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def topk_cosine(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_col: str = "cosine_sim",
) -> DataFrame:
    """Exact top-k by cosine similarity against one query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q)
    return (
        embeddings.select(F.col(id_col), F.round(sim, 4).alias(sim_col))
        .orderBy(F.col(sim_col).desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_bits(
    vec_col: Column | str, dim: int, n_planes: int = 8, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^n_planes)).

    Sign of <v, h_i> per plane, packed to an int. Pure higher-order
    built-ins; vectors never leave the JVM.

    Fails loudly when a vector's length differs from ``dim``: zip_with
    would otherwise null-pad the shorter side, the dot product would go
    NULL, every sign test would be false, and ALL rows would silently
    land in bucket 0 — turning the LSH equi-join into an all-pairs join.

    NULL vectors also fail loudly (reported as "NULL-dim") rather than
    landing in bucket 0 as they did before the guard existed: a null
    embedding in an LSH join is a data-quality bug upstream, and bucket 0
    would silently cross-join every null row. ``F.size(NULL)`` is NULL,
    so both the condition and the message coalesce the size to keep the
    error readable instead of raise_error(NULL).
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        pcol = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, pcol, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    sz = F.coalesce(F.size(vec), F.lit(-1))
    return F.when(sz == F.lit(dim), bucket).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_bucket_bits: expected {dim}-dim vectors, got "),
                F.when(sz == -1, F.lit("NULL")).otherwise(sz.cast("string")),
                F.lit("-dim; all rows would degenerate into LSH bucket 0"),
            )
        )
    )


def _hyperplanes_int(
    dim: int, n_planes: int, seed: int = 42, scale: int = 1000
) -> list[list[int]]:
    """The lsh_bucket_bits hyperplanes quantized to integers (driver-side,
    exact) so dot products can be all-integer arithmetic."""
    return [
        [round(x * scale) for x in p] for p in _hyperplanes(dim, n_planes, seed)
    ]


def lsh_bucket_bits_exact(
    vec_col: Column | str,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    scale: int = 1000,
) -> Column:
    """Bit-identical-on-any-engine LSH bucket id: quantize the vector to
    integers (floor(x*scale)) and use integer-quantized hyperplanes, so
    every dot product is exact integer arithmetic — no FP summation-order
    ambiguity between engines, which is what keeps the float version
    (lsh_bucket_bits) out of the oracle gate. Buckets can differ from the
    float version only for vectors whose hyperplane margin is below the
    quantization error (~1/scale); recall/precision behavior is the same.

    Products stay < 2^53, so the math is exact even for an engine that
    accumulates in doubles (DuckDB's list_dot_product) — the q137 oracle
    relies on that. Same loud failure as lsh_bucket_bits on dim mismatch
    or NULL vectors.
    """
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    qv = F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("bigint")
    )
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(_hyperplanes_int(dim, n_planes, seed, scale)):
        pcol = F.array(*[F.lit(int(x)).cast("bigint") for x in plane])
        d = F.aggregate(
            F.zip_with(qv, pcol, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    sz = F.coalesce(F.size(vec), F.lit(-1))
    return F.when(sz == F.lit(dim), bucket).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"lsh_bucket_bits_exact: expected {dim}-dim vectors, got "),
                F.when(sz == -1, F.lit("NULL")).otherwise(sz.cast("string")),
                F.lit("-dim"),
            )
        )
    )


def ann_search_bucketed(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: rescore only vectors sharing the query's LSH
    bucket. Recall < 1 by design; use multiple probe tables (different
    seeds) to trade cost for recall."""
    # query bucket computed driver-side (it's one vector)
    bucket = 0
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        if sum(a * b for a, b in zip(query_vec, plane)) > 0:
            bucket |= 1 << i

    bucketed = embeddings.withColumn(
        "_bucket", lsh_bucket_bits(F.col(vec_col), dim, n_planes, seed)
    )
    return topk_cosine(
        bucketed.filter(F.col("_bucket") == F.lit(bucket)),
        query_vec,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cluster-probe search
# ---------------------------------------------------------------------------

def ivf_fit_centroids(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
) -> list[list[float]]:
    """Train the coarse quantizer on a bounded driver-side sample.

    Sampling + tiny k-means is the standard IVF training recipe (the
    quantizer needs only thousands of examples regardless of corpus size);
    the full table never leaves the executors.
    """
    import numpy as np

    rows = (
        embeddings.select(vec_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_size)
        .collect()
    )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def ivf_assign(vec_col: Column | str, centroids: list[list[float]]) -> Column:
    """Cluster id = argmin L2 distance to the centroids, computed with
    per-centroid dot products JVM-side (||v-c||² = ||v||² - 2<v,c> + ||c||²
    and ||v||² is constant per row, so argmin of (||c||² - 2<v,c>))."""
    scores = []
    for c in centroids:
        ccol = F.array(*[F.lit(x) for x in c])
        dotp = F.aggregate(
            F.zip_with(vec_col, ccol, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        norm2 = sum(x * x for x in c)
        scores.append(F.lit(norm2) - 2.0 * dotp)
    arr = F.array(*scores)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


def ivf_search(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe clusters nearest the query, rescore exactly within
    them. nprobe == n_clusters degrades gracefully to exact search."""
    import numpy as np

    q = np.array(query_vec, dtype=np.float64)
    cents = np.array(centroids, dtype=np.float64)
    d = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]

    assigned = embeddings.withColumn("_cluster", ivf_assign(F.col(vec_col), centroids))
    cand = assigned.filter(F.col("_cluster").isin(probe))
    return topk_cosine(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs (SURVEY.md §2 Part B "Deduplication":
# embedding-cosine near-dup — the semantic-dedup sibling of MinHash)
# ---------------------------------------------------------------------------

def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup detection: (id_a, id_b) for every
    pair with cosine >= threshold, id_a < id_b.

    O(n²) by construction — the verification rescorer for a bounded
    window or for candidates produced by ``cosine_near_dup_pairs_lsh``,
    same division of labor as exact n-gram Jaccard vs MinHash. The
    stream side is repartitioned: a small filtered input collapses to one
    partition and would serialize every comparison.
    """
    base = embeddings.select(F.col(id_col), F.col(vec_col))
    a = base.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism
    ).alias("a")
    b = base.alias("b")
    sim = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(sim >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )


def cosine_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Scale path: candidates are pairs sharing a random-hyperplane LSH
    bucket (equi-join on the bucket id — a hash shuffle, never all-pairs),
    exact-rescored by cosine. Precision is exact (every emitted pair
    really clears the threshold); recall < 1 when a near-dup pair straddles
    a hyperplane. At 100 TB the bucket id becomes a persisted partition
    column and candidate cost is Σ|bucket|², as with MinHash banding.
    """
    bucketed = embeddings.select(F.col(id_col), F.col(vec_col)).withColumn(
        "_bucket", lsh_bucket_bits(F.col(vec_col), dim, n_planes, seed)
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(sim >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )


def cosine_incremental_filter(
    corpus: DataFrame,
    new: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Semantic incremental dedup: the rows of ``new`` with NO embedding in
    ``corpus`` at cosine >= threshold — the admission filter a training
    pipeline runs on every incoming crawl batch.

    With ``dim`` set, candidates come from an LSH-bucket equi-join (cost
    scales with |new| + bucket collisions, not |corpus| — the corpus side
    is pre-bucketed once and at 100 TB lives partitioned by bucket id, so
    only matching partitions are even read). With ``dim=None`` the
    comparison is exact (nested-loop vs the full corpus) — the bounded
    verification twin, same division of labor as q87's text version.
    """
    new_side = new.select(F.col(id_col), F.col(vec_col))
    corpus_side = corpus.select(
        F.col(id_col).alias("_c_id"), F.col(vec_col).alias("_c_vec")
    )
    # spread the probe side: a small batch collapses to one partition and
    # would serialize every comparison (see q75)
    new_side = new_side.repartition(
        new.sparkSession.sparkContext.defaultParallelism
    )
    if dim is not None:
        new_side = new_side.withColumn(
            "_bucket", lsh_bucket_bits(F.col(vec_col), dim, n_planes, seed)
        )
        corpus_side = corpus_side.withColumn(
            "_bucket", lsh_bucket_bits(F.col("_c_vec"), dim, n_planes, seed)
        )
        cand = new_side.join(corpus_side, "_bucket")
    else:
        cand = new_side.crossJoin(corpus_side)
    sim = cosine_similarity(F.col(vec_col), F.col("_c_vec"))
    dup_ids = (
        cand.filter(sim >= threshold)
        .select(F.col(id_col))
        .distinct()
    )
    return new.select(id_col).join(dup_ids, id_col, "left_anti")


def ann_search_multiprobe(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-probe LSH: search the query's bucket plus the buckets whose
    codes differ on the hyperplanes the query is CLOSEST to (those sign
    bits are the likeliest to flip for true neighbors). Standard recall
    lift at the cost of probing n_probes buckets instead of one — still a
    tiny fraction of the corpus vs brute force."""
    planes = _hyperplanes(dim, n_planes, seed)
    margins = []
    bucket = 0
    for i, plane in enumerate(planes):
        d = sum(a * b for a, b in zip(query_vec, plane))
        if d > 0:
            bucket |= 1 << i
        margins.append((abs(d), i))

    probes = [bucket]
    for _, i in sorted(margins):  # nearest hyperplanes first
        if len(probes) >= n_probes:
            break
        probes.append(bucket ^ (1 << i))

    bucketed = embeddings.withColumn(
        "_bucket", lsh_bucket_bits(F.col(vec_col), dim, n_planes, seed)
    )
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return topk_cosine(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def mmr_rerank(
    embeddings: DataFrame,
    query_id: int,
    lo: int,
    hi: int,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k over the candidate
    window ``lo <= id <= hi`` against the ``query_id`` vector:

        pick_1 = argmax rel(c)
        pick_i = argmax  lam*rel(c) - mu*max_{p in picked} sim(c, p)

    ``mu`` is an explicit weight rather than computed ``1 - lam``: the
    IEEE double ``1 - 0.7`` is 0.30000000000000004, not the literal 0.3
    a SQL twin would use, and the greedy must be bit-reproducible.

    ties broken by lowest id. Relevance and the candidate pairwise-sim
    matrix are computed JVM-side (``functions/vectors.py`` cosine — the
    same expression the q56/q128 oracles hash-match) and ROUNDED TO 6
    DECIMALS before the greedy: sub-1e-6 cross-engine float drift then
    cannot flip an argmax, which is what makes the q176 recursive-CTE
    oracle exactly reproducible. The greedy itself runs driver-side over
    the collected candidate set — bounded by construction (a rerank head
    is ≤ a few hundred rows; the SCALE path is the LSH/IVF candidate
    pruning that produced the window, q58/q73), the same division of
    labor as the bounded exact rescorers q53/q57.

    Returns (rank, id) with rank 1..k in selection order.
    """
    from ..functions.vectors import cosine_similarity

    from ..functions.vectors import l2_norm

    qrow = embeddings.filter(F.col(id_col) == query_id).head()
    if qrow is None:
        raise ValueError(f"query vector {id_col}={query_id} not found")
    if not any(float(x) != 0.0 for x in qrow[vec_col]):
        raise ValueError(f"query vector {id_col}={query_id} has zero norm")
    qarr = F.array(*[F.lit(float(x)) for x in qrow[vec_col]])

    # zero-norm candidates make cosine 0/0 — under ANSI that is an opaque
    # DIVIDE_BY_ZERO mid-job, under non-ANSI a NULL that silently diverges
    # from the oracle's NULLS LAST ordering; pre-check and name the ids
    zero_ids = [
        r[id_col]
        for r in embeddings.filter(
            (F.col(id_col) >= lo) & (F.col(id_col) <= hi) & (l2_norm(F.col(vec_col)) == 0)
        )
        .select(id_col)
        .collect()
    ]
    if zero_ids:
        raise ValueError(
            f"mmr_rerank: zero-norm embeddings in candidate window: {sorted(zero_ids)}; "
            "filter them out first"
        )

    cand = embeddings.filter(
        (F.col(id_col) >= lo) & (F.col(id_col) <= hi)
    ).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), qarr), 6).alias("rel"),
        F.col(vec_col),
    )
    base = cand.select(F.col(id_col), F.col(vec_col))
    a = base.select(F.col(id_col).alias("ia"), F.col(vec_col).alias("va"))
    b = base.select(F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"))
    # ia < ib: cosine is symmetric, so compute each pair once JVM-side
    # and mirror the dict driver-side — halves the n(n-1) expression work
    pair_sims = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("s"),
        )
        .collect()
    )
    rel = {r[id_col]: r["rel"] for r in cand.select(id_col, "rel").collect()}
    sim: dict = {}
    for r in pair_sims:
        sim[(r["ia"], r["ib"])] = r["s"]
        sim[(r["ib"], r["ia"])] = r["s"]

    # a zero-norm vector makes cosine NULL (0/0) — fail with the cause
    # rather than an opaque NoneType error mid-greedy, and rather than
    # silently diverging from the oracle's NULLS LAST ordering
    bad_rel = sorted(c for c, v in rel.items() if v is None)
    bad_sim = sorted({i for (i, j), v in sim.items() if v is None})
    if bad_rel or bad_sim:
        raise ValueError(
            "mmr_rerank: zero-norm or invalid embeddings make cosine NULL "
            f"(rel NULL for ids {bad_rel}, pair-sim NULL involving ids "
            f"{bad_sim}); filter them out of the candidate window first"
        )

    picked: list = []
    remaining = set(rel)
    while remaining and len(picked) < k:
        if not picked:
            # DESC by rel, ties by lowest id
            nxt = min(remaining, key=lambda c: (-rel[c], c))
        else:
            nxt = min(
                remaining,
                key=lambda c: (
                    -(lam * rel[c] - mu * max(sim[(c, p)] for p in picked)),
                    c,
                ),
            )
        picked.append(nxt)
        remaining.discard(nxt)

    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(picked)], f"rank bigint, {id_col} bigint"
    )


def semantic_dedup_drop_list(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster, then near-dup ONLY within
    each cluster. Returns the DROP list — one row per discarded vector:
    (id, cluster, keeper_id, keeper_cos), where ``keeper_id`` is the
    lowest-id same-cluster neighbor with cosine >= threshold (the copy
    that survives) and ``keeper_cos`` its similarity, rounded 6.

    This is the composition q150 (k-means assignment) and q128 (cosine
    near-dup) exist for: assignment is one scan of JVM column math; the
    pair join is keyed by cluster id, so candidate cost is Σ|cluster|²
    instead of the all-pairs n² — with k clusters of balanced size
    that's a k× reduction, and at 100 TB the cluster id becomes a
    persisted partition column so each cluster's pair join runs
    co-located (SCALING.md economics, same as LSH buckets). Keep-lowest
    is the same deterministic survivor rule as exact dedup (q50).
    """
    from .clustering import assign_clusters

    cluster, _ = assign_clusters(vec_col, centroids)
    assigned = embeddings.select(
        F.col(id_col), F.col(vec_col), cluster.alias("cluster")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    pairs = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
        )
        .filter(sim >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id"),
            F.col("a.cluster").alias("cluster"),
            F.col(f"b.{id_col}").alias("nid"),
            F.round(sim, 6).alias("cos"),
        )
    )
    return pairs.groupBy("id", "cluster").agg(
        F.min("nid").cast("bigint").alias("keeper_id"),
        F.min_by("cos", "nid").alias("keeper_cos"),
    )
