"""Distributed Lloyd k-means over an embedding column — the clustering
stage of semantic curation pipelines (SemDeDup-style cluster-then-prune,
topic balancing, IVF quantizer training at full-corpus scale).

Contrast with ``similarity.ivf_fit_centroids``: that trains on a bounded
driver-side sample (the standard IVF recipe). This module runs TRUE
distributed Lloyd iterations: each iteration is one executor-side scan
(assignment = argmin of squared distance, all JVM column math) plus one
map-side-combined shuffle of k×(dim+2) partial sums per partition. The
only driver state is the k×dim centroid matrix — at 10^9 vectors on 1000
executors each iteration moves kilobytes, never vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def squared_distance(vec_col: Column | str, centroid: list[float]) -> Column:
    """||v - c||² via zip_with — element order matches an ANSI engine's
    left-to-right list fold, so oracle twins agree to double precision."""
    carr = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(
        vec_col, carr, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(
    vec_col: Column | str, centroids: list[list[float]]
) -> tuple[Column, Column]:
    """(cluster, dist2) columns: argmin over centroids of squared distance,
    ties broken toward the lowest centroid index (array_position returns
    the FIRST occurrence of the min)."""
    dists = F.array(*[squared_distance(vec_col, c) for c in centroids])
    best = F.array_min(dists)
    cluster = (F.array_position(dists, best) - 1).cast("int")
    return cluster, best


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    init_centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 4,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Distributed Lloyd iterations; returns (assignment_df, centroids,
    inertia_per_iter).

    - ``init_centroids`` omitted → deterministic seeding from the k rows
      with the smallest ``id_col`` (reproducible across cluster shapes;
      pass ``ivf_fit_centroids`` output for k-means|| -style quality).
    - Each iteration: assignment scan → groupBy(cluster) of per-dimension
      sums (map-side combined; k×dim doubles cross the wire per
      partition) → centroid update on the driver. Empty clusters keep
      their previous centroid.
    - Inertia (sum of squared distances) rides the same aggregation, so
      convergence monitoring adds zero extra scans.

    The returned assignment frame is a fresh lazy plan over ``df`` with
    the final centroids as literals — lineage does not grow with
    ``iters``, so no checkpointing is needed.

    Rows with a null ``vec_col`` are dropped up front (a null vector has
    no distance to anything; without the filter it would surface as an
    opaque ``sse=None`` TypeError in the driver loop).
    """
    df = df.filter(F.col(vec_col).isNotNull())
    if init_centroids is None:
        rows = (
            df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
        )
        init_centroids = [[float(x) for x in r[1]] for r in rows]
    cents = [list(c) for c in init_centroids]
    dim = len(cents[0])
    inertia: list[float] = []

    for _ in range(max(iters, 0)):
        cluster, dist2 = assign_clusters(vec_col, cents)
        assigned = df.select(
            cluster.alias("cluster"),
            dist2.alias("dist2"),
            F.col(vec_col).alias("_v"),
        )
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("dist2").alias("sse"),
                *[
                    F.sum(F.element_at("_v", i + 1).cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        inertia.append(float(sum(r["sse"] for r in stats)))
        for r in stats:
            c = r["cluster"]
            if r["n"] > 0 and 0 <= c < len(cents):
                cents[c] = [r[f"s{i}"] / r["n"] for i in range(dim)]

    cluster, dist2 = assign_clusters(vec_col, cents)
    out = df.withColumn("cluster", cluster).withColumn("dist2", dist2)
    return out, cents, inertia
