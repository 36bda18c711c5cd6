"""Distributed Lloyd k-means (llm/clustering.py): convergence, empty-cluster
handling, deterministic seeding, and tie-break semantics. Driver parity for
the assignment pass is q150 (tools/check.py)."""

from __future__ import annotations

import pytest

from _spark_multi_format_data_lake_pipeline_spark.llm.clustering import (
    assign_clusters,
    kmeans_lloyd,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_inertia_monotonically_nonincreasing(spark, sf_dir):
    from pyspark.sql import functions as F
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    _, cents, inertia = kmeans_lloyd(emb, k=4, iters=4)
    assert len(inertia) == 4 and len(cents) == 4
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9), f"inertia rose: {inertia}"


def test_recovers_planted_blobs(spark):
    # two tight blobs far apart; k=2 from the first two points (one per blob)
    blob_a = [[0.0 + d, 0.0] for d in (0, 0.1, -0.1, 0.05)]
    blob_b = [[10.0 + d, 10.0] for d in (0, 0.1, -0.1, 0.05)]
    df = _vec_df(spark, [blob_a[0], blob_b[0]] + blob_a[1:] + blob_b[1:])
    out, cents, inertia = kmeans_lloyd(df, k=2, iters=3)
    rows = {r.vec_id: r.cluster for r in out.collect()}
    a_ids = {0, 2, 3, 4}
    b_ids = {1, 5, 6, 7}
    assert len({rows[i] for i in a_ids}) == 1
    assert len({rows[i] for i in b_ids}) == 1
    assert rows[0] != rows[1]
    # centroids land on the blob means
    assert cents[rows[0]][0] == pytest.approx(0.0125, abs=1e-9)
    assert cents[rows[1]][0] == pytest.approx(10.0125, abs=1e-9)
    # converged: final inertia is the within-blob variance, tiny vs start
    assert inertia[-1] < 0.1


def test_empty_cluster_keeps_previous_centroid(spark):
    # 3 seeds but only 2 distinct point masses -> one cluster starves;
    # its centroid must survive (not NaN / not dropped).
    df = _vec_df(spark, [[0.0, 0.0], [0.0, 0.1], [5.0, 5.0], [9.9, 9.9], [10.0, 10.0]])
    seeds = [[0.0, 0.0], [10.0, 10.0], [100.0, 100.0]]
    out, cents, _ = kmeans_lloyd(df, init_centroids=seeds, iters=2)
    assert cents[2] == [100.0, 100.0]
    assert len(cents) == 3
    clusters = {r.cluster for r in out.collect()}
    assert 2 not in clusters


def test_tie_breaks_toward_lowest_centroid_index(spark):
    df = _vec_df(spark, [[1.0, 1.0]])
    cluster, dist2 = assign_clusters("embedding", [[3.0, 3.0], [3.0, 3.0]])
    row = df.select(cluster.alias("c"), dist2.alias("d")).collect()[0]
    assert row.c == 0  # equal distances -> first centroid wins
    assert row.d == pytest.approx(8.0)


def test_deterministic_seeding_orders_by_id(spark):
    # seeding must take the k lowest ids regardless of row order
    vecs = [[9.0, 9.0], [1.0, 1.0], [5.0, 5.0]]
    df = _vec_df(spark, vecs).orderBy("embedding")  # scrambled physical order
    _, cents, _ = kmeans_lloyd(df, k=2, iters=0)
    assert cents == [[9.0, 9.0], [1.0, 1.0]]  # vec_id 0 and 1
