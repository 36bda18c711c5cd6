"""ANN variants: IVF recall behavior and LSH bucket sanity."""

from __future__ import annotations

from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import (
    ann_search_bucketed,
    ivf_fit_centroids,
    ivf_search,
    topk_cosine,
)


def _query_vec(spark, sf_dir):
    import pyspark.sql.functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb, list(emb.filter(F.col("vec_id") == 0).head()[1])


def test_ivf_full_probe_equals_exact(spark, sf_dir):
    emb, q = _query_vec(spark, sf_dir)
    cents = ivf_fit_centroids(emb, n_clusters=8, sample_size=256, iters=4)
    exact = [r.vec_id for r in topk_cosine(emb, q, k=10).collect()]
    full = [r.vec_id for r in ivf_search(emb, q, cents, k=10, nprobe=8).collect()]
    assert full == exact  # probing every cluster degrades to exact search


def test_ivf_partial_probe_recall(spark, sf_dir):
    emb, q = _query_vec(spark, sf_dir)
    cents = ivf_fit_centroids(emb, n_clusters=8, sample_size=256, iters=4)
    exact = {r.vec_id for r in topk_cosine(emb, q, k=10).collect()}
    approx = [r.vec_id for r in ivf_search(emb, q, cents, k=10, nprobe=4).collect()]
    assert len(approx) == 10
    # query's own vector lives in a probed cluster by construction
    assert 0 in approx
    recall = len(set(approx) & exact) / 10
    assert recall >= 0.3, f"recall collapsed: {recall}"


def test_lsh_bucket_returns_neighbors(spark, sf_dir):
    emb, q = _query_vec(spark, sf_dir)
    got = ann_search_bucketed(emb, q, dim=len(q), k=10)
    rows = got.collect()
    assert 1 <= len(rows) <= 10
    assert rows[0].vec_id == 0  # the query vector itself is its top hit


def test_lsh_bucket_dim_mismatch_fails_loudly(spark, sf_dir):
    """A dim mismatch must raise, not silently send every row to bucket 0
    (which would turn the LSH equi-join into an all-pairs join)."""
    import pytest
    from pyspark.sql import functions as F

    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import lsh_bucket_bits

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bad = emb.withColumn("_bucket", lsh_bucket_bits(F.col("embedding"), dim=32))
    with pytest.raises(Exception, match="expected 32-dim"):
        bad.collect()


def test_lsh_bucket_null_vector_fails_with_readable_error(spark, sf_dir):
    """F.size(NULL) is NULL: without the coalesce both the guard condition
    and the error message would go NULL, raising an opaque null error (and
    before the guard existed, null embeddings silently landed in bucket 0)."""
    import pytest
    from pyspark.sql import functions as F

    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import lsh_bucket_bits

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(5)
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 2 == 0, F.col("embedding")),
        )
    )
    dim = len(emb.filter(F.col("embedding").isNotNull()).first().embedding)
    bad = emb.withColumn("_bucket", lsh_bucket_bits(F.col("embedding"), dim=dim))
    with pytest.raises(Exception, match="NULL-dim"):
        bad.collect()


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import ann_search_multiprobe

    emb, q = _query_vec(spark, sf_dir)
    exact = {r.vec_id for r in topk_cosine(emb, q, k=10).collect()}
    single = {r.vec_id for r in ann_search_bucketed(emb, q, dim=len(q), k=10).collect()}
    multi = {
        r.vec_id
        for r in ann_search_multiprobe(emb, q, dim=len(q), k=10, n_probes=4).collect()
    }
    assert single <= multi or len(multi & exact) >= len(single & exact)
    assert 0 in multi


def test_cosine_near_dup_exact_finds_planted_pairs(spark, sf_dir):
    """Exact cosine near-dup on a planted corpus: each of the 50 base
    vectors pairs with exactly its perturbed twin (id + 10000)."""
    from _spark_multi_format_data_lake_pipeline_spark.queries.llm import _planted_embedding_corpus
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import cosine_near_dup_pairs

    corpus = _planted_embedding_corpus(spark, sf_dir)
    pairs = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(corpus, threshold=0.9).collect()
    }
    assert pairs == {(i, i + 10000) for i in range(50)}


def test_cosine_near_dup_lsh_precision_and_recall(spark, sf_dir):
    """LSH candidates rescored exactly: precision must be 1 (every emitted
    pair is a true near-dup); recall < 1 only from bucket straddling, and
    must stay reasonable on the planted corpus."""
    from _spark_multi_format_data_lake_pipeline_spark.queries.llm import _planted_embedding_corpus
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )

    corpus = _planted_embedding_corpus(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(corpus, threshold=0.9).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs_lsh(corpus, threshold=0.9, dim=64).collect()
    }
    assert approx <= exact  # precision = 1 by construction (exact rescore)
    assert len(approx) / len(exact) >= 0.8  # deterministic: 43/50 at seed 42


def test_cosine_incremental_exact_admits_only_fresh(spark, sf_dir):
    """Exact incremental filter: every planted dup rejected, every fresh
    vector admitted."""
    from _spark_multi_format_data_lake_pipeline_spark.queries.llm import _incremental_batches
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import cosine_incremental_filter

    corpus, new = _incremental_batches(spark, sf_dir)
    kept = {r.vec_id for r in cosine_incremental_filter(corpus, new, threshold=0.9).collect()}
    assert kept == set(range(100, 125))


def test_cosine_incremental_lsh_never_rejects_fresh(spark, sf_dir):
    """LSH path errs only toward admission: exact-kept ⊆ lsh-kept (a
    straddled dup may slip in; a fresh vector can never be rejected,
    since rejection requires a true >= threshold match in the bucket)."""
    from _spark_multi_format_data_lake_pipeline_spark.queries.llm import _incremental_batches
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import cosine_incremental_filter

    corpus, new = _incremental_batches(spark, sf_dir)
    exact = {r.vec_id for r in cosine_incremental_filter(corpus, new, threshold=0.9).collect()}
    lsh = {r.vec_id for r in cosine_incremental_filter(corpus, new, threshold=0.9, dim=64).collect()}
    assert exact <= lsh
    assert set(range(100, 125)) <= lsh
    # the dial still catches most planted dups (deterministic at seed 42)
    missed_dups = len(lsh) - len(exact)
    assert missed_dups <= 10


def test_lsh_exact_twin_mostly_agrees_with_float_buckets(spark, sf_dir):
    """lsh_bucket_bits_exact (q137) quantizes the same seeded hyperplanes;
    buckets may differ from the float path only for vectors with a
    hyperplane margin below the quantization error, so agreement should
    be near-total on real embeddings."""
    from pyspark.sql import functions as F

    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import (
        lsh_bucket_bits,
        lsh_bucket_bits_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    both = emb.select(
        lsh_bucket_bits(F.col("embedding"), dim=64).alias("f"),
        lsh_bucket_bits_exact(F.col("embedding"), dim=64).alias("i"),
    )
    n = both.count()
    agree = both.filter(F.col("f") == F.col("i")).count()
    assert agree / n > 0.9, (agree, n)


def test_ivf_assign_twin_centroids_map_to_themselves(spark, sf_dir):
    """q138 invariant: a vector that IS a centroid has distance 0 to
    itself, so it must be assigned its own cluster index."""
    from pyspark.sql import functions as F

    from _spark_multi_format_data_lake_pipeline_spark.queries.registry import QUERIES

    out = QUERIES["q138_ivf_assign_twin"].fn(spark, sf_dir)
    cents = sorted(
        r.vec_id for r in out.filter(F.col("vec_id") % 37 == 0).collect()
    )
    got = {
        r.vec_id: r.cluster
        for r in out.filter(F.col("vec_id") % 37 == 0).collect()
    }
    for idx, vid in enumerate(cents):
        assert got[vid] == idx, (vid, idx, got[vid])


def test_semdedup_drops_planted_twins_within_cluster(spark):
    """Planted near-identical twins are dropped in favor of their
    lower-id base (keep-lowest survivor rule), distant vectors survive,
    and the pair search never crosses cluster boundaries."""
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import semantic_dedup_drop_list

    # two tight groups far apart + one twin per group
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [1.001, 0.01, 0.0]),   # twin of 0
        (11, [0.01, 1.001, 0.0]),   # twin of 1
        (20, [0.7, 0.7, 0.1]),      # between, but closest to neither twin pair
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    out = {
        r["id"]: (r["cluster"], r["keeper_id"])
        for r in semantic_dedup_drop_list(df, cents, threshold=0.95).collect()
    }
    assert out[10] == (0, 0) and out[11] == (1, 1)
    assert 0 not in out and 1 not in out  # bases survive
    assert 20 not in out  # not similar enough to anything in its cluster
