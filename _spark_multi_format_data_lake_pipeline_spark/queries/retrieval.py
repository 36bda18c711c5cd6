"""Retrieval & corpus-modeling queries (round-5 additions): BM25 ranking,
within-corpus duplicate-span detection, temperature-scaled domain mixture
weights, bigram-LM surprisal scoring, and distributed k-means assignment.

These extend the training-data-pipeline surface beyond the reference
(whose aggregation surface is ``df.count()`` — SURVEY.md §2 A.4): a user
curating a 100 TB corpus needs retrieval scoring for eval-set mining,
substring-level dup pressure per document, mixture weights for data
balancing, an n-gram LM signal for perplexity-style filtering, and
semantic clustering for SemDeDup-style prune-per-cluster curation.

Operator implementations live in ``llm/retrieval.py`` and
``llm/clustering.py``; every query here is fully oracle-paired
(deterministic math, sha256-keyed shingles, explicit rounding +
tie-breaks) — no rows-only entries. Differential property tests against
pure-Python references: tests/test_retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.retrieval import (
    _tokens,
    bigram_surprisal,
    bm25_topk,
    domain_mixture,
    duplicate_span_stats,
)
from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q146 — BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")


@register(
    "q146_bm25_topk",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    words AS (
        SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks
    ),
    tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM words WHERE term IN ('spark', 'hash', 'window')
        GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(w)) AS avgdl FROM toks),
    scored AS (
        SELECT tf.doc_id,
               SUM(LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(s, 4) AS bm25_score
    FROM scored
    ORDER BY ROUND(s, 4) DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 (Lucene idf, k1=1.2, b=0.75) top-20 for a fixed 3-term query "
        "via llm/retrieval.py::bm25_topk. Scale shape: term filter before "
        "the tf groupBy, doc length rides the explode, df/stats broadcast, "
        "TakeOrdered top-k; ties break by doc_id after 4-decimal rounding "
        "so the cut is deterministic across engines.",
)
def q146_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=20)


# ---------------------------------------------------------------------------
# q147 — within-corpus duplicate-span fraction (Lee et al. style signal)
# ---------------------------------------------------------------------------

@register(
    "q147_duplicate_spans",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, sha256(array_to_string(w[i:i+7], ' ')) AS g
        FROM toks, unnest(generate_series(1, len(w) - 7)) AS t(i)
        WHERE len(w) >= 8
    ),
    ds AS (SELECT DISTINCT doc_id, g FROM sh),
    freq AS (SELECT g, COUNT(*) AS nd FROM ds GROUP BY g)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
           ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
               AS dup_frac
    FROM ds JOIN freq USING (g)
    GROUP BY doc_id
    """,
    doc="Per-document duplicated-span pressure via llm/retrieval.py::"
        "duplicate_span_stats: fraction of a doc's distinct 8-gram "
        "shingles that also appear in at least one other document (the "
        "exact-substring dedup signal from 'Deduplicating Training Data "
        "Makes Language Models Better'). posexplode→lead() shingles reduce "
        "straight to sha256 — fixed-width uniform shuffle keys throughout.",
)
def q147_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_span_stats(_t(spark, sf_dir, "documents"), n=8)


# ---------------------------------------------------------------------------
# q148 — temperature-scaled domain mixture weights
# ---------------------------------------------------------------------------

@register(
    "q148_domain_mixture",
    oracle=r"""
    WITH g AS (
        SELECT source, lang,
               COUNT(*) AS n_docs,
               SUM(len(string_split_regex(TRIM(text), '\s+'))) AS toks
        FROM documents
        GROUP BY source, lang
    )
    SELECT source, lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(toks AS BIGINT) AS n_tokens,
           ROUND(toks::DOUBLE / SUM(toks) OVER (), 6) AS token_share,
           ROUND(SQRT(toks) / SUM(SQRT(toks)) OVER (), 6) AS mixture_weight
    FROM g
    """,
    doc="Data-mixing weights per (source, lang) domain via llm/retrieval"
        ".py::domain_mixture: raw token share and the temperature-scaled "
        "sampling weight w_i ∝ share_i^0.5 (alpha=0.5 upweights rare "
        "domains). One shuffle to the domain grain; the normalizing window "
        "runs over the O(#domains) table.",
)
def q148_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mixture(_t(spark, sf_dir, "documents"), alpha=0.5)


# ---------------------------------------------------------------------------
# q149 — bigram-LM surprisal (perplexity-style quality signal)
# ---------------------------------------------------------------------------

@register(
    "q149_bigram_surprisal",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    pairs AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
    words AS (SELECT unnest(w) AS word FROM toks),
    uni AS (SELECT word, COUNT(*) AS c1 FROM words GROUP BY word),
    v AS (SELECT COUNT(DISTINCT word) AS vocab FROM words)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN((c12 + 1.0) / (c1 + vocab))), 4) AS avg_bigram_surprisal
    FROM pairs
    JOIN big USING (w1, w2)
    JOIN uni ON pairs.w1 = uni.word
    CROSS JOIN v
    GROUP BY doc_id
    """,
    doc="Average add-1-smoothed bigram negative logprob per document under "
        "the corpus's own bigram model (llm/retrieval.py::bigram_surprisal) "
        "— the next step up from q86's unigram surprisal for perplexity-"
        "based quality filtering. posexplode→lead(1) bigrams; gram-keyed "
        "count tables with map-side partials; vocab as a 1-row broadcast.",
)
def q149_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_surprisal(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q150 — distributed k-means assignment (semantic clustering for curation)
# ---------------------------------------------------------------------------

@register(
    "q150_kmeans_assign",
    oracle=r"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < 4),
    d AS (
        SELECT emb.vec_id, cents.cid,
               list_sum(list_transform(list_zip(emb.v, cents.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
        FROM emb CROSS JOIN cents
    ),
    a AS (
        SELECT vec_id, cid, dist2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d
    )
    SELECT cid AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(SUM(dist2), 3) AS sse
    FROM a WHERE rn = 1
    GROUP BY cid
    """,
    doc="One Lloyd assignment pass of llm/clustering.py's distributed "
        "k-means, from deterministic seeds (the 4 lowest vec_ids), "
        "reporting per-cluster membership and SSE. Assignment is pure JVM "
        "column math (zip_with squared distance, argmin via array_position "
        "with lowest-index tie-break — mirrored by the oracle's ORDER BY "
        "dist2, cid); the report shuffle moves k partial rows per "
        "partition. The multi-iteration driver loop (centroid update = "
        "k x dim literals, inertia monotonicity) is pinned by "
        "tests/test_clustering.py — iteration count never changes the "
        "per-iteration plan, so one pass is the honest oracle surface.",
)
def q150_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.clustering import assign_clusters

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        [float(x) for x in r[1]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    cluster, dist2 = assign_clusters("v", seeds)
    return (
        emb.select(cluster.alias("cluster"), dist2.alias("dist2"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.sum("dist2"), 3).alias("sse"),
        )
    )


# ---------------------------------------------------------------------------
# q155 — lexical diversity: token entropy / type-token / hapax ratio
# ---------------------------------------------------------------------------

@register(
    "q155_token_entropy",
    oracle=r"""
    WITH words AS (
        SELECT doc_id, unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
        FROM documents
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
    n AS (SELECT doc_id, SUM(c) AS n FROM tf GROUP BY doc_id)
    SELECT tf.doc_id,
           CAST(n.n AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
               AS hapax_ratio,
           ROUND(-SUM((c::DOUBLE / n.n) * LN(c::DOUBLE / n.n)), 4)
               AS token_entropy
    FROM tf JOIN n USING (doc_id)
    GROUP BY tf.doc_id, n.n
    """,
    doc="Lexical-diversity quality signals: Shannon entropy of the "
        "per-document token distribution (low = repetitive/boilerplate, "
        "the information-theoretic cousin of q79's repetition rules), "
        "type count, and hapax-legomenon ratio. Two shuffles — the "
        "(doc, token) tf grain, then the doc grain for the total-count "
        "window, whose partitioning the final rollup inherits; that is "
        "the floor for per-token-frequency entropy.",
)
def q155_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(_tokens("text")).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    tfn = tf.withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    p = F.col("c").cast("double") / F.col("n")
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return tfn.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        hapax.cast("bigint").alias("n_hapax"),
        F.round(hapax.cast("double") / F.count(F.lit(1)), 4).alias("hapax_ratio"),
        F.round(-F.sum(p * F.log(p)), 4).alias("token_entropy"),
    )


# ---------------------------------------------------------------------------
# q156 — weighted PageRank over the nation-trade graph (iterative)
# ---------------------------------------------------------------------------

@register(
    "q156_nation_trade_pagerank",
    oracle="""
    WITH edges AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
    ),
    nodes AS (SELECT src AS nation FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS cnt FROM nodes),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    edges_norm AS (
        SELECT e.src, e.dst, e.w::DOUBLE / o.ow AS p
        FROM edges e JOIN outw o ON o.src = e.src
    ),
    r0 AS (SELECT nation, 1.0 / nn.cnt AS r FROM nodes CROSS JOIN nn),
    r1 AS (
        SELECT n.nation, 0.15 / nn.cnt + 0.85 * COALESCE(SUM(p.r * e.p), 0) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN edges_norm e ON e.dst = n.nation
        LEFT JOIN r0 p ON p.nation = e.src
        GROUP BY n.nation, nn.cnt
    ),
    r2 AS (
        SELECT n.nation, 0.15 / nn.cnt + 0.85 * COALESCE(SUM(p.r * e.p), 0) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN edges_norm e ON e.dst = n.nation
        LEFT JOIN r1 p ON p.nation = e.src
        GROUP BY n.nation, nn.cnt
    ),
    r3 AS (
        SELECT n.nation, 0.15 / nn.cnt + 0.85 * COALESCE(SUM(p.r * e.p), 0) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN edges_norm e ON e.dst = n.nation
        LEFT JOIN r2 p ON p.nation = e.src
        GROUP BY n.nation, nn.cnt
    ),
    r4 AS (
        SELECT n.nation, 0.15 / nn.cnt + 0.85 * COALESCE(SUM(p.r * e.p), 0) AS r
        FROM nodes n CROSS JOIN nn
        LEFT JOIN edges_norm e ON e.dst = n.nation
        LEFT JOIN r3 p ON p.nation = e.src
        GROUP BY n.nation, nn.cnt
    )
    SELECT nt.n_name AS nation, ROUND(r4.r, 6) AS pagerank
    FROM r4 JOIN nation nt ON nt.n_nationkey = r4.nation
    """,
    doc="Weighted PageRank (d=0.85, 4 iterations) over the supplier-nation "
        "→ customer-nation trade graph, via operators/graph.py::pagerank — "
        "the URL-authority primitive of web-corpus curation, exercised "
        "here as a second distributed iterative algorithm next to k-means "
        "and connected components. Per iteration: one O(edges) join + one "
        "dst-keyed aggregation; rank state is O(nodes) and never leaves "
        "the executors. The oracle unrolls the same four iterations as "
        "chained CTEs — identical double math, rounded at the end only.",
)
def q156_nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nt = _t(spark, sf_dir, "nation")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(edges, weight="w", iters=4, damping=0.85)
    return ranks.join(
        F.broadcast(nt), ranks.node == nt.n_nationkey
    ).select(F.col("n_name").alias("nation"), F.round("r", 6).alias("pagerank"))


# ---------------------------------------------------------------------------
# q159 — triangle counting / local clustering coefficient (nation graph)
# ---------------------------------------------------------------------------

@register(
    "q159_trade_clustering_coeff",
    oracle="""
    WITH pair AS MATERIALIZED (
        SELECT LEAST(s.s_nationkey, c.c_nationkey) AS a,
               GREATEST(s.s_nationkey, c.c_nationkey) AS b,
               COUNT(*) AS w
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey <> c.c_nationkey
        GROUP BY 1, 2
    ),
    und AS MATERIALIZED (
        SELECT a, b FROM pair
        WHERE w > (SELECT quantile_cont(w, 0.5) FROM pair)
    ),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    pern AS (
        SELECT n, COUNT(*) AS t FROM (
            SELECT x AS n FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY n
    ),
    deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT a AS n, b FROM und UNION ALL SELECT b, a FROM und
        ) GROUP BY n
    )
    SELECT nt.n_name AS nation,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(COALESCE(pern.t, 0) AS BIGINT) AS triangles,
           ROUND(COALESCE(pern.t, 0) * 2.0 / (deg.d * (deg.d - 1)), 4)
               AS clustering_coeff
    FROM deg
    LEFT JOIN pern ON pern.n = deg.n
    JOIN nation nt ON nt.n_nationkey = deg.n
    WHERE deg.d > 1
    """,
    doc="Triangle counting + local clustering coefficient over the "
        "above-median-weight (SF-relative, so the graph stays half-dense "
        "at every scale) undirected nation-trade graph — the third "
        "distributed graph primitive next to connected components and "
        "PageRank. Triangles use the canonical a<b<c ordered-edge double "
        "join, which counts each triangle once and bounds the join "
        "blowup by the arboricity (the standard distributed-triangle "
        "shape); per-node counts and degrees then come from two UNION "
        "ALL rollups. Nodes of degree <2 have no defined coefficient "
        "and are excluded on both sides. The oracle's heavy CTEs are "
        "MATERIALIZED — without it DuckDB re-executes the 4-way edge "
        "build once per triangle leg (400 s at sf0.1 -> 4 s).",
)
def q159_trade_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nt = _t(spark, sf_dir, "nation")
    sk, ck = F.col("s_nationkey"), F.col("c_nationkey")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(sk != ck)
        .groupBy(
            F.least(sk, ck).alias("a"), F.greatest(sk, ck).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    thresh = pair.agg(F.expr("percentile(w, 0.5)").alias("thr"))
    # The sparsified edge list is bounded by #nations^2 (<=625 rows), so
    # materialize it driver-side once instead of persist() (which the
    # CacheManager would hold for the session lifetime) or lazy reuse
    # (which re-runs the 4-way edge build once per triangle leg). For a
    # general large graph, keep it distributed and localCheckpoint.
    edge_rows = (
        pair.crossJoin(F.broadcast(thresh))
        .filter(F.col("w") > F.col("thr"))
        .select("a", "b")
        .collect()
    )
    und = spark.createDataFrame(
        [(r.a, r.b) for r in edge_rows], "a bigint, b bigint"
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    pern = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    out = (
        deg.join(pern, "n", "left")
        .filter(F.col("d") > 1)
        .join(F.broadcast(nt), F.col("n") == nt.n_nationkey)
    )
    t = F.coalesce(F.col("t"), F.lit(0))
    return out.select(
        F.col("n_name").alias("nation"),
        F.col("d").cast("bigint").alias("degree"),
        t.cast("bigint").alias("triangles"),
        F.round(t * 2.0 / (F.col("d") * (F.col("d") - 1)), 4).alias(
            "clustering_coeff"
        ),
    )


# ---------------------------------------------------------------------------
# q184 — streaming k-means sufficient-stats fold, batch-split twin
# ---------------------------------------------------------------------------

@register(
    "q184_kmeans_stats_merged_twin",
    oracle=r"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS c FROM emb WHERE vec_id < 4),
    d AS (
        SELECT emb.vec_id, cents.cid,
               list_sum(list_transform(list_zip(emb.v, cents.c),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
        FROM emb CROSS JOIN cents
    ),
    a AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d
    )
    SELECT a.cid AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(emb.v[1]) / COUNT(*), 6) AS c0,
           ROUND(SUM(emb.v[17]) / COUNT(*), 6) AS c16,
           ROUND(SUM(emb.v[42]) / COUNT(*), 6) AS c41,
           ROUND(SUM(emb.v[64]) / COUNT(*), 6) AS c63
    FROM a JOIN emb ON a.vec_id = emb.vec_id
    WHERE a.rn = 1
    GROUP BY a.cid
    """,
    doc="streaming/sinks.py::kmeans_partials + merge_kmeans_stats driven "
        "batch-side: the embedding table is split into 3 'micro-batches' "
        "(vec_id mod 3), each batch's per-cluster (count, per-dim sums) "
        "partials are computed with the SAME code the "
        "stream_kmeans_stats_sink foreachBatch fold runs, unioned, and "
        "merged to refreshed centroids — hash-proving the mergeable-"
        "partials algebra (sums and counts ADD) against a direct "
        "one-pass per-cluster mean oracle. Assignment uses q150's "
        "deterministic seeds (4 lowest vec_ids); 4 probe dimensions of "
        "the 64-dim centroid are reported rounded to 6 (the round "
        "absorbs partial-vs-one-pass summation association). The "
        "replay-idempotency and converges-to-batch properties of the "
        "actual streaming fold are pinned by tests/test_streaming.py.",
)
def q184_kmeans_stats_merged_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from ..streaming.sinks import kmeans_partials, merge_kmeans_stats

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    seeds = [
        [float(x) for x in r[1]]
        for r in emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    batches = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    partials = reduce(
        lambda x, y: x.unionByName(y),
        [kmeans_partials(b, seeds, vec_col="v") for b in batches],
    )
    merged = merge_kmeans_stats(partials, dim=64)
    return merged.select(
        "cluster",
        "n",
        F.round(F.element_at("centroid", 1), 6).alias("c0"),
        F.round(F.element_at("centroid", 17), 6).alias("c16"),
        F.round(F.element_at("centroid", 42), 6).alias("c41"),
        F.round(F.element_at("centroid", 64), 6).alias("c63"),
    )


# ---------------------------------------------------------------------------
# q186 — sequence packing: packed-pretraining token-offset index
# ---------------------------------------------------------------------------

@register(
    "q186_packing_offsets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id % 32 AS shard, doc_id,
             CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE LENGTH(TRIM(text)) > 0
    ),
    offs AS (
      SELECT shard, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS end_off
      FROM toks WHERE n_tokens > 0
    )
    SELECT shard, doc_id, n_tokens,
           CAST(end_off - n_tokens AS BIGINT) AS start_off,
           CAST(FLOOR((end_off - n_tokens) / 512) AS BIGINT) AS first_seq,
           CAST(FLOOR((end_off - 1) / 512) AS BIGINT) AS last_seq,
           CAST(FLOOR((end_off - 1) / 512)
                - FLOOR((end_off - n_tokens) / 512) + 1 AS BIGINT) AS n_seqs,
           FLOOR((end_off - 1) / 512)
             > FLOOR((end_off - n_tokens) / 512) AS straddles
    FROM offs
    """,
    doc="llm/packing.py::sequence_offsets — the packed-pretraining data "
        "layout INDEX (q113 is the coarse sibling: it reports bin-level "
        "doc/token totals per shard, this emits the per-DOCUMENT offset "
        "row that makes the packed layout random-accessible — which "
        "sequences a document occupies, where it starts, whether it "
        "straddles): each shard (doc_id mod 32) concatenates its "
        "documents' token streams and chops them into 512-token training "
        "sequences; per doc the index records its global start offset "
        "and the [first_seq, last_seq] range it occupies (docs straddle "
        "boundaries, the GPT/Llama packing convention). One shuffle to "
        "the shard grain + a per-shard JVM prefix-sum window; shard "
        "count is the parallelism knob (10^4-10^5 at 100 TB), so no "
        "few-groups funnel. The oracle replays the identical integer "
        "prefix-sum and floor arithmetic.",
)
def q186_packing_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.packing import sequence_offsets

    docs = _t(spark, sf_dir, "documents")
    return sequence_offsets(
        docs, "doc_id", "text", seq_len=512, shard=F.col("doc_id") % 32
    )


# ---------------------------------------------------------------------------
# q207 — waterfilling token-budget allocation across domains
# ---------------------------------------------------------------------------

@register(
    "q207_waterfill_budget",
    oracle=r"""
    WITH g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(len(string_split_regex(TRIM(text), '\s+'))) AS toks
      FROM documents GROUP BY source
    ),
    d AS (
      SELECT source,
             ROUND(SQRT(toks) / SUM(SQRT(toks)) OVER (), 6) AS w,
             CAST(toks AS DOUBLE) AS a
      FROM g
    ),
    r AS (SELECT source, w, a,
                 CASE WHEN w > 0 THEN a / w END AS ratio FROM d),
    cum AS (
      SELECT source, w, a, ratio,
             SUM(a) OVER win AS ca, SUM(w) OVER win AS cw,
             LEAD(ratio) OVER win AS nr
      FROM r WINDOW win AS (ORDER BY ratio ASC NULLS LAST, source)
    ),
    tot AS (SELECT SUM(w) AS tw, SUM(a) AS ta FROM d),
    lam AS (
      SELECT COALESCE(
               MAX(CASE WHEN ratio IS NOT NULL AND (tw - cw) > 0
                        AND ratio <= (24000 - ca) / (tw - cw)
                        AND (nr IS NULL OR (24000 - ca) / (tw - cw) <= nr)
                   THEN (24000 - ca) / (tw - cw) END),
               MAX(CASE WHEN 24000 / tw <= (SELECT MIN(ratio) FROM r)
                   THEN 24000 / tw END)
             ) AS lam,
             MAX(ta) AS ta
      FROM cum CROSS JOIN tot
    )
    SELECT d.source,
           d.w AS weight,
           CAST(d.a AS BIGINT) AS avail_tokens,
           CAST(FLOOR(CASE WHEN 24000 >= lam.ta THEN d.a
                           ELSE LEAST(d.a, lam.lam * d.w) END) AS BIGINT)
             AS allocation,
           (24000 < lam.ta AND d.a <= lam.lam * d.w) AS binding
    FROM d CROSS JOIN lam
    """,
    doc="llm/retrieval.py::waterfill_allocation — the mixture-PLANNING "
        "step between q148's temperature-scaled weights and the "
        "samplers: allocate a 24k-token budget as min(avail, "
        "lambda * w) with one global water level so targets sum to the "
        "budget; availability-capped domains are 'binding' and their "
        "shortfall flows to the rest. The classic waterfilling solve, "
        "done with windows over the 20-row DOMAIN table (the corpus is "
        "touched once for token counts). Engine-exact: weights are "
        "pre-rounded to 6 (q148's convention), every downstream "
        "expression mirrors textually, and the water level is picked by "
        "a bracketing condition on identical IEEE doubles; verified "
        "against a bisection reference on random cases in "
        "tests/test_pipeline_ops.py.",
)
def q207_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.retrieval import domain_mixture, waterfill_allocation

    mix = domain_mixture(
        _t(spark, sf_dir, "documents"), group_cols=("source",), alpha=0.5
    )
    return waterfill_allocation(
        mix, "mixture_weight", "n_tokens", budget=24000.0, key_cols=["source"]
    )


# ---------------------------------------------------------------------------
# q209 — exact-substring dedup cut list (Lee et al. 2022, removal side)
# ---------------------------------------------------------------------------

@register(
    "q209_duplicate_span_cuts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, t.i - 1 AS pos,
               sha256(array_to_string(w[t.i:t.i+7], ' ')) AS g
        FROM toks, unnest(generate_series(1, len(w) - 7)) AS t(i)
        WHERE len(w) >= 8
    ),
    freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, pos FROM sh JOIN freq USING (g)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > LAG(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) + 8
                    THEN 1 ELSE 0 END AS brk
        FROM dup
    ),
    grp AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_dup_grams
    FROM grp GROUP BY doc_id, island
    """,
    doc="llm/dedup.py::exact_substring_cuts — the REMOVAL side of the "
        "exact-substring dedup q147 only measures: maximal token spans "
        "covered by 8-grams occurring >= 2 times anywhere in the corpus, "
        "emitted as (doc_id, span_start, span_len) cut lists per Lee et "
        "al. 2022. Grams reduce to sha256 before the corpus-wide "
        "frequency groupBy (fixed-width uniform shuffle keys); span "
        "merging is a doc-partitioned gaps-and-islands window — four "
        "keyed shuffles, nothing global, so the plan survives a 100x "
        "corpus. Both engines merge intervals with the same "
        "overlap-or-adjacency rule, so the span set hash-matches.",
)
def q209_duplicate_span_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import exact_substring_cuts

    return exact_substring_cuts(_t(spark, sf_dir, "documents"), n=8)


# ---------------------------------------------------------------------------
# q213 — exact-substring dedup APPLY: rewrite the corpus minus cut spans
# ---------------------------------------------------------------------------

@register(
    "q213_span_removed_corpus",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    pos AS (
        SELECT doc_id, t.i - 1 AS pos, w[t.i] AS word
        FROM toks, unnest(generate_series(1, len(w))) AS t(i)
    ),
    sh AS (
        SELECT doc_id, t.i - 1 AS gpos,
               sha256(array_to_string(w[t.i:t.i+7], ' ')) AS g
        FROM toks, unnest(generate_series(1, len(w) - 7)) AS t(i)
        WHERE len(w) >= 8
    ),
    freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) >= 2),
    dup AS (SELECT doc_id, gpos FROM sh JOIN freq USING (g)),
    kept AS (
        SELECT p.doc_id, p.pos, p.word
        FROM pos p ANTI JOIN dup d
          ON p.doc_id = d.doc_id
         AND p.pos >= d.gpos AND p.pos < d.gpos + 8
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_after,
               string_agg(word, ' ' ORDER BY pos) AS cleaned
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS BIGINT) AS n_tokens_before,
           CAST(COALESCE(a.n_after, 0) AS BIGINT) AS n_tokens_after,
           COALESCE(a.cleaned, '') AS cleaned_text
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
    doc="llm/dedup.py::remove_cut_spans ∘ exact_substring_cuts — the "
        "APPLY half of exact-substring dedup: the corpus rewritten with "
        "every duplicated-8-gram span removed (q209 emits the cut list, "
        "this consumes it). Removal is a JVM index-lambda filter over "
        "the token array with the per-doc cut list carried as a bounded "
        "array column; one doc-keyed join beyond q209's pipeline. The "
        "oracle removes at the position grain (anti-join against dup "
        "gram coverage) — coverage by merged maximal spans equals "
        "coverage by the raw dup grams, so both engines drop exactly "
        "the same tokens.",
)
def q213_span_removed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import exact_substring_cuts, remove_cut_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_cut_spans(docs, exact_substring_cuts(docs, n=8))


# ---------------------------------------------------------------------------
# q225 — short-span hot-fragment cut list (the <8-token floor of q209)
# ---------------------------------------------------------------------------

@register(
    "q225_short_span_hot_cuts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, t.i - 1 AS pos,
               sha256(array_to_string(w[t.i:t.i+2], ' ')) AS g
        FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 3
    ),
    freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) >= 5),
    dup AS (SELECT doc_id, pos FROM sh JOIN freq USING (g)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > LAG(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos) + 3
                    THEN 1 ELSE 0 END AS brk
        FROM dup
    ),
    grp AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl
    )
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 3 - MIN(pos) AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_dup_grams
    FROM grp GROUP BY doc_id, island
    """,
    doc="llm/dedup.py::exact_substring_cuts at (n=3, min_occ=5) — the "
        "SHORT-SPAN complement to q209: duplicated spans of < 8 tokens "
        "contain no duplicated 8-gram and are invisible to the default "
        "pass (recall floor measured in tests/test_similarity.py and "
        "SCALING.md), so hot short fragments — boilerplate sentences, "
        "navigation chrome, license lines — are caught by trigram "
        "anchors with a HIGH frequency threshold instead (at n<8 a "
        "threshold of 2 would cut natural language; >= 5 isolates "
        "corpus-hot fragments). Same four-keyed-shuffle plan as q209; "
        "cut lists from both passes union into remove_cut_spans.",
)
def q225_short_span_hot_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import exact_substring_cuts

    return exact_substring_cuts(
        _t(spark, sf_dir, "documents"), n=3, min_occ=5
    )


# ---------------------------------------------------------------------------
# q218 — reciprocal-rank fusion of lexical (BM25) and dense (cosine) rankers
# ---------------------------------------------------------------------------

@register(
    "q218_rrf_hybrid_search",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    words AS (
        SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM toks
    ),
    tf AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf
        FROM words WHERE term IN ('spark', 'hash', 'window')
        GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(w)) AS avgdl FROM toks),
    scored AS (
        SELECT tf.doc_id,
               SUM(LN((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))) AS s
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    bm AS (
        SELECT doc_id, ROUND(s, 4) AS bs FROM scored
        ORDER BY ROUND(s, 4) DESC, doc_id LIMIT 20
    ),
    bmr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bs DESC, doc_id) AS r1
        FROM bm
    ),
    cs AS (
        SELECT e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                   (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE))
                    FROM embeddings WHERE vec_id = 0)), 4) AS c
        FROM embeddings e
        ORDER BY c DESC, e.vec_id LIMIT 20
    ),
    csr AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r2
        FROM cs
    ),
    f AS (
        SELECT doc_id, r1, r2,
               COALESCE(CAST(1 AS DOUBLE) / (60 + r1), 0)
               + COALESCE(CAST(1 AS DOUBLE) / (60 + r2), 0) AS rrf
        FROM bmr FULL OUTER JOIN csr USING (doc_id)
    )
    SELECT doc_id, CAST(r1 AS INT) AS bm25_rank, CAST(r2 AS INT) AS cosine_rank,
           ROUND(rrf, 6) AS rrf_score
    FROM f ORDER BY ROUND(rrf, 6) DESC, doc_id LIMIT 20
    """,
    doc="Reciprocal-rank fusion (Cormack et al. 2009, k=60) of the BM25 "
        "lexical ranker (q146's scorer) and the dense cosine ranker "
        "(q56's probe, doc_id = vec_id) — hybrid search's standard "
        "score-free combiner. Each ranker contributes only its TOP-20 "
        "head (TakeOrdered, no global sort); ranking windows then run "
        "over those bounded heads — the q176 rerank-head economics, so "
        "fusion cost is independent of corpus size. 1/(60+rank) sums "
        "are exact rationals in both engines; ties break on doc_id "
        "after 6-dp rounding.",
)
def q218_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..llm.similarity import topk_cosine

    docs = _t(spark, sf_dir, "documents")
    em = _t(spark, sf_dir, "embeddings")
    bm = bm25_topk(docs, _BM25_TERMS, k=20)
    w1 = Window.orderBy(F.col("bm25_score").desc(), "doc_id")
    bmr = bm.select("doc_id", F.row_number().over(w1).alias("r1"))
    qvec = em.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    cos = topk_cosine(em, [float(x) for x in qvec], k=20).withColumnRenamed(
        "vec_id", "doc_id"
    )
    w2 = Window.orderBy(F.col("cosine_sim").desc(), "doc_id")
    csr = cos.select("doc_id", F.row_number().over(w2).alias("r2"))
    rrf = F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r1")), F.lit(0.0)) + F.coalesce(
        F.lit(1.0) / (F.lit(60) + F.col("r2")), F.lit(0.0)
    )
    return (
        bmr.join(csr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("r1").cast("int").alias("bm25_rank"),
            F.col("r2").cast("int").alias("cosine_rank"),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(20)
    )
