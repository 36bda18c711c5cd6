"""Retrieval & corpus-modeling queries (round-5 additions): BM25 ranking,
within-corpus duplicate-span detection, temperature-scaled domain mixture
weights, and bigram-LM surprisal scoring.

These extend the training-data-pipeline surface beyond the reference
(whose aggregation surface is ``df.count()`` — SURVEY.md §2 A.4): a user
curating a 100 TB corpus needs retrieval scoring for eval-set mining,
substring-level dup pressure per document, mixture weights for data
balancing, and an n-gram LM signal for perplexity-style filtering.

Every query here is fully oracle-paired (deterministic math, sha256-keyed
shingles, explicit rounding + tie-breaks) — no rows-only entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _toks(docs: DataFrame) -> DataFrame:
    """(doc_id, w: array<string>) — lowercase whitespace tokens."""
    return docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    )


# ---------------------------------------------------------------------------
# q146 — BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "hash", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


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
    doc="BM25 (Lucene idf, k1=1.2, b=0.75) top-20 for a fixed 3-term query. "
        "Scale shape: the term filter lands BEFORE the tf groupBy, so the "
        "explode never shuffles non-query terms; doc length rides the "
        "explode (no doc-length join); df and the (n_docs, avgdl) scalar "
        "are broadcast (3 rows / 1 row); final top-k is TakeOrdered, no "
        "global sort. Ties broken by doc_id after 4-decimal rounding so "
        "the cut is deterministic across engines.",
)
def q146_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks(_t(spark, sf_dir, "documents"))
    words = toks.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("term")
    ).filter(F.col("term").isin(*_BM25_TERMS))
    tf = words.groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * F.col("tf") * (_BM25_K1 + 1.0) / norm).alias("part"))
        .groupBy("doc_id")
        .agg(F.sum("part").alias("s"))
    )
    return (
        scored.select("doc_id", F.round("s", 4).alias("bm25_score"))
        .orderBy(F.col("bm25_score").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q147 — within-corpus duplicate-span fraction (Lee et al. style signal)
# ---------------------------------------------------------------------------

_SPAN_N = 8


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
    doc="Per-document duplicated-span pressure: fraction of a doc's distinct "
        "8-gram shingles that also appear in at least one other document "
        "(the exact-substring dedup signal from 'Deduplicating Training "
        "Data Makes Language Models Better'). Shingles use the posexplode→"
        "lead() shape (the gram string materializes once, straight into "
        "sha256 — fixed-width 64-hex shuffle keys, no long-string "
        "shuffles). Distinct + per-shingle frequency + rejoin are all "
        "keyed on the uniform sha key: no skew at any corpus size.",
)
def q147_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "w0"
        ),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [
        F.lead("w0", k).over(win).alias(f"w{k}") for k in range(1, _SPAN_N)
    ]
    leads = tk.select("doc_id", "w0", *lead_cols)
    gram_cols = [f"w{k}" for k in range(_SPAN_N)]
    grams = leads.filter(F.col(f"w{_SPAN_N - 1}").isNotNull()).select(
        "doc_id", F.sha2(F.concat_ws(" ", *gram_cols), 256).alias("g")
    )
    ds = grams.distinct()
    freq = ds.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        ds.join(freq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_shingles"),
            dup.cast("bigint").alias("dup_shingles"),
            F.round(
                dup.cast("double") / F.count(F.lit(1)), 4
            ).alias("dup_frac"),
        )
    )


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
    doc="Data-mixing weights per (source, lang) domain: raw token share and "
        "the temperature-scaled sampling weight w_i ∝ share_i^0.5 "
        "(alpha=0.5 upweights rare domains, the standard multilingual/"
        "multi-domain mixing rule). One shuffle to the domain grain; the "
        "normalizing window runs over the domain table, which is "
        "O(#domains) — tiny at any corpus scale.",
)
def q148_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("n_tokens"),
    )
    everything = Window.partitionBy()
    return g.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(everything), 6
        ).alias("token_share"),
        F.round(
            F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(everything),
            6,
        ).alias("mixture_weight"),
    )


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
        "the corpus's own bigram model — the next step up from q86's "
        "unigram surprisal for perplexity-based quality filtering. Bigram "
        "occurrences come from the posexplode→lead(1) shape (no HOF "
        "lambdas); the corpus bigram/unigram tables are shuffle-keyed on "
        "the gram itself (Zipf head words are hot but the per-key state is "
        "one counter — partial aggregation absorbs the skew map-side); "
        "vocab size rides a broadcast 1-row cross join, not a driver "
        "action.",
)
def q149_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "w1"
        ),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        tk.select("doc_id", "w1", F.lead("w1", 1).over(win).alias("w2"))
        .filter(F.col("w2").isNotNull())
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = tk.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tk.agg(F.countDistinct("w1").alias("vocab"))
    nlp = -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab")))
    return (
        pairs.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nlp), 4).alias("avg_bigram_surprisal"),
        )
    )


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
