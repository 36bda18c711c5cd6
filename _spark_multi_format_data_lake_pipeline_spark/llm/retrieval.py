"""Retrieval & corpus-modeling operators: BM25 scoring, duplicate-span
statistics, domain mixture weights, and bigram-LM surprisal.

Query registrations live in ``queries/retrieval.py`` (q146-q149); these
functions are the reusable surface a pipeline composes (scale notes in
SCALING.md §"Retrieval & corpus modeling").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _tokens(text_col: str) -> F.Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25_score) — top-k documents for a term-set query under BM25
    with the Lucene idf ln((N - df + 0.5)/(df + 0.5) + 1).

    Scale shape: the term filter lands BEFORE the tf groupBy so the explode
    never shuffles non-query terms; doc length rides the explode (no
    doc-length join); df (|terms| rows) and the (N, avgdl) scalar are
    broadcasts; the final top-k is TakeOrdered — no global sort. Ties break
    by id after 4-decimal rounding so the cut is deterministic. At index-
    backed scale the same scorer runs over q120's posting lists; this is
    the index-free scan form.
    """
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("w"))
    words = toks.select(
        id_col, F.size("w").alias("dl"), F.explode("w").alias("term")
    ).filter(F.col("term").isin(*terms))
    tf = words.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("w")).alias("avgdl")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(id_col, (idf * F.col("tf") * (k1 + 1.0) / norm).alias("part"))
        .groupBy(id_col)
        .agg(F.sum("part").alias("s"))
    )
    return (
        scored.select(id_col, F.round("s", 4).alias("bm25_score"))
        .orderBy(F.col("bm25_score").desc(), id_col)
        .limit(k)
    )


def duplicate_span_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 8
) -> DataFrame:
    """(id, n_distinct_shingles, dup_shingles, dup_frac) — per document, the
    fraction of its distinct word n-grams that appear in >= 2 documents
    (the exact-substring dedup signal from 'Deduplicating Training Data
    Makes Language Models Better'). Docs shorter than n tokens drop out.

    Shingles take the posexplode→lead() shape and immediately reduce to
    sha256 — every downstream exchange moves fixed-width uniform keys.
    """
    tk = docs.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w0")
    )
    win = Window.partitionBy(id_col).orderBy("pos")
    lead_cols = [F.lead("w0", j).over(win).alias(f"w{j}") for j in range(1, n)]
    leads = tk.select(id_col, "w0", *lead_cols)
    gram_cols = [f"w{j}" for j in range(n)]
    grams = leads.filter(F.col(f"w{n - 1}").isNotNull()).select(
        id_col, F.sha2(F.concat_ws(" ", *gram_cols), 256).alias("g")
    )
    ds = grams.distinct()
    freq = ds.groupBy("g").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
    return (
        ds.join(freq, "g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_shingles"),
            dup.cast("bigint").alias("dup_shingles"),
            F.round(dup.cast("double") / F.count(F.lit(1)), 4).alias("dup_frac"),
        )
    )


def domain_mixture(
    docs: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """(group_cols..., n_docs, n_tokens, token_share, mixture_weight) —
    temperature-scaled sampling weights w_i ∝ share_i^alpha (alpha < 1
    upweights rare domains, the standard multi-domain mixing rule). One
    shuffle to the domain grain; the normalizing window runs over the
    O(#domains) group table."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    g = docs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("n_tokens"),
    )
    everything = Window.partitionBy()
    powered = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    return g.select(
        *group_cols,
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.sum("n_tokens").over(everything), 6
        ).alias("token_share"),
        F.round(powered / F.sum(powered).over(everything), 6).alias("mixture_weight"),
    )


def bigram_surprisal(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bigrams, avg_bigram_surprisal) — average add-1-smoothed
    -ln p(w2|w1) under the corpus's own bigram model; the next step up
    from unigram surprisal for perplexity-style quality filtering. Docs
    with fewer than 2 tokens drop out.

    Bigrams come from posexplode→lead(1); the corpus bigram/unigram count
    tables shuffle once on the gram key (Zipf heads collapse map-side);
    vocabulary size rides a 1-row broadcast cross join, keeping the whole
    query lazy."""
    tk = docs.select(F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1"))
    win = Window.partitionBy(id_col).orderBy("pos")
    pairs = tk.select(id_col, "w1", F.lead("w1", 1).over(win).alias("w2")).filter(
        F.col("w2").isNotNull()
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = tk.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tk.agg(F.countDistinct("w1").alias("vocab"))
    nlp = -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab")))
    return (
        pairs.join(big, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(nlp), 4).alias("avg_bigram_surprisal"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n_pair, pmi) — corpus-level collocation strength for every
    adjacent bigram seen at least ``min_count`` times:

        pmi = ln( P(w1,w2) / (P(w1)·P(w2)) )
            = ln( c12 · Nu · Nu / (Nb · c1 · c2) )

    with bigram probability over bigram slots (Nb) and unigram
    probabilities over tokens (Nu). High-PMI pairs are multi-word
    expressions — the units a tokenizer or a phrase-aware dedup shingle
    should not split. Same machinery as :func:`bigram_surprisal` (gram-
    keyed count shuffles with map-side partials; Nb/Nu as a 1-row
    broadcast); the ``min_count`` filter applies to exact integer counts
    so the output set is reproducible across engines, and the pmi double
    is computed in one mirrored expression shape for the q170 oracle."""
    tk = docs.select(F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w1"))
    win = Window.partitionBy(id_col).orderBy("pos")
    pairs = tk.select(id_col, "w1", F.lead("w1", 1).over(win).alias("w2")).filter(
        F.col("w2").isNotNull()
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = tk.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    totals = pairs.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        tk.agg(F.count(F.lit(1)).alias("nu"))
    )
    u1 = uni.select(F.col("w1"), F.col("c1"))
    u2 = uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c2"))
    pmi = F.log(
        (F.col("c12").cast("double") * F.col("nu") * F.col("nu"))
        / (F.col("nb").cast("double") * F.col("c1") * F.col("c2"))
    )
    return (
        big.filter(F.col("c12") >= min_count)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("n_pair"),
            # + 0.0 normalizes IEEE -0.0 (a near-1 ratio rounded to zero
            # keeps its sign bit, and the engines disagree on it)
            (F.round(pmi, 4) + F.lit(0.0)).alias("pmi"),
        )
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens) — the persistent index tables BM25 scores from
    at scale: postings (term, id, tf) and doclens (id, dl). Build once,
    write partitioned/bucketed by term, and every query afterwards scans
    only its own terms' postings (partition pruning) instead of the
    corpus. q120's inverted-index report is the capped human-readable
    view of the same structure."""
    toks = docs.select(F.col(id_col), _tokens(text_col).alias("w"))
    doclens = toks.select(id_col, F.size("w").alias("dl"))
    postings = (
        toks.select(id_col, F.explode("w").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, doclens


def bm25_topk_from_postings(
    postings: DataFrame,
    doclens: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over a pre-built index — the 100 TB production shape:
    the term filter prunes the postings scan (partition pruning when the
    index is written partitioned by term), so query cost is
    O(matching postings), independent of corpus size. Identical scores to
    ``bm25_topk`` (equivalence pinned by tests/test_retrieval.py)."""
    hits = postings.filter(F.col("term").isin(*terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doclens, id_col)
        .crossJoin(F.broadcast(stats))
        .select(id_col, (idf * F.col("tf") * (k1 + 1.0) / norm).alias("part"))
        .groupBy(id_col)
        .agg(F.sum("part").alias("s"))
    )
    return (
        scored.select(id_col, F.round("s", 4).alias("bm25_score"))
        .orderBy(F.col("bm25_score").desc(), id_col)
        .limit(k)
    )


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "relevance",
) -> DataFrame:
    """Distributed ranking-quality evaluation: per-query NDCG@k, MRR@k
    (reciprocal rank of the first relevant hit), and recall@k, averaged
    over queries — the metrics that gate a retrieval/rerank stage before
    its output feeds a training-data mixture.

    ``results``: (query, doc, rank 1-based) system output;
    ``qrels``: (query, doc, graded relevance >= 0). Join on (query, doc)
    is the only data-sized shuffle; DCG/IDCG are per-query aggregates of
    the joined top-k — everything else is column math. Only queries WITH
    at least one relevant document are scored (n_queries counts those);
    a scored query the system found nothing for contributes 0 to all
    three averages. IDCG truncates the ideal ranking at k like DCG
    (standard NDCG@k); recall@k uses the attainable-at-k denominator
    min(n_rel, k), so a perfect ranking scores 1 even when n_rel > k.

    Returns ONE row: (n_queries, ndcg_at_k, mrr_at_k, recall_at_k),
    rounded to 6.
    """
    # canonicalize both inputs to one row per (query, doc): merged qrels
    # files commonly repeat judgments (keep the max grade), and a
    # malformed run listing a doc twice must not double-count its DCG
    # contribution (keep the best rank)
    topk = (
        results.filter(F.col(rank_col) <= k)
        .groupBy(query_col, id_col)
        .agg(F.min(rank_col).alias(rank_col))
    )
    rel = (
        qrels.filter(F.col(rel_col) > 0)
        .groupBy(query_col, id_col)
        .agg(F.max(rel_col).alias(rel_col))
    )

    # per-query DCG and first-relevant rank over the system's top-k
    hits = topk.join(rel, [query_col, id_col])
    per_q_hits = hits.groupBy(query_col).agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
            / F.log2(F.col(rank_col) + 1.0)
        ).alias("dcg"),
        (1.0 / F.min(rank_col)).alias("rr"),
        F.count(F.lit(1)).cast("long").alias("hits_at_k"),
    )

    # per-query IDCG: ideal ordering of ALL relevant docs, truncated at k
    wq = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    ideal = (
        rel.withColumn("_irank", F.row_number().over(wq))
        .filter(F.col("_irank") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
                / F.log2(F.col("_irank") + 1.0)
            ).alias("idcg"),
        )
    )
    n_rel = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )

    per_q = (
        n_rel.join(ideal, query_col)
        .join(per_q_hits, query_col, "left")
        .select(
            query_col,
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
            F.coalesce(F.col("rr"), F.lit(0.0)).alias("rr"),
            (
                F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("double")
                / F.least(F.col("n_rel"), F.lit(k)).cast("double")
            ).alias("recall"),
        )
    )
    # coalesce: with zero scorable queries AVG is NULL — report 0.0 so a
    # numeric gate comparison never meets None
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.coalesce(F.round(F.avg("ndcg"), 6), F.lit(0.0)).alias("ndcg_at_k"),
        F.coalesce(F.round(F.avg("rr"), 6), F.lit(0.0)).alias("mrr_at_k"),
        F.coalesce(F.round(F.avg("recall"), 6), F.lit(0.0)).alias("recall_at_k"),
    )


def waterfill_allocation(
    domains: DataFrame,
    weight_col: str,
    avail_col: str,
    budget: float,
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Allocate a token budget across domains respecting availability —
    the mixture-PLANNING step between ``domain_mixture``'s weights and
    the samplers that draw the data: target_i = min(avail_i,
    lambda * w_i) with one global water level lambda chosen so the
    targets sum to the budget (all-available when the budget exceeds the
    corpus). The classic waterfilling solution, computed with windows
    over the DOMAIN table (never data-sized): sort by the binding ratio
    avail/weight ascending; for a prefix of k binding domains the
    candidate level is lambda_k = (B - cum_avail_k) / (total_w -
    cum_w_k); the correct prefix is the unique row where
    r_k <= lambda_k <= r_{k+1} (lambda_0 = B/total_w when nothing
    binds). Returns (key…, weight, avail, allocation, binding).

    Determinism: one total order (ratio, key…); all arithmetic is the
    same IEEE expression both engines, so an ANSI oracle replays the
    pick exactly. Zero-weight domains get 0 (their ratio is +inf; they
    never bind and lambda*0 = 0)."""
    keys = list(key_cols)
    w = F.col(weight_col).cast("double")
    a = F.col(avail_col).cast("double")
    d = domains.select(*keys, w.alias("_w"), a.alias("_a")).withColumn(
        "_r", F.when(F.col("_w") > 0, F.col("_a") / F.col("_w"))
    )
    win = Window.orderBy(F.col("_r").asc_nulls_last(), *keys)
    cum = (
        d.withColumn("_ca", F.sum("_a").over(win))
        .withColumn("_cw", F.sum("_w").over(win))
        .withColumn("_nr", F.lead("_r").over(win))
    )
    tot = d.agg(
        F.sum("_w").alias("_tw"), F.sum("_a").alias("_ta")
    )
    j = cum.crossJoin(F.broadcast(tot))
    # lambda if THIS row is the last binding one; the all-domains-bind
    # row (zero remaining weight) is the budget >= total-avail case the
    # output handles separately — NULL here, and ANSI division stays safe
    rem_w = F.col("_tw") - F.col("_cw")
    lam_k = F.when(rem_w > 0, (F.lit(budget) - F.col("_ca")) / rem_w)
    # lambda with NO binding rows at all
    lam_0 = F.lit(budget) / F.col("_tw")
    # the chosen level: max over { lam_0 if it clears every ratio } and
    # the valid prefix row's lam_k — expressed as a global agg of the
    # per-row candidates that satisfy their bracketing condition
    cand = j.select(
        F.when(
            (F.col("_r").isNotNull())
            & (F.col("_r") <= lam_k)
            & (F.col("_nr").isNull() | (lam_k <= F.col("_nr"))),
            lam_k,
        ).alias("_lam"),
        F.when(
            lam_0 <= F.coalesce(
                F.min("_r").over(Window.orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )),
                F.lit(float("inf")),
            ),
            lam_0,
        ).alias("_lam0"),
        F.col("_ta"),
    )
    lam_row = cand.agg(
        F.coalesce(F.max("_lam"), F.max("_lam0")).alias("_lam"),
        F.max("_ta").alias("_ta"),
    )
    out = d.crossJoin(F.broadcast(lam_row)).select(
        *keys,
        F.round("_w", 6).alias("weight"),
        F.col("_a").cast("bigint").alias("avail_tokens"),
        F.floor(
            F.when(F.lit(budget) >= F.col("_ta"), F.col("_a")).otherwise(
                F.least(F.col("_a"), F.col("_lam") * F.col("_w"))
            )
        )
        .cast("bigint")
        .alias("allocation"),
        (
            (F.lit(budget) < F.col("_ta"))
            & (F.col("_a") <= F.col("_lam") * F.col("_w"))
        ).alias("binding"),
    )
    return out
