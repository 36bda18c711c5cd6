"""Text-analysis scalar helpers over the documents table (SURVEY.md §2
Part B "LLM-data extensions": text stats / quality scoring / language-ID
support functions).

All built-in column expressions (split/filter/transform/size) — codegen'd,
no UDFs, so text featurization of 100 TB of documents stays a pure map
stage with zero Python overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multi-language stopword list used for quality scoring — enough signal
# for a ratio feature without external deps.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "in", "to", "is",
    "der", "die", "das", "und", "le", "la", "les", "et",
    "el", "los", "y", "de", "que",
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text; empty string → empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / F.size(toks).cast("double")
    )


def avg_token_length(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks).cast("double")
    )


def with_char_ngrams(df, text_col: str, out: str = "grams", n: int = 3):
    """Add a column of distinct character n-gram shingles.

    DataFrame-level: the lowered text must be a bound attribute before the
    per-index substring lambda runs — HOF lambdas are interpreted without
    CSE, so referencing `lower(trim(text))` inside the lambda would
    re-lowercase the whole document once per n-gram (O(len²) per doc).
    """
    tmp = df.withColumn("__t", F.lower(F.trim(F.col(text_col))))
    t = F.col("__t")
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short strings
    idx = F.sequence(F.lit(1), F.length(t) - (n - 1))
    grams = F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))
    return tmp.withColumn(
        out,
        F.when(F.length(t) >= n, grams).otherwise(F.array().cast("array<string>")),
    ).drop("__t")


# GPT-2-style pretokenizer pattern, restricted to the Java-regex ∩ RE2
# common subset (non-capturing groups, \p{L}/\p{N} classes, no lookaround)
# so the DuckDB oracle compiles the identical pattern. Pieces: common
# English contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pretokenization (array of pieces). The whole match (group
    0) is the token — the pattern has no capturing groups."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def hash_bucket(key: Column | str, buckets: int = 10_000) -> Column:
    """Deterministic engine-portable bucket in [0, buckets): the first 8
    hex chars of sha256(key) mod buckets. Unlike ``df.sample`` (seeded
    RNG, engine- and partitioning-dependent) this selects the SAME rows
    on any engine and any cluster shape — the reproducible-sampling
    primitive for corpus experiments ("take 1% of documents, forever").
    DuckDB twin: ``CAST(('0x' || substr(sha256(key), 1, 8)) AS BIGINT) %
    buckets``.
    """
    col = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.sha2(col.cast("string"), 256), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(buckets))


def _doc_words(df, id_col: str, text_col: str):
    """(id, word) — lowercased whitespace tokens, one row per occurrence."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """(id, word, rank, tfidf) — top-k characteristic terms per document,
    tfidf = tf * ln(N / df). Execution: explode → (doc,word) count → word-
    keyed document-frequency join (map-side combined both times) → per-doc
    WindowGroupLimit for the top-k. The df table is |vocab|-sized — tiny
    next to the corpus — so AQE broadcasts the join at scale.

    Ties broken by word ascending so results are deterministic (word-soup
    corpora tie constantly).
    """
    from pyspark.sql import Window

    words = _doc_words(df, id_col, text_col)
    n_docs = df.count()  # one lightweight count job; N is a plan literal
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "word").select(
        "id",
        "word",
        (F.col("tf").cast("double") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
            "tfidf_raw"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("tfidf_raw").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "word",
            "rank",
            F.round("tfidf_raw", 4).alias("tfidf"),
        )
    )


def unigram_neg_logprob(df, id_col: str, text_col: str):
    """(id, n_tokens, avg_neg_logprob) — average -ln p(word) under the
    corpus unigram model; the cheap stand-in for perplexity-based quality
    filtering (docs scoring far above the corpus mean are gibberish or
    boilerplate-stuffed). Same two shuffles as tf-idf; the unigram table
    is vocab-sized."""
    words = _doc_words(df, id_col, text_col)
    total = words.count()  # corpus token count as a plan literal
    uni = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    scored = words.join(uni, "word").select(
        "id", (-F.log(F.col("c").cast("double") / F.lit(float(total)))).alias("nlp")
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.round(F.avg("nlp"), 4).alias("avg_neg_logprob"),
    ).withColumnRenamed("id", id_col)
