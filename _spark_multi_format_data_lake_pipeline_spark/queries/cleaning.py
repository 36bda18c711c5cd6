"""Text-cleaning catalog queries (q77-q80): PII redaction, HTML strip,
repetition signals, corpus boilerplate-line removal.

The synthetic `documents` corpus is clean single-line prose, so q77/q78/
q80 first SYNTHESIZE the dirt deterministically from (doc_id, source) —
identically on the Spark side and in the oracle SQL — then clean it.
That makes the parity check exercise the actual transformation (regex
dialect, entity decode, line accounting) rather than a no-op.

The oracle strings for q77/q78 are GENERATED from the same pattern
tables the Spark expressions use (`llm/cleaning.py::pii_redact_sql`,
`strip_html_sql`) — one source of truth, no drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import BPE_ISH_PATTERN, bpe_ish_tokens, token_count
from ..llm.cleaning import (
    dedup_lines_corpus,
    pii_redact_sql,
    redact_pii,
    repetition_signals,
    strip_html,
    strip_html_sql,
)
from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q77 — PII redaction (map-only regexp_replace chain)
# ---------------------------------------------------------------------------

_PII_DIRT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 ssn 123-45-6789 call 415-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_dirt_spark() -> F.Column:
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com ip 10.0."),
        (did % 256).cast("string"),
        F.lit(".7 ssn 123-45-6789 call 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )


@register(
    "q77_pii_redaction",
    oracle=f"""
    SELECT doc_id, {pii_redact_sql(f"({_PII_DIRT_SQL})")} AS clean_text
    FROM documents
    """,
    doc="PII redaction over deterministically dirtied text (email/IP/SSN/"
        "phone synthesized from doc_id). Map-only regexp_replace chain, "
        "zero shuffles; oracle SQL generated from the same pattern table.",
)
def q77_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", redact_pii(_pii_dirt_spark()).alias("clean_text")
    )


# ---------------------------------------------------------------------------
# q78 — HTML strip + entity decode (map-only)
# ---------------------------------------------------------------------------

_HTML_DIRT_SQL = (
    "'<div class=\"doc\"><p>' || text ||"
    " '</p></div> <br/> 5 &lt; 7 &amp;&amp; &quot;it&#39;s&quot;'"
)


def _html_dirt_spark() -> F.Column:
    return F.concat(
        F.lit('<div class="doc"><p>'),
        F.col("text"),
        F.lit("</p></div> <br/> 5 &lt; 7 &amp;&amp; &quot;it&#39;s&quot;"),
    )


@register(
    "q78_html_strip",
    oracle=f"""
    SELECT doc_id, {strip_html_sql(f"({_HTML_DIRT_SQL})")} AS clean_text
    FROM documents
    """,
    doc="HTML tag removal + entity decode + whitespace collapse over "
        "deterministically wrapped text. Map-only; oracle generated from "
        "the same tag/entity tables.",
)
def q78_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", strip_html(_html_dirt_spark()).alias("clean_text")
    )


# ---------------------------------------------------------------------------
# q79 — Gopher-style repetition / quality signals
# ---------------------------------------------------------------------------

@register(
    "q79_repetition_signals",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               trim(lower(text)) AS t,
               string_split_regex(trim(lower(text)), '\s+') AS words
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(words) AS INT) AS n_words,
               ROUND(length(regexp_replace(t, '\s+', '', 'g'))::DOUBLE
                     / len(words), 4) AS mean_word_len,
               ROUND(CASE WHEN len(words) >= 2 THEN
                   1.0 - len(list_distinct([words[i] || ' ' || words[i + 1]
                                            for i in range(1, len(words))]))::DOUBLE
                         / (len(words) - 1)
                   ELSE 0.0 END, 4) AS dup_2gram_frac
        FROM w
    ),
    t AS (
        SELECT doc_id,
               ROUND(MAX(c)::DOUBLE / CAST(SUM(c) AS BIGINT), 4) AS top_word_frac
        FROM (
            SELECT doc_id, word, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(words) AS word FROM w)
            GROUP BY doc_id, word
        )
        GROUP BY doc_id
    )
    SELECT m.doc_id, n_words, mean_word_len, dup_2gram_frac, top_word_frac
    FROM m JOIN t USING (doc_id)
    """,
    doc="Per-doc repetition/quality signals (Gopher rules): word count, "
        "mean word length, duplicate-2-gram fraction (map-only array "
        "exprs) and top-word fraction (explode + doc-keyed groupBy).",
)
def q79_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q80 — corpus-level boilerplate line removal (C4 recipe)
# ---------------------------------------------------------------------------

_LINES_DIRT_SQL = (
    "text || chr(10) || 'subscribe to our newsletter' || chr(10) ||"
    " 'copyright ' || source || chr(10) || 'doc id ' || CAST(doc_id AS VARCHAR)"
)


def _lines_dirt_spark() -> F.Column:
    return F.concat_ws(
        "\n",
        F.col("text"),
        F.lit("subscribe to our newsletter"),
        F.concat(F.lit("copyright "), F.col("source")),
        F.concat(F.lit("doc id "), F.col("doc_id").cast("string")),
    )


@register(
    "q80_boilerplate_line_dedup",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_LINES_DIRT_SQL} AS dirty FROM documents
    ),
    l AS (
        SELECT doc_id,
               unnest(string_split(dirty, chr(10))) AS line,
               unnest(generate_series(1, len(string_split(dirty, chr(10))))) AS pos
        FROM d
    ),
    dup AS (
        SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 5
    )
    SELECT l.doc_id,
           COALESCE(string_agg(l.line, chr(10) ORDER BY l.pos)
                    FILTER (WHERE dup.line IS NULL), '') AS clean_text,
           CAST(COUNT(dup.line) AS INT) AS n_removed
    FROM l LEFT JOIN dup ON l.line = dup.line
    GROUP BY l.doc_id
    """,
    doc="C4-style boilerplate removal: lines present in >= 5 distinct docs "
        "(the synthesized newsletter/copyright lines) are deleted corpus-"
        "wide; unique lines survive in order. Two doc/line-keyed shuffles.",
)
def q80_boilerplate_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", _lines_dirt_spark().alias("dirty"))
    return dedup_lines_corpus(dirty, "doc_id", "dirty", min_docs=5)


# ---------------------------------------------------------------------------
# q81 — token counting: whitespace vs BPE-style pretokenizer
# ---------------------------------------------------------------------------

_BPE_SQL_LIT = BPE_ISH_PATTERN.replace("'", "''")  # pattern starts with '


@register(
    "q81_bpe_token_counts",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_SQL_LIT}', 0)) AS INT)
               AS n_bpe_tokens,
           ROUND(len(regexp_extract_all(text, '{_BPE_SQL_LIT}', 0))::DOUBLE
                 / len(string_split_regex(trim(text), '\s+')), 4) AS bpe_per_ws
    FROM documents
    """,
    doc="Token counting two ways: whitespace split and a GPT-2-style "
        "regex pretokenizer (shared Java/RE2 pattern — the oracle compiles "
        "the IDENTICAL string from functions/text.py::BPE_ISH_PATTERN). "
        "Map-only, zero shuffles.",
)
def q81_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_bpe = F.size(bpe_ish_tokens(F.col("text")))
    n_ws = token_count(F.col("text"))
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(n_bpe.cast("double") / n_ws.cast("double"), 4).alias("bpe_per_ws"),
    )


# ---------------------------------------------------------------------------
# q84 — deterministic hash-mod sampling (reproducible on any engine)
# ---------------------------------------------------------------------------

@register(
    "q84_deterministic_sample",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 10000 AS bucket
    FROM documents
    WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 10000 < 1000
    """,
    doc="Reproducible ~10% sample: sha256-derived bucket < 1000/10000. "
        "Same rows on every engine, partitioning, and run — what corpus "
        "experiments need instead of seeded RNG sampling. Map-only filter "
        "(prunes at the scan at scale when the bucket is persisted).",
)
def q84_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), 10_000)
    return docs.select("doc_id", b.alias("bucket")).filter(F.col("bucket") < 1000)


# ---------------------------------------------------------------------------
# q85 — TF-IDF top terms per document
# ---------------------------------------------------------------------------

@register(
    "q85_tfidf_top_terms",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        FROM documents
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tfc FROM words GROUP BY doc_id, word
    ),
    dfreq AS (
        SELECT word, COUNT(*) AS dfc FROM tf GROUP BY word
    ),
    scored AS (
        SELECT tf.doc_id, tf.word,
               tf.tfc * ln((SELECT COUNT(*) FROM documents)::DOUBLE / dfreq.dfc)
                   AS tfidf_raw
        FROM tf JOIN dfreq USING (word)
    )
    SELECT doc_id, word, rank, ROUND(tfidf_raw, 4) AS tfidf
    FROM (
        SELECT doc_id, word, tfidf_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tfidf_raw DESC, word) AS INT) AS rank
        FROM scored
    )
    WHERE rank <= 3
    """,
    doc="Top-3 characteristic terms per doc, tfidf = tf * ln(N/df). "
        "Explode -> doc-keyed tf -> vocab-sized df join (AQE broadcasts) "
        "-> WindowGroupLimit top-k. Ties broken by word for determinism.",
)
def q85_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


# ---------------------------------------------------------------------------
# q86 — unigram negative log-prob (perplexity-style quality score)
# ---------------------------------------------------------------------------

@register(
    "q86_unigram_logprob",
    oracle=r"""
    WITH words AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
        FROM documents
    ),
    uni AS (
        SELECT word, COUNT(*) AS c FROM words GROUP BY word
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_tokens,
           ROUND(AVG(-ln(uni.c::DOUBLE / (SELECT COUNT(*) FROM words))), 4)
               AS avg_neg_logprob
    FROM words JOIN uni USING (word)
    GROUP BY doc_id
    """,
    doc="Average -ln p(word) under the corpus unigram model — the cheap "
        "perplexity stand-in for quality filtering. Two shuffles; the "
        "unigram table is vocab-sized.",
)
def q86_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import unigram_neg_logprob

    docs = _t(spark, sf_dir, "documents")
    return unigram_neg_logprob(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q217 — DSIR importance weights (target-vs-raw unigram log-likelihood ratio)
# ---------------------------------------------------------------------------

@register(
    "q217_dsir_scores",
    oracle=r"""
    WITH words AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS w
        FROM documents WHERE length(TRIM(text)) > 0
    ),
    tot AS (
        SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                 AS nt,
               CAST(COUNT(*) AS DOUBLE) AS nr
        FROM words
    ),
    tgt AS (
        SELECT w, COUNT(*) AS ct FROM words WHERE lang = 'en' GROUP BY w
    ),
    raw AS (SELECT w, COUNT(*) AS cr FROM words GROUP BY w),
    lr AS (
        SELECT r.w,
               LN(((COALESCE(t.ct, 0) + 1.0) / (tot.nt + tot.v))
                  / ((r.cr + 1.0) / (tot.nr + tot.v))) AS llr
        FROM raw r LEFT JOIN tgt t ON r.w = t.w, tot
    ),
    dw AS (
        SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(SUM(c * llr), 4) AS dsir_score
    FROM dw JOIN lr ON dw.w = lr.w
    GROUP BY doc_id
    """,
    doc="DSIR data selection (Xie et al. 2023): per-document importance "
        "weight = sum of token-count-weighted log-likelihood ratios "
        "between a TARGET unigram LM (lang='en' slice, the domain you "
        "want more of) and the RAW-corpus LM, both Laplace-smoothed "
        "over the joint vocab. Positive scores mark documents that look "
        "like the target domain — the selection signal upstream of "
        "q106/q121 samplers, and the model-RATIO sibling of q86's "
        "single-model surprisal. Corpus reduces to (doc, word) counts "
        "once; the log-ratio table is vocab-sized and broadcast, so "
        "scoring is one map-side join + doc-keyed sum at any corpus "
        "size. Identical smoothing arithmetic both engines; 4-dp round "
        "absorbs log/summation ulps.",
)
def q217_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    words = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("w"),
    )
    # ONE corpus shuffle to the word grain carries both models (raw
    # count + conditional target count); totals then reduce over the
    # vocab-sized table, not the corpus
    wt = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("ct"),
    )
    tot = wt.agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cr").cast("double").alias("nr"),
    )
    lr = wt.crossJoin(F.broadcast(tot)).select(
        "w",
        F.log(
            ((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.col("v")))
            / ((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.col("v")))
        ).alias("llr"),
    )
    dw = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return (
        dw.join(F.broadcast(lr), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("c") * F.col("llr")), 4).alias("dsir_score"),
        )
    )


# ---------------------------------------------------------------------------
# q234 — per-source Jensen-Shannon divergence vs the global corpus
# ---------------------------------------------------------------------------

@register(
    "q234_source_js_divergence",
    oracle="""
    WITH w AS (
        SELECT source,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
    ),
    w2 AS (SELECT source, word FROM w WHERE word <> ''),
    sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
           FROM w2 GROUP BY 1, 2),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS stot FROM sw GROUP BY 1),
    gw AS (SELECT word, CAST(SUM(c) AS BIGINT) AS g FROM sw GROUP BY 1),
    gt AS (SELECT CAST(SUM(c) AS BIGINT) AS gtot FROM sw),
    x AS (
        SELECT sw.source,
               CAST(sw.c AS DOUBLE) / CAST(st.stot AS DOUBLE) AS p,
               CAST(gw.g AS DOUBLE) / CAST(gt.gtot AS DOUBLE) AS q
        FROM sw
        JOIN st ON sw.source = st.source
        JOIN gw ON sw.word = gw.word
        CROSS JOIN gt
    ),
    agg AS (
        SELECT source,
               SUM(p * LN(2.0 * p / (p + q))) AS tp,
               SUM(q * LN(2.0 * q / (p + q))) AS tq,
               SUM(q) AS qpresent
        FROM x GROUP BY 1
    )
    SELECT a.source, st.stot AS n_tokens,
           ROUND(0.5 * a.tp
                 + 0.5 * (a.tq + (1.0 - a.qpresent) * LN(2.0)), 6) AS jsd
    FROM agg a JOIN st ON a.source = st.source
    """,
    doc="Jensen-Shannon divergence of every source shard's unigram "
        "distribution against the whole-corpus distribution — the "
        "bounded symmetric drift metric (0..ln2 nats) a training-data "
        "pipeline uses to rank which shards skew the mixture, beside "
        "q217's DSIR (which scores DOCUMENTS against a target; this "
        "scores SHARDS against the blend). JSD needs the q-side sum "
        "over the FULL vocabulary including words absent from the "
        "shard (p=0 there, where the term is q*ln2): computed without "
        "materializing the |sources| x |vocab| cross product as "
        "sum_absent q = 1 - sum_present q — so the plan is word-grain "
        "groupBys plus a word-keyed join, never a vocab cross join. "
        "Tokens are the catalog-standard whitespace split of "
        "trim(lower(text)). One 1-row corpus-total reduce broadcast "
        "(q217's shape); everything else is keyed shuffles that scale "
        "with corpus size.",
)
def q234_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    sw = w.groupBy("source", "word").agg(F.count(F.lit(1)).alias("c"))
    st = sw.groupBy("source").agg(F.sum("c").alias("stot"))
    gw = sw.groupBy("word").agg(F.sum("c").alias("g"))
    gt = sw.agg(F.sum("c").alias("gtot"))
    x = (
        sw.join(F.broadcast(st), "source")
        .join(gw, "word")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            (F.col("c").cast("double") / F.col("stot").cast("double")).alias("p"),
            (F.col("g").cast("double") / F.col("gtot").cast("double")).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    agg = x.groupBy("source").agg(
        F.sum(p * F.log(F.lit(2.0) * p / (p + q))).alias("tp"),
        F.sum(q * F.log(F.lit(2.0) * q / (p + q))).alias("tq"),
        F.sum(q).alias("qpresent"),
    )
    return agg.join(F.broadcast(st), "source").select(
        "source",
        F.col("stot").alias("n_tokens"),
        F.round(
            F.lit(0.5) * F.col("tp")
            + F.lit(0.5)
            * (
                F.col("tq")
                + (F.lit(1.0) - F.col("qpresent")) * F.log(F.lit(2.0))
            ),
            6,
        ).alias("jsd"),
    )


# ---------------------------------------------------------------------------
# q235 — deterministic hash-based train/val/test split (stratified report)
# ---------------------------------------------------------------------------

@register(
    "q235_dataset_split",
    oracle="""
    WITH s AS (
        SELECT lang, n_chars,
               CASE
                 WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      < 'cccccccc' THEN 'train'
                 WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      < 'e6666666' THEN 'val'
                 ELSE 'test'
               END AS split
        FROM documents
    )
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1, 2
    """,
    doc="Deterministic 80/10/10 train/val/test split keyed on "
        "md5(doc_id) hex-prefix thresholds (llm/curation.py:hash_split) "
        "— the dataset-split primitive randomSplit cannot provide: "
        "assignment is a pure function of the key, stable across runs, "
        "cluster sizes and row order, so re-curating the corpus never "
        "moves a document across the leakage boundary. Deliberately "
        "distinct from q144 (leakage_safe_split: dedup-GROUP-aware "
        "assignment via sha hash_bucket modulo — WHO shares a split) — "
        "this row is the FRACTION surface: arbitrary named splits from "
        "a fraction dict via hex thresholds (no modulo quantization to "
        "100 buckets) plus a salt for drawing fresh independent "
        "assignments, reported as a stratification. The query "
        "reports the split x language stratification with a char-mass "
        "payload, so the driver hash checks the exact per-cell "
        "membership both engines derive from the same md5 CASE. "
        "Map-side expression + one groupBy; no shuffle beyond the "
        "count. 16^8 hex buckets bound the quantization error at "
        "~2e-10 of the corpus.",
)
def q235_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.curation import hash_split

    docs = _t(spark, sf_dir, "documents")
    s = hash_split(docs, "doc_id")
    return s.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
