"""Text-cleaning operators for training-data pipelines: PII redaction,
HTML stripping, per-document repetition signals (Gopher-style quality
rules), and corpus-level boilerplate line removal (C4-style).

These extend the reference's surface (which stops at ingest+merge,
`/root/reference/schema_manager.py`, `/root/reference/main.py`) with the
cleaning stages a 100 TB pretraining-corpus pipeline runs between ingest
and dedup.

Scale design
------------
- PII redaction / HTML stripping are pure map-stage `regexp_replace`
  chains — JVM-side, whole-stage-codegen, zero shuffles, no Python.
- Repetition signals need one explode+groupBy per doc (top-word) plus a
  map-only pass (mean word length, duplicate-2-gram fraction). The
  shuffle is keyed by doc id — uniform by construction.
- Boilerplate line removal is the C4 recipe: explode lines, count
  DISTINCT docs per line, remove lines above the threshold, reassemble.
  Two shuffles (line-count, doc-reassembly). The line-key join can skew
  on ultra-common lines at corpus scale; the dup-line table is tiny
  relative to the corpus (only lines repeated >= min_docs) so Spark's
  AQE broadcasts it in practice.

The PII / entity tables below are the single source of truth for BOTH
engines: ``pii_redact_sql`` / ``strip_html_sql`` generate the DuckDB
oracle expression from the same patterns the Spark column uses, so the
two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (label, pattern, replacement) — applied in order. Email first (it would
# otherwise be chewed up by the digit rules), widest digit patterns next.
# Patterns stay in the Java-regex ∩ RE2 common subset (no lookaround, no
# backreferences) so Spark and DuckDB compile them identically.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]

# HTML entity unescapes — &amp; LAST so "&amp;lt;" doesn't double-decode.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_TAG_RE = r"<[^>]+>"
_WS_RE = r"\s+"


def redact_pii(col: Column | str) -> Column:
    """Replace emails / IPv4s / SSNs / phone numbers with typed tokens."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_redact_sql(expr: str) -> str:
    """DuckDB expression applying the same redaction chain to ``expr``."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def strip_html(col: Column | str) -> Column:
    """Drop tags, decode common entities, collapse whitespace."""
    out = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(out, _TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, _WS_RE, " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB expression mirroring :func:`strip_html`."""
    out = f"regexp_replace({expr}, '{_TAG_RE}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '{_WS_RE}', ' ', 'g'))"


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_words, mean_word_len, dup_2gram_frac, top_word_frac) —
    Gopher-style repetition/quality signals per document.

    mean_word_len and dup_2gram_frac are map-only (array expressions over
    a bound token column — see the HOF re-evaluation note in
    ``functions/text.py``); top_word_frac takes the explode+groupBy path
    because a per-doc word histogram as an array lambda would be O(n²)
    per document.
    """
    lowered = F.lower(F.trim(F.col(text_col)))
    toks = df.select(F.col(id_col).alias("id"), lowered.alias("__t")).withColumn(
        "__w", F.split(F.col("__t"), _WS_RE)
    )
    w = F.col("__w")
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    dup_frac = F.when(
        n >= 2,
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / (n - 1).cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    mapped = toks.select(
        "id",
        n.alias("n_words"),
        F.round(
            F.length(F.regexp_replace("__t", _WS_RE, "")).cast("double")
            / n.cast("double"),
            4,
        ).alias("mean_word_len"),
        dup_frac.alias("dup_2gram_frac"),
    )
    counts = (
        toks.select("id", F.explode(w).alias("word"))
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.groupBy("id").agg(
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 4).alias(
            "top_word_frac"
        )
    )
    return (
        mapped.join(top, "id")
        .select(
            F.col("id").alias(id_col),
            "n_words",
            "mean_word_len",
            "dup_2gram_frac",
            "top_word_frac",
        )
    )


def dedup_lines_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 5,
    delim: str = "\n",
) -> DataFrame:
    """C4-style boilerplate removal: delete every line that appears in at
    least ``min_docs`` DISTINCT documents; reassemble the survivors in
    original order. Returns (id, clean_text, n_removed).

    Documents whose lines are ALL boilerplate come back with an empty
    clean_text (they stay in the output — dropping them is the caller's
    filter, not this operator's).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), F.lit(delim))).alias("pos", "line"),
    )
    dup = (
        lines.groupBy("line")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line", F.lit(True).alias("__dup"))
    )
    tagged = lines.join(dup, "line", "left")
    keep_struct = F.when(F.col("__dup").isNull(), F.struct("pos", "line"))
    return (
        tagged.groupBy("id")
        .agg(
            # collect_list drops NULLs, so boilerplate lines vanish here;
            # array_sort on (pos, line) structs restores document order
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(keep_struct)), lambda s: s["line"]
                ),
                delim,
            ).alias("clean_text"),
            F.sum(F.coalesce(F.col("__dup").cast("int"), F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
        .withColumnRenamed("id", id_col)
    )
