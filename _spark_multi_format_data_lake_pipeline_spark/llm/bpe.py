"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer-training stage of an LLM data pipeline: given a corpus,
learn the merge table (Sennrich et al. 2016) that greedily fuses the
most frequent adjacent symbol pair, iterating. At 100 TB the corpus is
reduced ONCE to (distinct word, frequency) — Zipf's law makes this
vocab table tiny relative to the corpus (the groupBy's map-side combine
collapses the head) — and every subsequent iteration runs over the
VOCAB, not the corpus:

    per iteration: explode each distinct word's adjacent symbol pairs,
    weight by word frequency, SUM per pair (map-side combined), take
    the argmax (one row to the driver), apply the merge to every word's
    symbol array JVM-side.

Cost per merge = one vocab-sized scan + one pair-keyed shuffle + a
1-row driver exchange. The merge application is a left-to-right
no-overlap fold over each symbol array — expressed with higher-order
functions (aggregate over indices with a skip flag), no Python in the
loop. ``functions/text.py::bpe_ish_tokens`` is the counting-side
heuristic for budgeting; THIS module learns a real merge table.

q199 oracle-checks the distributed pair-counting core (character-level
first iteration — adjacent char pairs are 2-char substrings, identical
SQL both engines); the multi-iteration trainer is pytest-verified
against a sequential Python reference implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — the corpus reduced to its distinct-word table."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def chars_of(word: Column | str) -> Column:
    """Initial symbol sequence: one-char symbols (substring, not split —
    split-on-empty-pattern edge cases differ across engines/versions)."""
    w = F.col(word) if isinstance(word, str) else word
    return F.transform(F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1)))


def pair_counts(vocab: DataFrame, syms_col: str = "syms", freq_col: str = "freq") -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies over the vocab,
    weighted by word frequency. One vocab-sized explode + one pair-keyed
    aggregation (map-side combined)."""
    n = F.size(syms_col)
    idx = F.explode(F.sequence(F.lit(1), n - 1))
    return (
        vocab.filter(n >= 2)
        .select(F.col(freq_col), F.col(syms_col), idx.alias("_i"))
        .select(
            F.element_at(syms_col, F.col("_i")).alias("a"),
            F.element_at(syms_col, F.col("_i") + 1).alias("b"),
            F.col(freq_col),
        )
        .groupBy("a", "b")
        .agg(F.sum(freq_col).cast("long").alias("cnt"))
    )


def merge_pair(syms_col: str, a: str, b: str) -> Column:
    """Apply one BPE merge to a symbol array: every non-overlapping
    left-to-right occurrence of (a, b) fuses into a+b. Pure JVM
    higher-order fold: the accumulator carries (out array, skip flag);
    index i appends syms[i] unless it starts a match (append the fused
    symbol, skip the next index) or was consumed by the previous match."""
    syms = F.col(syms_col)
    n = F.size(syms)
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc, i):
        cur = F.element_at(syms, i)
        nxt = F.element_at(syms, i + 1)  # NULL at the last index
        starts_match = (
            (~acc.skip) & (i < n) & (cur == F.lit(a)) & (nxt.eqNullSafe(F.lit(b)))
        )
        return (
            F.when(acc.skip, F.struct(acc.out.alias("out"), F.lit(False).alias("skip")))
            .when(
                starts_match,
                F.struct(
                    F.concat(acc.out, F.array(F.lit(a + b))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc.out, F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(F.sequence(F.lit(1), n), acc0, step, lambda acc: acc.out)


def train_bpe(
    docs: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(a, b, count), ...] in
    merge order. Ties break on (a, b) lexicographically so the merge
    table is deterministic on any cluster shape. Each iteration moves
    ONE row to the driver (the argmax pair); the vocab is cached once —
    eager localCheckpoint per iteration keeps the symbol arrays
    materialized instead of re-deriving the whole merge chain lazily
    (the lineage would grow quadratically with merges)."""
    vocab = word_frequencies(docs, text_col).select(
        "freq", chars_of("word").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            pair_counts(vocab)
            .filter(F.col("cnt") >= min_freq)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.select(
            "freq", merge_pair("syms", a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def apply_merges(syms: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode: apply a trained merge table (in rank order, each to its
    left-to-right non-overlapping fixpoint) to a symbol array — the
    APPLY side of ``train_bpe``. One constant-size expression: an outer
    ``aggregate`` over the merge table (a literal array — the broadcast
    tokenizer) whose accumulator is the symbol array, with the same
    skip-flag pair fold as ``merge_pair`` inside. Expression depth does
    not grow with the number of merges (no per-merge projection chain,
    no Python), so a 32k-merge production tokenizer compiles the same
    plan as a 12-merge test one.

    A single left-to-right pass per merge IS that merge's fixpoint:
    fusing (a, b) never creates a new adjacent (a, b) occurrence — the
    fused symbol a+b differs from both a and b — so no recheck pass is
    needed (the DuckDB oracle iterates REPLACE to fixpoint and lands on
    the same pairing; tests pin the equivalence)."""
    pairs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in merges
        ]
    )

    def one_merge(acc, m):
        n = F.size(acc)
        st0 = F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        )

        def step(st, i):
            cur = F.element_at(acc, i)
            # try_element_at: NULL (not an ANSI index error) at i == n
            nxt = F.try_element_at(acc, i + 1)
            starts_match = (
                (~st.skip)
                & (i < n)
                & (cur == m["a"])
                & nxt.eqNullSafe(m["b"])
            )
            return (
                F.when(
                    st.skip,
                    F.struct(st.out.alias("out"), F.lit(False).alias("skip")),
                )
                .when(
                    starts_match,
                    F.struct(
                        F.concat(
                            st.out, F.array(F.concat(m["a"], m["b"]))
                        ).alias("out"),
                        F.lit(True).alias("skip"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(st.out, F.array(cur)).alias("out"),
                        F.lit(False).alias("skip"),
                    )
                )
            )

        return F.aggregate(F.sequence(F.lit(1), n), st0, step, lambda st: st.out)

    return F.aggregate(pairs, syms, one_merge)


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word, n_tokens, encoded) — the vocabulary encoding table for a
    trained merge list. At 100 TB this is THE scale trick of BPE apply:
    encode the distinct-word table (Zipf-small), then broadcast-join it
    to the corpus (``bpe_token_counts``) — the corpus itself never runs
    the merge loop."""
    syms = apply_merges(chars_of(word_col), merges)
    return words.select(
        F.col(word_col),
        F.size(syms).cast("bigint").alias("n_tokens"),
        F.array_join(syms, " ").alias("encoded"),
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document: corpus words map
    through the broadcast vocabulary encoding table — one explode + one
    broadcast join + one doc-keyed aggregation; the merge fold runs only
    over distinct words."""
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.length("word") > 0)
    vocab = bpe_encode_words(
        words.select("word").distinct(), merges
    ).select("word", F.col("n_tokens").alias("_nt"))
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("_nt").cast("bigint").alias("n_bpe_tokens"),
        )
    )
