"""Semantic tests for the retrieval/corpus-modeling queries (q146-q149).

Driver parity (Spark == DuckDB hash) is covered by tools/check.py; these
tests pin the *semantics* on planted corpora: BM25 ordering, duplicate-span
detection of a shared substring, mixture-weight normalization and rare-
domain upweighting, and surprisal separating formulaic from novel text.
"""

from __future__ import annotations

import math

import pytest

from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    """Write a documents.parquet a query's sf_dir loader can read."""
    sf = str(tmp_path)
    df = spark.createDataFrame(
        [(i, text, lang, source, len(text)) for i, (text, lang, source) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_bm25_ranks_term_dense_doc_first(spark, tmp_path):
    # doc0 mentions 'spark' three times, doc1 once, doc2 never.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            ("spark spark spark engine plan", "en", "s0"),
            ("spark engine plan shuffle stage", "en", "s0"),
            ("engine plan shuffle stage codegen", "en", "s0"),
        ],
    )
    out = QUERIES["q146_bm25_topk"].fn(spark, sf).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 0, "term-dense doc must rank first"
    assert 2 not in ids, "doc without any query term must not score"
    assert all(r.bm25_score > 0 for r in out)


def test_bm25_doc_length_normalization(spark, tmp_path):
    # Same tf for 'hash', but doc1 is much longer -> lower score (b=0.75).
    filler = " ".join(["pad"] * 60)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            ("hash join probe", "en", "s0"),
            (f"hash join probe {filler}", "en", "s0"),
        ],
    )
    out = {r.doc_id: r.bm25_score for r in QUERIES["q146_bm25_topk"].fn(spark, sf).collect()}
    assert out[0] > out[1]


def test_duplicate_spans_detects_shared_8gram(spark, tmp_path):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (f"{shared} alpha beta gamma delta epsilon zeta", "en", "s0"),
            (f"prefix words here {shared} suffix tail words", "en", "s0"),
            ("totally different content with no overlap at all here okay", "en", "s0"),
        ],
    )
    rows = {r.doc_id: r for r in QUERIES["q147_duplicate_spans"].fn(spark, sf).collect()}
    assert rows[0].dup_shingles >= 1 and rows[1].dup_shingles >= 1
    assert rows[2].dup_shingles == 0 and rows[2].dup_frac == 0.0
    for r in rows.values():
        assert 0 <= r.dup_shingles <= r.n_distinct_shingles
        assert 0.0 <= r.dup_frac <= 1.0


def test_duplicate_spans_short_docs_excluded(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [("only three words", "en", "s0")])
    assert QUERIES["q147_duplicate_spans"].fn(spark, sf).count() == 0


def test_mixture_weights_normalize_and_upweight_rare(spark, tmp_path):
    big = " ".join(["tok"] * 90)
    small = " ".join(["tok"] * 10)
    sf = _write_docs(
        spark,
        tmp_path,
        [(big, "en", "web"), (small, "fr", "books")],
    )
    rows = {(r.source, r.lang): r for r in QUERIES["q148_domain_mixture"].fn(spark, sf).collect()}
    assert abs(sum(r.mixture_weight for r in rows.values()) - 1.0) < 1e-4
    assert abs(sum(r.token_share for r in rows.values()) - 1.0) < 1e-4
    rare, common = rows[("books", "fr")], rows[("web", "en")]
    # alpha=0.5 moves the rare domain's weight above its raw share.
    assert rare.mixture_weight > rare.token_share
    assert common.mixture_weight < common.token_share
    # exact closed form: sqrt(10)/(sqrt(10)+sqrt(90)) = 0.25
    assert rare.mixture_weight == pytest.approx(0.25, abs=1e-4)


def test_bigram_surprisal_formulaic_below_novel(spark, tmp_path):
    # doc0 repeats one bigram; doc1 is all singleton bigrams. Under the
    # corpus bigram LM, doc0's transitions are high-probability.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            ("a b a b a b a b a b", "en", "s0"),
            ("c d e f g h i j k l", "en", "s0"),
        ],
    )
    rows = {r.doc_id: r for r in QUERIES["q149_bigram_surprisal"].fn(spark, sf).collect()}
    assert rows[0].avg_bigram_surprisal < rows[1].avg_bigram_surprisal
    assert rows[0].n_bigrams == 9 and rows[1].n_bigrams == 9


def test_bigram_surprisal_add1_smoothing_exact(spark, tmp_path):
    # Single doc "x y": one bigram with c12=1, c1(x)=1, vocab=2.
    # -ln((1+1)/(1+2)) = ln(1.5)
    sf = _write_docs(spark, tmp_path, [("x y", "en", "s0")])
    row = QUERIES["q149_bigram_surprisal"].fn(spark, sf).collect()[0]
    assert row.avg_bigram_surprisal == pytest.approx(round(math.log(1.5), 4), abs=1e-6)


# ---------------------------------------------------------------------------
# Differential property tests: Spark operators vs pure-Python references
# ---------------------------------------------------------------------------

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import (
    bigram_surprisal,
    bm25_topk,
    duplicate_span_stats,
)

_WORDS = ["spark", "hash", "window", "pad", "x"]
_CORPUS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=10,
)
_DIFF_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _tok(t):
    return re.split(r"\s+", t.strip().lower())


@given(texts=_CORPUS)
@_DIFF_SETTINGS
def test_bm25_matches_python_reference(spark, texts):
    terms = ("spark", "hash", "window")
    k1, b = 1.2, 0.75
    toks = [_tok(t) for t in texts]
    n = len(toks)
    avgdl = sum(len(w) for w in toks) / n
    df_t = {
        t: sum(1 for w in toks if t in w) for t in terms
    }
    expected = {}
    for i, w in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        if s > 0:
            expected[i] = round(s, 4)
    rows = bm25_topk(_docs_df(spark, texts), terms, k=100).collect()
    got = {r.doc_id: r.bm25_score for r in rows}
    assert set(got) == set(expected)
    for i in expected:
        assert got[i] == pytest.approx(expected[i], abs=2e-4)
    # ranking: (score desc, doc_id asc)
    keys = [(-r.bm25_score, r.doc_id) for r in rows]
    assert keys == sorted(keys)


@given(texts=_CORPUS, n=st.integers(2, 4))
@_DIFF_SETTINGS
def test_duplicate_spans_match_python_reference(spark, texts, n):
    toks = [_tok(t) for t in texts]
    grams = [
        {tuple(w[i : i + n]) for i in range(len(w) - n + 1)} for w in toks
    ]
    freq = {}
    for gs in grams:
        for g in gs:
            freq[g] = freq.get(g, 0) + 1
    expected = {
        i: (
            len(gs),
            sum(1 for g in gs if freq[g] >= 2),
        )
        for i, gs in enumerate(grams)
        if gs
    }
    rows = duplicate_span_stats(_docs_df(spark, texts), n=n).collect()
    got = {r.doc_id: (r.n_distinct_shingles, r.dup_shingles) for r in rows}
    assert got == expected


@given(texts=_CORPUS)
@_DIFF_SETTINGS
def test_bigram_surprisal_matches_python_reference(spark, texts):
    toks = [_tok(t) for t in texts]
    big, uni = {}, {}
    for w in toks:
        for a in w:
            uni[a] = uni.get(a, 0) + 1
        for a, b2 in zip(w, w[1:]):
            big[(a, b2)] = big.get((a, b2), 0) + 1
    vocab = len(uni)
    expected = {}
    for i, w in enumerate(toks):
        pairs = list(zip(w, w[1:]))
        if not pairs:
            continue
        nlp = [
            -math.log((big[(a, b2)] + 1.0) / (uni[a] + vocab)) for a, b2 in pairs
        ]
        expected[i] = (len(pairs), round(sum(nlp) / len(nlp), 4))
    rows = bigram_surprisal(_docs_df(spark, texts)).collect()
    got = {r.doc_id: (r.n_bigrams, r.avg_bigram_surprisal) for r in rows}
    assert set(got) == set(expected)
    for i, (nb, s) in expected.items():
        assert got[i][0] == nb
        assert got[i][1] == pytest.approx(s, abs=2e-4)


def test_bm25_from_prebuilt_index_equals_scan_form(spark, sf_dir):
    """The index-backed scorer (production shape: postings pruned by
    term) must produce exactly the scan form's scores and ranking."""
    from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import (
        build_postings,
        bm25_topk_from_postings,
    )
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    docs = load_table(spark, sf_dir, "documents")
    terms = ("spark", "hash", "window")
    scan = [
        (r.doc_id, r.bm25_score) for r in bm25_topk(docs, terms, k=50).collect()
    ]
    postings, doclens = build_postings(docs)
    idx = [
        (r.doc_id, r.bm25_score)
        for r in bm25_topk_from_postings(postings, doclens, terms, k=50).collect()
    ]
    assert idx == scan


def test_ranking_metrics_hand_computed(spark):
    import math

    from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import ranking_metrics

    # q1: docs a(rel 2) at rank 1, c(rel 1) at rank 3; b irrelevant at 2.
    # qrels also has d(rel 3) which the system missed entirely.
    results = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 2), ("q1", "c", 1), ("q1", "d", 3)],
        "query_id string, doc_id string, relevance int",
    )
    row = ranking_metrics(results, qrels, k=3).head()
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert row["n_queries"] == 1
    assert row["ndcg_at_k"] == round(dcg / idcg, 6)
    assert row["mrr_at_k"] == 1.0  # first hit at rank 1
    assert row["recall_at_k"] == round(2 / 3, 6)  # 2 of 3 relevant found


def test_ranking_metrics_perfect_and_empty(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import ranking_metrics

    # perfect ranking, n_rel > k: recall uses the attainable-at-k denom
    results = spark.createDataFrame(
        [("q", f"d{i}", i) for i in range(1, 4)],
        "query_id string, doc_id string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", f"d{i}", 5 - i) for i in range(1, 6)],  # d1..d4 relevant (d5 grade 0)
        "query_id string, doc_id string, relevance int",
    )
    row = ranking_metrics(results, qrels, k=3).head()
    assert row["ndcg_at_k"] == 1.0
    assert row["mrr_at_k"] == 1.0
    assert row["recall_at_k"] == 1.0

    # a query whose top-k has NO relevant docs scores 0 across the board
    miss = spark.createDataFrame(
        [("q", "x", 1)], "query_id string, doc_id string, rank int"
    )
    row2 = ranking_metrics(miss, qrels, k=3).head()
    assert row2["n_queries"] == 1
    assert (row2["ndcg_at_k"], row2["mrr_at_k"], row2["recall_at_k"]) == (0.0, 0.0, 0.0)
