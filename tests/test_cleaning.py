"""Unit tests for llm/cleaning.py — the pieces the oracle can't see:
behavior on crafted dirty inputs (the catalog queries only exercise the
deterministic dirt synthesized from the clean corpus)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.llm.cleaning import (
    dedup_lines_corpus,
    redact_pii,
    repetition_signals,
    strip_html,
)


def _one(spark, s: str, expr) -> str:
    return spark.createDataFrame([(s,)], "t string").select(
        expr.alias("v")
    ).head()[0]


class TestRedactPii:
    def test_all_pii_kinds(self, spark):
        dirty = (
            "mail bob.smith+x@sub.example.co.uk, ip 192.168.001.1, "
            "ssn 123-45-6789, call 415-555-1234 or 415.555.9999"
        )
        out = _one(spark, dirty, redact_pii(F.col("t")))
        assert out == (
            "mail <EMAIL>, ip <IP>, ssn <SSN>, call <PHONE> or <PHONE>"
        )

    def test_clean_text_untouched(self, spark):
        s = "no pii here, just words and 42 numbers 1-2"
        assert _one(spark, s, redact_pii(F.col("t"))) == s

    def test_ip_not_phone_confusion(self, spark):
        # 4-quad dotted stays an IP; 3-part dashed number is a phone
        out = _one(spark, "10.0.0.7 and 555-123-4567", redact_pii(F.col("t")))
        assert out == "<IP> and <PHONE>"


class TestStripHtml:
    def test_tags_entities_whitespace(self, spark):
        dirty = '<div class="x"><p>a&amp;b</p>\n\n<br/>  5 &lt; 7 &quot;q&#39;s&quot;</div>'
        out = _one(spark, dirty, strip_html(F.col("t")))
        assert out == "a&b 5 < 7 \"q's\""

    def test_amp_decoded_last(self, spark):
        # "&amp;lt;" must decode to the literal "&lt;", not to "<"
        assert _one(spark, "x &amp;lt; y", strip_html(F.col("t"))) == "x &lt; y"


class TestRepetitionSignals:
    def test_known_fractions(self, spark):
        df = spark.createDataFrame(
            [
                (1, "aa bb aa bb aa"),  # 5 words, top 'aa'=3/5; 2-grams all dup after 2 distinct
                (2, "one two three four"),  # no repetition
                (3, "solo"),  # single word: dup_2gram_frac defined as 0
            ],
            "id bigint, text string",
        )
        rows = {
            r["id"]: r
            for r in repetition_signals(df, "id", "text").collect()
        }
        assert rows[1]["n_words"] == 5
        assert rows[1]["top_word_frac"] == pytest.approx(0.6)
        # 4 total 2-grams, 2 distinct ("aa bb", "bb aa") -> 0.5 duplicated
        assert rows[1]["dup_2gram_frac"] == pytest.approx(0.5)
        assert rows[1]["mean_word_len"] == pytest.approx(2.0)
        assert rows[2]["dup_2gram_frac"] == 0.0
        assert rows[2]["top_word_frac"] == pytest.approx(0.25)
        assert rows[3]["dup_2gram_frac"] == 0.0
        assert rows[3]["n_words"] == 1


class TestDedupLinesCorpus:
    def test_boilerplate_removed_unique_kept_in_order(self, spark):
        docs = [(i, f"intro {i}\nSUBSCRIBE NOW\nbody {i}") for i in range(5)]
        docs.append((99, "intro 99\nrare line\nbody 99"))
        df = spark.createDataFrame(docs, "id bigint, text string")
        out = {
            r["id"]: r
            for r in dedup_lines_corpus(df, "id", "text", min_docs=5).collect()
        }
        assert len(out) == 6
        # SUBSCRIBE NOW appears in 5 docs -> removed from those docs
        assert out[0]["clean_text"] == "intro 0\nbody 0"
        assert out[0]["n_removed"] == 1
        # 'rare line' appears once -> kept, order preserved
        assert out[99]["clean_text"] == "intro 99\nrare line\nbody 99"
        assert out[99]["n_removed"] == 0

    def test_all_lines_boilerplate_yields_empty(self, spark):
        df = spark.createDataFrame(
            [(i, "same\nsame2") for i in range(5)], "id bigint, text string"
        )
        out = dedup_lines_corpus(df, "id", "text", min_docs=5).collect()
        assert all(r["clean_text"] == "" and r["n_removed"] == 2 for r in out)

    def test_threshold_boundary(self, spark):
        # a line in exactly min_docs-1 docs survives
        df = spark.createDataFrame(
            [(i, f"u{i}\nshared") for i in range(4)], "id bigint, text string"
        )
        out = dedup_lines_corpus(df, "id", "text", min_docs=5).collect()
        assert all(r["n_removed"] == 0 for r in out)


class TestMinhashIncrementalFilter:
    def test_planted_duplicate_filtered_fresh_kept(self, spark):
        from _spark_multi_format_data_lake_pipeline_spark.llm.dedup import minhash_incremental_filter

        base = ("the quick brown fox jumps over the lazy dog and then runs "
                "far away into the deep green forest tonight").split()
        old = spark.createDataFrame(
            [(i, " ".join(base * 3) + f" variant {i}") for i in range(5)],
            "id bigint, text string",
        )
        new = spark.createDataFrame(
            [
                (100, " ".join(base * 3) + " variant 0"),  # near-copy of old id 0
                (101, " ".join(f"completely unrelated token{j} stream" for j in range(20))),
            ],
            "id bigint, text string",
        )
        kept = [
            r["id"]
            for r in minhash_incremental_filter(new, old, "id", "text").collect()
        ]
        assert kept == [101]
