"""End-to-end corpus curation funnel (llm/curation.py): one declarative
pass annotating drop reasons; planted docs land in the right funnel stage."""

import pytest
from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.llm.curation import (
    curate_corpus,
    curation_report,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest tonight under a pale cold moon"
)
OTHER = (
    "completely different subject matter here about spark catalyst plans "
    "and shuffle partitions during large scale joins on clusters"
)


@pytest.fixture(scope="module")
def annotated(spark):
    docs = spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE),                              # exact dup of 0
            (2, BASE + " extra trailing words"),    # near dup of 0
            (3, "hi"),                              # too short
            (4, "<p>" + BASE + "</p>"),             # html -> cleans to BASE -> exact dup
            (5, OTHER),                             # kept
        ],
        "doc_id bigint, text string",
    )
    return curate_corpus(docs, near_threshold=0.6).cache()


def test_funnel_reasons(annotated):
    got = {r["doc_id"]: r["drop_reason"] for r in annotated.collect()}
    assert got[0] is None
    assert got[1] == "exact_dup"
    assert got[2] == "near_dup"
    assert got[3] == "too_short"
    assert got[4] == "exact_dup"  # cleaning runs BEFORE dedup
    assert got[5] is None


def test_clean_text_stripped(annotated):
    r4 = annotated.filter("doc_id = 4").head()
    assert r4["clean_text"] == BASE


def test_report_is_one_groupby(annotated):
    rep = {r["stage"]: r["n_docs"] for r in curation_report(annotated).collect()}
    assert rep == {"kept": 2, "exact_dup": 2, "near_dup": 1, "too_short": 1}


def test_quality_gate_charged_before_dedup(spark):
    # a stopword-soup doc AND its exact copy: both low_quality, not dup
    soup = "the and of to is the and of to is the and of to is"
    docs = spark.createDataFrame(
        [(0, soup), (1, soup), (2, OTHER)], "doc_id bigint, text string"
    )
    out = curate_corpus(docs, max_stopword=0.5)
    got = {r["doc_id"]: r["drop_reason"] for r in out.collect()}
    assert got[0] == "low_quality" and got[1] == "low_quality"
    assert got[2] is None


def test_curated_set_is_null_filter(annotated):
    kept = annotated.filter(F.col("drop_reason").isNull())
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 5]


def test_checkpoint_dir_severs_lineage_from_source(spark, tmp_path):
    """The 100 TB posture: with checkpoint_dir, the cleaned stage lands in
    parquet and EVERY downstream branch scans those files — the source
    (and its regex chain) appears nowhere in the returned plan, proving
    the HTML/PII pass ran in exactly one job."""
    src_path = str(tmp_path / "src_docs")
    spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, "hi"), (3, OTHER)],
        "doc_id bigint, text string",
    ).write.parquet(src_path)
    docs = spark.read.parquet(src_path)

    ckpt = str(tmp_path / "ckpt")
    out = curate_corpus(
        docs, near_threshold=0.6, checkpoint_dir=ckpt, cache_cleaned=False
    )

    # the checkpoint materialized the cleaned stage
    cleaned = spark.read.parquet(ckpt + "/curation_cleaned")
    assert sorted(cleaned.columns) == ["clean_text", "id", "q_reason"]
    assert cleaned.count() == 4

    # every scan in the result plan reads the checkpoint, never the source
    files = out.inputFiles()
    assert files and all("curation_cleaned" in f for f in files)
    assert not any("src_docs" in f for f in files)

    # and the annotations are unchanged vs the persist posture
    got = {r["doc_id"]: r["drop_reason"] for r in out.collect()}
    assert got == {0: None, 1: "exact_dup", 2: "too_short", 3: None}


def test_hash_split_deterministic_salted_and_exhaustive(spark):
    """hash_split: pure function of (salt, key) — rerun-identical, every
    row assigned, fractions roughly honored, salt draws a fresh
    assignment, bad fractions refused."""
    from _spark_multi_format_data_lake_pipeline_spark.llm.curation import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = hash_split(df, "doc_id")
    counts = {
        r["split"]: r["cnt"]
        for r in a.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000  # nobody orphaned
    assert 0.74 < counts["train"] / 2000 < 0.86  # md5-uniform ~0.8
    # deterministic: a second evaluation is row-for-row identical
    b = hash_split(df, "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a different salt reassigns a nontrivial fraction
    c = hash_split(df, "doc_id", salt="seed-2")
    moved = a.join(c.withColumnRenamed("split", "split2"), "doc_id").filter(
        "split <> split2"
    )
    assert moved.count() > 200
    # custom fractions: last split absorbs the tail; sums must be 1
    d = hash_split(df, "doc_id", fractions={"fit": 0.5, "holdout": 0.5})
    assert {r["split"] for r in d.select("split").distinct().collect()} == {
        "fit",
        "holdout",
    }
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "doc_id", fractions={"a": 0.5, "b": 0.4})


def test_hash_split_trailing_zero_fractions(spark):
    """Edge the lexicographic CASE used to misroute: a trailing ZERO
    fraction makes the cumulative threshold reach the full hex range,
    where format() emits a 9-char string and every md5 starting a-f
    compared greater — the clamp assigns the full-range split
    everything and zero-fraction splits nothing."""
    from _spark_multi_format_data_lake_pipeline_spark.llm.curation import hash_split

    df = spark.range(0, 500).selectExpr("CAST(id AS string) AS doc_id")
    a = hash_split(df, "doc_id", fractions={"train": 1.0, "test": 0.0})
    assert a.groupBy("split").count().collect()[0]["split"] == "train"
    assert a.filter("split = 'test'").count() == 0
    # zero fraction in the MIDDLE: its threshold equals the previous
    # one, so it captures nothing; the others keep their mass
    b = hash_split(
        df, "doc_id", fractions={"a": 0.5, "b": 0.0, "c": 0.5}
    ).groupBy("split").count()
    got = {r["split"]: r["count"] for r in b.collect()}
    assert got.get("b", 0) == 0 and got["a"] + got["c"] == 500
