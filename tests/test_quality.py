"""One-pass data-quality validation rules."""

from __future__ import annotations

from _spark_multi_format_data_lake_pipeline_spark.llm.quality import (
    Rule,
    distinct_ratio,
    in_range_ratio,
    null_ratio,
    validate,
)


def test_validate_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 150.0), (3, "c", 50.0), (3, "d", 60.0)],
        "id int, name string, score double",
    )
    rules = [
        Rule("name_null_ratio", null_ratio("name"), max_ok=0.3),
        Rule("id_unique", distinct_ratio("id"), min_ok=1.0),       # fails (dup 3)
        Rule("score_in_range", in_range_ratio("score", 0, 100), min_ok=0.9),  # fails (150)
    ]
    report = {r.rule: (r.value, r.passed) for r in validate(df, rules).collect()}
    assert report["name_null_ratio"] == (0.25, True)
    assert report["id_unique"] == (0.75, False)
    assert report["score_in_range"] == (0.75, False)


def test_validate_sampling_ops(spark, sf_dir):
    """df.sample + stratified sampleBy: statistical sanity (seeded)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    s = docs.sample(fraction=0.5, seed=42).count()
    assert 0.3 * n < s < 0.7 * n
    strat = docs.sampleBy("lang", fractions={"en": 1.0, "de": 0.0}, seed=42)
    langs = {r.lang for r in strat.select("lang").distinct().collect()}
    assert "de" not in langs and "en" in langs


class TestObservedMetrics:
    def test_metrics_ride_on_existing_action(self, spark, tmp_path):
        from _spark_multi_format_data_lake_pipeline_spark.llm.quality import (
            Rule,
            in_range_ratio,
            null_ratio,
            observation_report,
            observed,
        )

        df = spark.createDataFrame(
            [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)],
            "id bigint, v double",
        )
        rules = [
            Rule("v_null_ratio", null_ratio("v"), max_ok=0.3),
            Rule("v_in_range", in_range_ratio("v", 0, 35), min_ok=0.5),
        ]
        out, obs = observed(df, rules)
        # the only action is the write itself — metrics piggyback on it
        out.write.mode("overwrite").parquet(str(tmp_path / "out"))
        report = {r["rule"]: r for r in observation_report(obs, rules)}
        assert report["v_null_ratio"]["value"] == 0.25
        assert report["v_null_ratio"]["passed"]
        # in-range ratio: avg over non-null comparisons -> 2/3 of non-nulls...
        assert report["v_in_range"]["passed"]
