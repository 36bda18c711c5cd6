"""Count-min sketch (functions/sketches.py): overestimate-only guarantee,
error bound, and cell-wise shard mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _tokens(spark):
    # zipf-ish multiset: token t_k appears ~1000//(k+1) times
    rows = [(f"t_{k}",) for k in range(50) for _ in range(1000 // (k + 1))]
    return spark.createDataFrame(rows, "tok string")


def test_cms_never_underestimates_and_bounded(spark):
    toks = _tokens(spark)
    n_total = toks.count()
    width = 2048
    sketch = cms_build(toks, "tok", depth=4, width=width)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(sketch, exact.select("tok"), "tok", depth=4, width=width)
    joined = exact.join(est, "tok").collect()
    assert len(joined) == 50
    for r in joined:
        assert r.est_n >= r.n_exact, r
        # standard CMS bound: overestimate <= 2N/width w.h.p.
        assert r.est_n - r.n_exact <= 2 * n_total / width, r


def test_cms_sketch_is_bounded_size(spark):
    toks = _tokens(spark)
    sketch = cms_build(toks, "tok", depth=4, width=64)
    assert sketch.count() <= 4 * 64


def test_cms_shard_merge_equals_whole(spark):
    toks = _tokens(spark).withColumn(
        "shard", F.pmod(F.xxhash64("tok"), F.lit(2))
    )
    whole = cms_build(toks, "tok", depth=4, width=256)
    s0 = cms_build(toks.filter("shard = 0"), "tok", depth=4, width=256)
    s1 = cms_build(toks.filter("shard = 1"), "tok", depth=4, width=256)
    merged = cms_merge(s0, s1)
    diff = (
        whole.withColumnRenamed("cnt", "cnt_w")
        .join(merged.withColumnRenamed("cnt", "cnt_m"), ["d", "pos"], "full")
        .filter(
            F.coalesce(F.col("cnt_w"), F.lit(-1))
            != F.coalesce(F.col("cnt_m"), F.lit(-1))
        )
        .count()
    )
    assert diff == 0


def test_approx_percentile_close_to_exact(spark, sf_dir):
    from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES
    from pyspark.sql import functions as F
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    approx = {
        r["l_returnflag"]: (r["p50"], r["p90"], r["p99"])
        for r in QUERIES["q123_approx_percentiles"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: (r["e50"], r["e90"], r["e99"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("e90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("e99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, vals in approx.items():
        for a, e in zip(vals, exact[flag]):
            assert abs(a - e) <= max(abs(e) * 5e-3, 1.0), (flag, a, e)


def test_cms_sha_lane_matches_xxhash_guarantees(spark):
    """The sha256 lane (q135's oracle-pairable variant) obeys the same
    overestimate-only guarantee as the default xxhash64 lane."""
    toks = _tokens(spark)
    sketch = cms_build(toks, "tok", depth=4, width=2048, lane="sha256")
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
    est = cms_estimate(
        sketch, exact.select("tok"), "tok", depth=4, width=2048, lane="sha256"
    )
    for r in exact.join(est, "tok").collect():
        assert r.est_n >= r.n_exact, r


def test_hll_registers_estimate_within_error(spark, sf_dir):
    """q136's explicit register table must actually be an HLL: the standard
    estimator over the merged registers lands near exact count-distinct
    (m=64 -> ~13% standard error; assert 25%)."""
    from _spark_multi_format_data_lake_pipeline_spark.functions.sketches import (
        hll_estimate_registers,
        hll_merge_registers,
        hll_register_partials,
    )
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    partials = hll_register_partials(ev, "user_id", F.to_date("ts"), p=6)
    merged = hll_merge_registers(partials).collect()
    est = hll_estimate_registers(merged, p=6)
    assert abs(est - exact) / exact < 0.25, (est, exact)


def test_hll_partial_merge_equals_whole(spark, sf_dir):
    """Registers merged from per-day partials == registers built in one
    pass: the mergeability property that lets 100 TB pipelines maintain
    incremental sketches."""
    from _spark_multi_format_data_lake_pipeline_spark.functions.sketches import (
        hll_merge_registers,
        hll_register_partials,
    )
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    ev = load_table(spark, sf_dir, "events")
    per_day = hll_merge_registers(
        hll_register_partials(ev, "user_id", F.to_date("ts"), p=6)
    )
    one_pass = hll_merge_registers(
        hll_register_partials(ev, "user_id", F.lit(0), p=6)
    )
    assert sorted(map(tuple, per_day.collect())) == sorted(
        map(tuple, one_pass.collect())
    )
