"""Plan-property regression tests: the physical plans the engine promises
(PLANS.md) must not silently degrade — pushdown reaching parquet scans,
pruned read schemas, dims broadcast."""

from __future__ import annotations

import pytest

from _spark_multi_format_data_lake_pipeline_spark.queries import QUERIES


def _plan(spark, sf_dir, name) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(em)


def test_q01_filter_pushed_and_pruned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached the scan
    assert "l_orderkey" not in plan  # unused columns pruned from ReadSchema


def test_q06_two_predicate_pushdown(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_revenue_forecast")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity,24.0)" in plan


def test_q02_broadcasts_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_brand_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q05_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_nation_volume")
    assert "SortMergeJoin" not in plan or "BroadcastHashJoin" in plan
    # the one fact-side shuffle is the aggregation, not the joins
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q56_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q56_topk_cosine")
    assert "Exchange hashpartitioning" not in plan  # map + TakeOrdered only
    assert "TakeOrderedAndProject" in plan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned lake layout: a day filter must prune to that
    partition's files (PartitionFilters in the scan, fewer input files)."""
    import uuid
    from pyspark.sql import functions as F
    from _spark_multi_format_data_lake_pipeline_spark.catalog import CatalogManager
    from _spark_multi_format_data_lake_pipeline_spark.registry import TableHandle
    from _spark_multi_format_data_lake_pipeline_spark.sinks.writer import write_tables
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    db = f"prune_{uuid.uuid4().hex[:6]}"
    cat = CatalogManager(spark)
    try:
        events = load_table(spark, sf_dir, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        write_tables(
            spark,
            [TableHandle(events, "events_by_day", "PARQUET", events.count(), 7)],
            database=db,
            partition_by={"events_by_day": ["day"]},
            recreate_database=True,
        )
        t = spark.table(f"{db}.events_by_day")
        all_files = len(t.inputFiles())
        one_day = t.filter(F.col("day") == "2024-01-05")
        plan = one_day._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "day" in plan
        assert len(one_day.inputFiles()) < all_files
        assert one_day.count() > 0
    finally:
        cat.drop_database(db)


def test_runtime_bloom_filter_injects_into_probe_scan(spark, sf_dir):
    """session.py enables runtime bloom-filter pruning. Locally it stays
    dormant (Spark requires a >=10GB probe-side scan by default); this test
    lowers the runtime-settable threshold to prove the mechanism: the
    build side's join keys must appear as a might_contain() filter on the
    probe-side scan, which at 100 TB drops non-joinable fact rows before
    the shuffle."""
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    thr_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    old_thr, old_bcast = spark.conf.get(thr_key), spark.conf.get(bcast_key)
    try:
        spark.conf.set(thr_key, "0")
        spark.conf.set(bcast_key, "-1")  # force a shuffle join
        o = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        spark.conf.set(thr_key, old_thr)
        spark.conf.set(bcast_key, old_bcast)


def _simple_plan(spark, sf_dir, name) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    return df._jdf.queryExecution().explainString(em)


@pytest.mark.parametrize(
    "name,max_shuffles",
    [
        # explode→hash→64 partial MIN aggs map-side combined, bucket join:
        # sig shuffle + bucket groupBy + dropDuplicates = 3
        ("q54_minhash_near_dup", 3),
        # clean persist + exact-dedup groupBy + band join + two id-joins
        # + report groupBy = 7 (PLANS.md post-AQE section)
        ("q96_curation_funnel", 7),
        # content-sha window shuffle only; bucket assignment is map-only
        ("q144_leakage_safe_split", 1),
        # per-day register partials + merge = 2 groupBys
        ("q136_hll_register_twin", 2),
        # tf + df + per-doc score groupBys (df/stats ride broadcasts);
        # top-20 is TakeOrdered, never a global sort
        ("q146_bm25_topk", 4),
        # shingle window + (doc,g) distinct + per-doc rollup; the per-
        # shingle frequency joins back as a broadcast at test SF
        ("q147_duplicate_spans", 3),
        # one shuffle to the domain grain; normalizing window is
        # SinglePartition over O(#domains) rows
        ("q148_domain_mixture", 1),
        # bigram window + bigram/unigram count tables + per-doc avg;
        # vocab scalar rides a 1-row broadcast NLJ
        ("q149_bigram_surprisal", 5),
        # assignment is map-only column math; the one exchange is the
        # k-row cluster report (centroid seeds are literals)
        ("q150_kmeans_assign", 1),
        # daily rollup + spine/bounds reuse; gap join broadcasts at test SF
        ("q152_daily_gap_fill", 2),
        # activity distinct + contribution explode + dau/wau aggs
        ("q154_dau_wau_stickiness", 6),
        # tf grain then doc grain (window + rollup share the second)
        ("q155_token_entropy", 2),
        # 4 PageRank iterations over the ONCE-checkpointed edge list
        # (r17: the edge-derivation subtree appears exactly once; the
        # rank vector re-checkpoints every 5 rounds) — measured 29
        # static exchanges; growth past the margin means the lineage
        # cut regressed and iterations re-derive the edge join again
        ("q156_nation_trade_pagerank", 32),
        # LATERAL must rewrite to WindowGroupLimit, not per-row subqueries
        ("q162_lateral_top_orders", 2),
        # vocab df groupBy + per-doc position window + prefix join pair +
        # candidate distinct + rescore joins + degree groupBy; r6 removed
        # the vocab ranking window entirely (order by the (df_w, w) pair)
        ("q166_prefix_filter_neardup", 9),
        # one shuffle to (priority, bucket-ordinal) grain; both windows
        # share it
        ("q167_groups_frame_rolling", 1),
        # distinct day-list shuffle + user window; both groupBys reuse
        # the user_id exchange (anchor key is a superset)
        ("q168_activity_streaks", 2),
        # static references to the distinct-baskets subtree (a/b pruned
        # sides, brand counts x2, the frequent-brand prune, order total)
        # + pair groupBy + joins; AQE reuses the materialized basket
        # stage at runtime (ReusedExchange observed), so the fact is
        # scanned/shuffled once per distinct shuffle SHAPE, not per
        # reference
        ("q169_basket_brand_lift", 12),
        # bigram window + bigram/unigram count tables + two gram joins;
        # totals ride a 1-row broadcast (same family as q149)
        ("q170_pmi_collocations", 5),
        # (flag, price) pre-agg feeding BOTH the totals agg and the
        # range-partitioned running-sum stage (operators/prefix.py; its
        # sorted stage is persisted, so the pre-agg lineage in the static
        # plan executes once at runtime) + final report groupBy; the
        # cumulative sum itself is two RANGE exchanges + mapInPandas,
        # never a 3-partition window
        ("q171_weighted_median", 5),
        # row-level rules fold into ONE scan (SinglePartition aggs);
        # unique adds the only keyed groupBy; FK is a broadcast anti-join
        ("q173_expectations_report", 2),
        # three user-keyed stage groupBys + the progressive user_id
        # joins; AQE reuses the per-stage exchanges at runtime
        ("q174_funnel_time_percentiles", 10),
        # per-lang WindowGroupLimit system run + results/qrels
        # canonicalization groupBys + the (query, doc) metric joins; the
        # report is the one sanctioned 1-row agg (r6: +2 vs r5 because
        # the system run is now COMPUTED distributed — WindowGroupLimit
        # over lang — instead of injected as a driver literal)
        ("q177_ranking_metrics", 7),
        # ONE full-outer key join (sort-merge; bucketed tables make it
        # shuffle-free) — both snapshot scans shuffle once
        ("q179_table_diff", 2),
        # one shuffle to the user grain; window + island groupBy share it
        ("q180_merged_activity_spans", 1),
        # per-user conversions⋈touches + the channel rollup
        ("q181_attribution_linear", 2),
        # same join shape as q181; the weight CASE is column math
        ("q182_attribution_u", 2),
        # post-checkpoint plan: pid window exchange + island groupBy (the
        # range shuffle is inside the eager localCheckpoint)
        ("q185_global_busy_spans", 2),
        # ONE shuffle to the shard grain; offsets/floors are column math
        ("q186_packing_offsets", 1),
        # one shuffle to the user grain; lag + row_number + lead share it
        ("q187_scd2_user_state", 1),
        # per-side distinct gram sets + the pair groupBy; the bench side
        # and the train-size table ride broadcasts
        ("q193_decontamination", 3),
        # SCD build (user grain) + probe join reuses it; state rollup
        ("q194_point_in_time_state", 2),
        # business-key sha is map math; one month-grain groupBy
        ("q197_partition_checksums", 1),
        # (user,type) first-flag window refines the user running window
        ("q198_running_distinct_types", 2),
        # word-freq groupBy + pair groupBy; top-10 is TakeOrdered
        ("q199_bpe_merge_candidates", 2),
        # one shuffle to the user grain; lead window + rollup share it
        ("q200_time_weighted_value", 1),
        # single (user, bar) aggregation, map-side combinable
        ("q201_hourly_ohlc", 1),
        # user window (journey tag + lag/lead reuse it) + the pseudo-
        # state rollup; the union adds one exchange at the count grain
        ("q203_journey_transitions", 3),
        # doc window (gram leads) + gram-freq groupBy + freq join-back
        # + doc islands window; freq side broadcasts
        ("q209_duplicate_span_cuts", 4),
        # corpus→word-grain + (doc,word) grain + doc rollup; the vocab
        # ratio table and 1-row totals ride broadcasts
        ("q217_dsir_scores", 7),
        # within-brand-block pair join is ONE broadcast (dim-sized part
        # table locally; block-keyed shuffle at scale), zero hash
        # exchanges — FS scoring adds no movement beyond the pairing
        ("q215_fs_linkage_scores", 1),
        # cut-list pipeline (q209's 4) + the per-doc cut-array groupBy
        # and the doc-keyed rewrite join
        ("q213_span_removed_corpus", 7),
    ],
)
def test_heavy_llm_queries_hold_their_shuffle_budget(spark, sf_dir, name, max_shuffles):
    """Shuffle-budget pin for the heaviest LLM queries: an extra Exchange
    or any Python-eval node in these plans is a structural regression
    (each extra shuffle re-moves the whole corpus at 100 TB)."""
    plan = _simple_plan(spark, sf_dir, name)
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= max_shuffles, f"{name} grew to {n_shuffles} shuffles"
    assert "EvalPython" not in plan  # no Python in the hot path
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "q53_ngram_jaccard_pairs",
        "q87_incremental_dedup",
        "q128_embedding_near_dup",
        "q130_embedding_incremental_dedup",
    ],
)
def test_pair_queries_spread_the_nested_loop_stream_side(spark, sf_dir, name):
    """Regression guard for the single-partition BNLJ trap: every bounded
    pair/theta query must carry a round-robin repartition so the comparison
    work parallelizes (q75's pair stage was 9x slower without it; q75
    itself can't be plan-checked here — its union-find path has already
    executed by the time a DataFrame comes back, but it shares q53's
    pair-generation code)."""
    plan = _plan(spark, sf_dir, name)
    assert "REPARTITION_BY_NUM" in plan  # the user repartition survived


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Extends test_skew_bucketing.py::test_bucketed_join_avoids_shuffle
    (synthetic ranges, join only) to the real fact pair: orders⋈lineitem
    written bucketed on the order key must sort-merge-join with NO
    Exchange anywhere in the plan — including the downstream groupBy,
    which must INHERIT the bucket partitioning rather than re-shuffle.
    That inheritance is the larger half of the 100 TB payoff: one
    bucketed write amortizes over every subsequent join AND aggregation
    on the same key."""
    import uuid

    from pyspark.sql import functions as F
    from _spark_multi_format_data_lake_pipeline_spark.catalog import CatalogManager
    from _spark_multi_format_data_lake_pipeline_spark.registry import TableHandle
    from _spark_multi_format_data_lake_pipeline_spark.sinks.writer import write_tables
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    db = f"bkt_{uuid.uuid4().hex[:6]}"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    handles = [
        TableHandle(orders, "orders_b", "parquet", orders.count(), 3),
        TableHandle(lineitem, "lineitem_b", "parquet", lineitem.count(), 3),
    ]
    try:
        write_tables(
            spark,
            handles,
            database=db,
            bucket_by={"orders_b": (4, ["o_orderkey"]), "lineitem_b": (4, ["l_orderkey"])},
        )
        joined = (
            spark.table(f"{db}.orders_b")
            .hint("merge")  # force SMJ so broadcast can't mask the layout
            .join(
                spark.table(f"{db}.lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        plan = joined._jdf.queryExecution().explainString(em)
        assert "SortMergeJoin" in plan
        # bucket co-location: zero exchanges anywhere — the join consumes
        # bucket layout directly and the groupBy inherits it.
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is right: revenue rows for every order with items
        n = joined.count()
        expected = lineitem.select("l_orderkey").distinct().count()
        assert n == expected
    finally:
        CatalogManager(spark).drop_database(db)


@pytest.mark.parametrize(
    "name",
    ["q166_prefix_filter_neardup", "q177_ranking_metrics"],
)
def test_no_single_partition_funnel_in_fact_sized_paths(spark, sf_dir, name):
    """r6 regression guard for the two r5 VERDICT perf findings: q166's
    vocabulary ranking used to be ``row_number() OVER (ORDER BY df_w, w)``
    — a single-task sort of the whole vocabulary (10^8-10^9 tokens on a
    web corpus) — and q177's harness built its system run with an
    unpartitioned ranking window over every document. Both paths are now
    funnel-free: q166 orders prefixes by the (df_w, w) pair directly and
    q177 is a per-language WindowGroupLimit top-k. Any reappearing
    ``Exchange SinglePartition`` below a Window/Sort is a structural
    regression. (q177's FINAL one-row aggregate is the sole sanctioned
    single-partition exchange — a k-row reduce, not a data funnel.)"""
    plan = _simple_plan(spark, sf_dir, name)
    n_single = plan.count("Exchange SinglePartition")
    allowed = 1 if name == "q177_ranking_metrics" else 0
    assert n_single <= allowed, f"{name}: {n_single} single-partition exchanges"
