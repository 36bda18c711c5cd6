"""Unit tests for the round-5 depth operators: skyline, expectations,
PMI collocations, streaks, weighted median (queries/affinity.py,
operators/skyline.py, operators/expectations.py)."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.operators.expectations import (
    expect,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)
from _spark_multi_format_data_lake_pipeline_spark.operators.skyline import pareto_frontier_2d


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------

def _brute_frontier(pts):
    out = []
    for a in pts:
        dominated = any(
            b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])
            for b in pts
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_matches_bruteforce_random(spark):
    rng = random.Random(42)
    pts = [(rng.randint(0, 50), rng.randint(0, 50)) for _ in range(300)]
    df = spark.createDataFrame(pts, "cost int, gain int")
    got = sorted(
        (r["cost"], r["gain"])
        for r in pareto_frontier_2d(df, "cost", "gain", num_partitions=7).collect()
    )
    assert got == _brute_frontier(pts)


def test_skyline_keeps_exact_duplicates(spark):
    # duplicates of a frontier point do not dominate each other: all kept
    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 5)], "cost int, gain int"
    )
    got = sorted(
        (r["cost"], r["gain"]) for r in pareto_frontier_2d(df, "cost", "gain").collect()
    )
    assert got == [(1, 10), (1, 10)]


def test_skyline_excludes_null_coordinates(spark):
    df = spark.createDataFrame(
        [(1, 10), (None, 99), (0, None)], "cost int, gain int"
    )
    got = [
        (r["cost"], r["gain"]) for r in pareto_frontier_2d(df, "cost", "gain").collect()
    ]
    assert got == [(1, 10)]


def test_skyline_single_partition_equivalent(spark):
    rng = random.Random(7)
    pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(120)]
    df = spark.createDataFrame(pts, "cost int, gain int")
    one = sorted(
        (r["cost"], r["gain"])
        for r in pareto_frontier_2d(df, "cost", "gain", num_partitions=1).collect()
    )
    many = sorted(
        (r["cost"], r["gain"])
        for r in pareto_frontier_2d(df, "cost", "gain", num_partitions=13).collect()
    )
    assert one == many == _brute_frontier(pts)


# ---------------------------------------------------------------------------
# expectations
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # (id, price, status, code)
        (1, 10.0, "O", "1-A"),
        (1, 20.0, "F", "2-B"),      # duplicate id
        (2, -5.0, "O", "3-C"),      # price below range
        (3, 999.0, "X", "bad"),     # status out of set, code mismatch
        (None, 50.0, "F", "1-D"),   # null id
        (4, None, None, None),      # nulls: not violations except not_null(id)
    ]
    return spark.createDataFrame(
        rows, "id int, price double, status string, code string"
    )


def test_expectations_row_rules(spark, dirty):
    rules = [
        not_null("id_not_null", "id"),
        in_range("price_range", "price", 0, 100),
        in_set("status_domain", "status", ["O", "F"]),
        matches("code_format", "code", "^[1-9]-"),
    ]
    got = {r["rule"]: (r["n_violations"], r["n_checked"]) for r in expect(dirty, rules).collect()}
    assert got == {
        "id_not_null": (1, 6),
        "price_range": (2, 6),   # -5 and 999
        "status_domain": (1, 6),  # X (null not counted)
        "code_format": (1, 6),    # 'bad'
    }


def test_expectations_unique_and_fk(spark, dirty):
    ref = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    rules = [
        unique("id_unique", "id"),
        foreign_key("id_fk", "id", ref, "k"),
    ]
    got = {r["rule"]: (r["n_violations"], r["n_checked"]) for r in expect(dirty, rules).collect()}
    # unique: id=1 appears twice -> 1 surplus row; checked counts all rows
    assert got["id_unique"] == (1, 6)
    # fk: non-null ids are 1,1,2,3,4 -> 4 misses ref -> 1 violation of 5 checked
    assert got["id_fk"] == (1, 5)


def test_expectations_report_order_is_rule_order(spark, dirty):
    rules = [
        unique("z_first", "id"),
        not_null("a_second", "id"),
    ]
    names = [r["rule"] for r in expect(dirty, rules).collect()]
    assert names == ["z_first", "a_second"]


def test_expectations_contract_violations_raise(spark, dirty):
    from _spark_multi_format_data_lake_pipeline_spark.operators.expectations import Rule

    with pytest.raises(ValueError, match="at least one rule"):
        expect(dirty, [])
    with pytest.raises(ValueError, match="unrecognized rule kind"):
        expect(dirty, [Rule("typo", "in_rnge", ("price",))])
    with pytest.raises(ValueError, match="duplicate rule names"):
        expect(dirty, [not_null("same", "id"), unique("same", "id")])


def test_expectations_empty_table_reports_zero_not_null(spark):
    df = spark.createDataFrame([], "id int, v double")
    rules = [not_null("nn", "id"), in_range("rr", "v", 0, 10)]
    got = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in expect(df, rules).collect()
    }
    assert got == {"nn": (0, 0), "rr": (0, 0)}


def test_expectations_fk_shuffled_path_matches_broadcast(spark, dirty):
    ref = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    b = expect(dirty, [foreign_key("fk", "id", ref, "k")]).collect()
    s = expect(
        dirty, [foreign_key("fk", "id", ref, "k", broadcast_ref=False)]
    ).collect()
    assert [tuple(r) for r in b] == [tuple(r) for r in s]


def test_expectations_all_clean(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id int, v double")
    rules = [
        not_null("nn", "id"),
        in_range("rr", "v", 0, 10),
        unique("uu", "id"),
    ]
    got = {r["rule"]: r["n_violations"] for r in expect(df, rules).collect()}
    assert got == {"nn": 0, "rr": 0, "uu": 0}


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

def test_pmi_detects_planted_collocation(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import pmi_collocations

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        words = [rng.choice(vocab) for _ in range(30)]
        # plant "new york" often; its parts never occur alone
        for _ in range(3):
            j = rng.randrange(0, len(words) - 1)
            words[j : j + 2] = ["new", "york"]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5).collect()
    by_pair = {(r["w1"], r["w2"]): r["pmi"] for r in out}
    assert ("new", "york") in by_pair
    # the planted collocation has the highest PMI in the corpus
    assert by_pair[("new", "york")] == max(by_pair.values())
    # and PMI ~ ln(N_u) - ish positive; unrelated pairs sit near 0
    assert by_pair[("new", "york")] > 1.0


def test_pmi_counts_are_exact(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.retrieval import pmi_collocations

    df = spark.createDataFrame(
        [(0, "a b a b a b a b a b")], "doc_id long, text string"
    )
    out = {(r["w1"], r["w2"]): r["n_pair"] for r in pmi_collocations(df, min_count=1).collect()}
    assert out[("a", "b")] == 5
    assert out[("b", "a")] == 4


# ---------------------------------------------------------------------------
# streaks + weighted median (query-level, crafted frames)
# ---------------------------------------------------------------------------

def test_streak_islands_logic(spark):
    import datetime as dt

    rows = []
    # user 1: days 1,2,3 then 5,6 -> max streak 3, 2 streaks, 5 active days
    for d in (1, 2, 3, 5, 6):
        rows.append((1, dt.datetime(2024, 1, d)))
    # duplicate events on the same day must not break the streak
    rows.append((1, dt.datetime(2024, 1, 2, 12)))
    # user 2: isolated days -> max streak 1 (filtered out by >= 3)
    for d in (1, 3, 5):
        rows.append((2, dt.datetime(2024, 1, d)))
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")

    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    st = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    out = {
        r["user_id"]: (r["max_streak"], r["n_streaks"], r["active_days"])
        for r in st.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("max_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.sum("len").cast("bigint").alias("active_days"),
        )
        .filter(F.col("max_streak") >= 3)
        .collect()
    }
    assert out == {1: (3, 2, 5)}


def test_weighted_median_definition(spark):
    # values 1..4 with weights 1,1,1,7: total 10, half 5 ->
    # cum weights 1,2,3,10 -> first cum >= 5 is value 4
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 7.0)],
        "grp string, price double, w double",
    )
    from pyspark.sql import Window

    wo = Window.partitionBy("grp").orderBy("price")
    wt = Window.partitionBy("grp")
    c = df.select(
        "grp",
        "price",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    got = (
        c.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("grp")
        .agg(F.min("price").alias("wm"))
        .head()["wm"]
    )
    assert got == 4.0
    # unweighted sanity: equal weights -> lower median of 1..4 is 2
    eq = df.withColumn("w", F.lit(1.0))
    c2 = eq.select(
        "grp", "price",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    got2 = (
        c2.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("grp")
        .agg(F.min("price").alias("wm"))
        .head()["wm"]
    )
    assert got2 == 2.0


def test_grouped_running_sum_matches_window(spark):
    from pyspark.sql import Window
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    rng = random.Random(11)
    rows = []
    seen = set()
    for _ in range(500):
        g = rng.choice(["a", "b", "c"])
        o = rng.randint(0, 10_000)
        if (g, o) in seen:
            continue
        seen.add((g, o))
        rows.append((g, o, float(rng.randint(1, 9))))
    df = spark.createDataFrame(rows, "g string, o int, v double")

    w = Window.partitionBy("g").orderBy("o")
    expected = {
        (r["g"], r["o"]): r["cw"]
        for r in df.select("g", "o", F.sum("v").over(w).alias("cw")).collect()
    }
    for parts in (1, 7, 64):
        got = {
            (r["g"], r["o"]): r["cw"]
            for r in grouped_running_sum(
                df, ["g"], "o", "v", out_col="cw", num_partitions=parts
            ).collect()
        }
        assert got == expected, f"num_partitions={parts}"


def test_grouped_running_sum_multi_group_cols(spark):
    from pyspark.sql import Window
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    rows = [
        ("x", 1, 1, 2.0),
        ("x", 1, 2, 3.0),
        ("x", 2, 1, 5.0),
        ("y", 1, 1, 7.0),
        ("y", 1, 3, 1.0),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, o int, v double")
    w = Window.partitionBy("g1", "g2").orderBy("o")
    expected = {
        (r["g1"], r["g2"], r["o"]): r["cw"]
        for r in df.select("g1", "g2", "o", F.sum("v").over(w).alias("cw")).collect()
    }
    got = {
        (r["g1"], r["g2"], r["o"]): r["cw"]
        for r in grouped_running_sum(
            df, ["g1", "g2"], "o", "v", out_col="cw", num_partitions=3
        ).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# MMR re-rank
# ---------------------------------------------------------------------------

def _numpy_mmr(rel, sim, k, lam, mu):
    picked, remaining = [], set(rel)
    while remaining and len(picked) < k:
        if not picked:
            nxt = min(remaining, key=lambda c: (-rel[c], c))
        else:
            nxt = min(
                remaining,
                key=lambda c: (-(lam * rel[c] - mu * max(sim[(c, p)] for p in picked)), c),
            )
        picked.append(nxt)
        remaining.discard(nxt)
    return picked


def test_mmr_demotes_planted_duplicate(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import mmr_rerank

    rng = random.Random(5)
    dim = 8
    rows = [(0, [1.0] + [0.0] * (dim - 1))]  # query along e0
    # id 1: near-perfect match; id 2: EXACT clone of id 1; ids 3..12 random
    close = [0.99] + [0.01 * rng.random() for _ in range(dim - 1)]
    rows.append((1, close))
    rows.append((2, list(close)))
    for i in range(3, 13):
        rows.append((i, [rng.random() for _ in range(dim)]))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id long, embedding array<float>"
    )
    # diversity-heavy weights: with lam=0.7 a perfect clone still wins
    # (0.7*rel - 0.3*1.0 beats mediocre candidates); at lam=0.3/mu=0.7
    # the sim=1.0 penalty is decisive
    out = [
        r["vec_id"]
        for r in mmr_rerank(emb, 0, 1, 12, k=3, lam=0.3, mu=0.7).orderBy("rank").collect()
    ]
    # pure top-k would pick the clone second; MMR must NOT
    assert out[0] == 1
    assert out[1] != 2
    # ...but plain relevance ranking does pick it second (sanity of the planting)
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import topk_cosine
    q = [1.0] + [0.0] * (dim - 1)
    top = [r["vec_id"] for r in topk_cosine(emb.filter(F.col("vec_id") > 0), q, k=2).collect()]
    assert set(top) == {1, 2}


def test_mmr_matches_reference_greedy(spark, sf_dir):
    """Fully independent reference: cosines recomputed in numpy from the
    raw vectors (not through the engine's Spark expressions), rounded to
    the same 6 decimals, then the textbook greedy in plain Python. A
    formula error in the engine's cosine OR a selection-rule bug both
    break this equality (the 6-decimal pre-round is what makes numpy's
    different summation order agree with the JVM fold)."""
    import numpy as np

    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import mmr_rerank
    from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = [
        (r["rank"], r["vec_id"])
        for r in mmr_rerank(emb, 0, 1, 40, k=8).orderBy("rank").collect()
    ]
    rows = {
        r["vec_id"]: np.array(r["embedding"], dtype="float64")
        for r in emb.filter(F.col("vec_id") <= 40).collect()
    }
    qv = rows[0]

    def cos(u, v):
        return round(float(np.dot(u, v)) / (float(np.linalg.norm(u)) * float(np.linalg.norm(v))), 6)

    rel = {i: cos(v, qv) for i, v in rows.items() if i >= 1}
    sim = {
        (i, j): cos(rows[i], rows[j])
        for i in rel
        for j in rel
        if i != j
    }
    expected = list(enumerate(_numpy_mmr(rel, sim, 8, 0.7, 0.3), start=1))
    assert got == expected


def test_mmr_missing_query_raises(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import mmr_rerank

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="not found"):
        mmr_rerank(emb, 99, 1, 10)


def test_grouped_running_sum_null_group_key_raises(spark):
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    df = spark.createDataFrame(
        [("a", 1, 1.0), (None, 2, 2.0)], "g string, o int, v double"
    )
    with pytest.raises(ValueError, match="NULL values in group"):
        grouped_running_sum(df, ["g"], "o", "v")


def test_grouped_running_sum_column_collision_raises(spark):
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    df = spark.createDataFrame([("a", 1, 1.0, 0.0)], "g string, o int, v double, cw double")
    with pytest.raises(ValueError, match="already exist"):
        grouped_running_sum(df, ["g"], "o", "v", out_col="cw")
    # out_col colliding with an INTERNAL name would be silently dropped
    with pytest.raises(ValueError, match="out_col may not"):
        grouped_running_sum(df.drop("cw"), ["g"], "o", "v", out_col="_off")


def test_grouped_running_sum_group_cols_reversed_order(spark):
    """Multi-column groups passed in a DIFFERENT order than the DataFrame
    schema must still work (regression: the offset-table schema was built
    in df-schema order while tuples were in gcols order — mixed-type
    groups crashed, same-type groups silently returned empty)."""
    from pyspark.sql import Window
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    rows = [("x", 1, 1, 2.0), ("x", 1, 2, 3.0), ("y", 2, 1, 5.0)]
    df = spark.createDataFrame(rows, "g1 string, g2 int, o int, v double")
    w = Window.partitionBy("g1", "g2").orderBy("o")
    expected = {
        (r["g1"], r["g2"], r["o"]): r["cw"]
        for r in df.select("g1", "g2", "o", F.sum("v").over(w).alias("cw")).collect()
    }
    got = {
        (r["g1"], r["g2"], r["o"]): r["cw"]
        for r in grouped_running_sum(
            df, ["g2", "g1"], "o", "v", out_col="cw", num_partitions=3
        ).collect()
    }
    assert got == expected


def test_grouped_running_sum_all_null_value_slice(spark):
    """A group whose values are entirely NULL must not crash the driver
    accumulation; NULL values contribute nothing (window SUM skips them)."""
    from pyspark.sql import Window
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    rows = [("a", 1, None), ("a", 2, 3.0), ("b", 1, None), ("b", 2, None)]
    df = spark.createDataFrame(rows, "g string, o int, v double")
    w = Window.partitionBy("g").orderBy("o")
    expected = {
        (r["g"], r["o"]): r["cw"]
        for r in df.select("g", "o", F.sum("v").over(w).alias("cw")).collect()
    }
    got = {
        (r["g"], r["o"]): r["cw"]
        for r in grouped_running_sum(df, ["g"], "o", "v", out_col="cw", num_partitions=2).collect()
    }
    assert got == expected


def test_grouped_running_sum_decimal_values(spark):
    from _spark_multi_format_data_lake_pipeline_spark.operators.prefix import grouped_running_sum

    df = spark.sql(
        "SELECT * FROM VALUES ('a', 1, CAST(1.50 AS DECIMAL(15,2))), "
        "('a', 2, CAST(2.25 AS DECIMAL(15,2))) AS t(g, o, v)"
    )
    got = {
        r["o"]: r["cw"]
        for r in grouped_running_sum(df, ["g"], "o", "v", out_col="cw", num_partitions=2).collect()
    }
    assert got == {1: 1.5, 2: 3.75}


def test_skyline_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 2, 3)], "cost int, gain int, _best int")
    with pytest.raises(ValueError, match="already exist"):
        pareto_frontier_2d(df, "cost", "gain")


def test_basket_lift_independent_items_near_one(spark):
    # orders each containing both items A and B with item universe of 2:
    # perfectly dependent items -> lift = n_orders / (n_a * n_b) * c_ab
    rows = []
    for ok in range(10):
        rows.append((ok, "A"))
        rows.append((ok, "B"))
    lines = spark.createDataFrame(rows, "l_orderkey long, brand string")
    n = lines.select("l_orderkey").distinct().count()
    bc = {r["brand"]: r["c"] for r in lines.groupBy("brand").agg(F.count(F.lit(1)).alias("c")).collect()}
    a = lines.select("l_orderkey", F.col("brand").alias("brand_a"))
    b = lines.select(F.col("l_orderkey").alias("_ok"), F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .collect()
    )
    assert len(pairs) == 1
    c_ab = pairs[0]["c_ab"]
    lift = c_ab * n / (bc["A"] * bc["B"])
    assert c_ab == 10
    assert math.isclose(lift, 1.0)  # co-occur in every order: lift = 10*10/(10*10)


def test_observed_expectations_piggyback_on_action(spark, tmp_path):
    from _spark_multi_format_data_lake_pipeline_spark.operators.expectations import (
        in_range,
        not_null,
        observe,
        unique,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (None, 50.0), (3, -1.0)], "id int, v double"
    )
    rules = [not_null("id_nn", "id"), in_range("v_rng", "v", 0, 10)]
    observed, obs = observe(df, rules)
    # the metrics ride the caller's own action — here a parquet write
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_checked"] == 3
    assert got["id_nn"] == 1
    assert got["v_rng"] == 2  # 50.0 above range, -1.0 below

    with pytest.raises(ValueError, match="only supports row-level"):
        observe(df, [unique("u", "id")])
    with pytest.raises(ValueError, match="at least one rule"):
        observe(df, [])


def test_mmr_zero_norm_vector_raises(spark):
    from _spark_multi_format_data_lake_pipeline_spark.llm.similarity import mmr_rerank

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="zero-norm"):
        mmr_rerank(emb, 0, 1, 2, k=2)


def test_observe_rejects_duplicate_and_reserved_names(spark):
    from _spark_multi_format_data_lake_pipeline_spark.operators.expectations import (
        in_range,
        not_null,
        observe,
    )

    df = spark.createDataFrame([(1, 1.0)], "id int, v double")
    with pytest.raises(ValueError, match="duplicate rule names"):
        observe(df, [not_null("x", "id"), in_range("x", "v", 0, 1)])
    with pytest.raises(ValueError, match="reserved"):
        observe(df, [not_null("n_checked", "id")])
