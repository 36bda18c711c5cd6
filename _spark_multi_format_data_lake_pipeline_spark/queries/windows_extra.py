"""Window-function completions: cume_dist, nth_value, range frames
(SURVEY.md §2 Part B 'Window functions': running & framed aggregates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "q36_cume_nth",
    oracle="""
    SELECT s_suppkey,
           ROUND(CUME_DIST() OVER w, 6) AS bal_cume,
           ROUND(NTH_VALUE(s_acctbal, 2) OVER (ORDER BY s_acctbal DESC, s_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_bal
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey)
    """,
    doc="cume_dist + nth_value(2) over the full frame.",
)
def q36_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return su.select(
        "s_suppkey",
        F.round(F.cume_dist().over(w), 6).alias("bal_cume"),
        F.round(F.nth_value("s_acctbal", 2).over(w_full), 2).alias("second_bal"),
    )


@register(
    "q37_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(CAST(o_orderdate AS TIMESTAMP))
                 RANGE BETWEEN 7776000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_last_90d
    FROM orders
    """,
    doc="RANGE frame over event-time (90 days in ms): value-based window, not "
        "row-based — counts all orders within the trailing window regardless "
        "of row position.",
)
def q37_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 24 * 3600 * 1000, Window.currentRow)
    )
    return od.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("orders_last_90d"),
    )


@register(
    "q167_groups_frame_rolling",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice / 10000) AS INT) AS price_bucket,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS bucket_total
        FROM orders
        GROUP BY o_orderpriority, CAST(FLOOR(o_totalprice / 10000) AS INT)
    )
    SELECT o_orderpriority, price_bucket,
           CAST(SUM(bucket_total) OVER (
               PARTITION BY o_orderpriority ORDER BY price_bucket
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling3
    FROM g
    """,
    doc="GROUPS-mode window frame semantics (rolling sum over the current "
        "plus 2 preceding PEER GROUPS, all tie rows included). Neither "
        "Spark nor DuckDB implements the SQL:2011 GROUPS frame natively, "
        "so the two sides prove each other through INDEPENDENT rewrites: "
        "Spark stays at row grain — dense_rank() as the frame ordinal, "
        "then a RANGE BETWEEN 2 PRECEDING frame over it (the canonical "
        "GROUPS-to-RANGE rewrite, every peer row counted) — while the "
        "oracle pre-aggregates to group grain and uses a ROWS frame. "
        "DECIMAL(18,2) sums keep the arithmetic exact so the two "
        "summation orders cannot drift in floating point.",
)
def q167_groups_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    rows = orders.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 10000).cast("int").alias("price_bucket"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    dr = Window.partitionBy("o_orderpriority").orderBy("price_bucket")
    frame = (
        Window.partitionBy("o_orderpriority")
        .orderBy("ordinal")
        .rangeBetween(-2, Window.currentRow)
    )
    return (
        rows.withColumn("ordinal", F.dense_rank().over(dr))
        .withColumn(
            "rolling3", F.sum("price").over(frame).cast("double")
        )
        .select("o_orderpriority", "price_bucket", "rolling3")
        .distinct()
    )


# ---------------------------------------------------------------------------
# q198 — running COUNT(DISTINCT …) OVER rewrite (first-occurrence flags)
# ---------------------------------------------------------------------------

@register(
    "q198_running_distinct_types",
    oracle="""
    SELECT e.user_id,
           epoch_us(e.ts) AS ts_us,
           e.event_type,
           CAST((SELECT COUNT(DISTINCT e2.event_type) FROM events e2
                 WHERE e2.user_id = e.user_id AND e2.ts <= e.ts) AS BIGINT)
             AS distinct_types_so_far
    FROM events e
    """,
    doc="Running COUNT(DISTINCT) over an ordered per-user window — an "
        "aggregate NO engine supports as a native windowed DISTINCT "
        "(Spark rejects it outright), rewritten as the classic "
        "first-occurrence-flag sum: row_number() over (user, type) "
        "marks each type's first sighting, a running SUM of the flags "
        "over the user timeline is the distinct count so far (per-user "
        "novelty accumulation — 'how many behaviors has this user "
        "exhibited yet', the engagement-breadth curve). Two windows, "
        "both keyed by user (the (user,type) exchange is a refinement "
        "of the user exchange). The oracle is an INDEPENDENT "
        "formulation — a correlated COUNT(DISTINCT) subquery per row — "
        "so the hash check proves the rewrite, not just the "
        "arithmetic. Completes the SQL-rewrite family beside q167's "
        "GROUPS-frame and q162's LATERAL.",
)
def q198_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts_us")
    w_run = Window.partitionBy("user_id").orderBy("ts_us")
    first = F.row_number().over(w_first) == 1
    return ev.select(
        "user_id",
        "ts_us",
        "event_type",
        F.sum(F.when(first, 1).otherwise(0))
        .over(w_run)
        .cast("bigint")
        .alias("distinct_types_so_far"),
    )
