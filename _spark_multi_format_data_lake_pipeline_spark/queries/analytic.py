"""Window functions, sorts/top-k, set operations, and the scalar function
library (SURVEY.md §2 Part B rows "Window functions" / "Sorts" / "Set ops" /
"Scalar functions").

All window specs carry a unique-key tiebreak in ORDER BY so ranks are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_group
from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q20 — ranking windows: top-3 orders per customer
# ---------------------------------------------------------------------------

@register(
    "q20_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """,
    doc="row_number window; Spark 3.5+ pushes a WindowGroupLimit below the shuffle "
        "so each task keeps only 3 rows per key.",
)
def q20_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        od,
        group=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "rnk",
    )


# ---------------------------------------------------------------------------
# q21 — rank/dense_rank/ntile/percent_rank in one pass
# ---------------------------------------------------------------------------

@register(
    "q21_customer_balance_ranks",
    oracle="""
    SELECT c_custkey,
           RANK()         OVER w AS bal_rank,
           DENSE_RANK()   OVER w AS bal_dense_rank,
           NTILE(4)       OVER w AS bal_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS bal_pct_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Unpartitioned ranking window — single-partition sort; fine for dim-sized "
        "inputs, deliberately NOT for fact tables.",
)
def q21_customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cu.select(
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    )


# ---------------------------------------------------------------------------
# q22 — running (framed) aggregate
# ---------------------------------------------------------------------------

@register(
    "q22_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS avg_last3
    FROM orders
    """,
    doc="Running sum + sliding 3-row average per customer.",
)
def q22_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_3 = base.rowsBetween(-2, Window.currentRow)
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w_3), 4).alias("avg_last3"),
    )


# ---------------------------------------------------------------------------
# q23 — lag/lead/first/last
# ---------------------------------------------------------------------------

@register(
    "q23_event_deltas",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value)  OVER w, 2) AS delta_prev,
           ROUND(LEAD(value) OVER w - value, 2) AS delta_next,
           ROUND(FIRST_VALUE(value) OVER w, 2)  AS first_val,
           ROUND(LAST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/lead/first/last over per-user event sequences; LAST_VALUE needs the "
        "full frame on both engines.",
)
def q23_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
        F.round(F.first("value").over(w), 2).alias("first_val"),
        F.round(F.last("value").over(w_full), 2).alias("last_val"),
    )


# ---------------------------------------------------------------------------
# q24/q25/q26 — set operations
# ---------------------------------------------------------------------------

@register(
    "q24_segment_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    doc="INTERSECT (set semantics, dedup) = df.intersect.",
)
def q24_segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(recent)


@register(
    "q25_segment_except",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    doc="EXCEPT (set semantics) = df.subtract (exceptAll would keep multiplicity).",
)
def q25_segment_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.subtract(recent)


@register(
    "q26_union_by_name",
    oracle="""
    SELECT entity_id, name, kind FROM (
        SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind FROM supplier
    )
    """,
    doc="unionByName with differing column orders on the Spark side — positional "
        "UNION ALL would silently mis-align; by-name resolution is the engine's default.",
)
def q26_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
    )
    # deliberately different column order — unionByName aligns by name
    su = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_suppkey").alias("entity_id"),
    )
    return cu.unionByName(su).select("entity_id", "name", "kind")


# ---------------------------------------------------------------------------
# q27 — string function battery
# ---------------------------------------------------------------------------

@register(
    "q27_part_name_features",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                             AS name_upper,
           LENGTH(p_name)                            AS name_len,
           SUBSTRING(p_name, 1, 4)                   AS name_prefix,
           regexp_extract(p_brand, '[0-9]+', 0)      AS brand_num,
           regexp_replace(p_name, ' ', '_', 'g')     AS name_snake,
           CONCAT(p_brand, ':', p_type)              AS brand_type,
           LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS n_words,
           TRIM(CONCAT('  ', p_name, '  '))          AS name_trimmed
    FROM part
    """,
    doc="upper/length/substring/regexp_extract/regexp_replace/concat/trim — "
        "JVM-side, codegen'd, no UDFs.",
)
def q27_part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        (
            F.length("p_name") - F.length(F.regexp_replace("p_name", " ", "")) + 1
        ).alias("n_words"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
    )


# ---------------------------------------------------------------------------
# q28 — date/time function battery
# ---------------------------------------------------------------------------

@register(
    "q28_order_date_features",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)::INT    AS order_year,
           EXTRACT(month FROM o_orderdate)::INT   AS order_month,
           EXTRACT(quarter FROM o_orderdate)::INT AS order_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', DATE '1995-01-01', o_orderdate)::INT  AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')    AS due_date
    FROM orders
    """,
    doc="extract/date_trunc/datediff/interval arithmetic; temporal outputs "
        "stringified for cross-engine hashing.",
)
def q28_order_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.expr("o_orderdate + INTERVAL 90 DAY"), "yyyy-MM-dd").alias("due_date"),
    )


# ---------------------------------------------------------------------------
# q29 — math + conditional battery
# ---------------------------------------------------------------------------

@register(
    "q29_price_buckets",
    oracle="""
    SELECT CASE WHEN l_extendedprice < 10000 THEN 'low'
                WHEN l_extendedprice < 40000 THEN 'mid'
                ELSE 'high' END AS price_bucket,
           COUNT(*) AS n_rows,
           ROUND(SUM(ROUND(l_extendedprice, 0)), 2)        AS sum_rounded,
           ROUND(AVG(ABS(l_extendedprice - 25000)), 4)     AS avg_abs_dev,
           ROUND(SUM(LN(l_extendedprice + 1)), 4)          AS sum_log,
           ROUND(SUM(POW(l_discount, 2)), 6)               AS sum_disc_sq,
           ROUND(SUM(SQRT(l_quantity)), 4)                 AS sum_sqrt_qty
    FROM lineitem
    GROUP BY 1
    """,
    doc="round/abs/ln/pow/sqrt + CASE WHEN bucketing.",
)
def q29_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_extendedprice") < 10000, "low")
        .when(F.col("l_extendedprice") < 40000, "mid")
        .otherwise("high")
    )
    return (
        li.withColumn("price_bucket", bucket)
        .groupBy("price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.round("l_extendedprice", 0)), 2).alias("sum_rounded"),
            F.round(F.avg(F.abs(F.col("l_extendedprice") - 25000)), 4).alias("avg_abs_dev"),
            F.round(F.sum(F.log(F.col("l_extendedprice") + 1)), 4).alias("sum_log"),
            F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
            F.round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q30 — array functions over the embedding column
# ---------------------------------------------------------------------------

@register(
    "q30_embedding_array_stats",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6)           AS first_component,
           ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS comp_sum,
           ROUND(list_max(embedding), 6)                    AS comp_max,
           len(list_filter(embedding, x -> x > 0))          AS n_positive
    FROM embeddings
    """,
    doc="size/element_at/aggregate/array_max/filter — Spark higher-order functions "
        "mirror DuckDB list lambdas.",
)
def q30_embedding_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("comp_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("comp_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q44_intersect_except_all",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F')
    SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    """,
    doc="Multiset set-ops: intersectAll/exceptAll preserve multiplicity "
        "(unlike q24/q25's set semantics).",
)
def q44_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))
    inter = a.intersectAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = a.exceptAll(b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.unionByName(exc)


@register(
    "q45_row_dedup",
    oracle="""
    SELECT DISTINCT o_orderkey, o_orderstatus FROM (
        SELECT o_orderkey, o_orderstatus FROM orders
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders
    )
    """,
    doc="Exact whole-row dedup via dropDuplicates() over a deliberately "
        "duplicated input — deterministic because rows are exact copies.",
)
def q45_row_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return od.unionByName(od).dropDuplicates()
