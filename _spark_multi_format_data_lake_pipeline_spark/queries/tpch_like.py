"""TPC-H-flavored analytical queries adapted to the testdata schema
(SURVEY.md §2 Part B: the deeper join/agg/subquery shapes — correlated
scalar subqueries, disjunctive pushdown, two-level aggregation, LIKE
patterns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q61 — promo revenue share (TPC-H Q14 shape: conditional agg ratio)
# ---------------------------------------------------------------------------

@register(
    "q61_promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    doc="Conditional-aggregate ratio over a broadcast join (TPC-H Q14 shape).",
)
def q61_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    pa = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q62 — customer order-count distribution (TPC-H Q13: two-level aggregation)
# ---------------------------------------------------------------------------

@register(
    "q62_customer_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    doc="Histogram of per-customer order counts: aggregate of an aggregate "
        "(TPC-H Q13). Second groupBy keys on the first's output.",
)
def q62_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# ---------------------------------------------------------------------------
# q63 — small-quantity-order revenue (TPC-H Q17: correlated scalar subquery)
# ---------------------------------------------------------------------------

@register(
    "q63_small_qty_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.7 * AVG(l_quantity) AS qty_thresh
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_thresh
    """,
    doc="TPC-H Q17: rows below 0.7x their part's average quantity. The "
        "correlated subquery decorrelates to an aggregate + self-join — "
        "written directly in that shape so both engines run the same plan.",
)
def q63_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.7 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(thresh, li.l_partkey == thresh.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q64 — disjunctive multi-attribute predicates (TPC-H Q19 shape)
# ---------------------------------------------------------------------------

@register(
    "q64_disjunctive_filter",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 25 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_type  = 'STANDARD' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    doc="OR-of-ANDs across both join sides (TPC-H Q19): Catalyst extracts "
        "common single-side conjuncts for pushdown, the rest filters post-join.",
)
def q64_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_type") == "STANDARD")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q65 — returned-item top customers (TPC-H Q10 shape, top-k join agg)
# ---------------------------------------------------------------------------

@register(
    "q65_returned_item_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Revenue lost to returns per customer, top-20 (TPC-H Q10).",
)
def q65_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q66 — bilateral trade volume (TPC-H Q7 shape: dual-dim join + year split)
# ---------------------------------------------------------------------------

@register(
    "q66_bilateral_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate)::INT AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7: nation-pair trade volume by year; two aliases of the same "
        "dim joined under different roles.",
)
def q66_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("volume"))
    )


# ---------------------------------------------------------------------------
# q67 — dormant rich customers (TPC-H Q22 shape: anti join + avg subquery)
# ---------------------------------------------------------------------------

@register(
    "q67_dormant_rich_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22: above-average balance AND no recent orders — scalar "
        "subquery + anti join in one query.",
)
def q67_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    )
    # broadcast the 1-row average instead of collect()ing it: the whole
    # query stays one lazy plan / one Spark job
    avg_bal = (
        cu.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(od, F.col("c_custkey") == od.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# q68 — LIKE patterns + order-size buckets
# ---------------------------------------------------------------------------

@register(
    "q68_widget_order_sizes",
    oracle="""
    WITH sizes AS (
        SELECT l.l_orderkey, COUNT(*) AS n_items
        FROM lineitem l
        WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey
                      AND p.p_name LIKE '%widget%')
        GROUP BY l.l_orderkey
    )
    SELECT CASE WHEN n_items <= 2 THEN 'small'
                WHEN n_items <= 5 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(n_items) AS BIGINT) AS total_items
    FROM sizes
    GROUP BY 1
    """,
    doc="LIKE '%widget%' semi join feeding a bucketed second-level aggregate.",
)
def q68_widget_order_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    sizes = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    bucket = (
        F.when(F.col("n_items") <= 2, "small")
        .when(F.col("n_items") <= 5, "medium")
        .otherwise("large")
    )
    return (
        sizes.withColumn("size_bucket", bucket)
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("total_items"),
        )
    )


# ---------------------------------------------------------------------------
# q160 — sole-blame suppliers (TPC-H Q21 shape: EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

@register(
    "q160_sole_blame_suppliers",
    oracle="""
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 50
    """,
    doc="TPC-H Q21 shape (returnflag standing in for the missing "
        "receipt/commit dates): suppliers solely to blame for returns in "
        "multi-supplier orders — a correlated EXISTS + NOT EXISTS pair. "
        "The Spark side DECORRELATES it into one per-order aggregate "
        "(distinct suppliers, distinct returning suppliers) joined back "
        "to the returned rows: one groupBy + one key-join instead of two "
        "correlated subquery scans — the shape that survives at 100 TB, "
        "while the oracle keeps the declarative EXISTS form, proving the "
        "rewrite's semantics, not just its plan.",
)
def q160_sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ord_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("ns"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nrs"),
    )
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(ord_stats, "l_orderkey")
        .filter((F.col("ns") >= 2) & (F.col("nrs") == 1))
    )
    return (
        blamed.join(F.broadcast(s), blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q161 — large-volume orders (TPC-H Q18 shape: IN over grouped HAVING)
# ---------------------------------------------------------------------------

@register(
    "q161_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 250, with "
        "their customers — an IN predicate over a grouped HAVING "
        "subquery. Spark plans the IN as a left-semi join against the "
        "pre-aggregated order totals (one lineitem groupBy reused as the "
        "filter), so the fact table never scans twice at full width; the "
        "final rollup rides the same orderkey partitioning.",
)
def q161_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )
