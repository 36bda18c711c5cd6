"""Extended operator coverage: full/cross joins, grouping sets, pivot,
statistical aggregates, IN/EXISTS subqueries, map functions, approximate
distinct, language-ID (SURVEY.md §2 Part B rows not covered by the first
batch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import load_table, register_views
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q16 — full outer join
# ---------------------------------------------------------------------------

@register(
    "q16_full_outer_activity",
    oracle="""
    WITH rich AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000),
         recent AS (SELECT o_custkey, COUNT(*) AS n_recent
                    FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
                    GROUP BY o_custkey)
    SELECT COALESCE(r.c_custkey, o.o_custkey) AS custkey,
           ROUND(COALESCE(r.c_acctbal, -1), 2) AS acctbal,
           COALESCE(o.n_recent, 0) AS n_recent,
           (r.c_custkey IS NOT NULL) AS is_rich,
           (o.o_custkey IS NOT NULL) AS is_active
    FROM rich r FULL OUTER JOIN recent o ON r.c_custkey = o.o_custkey
    """,
    doc="Full outer join with exclusives on both sides; null-flag projection.",
)
def q16_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_acctbal")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    j = rich.join(recent, rich.c_custkey == recent.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.round(F.coalesce("c_acctbal", F.lit(-1.0)), 2).alias("acctbal"),
        F.coalesce("n_recent", F.lit(0)).alias("n_recent"),
        F.col("c_custkey").isNotNull().alias("is_rich"),
        F.col("o_custkey").isNotNull().alias("is_active"),
    )


# ---------------------------------------------------------------------------
# q17 — GROUPING SETS via the SQL surface
# ---------------------------------------------------------------------------

@register(
    "q17_grouping_sets",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
    doc="Explicit GROUPING SETS (not derivable from rollup/cube) through spark.sql.",
)
def q17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*) AS n_suppliers,
               ROUND(SUM(s_acctbal), 2) AS total_bal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


# ---------------------------------------------------------------------------
# q18 — approximate distinct (HLL) — engine-specific sketch → rows-only
# ---------------------------------------------------------------------------

@register(
    "q18_approx_distinct",
    oracle=None,
    doc="approx_count_distinct (HyperLogLog++). Sketches differ across engines "
        "→ rows-only; tests assert <5% error vs exact.",
)
def q18_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# ---------------------------------------------------------------------------
# q19 — statistical aggregate battery
# ---------------------------------------------------------------------------

@register(
    "q19_stats_battery",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4)  AS price_stddev,
           ROUND(VAR_SAMP(l_discount), 6)          AS disc_var,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS price_median,
           ROUND(CORR(l_quantity, l_extendedprice), 6)   AS qty_price_corr,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="stddev/variance/exact-percentile/corr/covar — Spark percentile() matches "
        "DuckDB quantile_cont (linear interpolation).",
)
def q19_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("price_median"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
    )


# ---------------------------------------------------------------------------
# q31 — pivot
# ---------------------------------------------------------------------------

@register(
    "q31_status_pivot",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="df.pivot with an explicit value list (never let pivot scan for distinct "
        "values at scale); oracle is the CASE-WHEN expansion pivot desugars to.",
)
def q31_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    joined = od.join(F.broadcast(cu), od.o_custkey == cu.c_custkey).join(
        F.broadcast(na), cu.c_nationkey == na.n_nationkey
    )
    p = (
        joined.groupBy("n_name")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "n_name",
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )


# ---------------------------------------------------------------------------
# q32 — language-ID heuristic (stopword voting)
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def _lang_scores_sql() -> str:
    parts = []
    for lang, words in _LANG_MARKERS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_intersect(string_split_regex(LOWER(TRIM(text)), '\\s+'), [{arr}])) AS s_{lang}"
        )
    return ", ".join(parts)


@register(
    "q32_lang_id_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang, {_lang_scores_sql()} FROM documents
    )
    SELECT lang AS actual_lang,
           CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY 1, 2
    """,
    doc="n-gram-free language-ID heuristic: distinct-stopword voting with a fixed "
        "tie-break order; output is the (actual, predicted) confusion matrix.",
)
def q32_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.withColumn("__toks", F.split(F.lower(F.trim("text")), r"\s+"))
    scored = toks.select(
        "lang",
        *[
            F.size(
                F.array_intersect("__toks", F.array(*[F.lit(w) for w in words]))
            ).alias(f"s_{lang}")
            for lang, words in _LANG_MARKERS.items()
        ],
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return (
        scored.withColumn("predicted_lang", predicted)
        .groupBy(F.col("lang").alias("actual_lang"), "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# q33 — IN / NOT IN subqueries through SQL
# ---------------------------------------------------------------------------

@register(
    "q33_in_subquery",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      AND p_size NOT IN (1, 2, 3)
    GROUP BY p_brand
    """,
    doc="IN-subquery (rewritten to left_semi by Catalyst) + NOT IN value list.",
)
def q33_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
          AND p_size NOT IN (1, 2, 3)
        GROUP BY p_brand
        """
    )


# ---------------------------------------------------------------------------
# q34 — map functions over parsed JSON props
# ---------------------------------------------------------------------------

@register(
    "q34_props_map_functions",
    oracle="""
    SELECT k.key AS prop_key,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT) AS sum_val
    FROM events, unnest(json_keys(props)) AS k(key)
    GROUP BY k.key
    """,
    doc="from_json to map<string,bigint> → explode(map) — the schema-free path "
        "for heterogeneous event payloads; map_keys/map_values surface.",
)
def q34_props_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = ev.select(F.explode(F.from_json("props", "map<string,bigint>")).alias("prop_key", "val"))
    return m.groupBy("prop_key").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("val").alias("sum_val"),
    )


# ---------------------------------------------------------------------------
# q35 — cross join (tiny dims only) + inequality filter
# ---------------------------------------------------------------------------

@register(
    "q35_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
    doc="Explicit cross join — only ever sane on tiny dims; the guard is the "
        "API requiring crossJoin() to be spelled out.",
)
def q35_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_a"))
    b = _t(spark, sf_dir, "region").select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") < F.col("region_b"))


# ---------------------------------------------------------------------------
# q83 — binned range join (point-in-interval as an equi-join)
# ---------------------------------------------------------------------------

@register(
    "q83_binned_range_join",
    oracle="""
    SELECT o.o_orderkey, COUNT(*) AS n_shipments
    FROM (SELECT o_orderkey,
                 date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS lo
          FROM orders WHERE o_orderkey % 97 = 0) o
    JOIN (SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d
          FROM lineitem) l
      ON l.d BETWEEN o.lo AND o.lo + 7
    GROUP BY o.o_orderkey
    """,
    doc="Pure range join (no equi key): shipments falling in a 7-day window "
        "after sampled order dates. operators/joins.py::binned_range_join "
        "rewrites the BETWEEN nested-loop into a bin-keyed equi-join + "
        "residual filter — the O(|P|*|I|) -> O(shuffle) rewrite that keeps "
        "interval joins alive at 100 TB. Oracle is the naive BETWEEN join.",
)
def q83_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import binned_range_join

    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("lo"),
        )
        .withColumn("hi", F.col("lo") + 7)
    )
    pts = _t(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("d")
    )
    j = binned_range_join(pts, iv, "d", "lo", "hi", bin_width=7)
    return j.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n_shipments"))


# ---------------------------------------------------------------------------
# q92 — calendar gap-fill (sequence/explode dimension generation)
# ---------------------------------------------------------------------------

@register(
    "q92_daily_gapfill",
    oracle="""
    WITH cal AS (
        SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-03-31',
                                      INTERVAL 1 DAY))::DATE AS d
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT strftime(cal.d, '%Y-%m-%d') AS day,
           COALESCE(daily.n_orders, 0)::BIGINT AS n_orders
    FROM cal LEFT JOIN daily USING (d)
    """,
    doc="Zero-filled daily order counts: a generated calendar dimension "
        "(F.sequence + explode — no source scan) left-joined to the daily "
        "aggregate. The calendar side is rows=days, always broadcastable; "
        "the fact side aggregates BEFORE the join so the shuffle carries "
        "one row per day, not per order.",
)
def q92_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = spark.range(1).select(
        F.explode(
            F.sequence(F.lit("1997-01-01").cast("date"), F.lit("1997-03-31").cast("date"))
        ).alias("d")
    )
    daily = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1997-04-01")
        )
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return cal.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q93 — fuzzy string matching (levenshtein)
# ---------------------------------------------------------------------------

@register(
    "q93_fuzzy_type_pairs",
    oracle="""
    WITH t AS (SELECT DISTINCT p_type FROM part)
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           levenshtein(a.p_type, b.p_type)::INT AS dist
    FROM t a JOIN t b ON a.p_type < b.p_type
    WHERE levenshtein(a.p_type, b.p_type) <= 6
    """,
    doc="Near-duplicate category labels by edit distance: distinct-value "
        "self-join + levenshtein <= 6. The distinct projection shrinks the "
        "pair space from |part|^2 to |vocab|^2 — the standard trick for "
        "fuzzy-matching label columns whose vocabulary is tiny relative to "
        "the table.",
)
def q93_fuzzy_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "part").select("p_type").distinct()
    a, b = t.alias("a"), t.alias("b")
    dist = F.levenshtein(F.col("a.p_type"), F.col("b.p_type"))
    return (
        a.join(b, F.col("a.p_type") < F.col("b.p_type"))
        .filter(dist <= 6)
        .select(
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
            dist.cast("int").alias("dist"),
        )
    )


# ---------------------------------------------------------------------------
# q94 — equi-width histogram (width_bucket)
# ---------------------------------------------------------------------------

@register(
    "q94_price_histogram",
    oracle="""
    -- DuckDB has no width_bucket; this CASE is the exact arithmetic Spark's
    -- WidthBucket uses (width = (max-min)/n = 5000.0, same IEEE doubles)
    SELECT CASE WHEN l_extendedprice < 0 THEN 0
                WHEN l_extendedprice >= 100000 THEN 21
                ELSE CAST(FLOOR(l_extendedprice / 5000.0) + 1 AS INT) END AS bucket,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_price
    FROM lineitem
    GROUP BY 1
    """,
    doc="Equi-width price histogram via width_bucket — single map-side-"
        "combined aggregation, shuffle carries only n_buckets rows. DuckDB "
        "lacks width_bucket, so the oracle spells out the same bucket "
        "arithmetic.",
)
def q94_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.width_bucket("l_extendedprice", F.lit(0), F.lit(100000), F.lit(20))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# q95 — unpivot / melt (inverse of q31's pivot)
# ---------------------------------------------------------------------------

@register(
    "q95_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, value
    FROM (
        SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
        FROM part
    ) UNPIVOT (value FOR metric IN (p_size, p_retailprice))
    """,
    doc="Wide→long unpivot (inverse of q31's pivot): each part row becomes "
        "one row per metric. Map-only (no shuffle) — the melt shape that "
        "feeds generic metric stores.",
)
def q95_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# q99 — recursive CTE (iterative transitive closure in pure SQL)
# ---------------------------------------------------------------------------

_Q99_SQL = """
    WITH RECURSIVE chain AS (
        SELECT s_suppkey AS id, 0 AS depth FROM supplier WHERE s_suppkey = 1
        UNION ALL
        SELECT s.s_suppkey, c.depth + 1
        FROM supplier s JOIN chain c ON {half} = c.id
        WHERE s.s_suppkey > 1
    )
    SELECT depth, COUNT(*) AS n_nodes,
           CAST(MIN(id) AS BIGINT) AS min_id, CAST(MAX(id) AS BIGINT) AS max_id
    FROM chain GROUP BY depth
"""


@register(
    "q99_recursive_hierarchy",
    oracle=_Q99_SQL.format(half="s.s_suppkey // 2"),
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): treat supplier keys as an "
        "implicit binary org-chart (parent = key div 2) and walk it from "
        "the root, counting nodes per depth. Each iteration is one "
        "hash-join stage; the frontier shrinks geometrically, exactly how "
        "an iterative closure should behave on a cluster.",
)
def q99_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q99_SQL.format(half="s.s_suppkey DIV 2"))


# ---------------------------------------------------------------------------
# q102 — deterministic list aggregation (collect_list + sort discipline)
# ---------------------------------------------------------------------------

@register(
    "q102_sorted_listagg",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_csv
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Per-nation sorted roster: collect_list is order-nondeterministic "
        "under parallel aggregation, so the engine ALWAYS array_sort()s "
        "before joining to a string — the discipline that makes list "
        "aggregation reproducible on any cluster shape. Oracle uses "
        "string_agg ORDER BY.",
)
def q102_sorted_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    return (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias(
                "supplier_csv"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q103 — file provenance via the _metadata column (rows-only)
# ---------------------------------------------------------------------------

@register(
    "q103_file_provenance",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name, COUNT(*) AS n_rows
    FROM lineitem
    """,
    doc="Per-input-file lineage: the hidden _metadata struct exposes "
        "file_name/file_size for every row at zero cost (populated from "
        "the scan, no extra IO) — the debugging handle for 'which file "
        "produced this bad row' on a million-file lake. DuckDB has no "
        "_metadata column, but the testdata layout is one parquet file per "
        "table, so the oracle pins both the count AND that Spark "
        "attributes every row to exactly that file (a second file or a "
        "wrong basename breaks the row-count/hash match).",
)
def q103_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# q104 — referential-integrity validation across the lake
# ---------------------------------------------------------------------------

@register(
    "q104_referential_integrity",
    oracle="""
    SELECT 'orders_without_customer' AS violation, COUNT(*) AS n
    FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_without_order' AS violation, COUNT(*) AS n
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_without_part' AS violation, COUNT(*) AS n
    FROM lineitem l ANTI JOIN part p ON l.l_partkey = p.p_partkey
    """,
    doc="Foreign-key orphan audit: one anti-join per relationship, counts "
        "unioned into a single report. Anti joins broadcast the key-only "
        "side when it fits and otherwise shuffle just the keys — the "
        "cheapest possible conformance sweep over a lake, run after every "
        "ingest batch.",
)
def q104_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")

    def _orphans(name, child, parent, ck, pk):
        return (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("violation"), "n")
        )

    return (
        _orphans("orders_without_customer", od, cu, "o_custkey", "c_custkey")
        .unionAll(_orphans("lineitem_without_order", li, od, "l_orderkey", "o_orderkey"))
        .unionAll(_orphans("lineitem_without_part", li, pa, "l_partkey", "p_partkey"))
    )


# ---------------------------------------------------------------------------
# q105 — struct -> JSON serialization (to_json export payloads)
# ---------------------------------------------------------------------------

@register(
    "q105_json_export",
    oracle="""
    SELECT o_orderkey,
           to_json(struct_pack(
               o_orderkey := o_orderkey,
               status := o_orderstatus,
               priority := o_orderpriority,
               order_date := strftime(o_orderdate, '%Y-%m-%d'),
               price_floor := CAST(FLOOR(o_totalprice) AS BIGINT)
           ))::VARCHAR AS payload
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
    doc="Row -> JSON-document serialization for export feeds: to_json over "
        "a struct projection renders each row as a compact JSON string "
        "entirely inside codegen (no Python), the inverse of the q40/q41 "
        "parse path. Ints/strings only in the payload (float-to-text "
        "differs across engines); FLOOR not CAST for the price (DuckDB "
        "casts double->bigint by rounding, Spark by truncation). Filter "
        "pushes to the scan, so the export reads only matching row groups.",
)
def q105_json_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.filter((F.col("o_orderstatus") == "F")
                  & (F.col("o_orderpriority") == "1-URGENT"))
        .select(
            "o_orderkey",
            F.to_json(F.struct(
                F.col("o_orderkey"),
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("priority"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
                F.floor("o_totalprice").cast("bigint").alias("price_floor"),
            )).alias("payload"),
        )
    )


# ---------------------------------------------------------------------------
# q106 — class-balanced deterministic sampling (training-mix rebalancing)
# ---------------------------------------------------------------------------

@register(
    "q106_balanced_lang_sample",
    oracle="""
    SELECT lang, doc_id, rk
    FROM (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY sha256(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS rk
        FROM documents
    ) WHERE rk <= 50
    """,
    doc="Class-balanced downsampling for training mixes: cap each language "
        "at K docs, chosen by ranking on sha256(doc_id) so the sample is "
        "deterministic and engine-portable (no RNG state, no seed drift "
        "across cluster shapes). One shuffle on the class key; "
        "WindowGroupLimit pushes the rank<=K cut below the sort at scale. "
        "Rebalancing a 100 TB multilingual corpus is this exact plan with "
        "a bigger K.",
)
def q106_balanced_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.sha2(F.col("doc_id").cast("string"), 256), "doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 50)
    )


# ---------------------------------------------------------------------------
# q107 — percentile winsorization (outlier clipping before training)
# ---------------------------------------------------------------------------

@register(
    "q107_winsorized_values",
    oracle="""
    WITH pct AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           ROUND(AVG(e.value), 4) AS raw_avg,
           ROUND(AVG(LEAST(GREATEST(e.value, p.p01), p.p99)), 4)
               AS winsorized_avg,
           COUNT(*) AS n_events
    FROM events e JOIN pct p ON e.event_type = p.event_type
    GROUP BY e.event_type
    """,
    doc="Winsorization: clip a metric to its per-class [p1, p99] band "
        "before it feeds training stats, the standard outlier guard for "
        "reward/quality signals. Exact interpolated percentile "
        "(F.percentile == DuckDB quantile_cont) on a tiny per-class agg, "
        "broadcast back over the fact table, clip with least/greatest in "
        "codegen. Two scans of events but only one shuffle of it; the "
        "percentile table is classes-sized, never fact-sized.",
)
def q107_winsorized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", 0.01).alias("p01"),
        F.percentile("value", 0.99).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(F.broadcast(pct), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 4).alias("raw_avg"),
            F.round(F.avg(clipped), 4).alias("winsorized_avg"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# q108 — ANSI-safe dirty-data promotion (try_cast / try_divide)
# ---------------------------------------------------------------------------

@register(
    "q108_try_cast_promotion",
    oracle="""
    WITH dirty AS (
        SELECT lang,
               TRY_CAST(CASE WHEN doc_id % 7 = 0 THEN source
                             ELSE CAST(n_chars AS VARCHAR) END AS BIGINT)
                   AS parsed,
               CASE WHEN doc_id % 5 = 0 THEN NULL
                    ELSE n_chars / (doc_id % 5) END AS safe_ratio
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
           CAST(COUNT(*) - COUNT(parsed) AS BIGINT) AS n_failed,
           CAST(ROUND(AVG(parsed), 2) AS DOUBLE) AS avg_parsed,
           CAST(ROUND(AVG(safe_ratio), 4) AS DOUBLE) AS avg_ratio
    FROM dirty GROUP BY lang
    """,
    doc="Typed promotion of dirty string data under ANSI mode (Spark 4 "
        "default): try_cast turns unparseable values into NULL instead of "
        "failing the job, try_divide absorbs div-by-zero — the correct "
        "posture for promoting all-string CSV ingests (reference "
        "schema_manager.py:57 reads every CSV column as string) to typed "
        "columns without a cluster-wide abort on one bad cell. Dirty "
        "values derived deterministically (every 7th doc gets a "
        "non-numeric string). Oracle spells TRY_CAST + a NULL-guard CASE "
        "for the divide.",
)
def q108_try_cast_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dirty = F.when(F.col("doc_id") % 7 == 0, F.col("source")).otherwise(
        F.col("n_chars").cast("string")
    )
    n = F.count(F.lit(1))
    return (
        docs.select(
            "lang",
            dirty.try_cast("bigint").alias("parsed"),
            F.try_divide("n_chars", F.col("doc_id") % 5).alias("safe_ratio"),
        )
        .groupBy("lang")
        .agg(
            n.alias("n_docs"),
            F.count("parsed").alias("n_parsed"),
            (n - F.count("parsed")).alias("n_failed"),
            F.round(F.avg("parsed"), 2).alias("avg_parsed"),
            F.round(F.avg("safe_ratio"), 4).alias("avg_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# q109 — robust outlier detection via median absolute deviation
# ---------------------------------------------------------------------------

@register(
    "q109_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, m.med,
               median(ABS(e.value - m.med)) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type, m.med
    )
    SELECT e.event_type,
           ROUND(m.med, 4) AS med,
           ROUND(m.mad, 4) AS mad,
           CAST(SUM(CASE WHEN ABS(e.value - m.med) > 3 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(e.value) AS BIGINT) AS n_values
    FROM events e JOIN mad m ON e.event_type = m.event_type
    GROUP BY e.event_type, m.med, m.mad
    """,
    doc="Robust outlier flagging: per-class median + MAD (median absolute "
        "deviation), the estimator that survives the heavy-tailed value "
        "distributions a mean/stddev z-score chokes on. Two tiny per-class "
        "aggregates broadcast back over the fact table; the fact table "
        "shuffles on the class key for the medians but the final flagging "
        "pass is join+codegen only. F.median == DuckDB median "
        "(interpolated) on identical doubles.",
)
def q109_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    is_out = (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")).cast("int")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(is_out).alias("n_outliers"),
            F.count("value").alias("n_values"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
            "n_values",
        )
    )


# ---------------------------------------------------------------------------
# q110 — contiguous stable-ID assignment (distributed row numbering)
# ---------------------------------------------------------------------------

@register(
    "q110_stable_ids",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
               AS stable_id
    FROM documents
    """,
    doc="Global contiguous ids without the global-window trap: the oracle "
        "is row_number() OVER (ORDER BY ...) which Spark would execute in "
        "a SINGLE task; the engine instead range-partitions, counts per "
        "partition (P longs to the driver), prefix-sums offsets, and "
        "numbers each partition independently (operators/ids.py). "
        "Bit-identical output, every stage parallel — how a 100 TB corpus "
        "gets its example ids.",
)
def q110_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ids import assign_contiguous_ids

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_contiguous_ids(docs, ["doc_id"], id_col="stable_id")


# ---------------------------------------------------------------------------
# q111 — count-min sketch token frequencies (mergeable, rows-only)
# ---------------------------------------------------------------------------

@register(
    "q111_cms_token_freq",
    oracle=None,
    doc="Count-min sketch frequency estimation (functions/sketches.py): "
        "token stream -> depth x width counter table (one groupBy, "
        "map-side partial agg), estimates = MIN over hash lanes. "
        "Mergeable across shards by cell-wise addition — the incremental "
        "companion to the q101 HLL sketch, answering 'how frequent is "
        "this token corpus-wide' from kilobytes. xxhash64 lanes have no "
        "DuckDB twin -> rows-only; tests prove the overestimate-only "
        "guarantee and shard-merge equivalence, and the sha256-lane twin "
        "q135 hash-checks the identical sketch algebra cross-engine.",
)
def q111_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sketches import cms_build, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    exact_top = (
        tokens.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok"))
        .limit(20)
    )
    sketch = cms_build(tokens, "tok")
    est = cms_estimate(sketch, exact_top.select("tok"), "tok")
    return (
        exact_top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "n_exact",
            "est_n",
            (F.col("est_n") >= F.col("n_exact")).alias("never_under"),
        )
        .orderBy(F.col("n_exact").desc(), "token")
    )


# ---------------------------------------------------------------------------
# q135 — count-min sketch with sha256 lanes (oracle-paired twin of q111)
# ---------------------------------------------------------------------------

@register(
    "q135_cms_sha_twin",
    oracle=r"""
    WITH tk AS (
        SELECT tok FROM (
            SELECT unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    lanes AS (SELECT d FROM (VALUES (0), (1), (2), (3)) AS v(d)),
    cells AS (
        SELECT d,
               CAST(('0x' || substr(sha256(CAST(d AS VARCHAR) || ':' || tok), 1, 8))
                    AS BIGINT) % 1024 AS pos,
               COUNT(*) AS cnt
        FROM tk CROSS JOIN lanes
        GROUP BY 1, 2
    ),
    top AS (
        SELECT tok, COUNT(*) AS n_exact FROM tk GROUP BY tok
        ORDER BY n_exact DESC, tok LIMIT 20
    ),
    probe AS (
        SELECT top.tok, top.n_exact, lanes.d,
               CAST(('0x' || substr(sha256(CAST(lanes.d AS VARCHAR) || ':' || top.tok), 1, 8))
                    AS BIGINT) % 1024 AS pos
        FROM top CROSS JOIN lanes
    )
    SELECT p.tok AS token, p.n_exact,
           MIN(COALESCE(c.cnt, 0)) AS est_n,
           MIN(COALESCE(c.cnt, 0)) >= p.n_exact AS never_under
    FROM probe p LEFT JOIN cells c USING (d, pos)
    GROUP BY 1, 2
    """,
    doc="Oracle-paired twin of q111: the IDENTICAL count-min pipeline "
        "(functions/sketches.py cms_build/cms_estimate) with sha256-derived "
        "hash lanes instead of xxhash64, so DuckDB rebuilds the exact "
        "counter matrix and the driver hash-checks build + merge-shape + "
        "estimate end-to-end (q134's hex-prefix pattern). q111 remains the "
        "production path — xxhash64 is one JVM intrinsic per lane vs "
        "sha256's hex round-trip — and its overestimate-only/merge "
        "guarantees are pinned by tests; this twin proves the relational "
        "sketch algebra itself is engine-exact.",
)
def q135_cms_sha_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sketches import cms_build, cms_estimate

    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    exact_top = (
        tokens.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("tok"))
        .limit(20)
    )
    sketch = cms_build(tokens, "tok", depth=4, width=1024, lane="sha256")
    est = cms_estimate(
        sketch, exact_top.select("tok"), "tok", depth=4, width=1024, lane="sha256"
    )
    return (
        exact_top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "n_exact",
            "est_n",
            (F.col("est_n") >= F.col("n_exact")).alias("never_under"),
        )
    )


# ---------------------------------------------------------------------------
# q112 — benchmark-contamination sweep (word 5-gram overlap)
# ---------------------------------------------------------------------------

@register(
    "q112_contamination_overlap",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(words) >= 3
                   THEN [array_to_string(words[i:i+2], ' ')
                         for i in range(1, len(words) - 1)]
                   ELSE []::VARCHAR[] END) AS grams
        FROM w
    ),
    bench AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 37 = 0
    ),
    cand AS (
        SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 37 <> 0
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(b.gram) AS BIGINT) AS n_overlap,
           ROUND(COUNT(b.gram)::DOUBLE / COUNT(*), 4) AS ratio
    FROM cand c LEFT JOIN bench b ON c.gram = b.gram
    GROUP BY c.doc_id
    HAVING COUNT(b.gram) > 0
    """,
    doc="Benchmark decontamination: flag training docs sharing word "
        "3-grams with a held-out 'benchmark' set (every 37th doc stands "
        "in). Shingles stay exact strings so the check is oracle-paired; "
        "at 100 TB the bench shingle set is small and broadcasts, making "
        "the sweep one map + one broadcast join over the exploded corpus "
        "— the shape every contamination audit runs before a training "
        "cut. Words column bound before the transform lambda (HOFs "
        "re-evaluate outer expressions per element).",
)
def q112_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words")
    )
    nw = F.size(F.col("words"))
    grams = F.when(
        nw >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), nw - 3),
                lambda i: F.array_join(F.slice(F.col("words"), i + 1, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", grams.alias("grams"))
    bench = (
        g.filter(F.col("doc_id") % 37 == 0)
        .select(F.explode("grams").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cand = g.filter(F.col("doc_id") % 37 != 0).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        cand.join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_overlap"),
            F.round(F.count("_hit") / F.count(F.lit(1)), 4).alias("ratio"),
        )
        .filter(F.col("n_overlap") > 0)
    )


# ---------------------------------------------------------------------------
# q113 — token-budget sequence packing (context-window binning)
# ---------------------------------------------------------------------------

@register(
    "q113_sequence_packing",
    oracle=r"""
    WITH t AS (
        SELECT lang, doc_id,
               CAST(len(string_split_regex(LOWER(TRIM(text)), '\s+'))
                    AS BIGINT) AS tok
        FROM documents
    ),
    packed AS (
        SELECT lang, tok,
               CAST(FLOOR((SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) - tok)
                          / 2048.0) AS BIGINT) AS bin
        FROM t
    )
    SELECT lang, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS total_tokens
    FROM packed GROUP BY lang, bin
    """,
    doc="Sequence packing for pretraining batches: docs stream into "
        "2048-token context windows per language; bin id falls out of a "
        "running token cumsum (each doc starts at its preceding total), "
        "so packing is ONE window pass — no iterative bin-packing loop, "
        "which is what makes it tractable on a 100 TB corpus. The "
        "greedy-sequential discipline also keeps bins stable under "
        "re-runs (deterministic doc order).",
)
def q113_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    tok = F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = docs.select(
        "lang",
        tok.alias("tok"),
        F.floor((F.sum(tok).over(w) - tok) / F.lit(2048.0)).alias("bin"),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# q114 — exact mergeable distinct counts via bitmap partials
# ---------------------------------------------------------------------------

@register(
    "q114_bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="EXACT distinct counting that still merges like a sketch: ids map "
        "to (bucket, bit) via bitmap_bucket_number/bitmap_bit_position, "
        "each (group, bucket) aggregates to a 4KB bitmap "
        "(bitmap_construct_agg), counts sum per group. Unlike "
        "COUNT(DISTINCT) — whose dedup must see all ids for a group in "
        "one place — bitmap partials OR together, so daily partials "
        "roll up into monthly exact uniques without rescanning, and the "
        "bucket key fans the shuffle out across (group x bucket) instead "
        "of concentrating on hot groups. HLL (q101) trades that exactness "
        "for fixed size; this is the exact tier of the same design.",
)
def q114_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    partial = (
        ev.select(
            "event_type",
            F.bitmap_bucket_number("user_id").alias("bucket"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return partial.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users")
    )


# ---------------------------------------------------------------------------
# q115 — dynamic pivot (two-phase: enumerate, then pivot)
# ---------------------------------------------------------------------------

@register(
    "q115_dynamic_pivot",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS status_p
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Dynamic pivot discipline: pivot columns are enumerated by a "
        "first (tiny, distinct-on-dictionary) pass, then passed "
        "EXPLICITLY to pivot() — never inferred inside the pivot, which "
        "would force Spark to run that distinct scan serially inside "
        "planning and makes output schemas drift run-to-run. Sorted "
        "value list keeps the column order deterministic. Oracle spells "
        "the same pivot as conditional aggregates.",
)
def q115_dynamic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    statuses = sorted(
        r[0] for r in od.select("o_orderstatus").distinct().collect()
    )
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "n_name",
            *[
                F.col(s).alias(f"status_{s.lower()}")
                for s in statuses
            ],
        )
    )


# ---------------------------------------------------------------------------
# q116 — argmax (max_by) with a deterministic composite tie-break
# ---------------------------------------------------------------------------

@register(
    "q116_argmax_top_customer",
    oracle="""
    SELECT n.n_name,
           arg_max(c.c_name,
                   printf('%012.2f-%010d', c.c_acctbal + 10000, c.c_custkey))
               AS top_customer,
           ROUND(MAX(c.c_acctbal), 2) AS top_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Argmax without a window: max_by/arg_max picks the row attribute "
        "at the group maximum in ONE aggregation pass — no rank window, "
        "no self-join, half the shuffles of the row_number()=1 "
        "formulation (q20) when only the top-1 attribute is needed. Ties "
        "are broken deterministically by a zero-padded composite sort key "
        "(value, id) — engine-portable where struct-valued arg_max is "
        "not; +10000 keeps negative balances sorting correctly as text.",
)
def q116_argmax_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    key = F.format_string(
        "%012.2f-%010d", F.col("c_acctbal") + 10000, F.col("c_custkey")
    )
    return (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", key).alias("top_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q117 — forward-fill imputation (last non-null carried forward)
# ---------------------------------------------------------------------------

@register(
    "q117_forward_fill_purchase",
    oracle="""
    SELECT event_id, user_id,
           ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value
                            END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING), 2) AS last_purchase
    FROM events
    """,
    doc="Forward-fill: carry each user's most recent purchase amount onto "
        "every subsequent event — the standard imputation / "
        "state-at-event-time feature for training data, done with "
        "last(..., ignorenulls) over a running frame instead of a "
        "self-join against the purchase history (which would shuffle the "
        "fact table twice). One window pass, one shuffle on user_id; "
        "event_id in the order key makes same-timestamp fills "
        "deterministic.",
)
def q117_forward_fill_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.last(pv, ignorenulls=True).over(w), 2).alias("last_purchase"),
    )


# ---------------------------------------------------------------------------
# q118 — CDC batch application (insert/update/delete upsert)
# ---------------------------------------------------------------------------

@register(
    "q118_cdc_apply",
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice,
               o_orderdate, o_orderpriority,
               CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
        FROM orders WHERE o_orderkey % 7 IN (0, 1)
    ),
    survivors AS (
        SELECT o.* FROM orders o
        ANTI JOIN changes c ON o.o_orderkey = c.o_orderkey
    ),
    final AS (
        SELECT * FROM survivors
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority
        FROM changes WHERE op <> 'D'
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM final GROUP BY o_orderstatus
    """,
    doc="CDC application (sinks/cdc.py): a change batch with deletes "
        "(every 7th order) and updates (+10% price) applied as "
        "anti-join-the-keys + union-the-upserts — the full I/U/D surface "
        "the reference's MERGE (utils/merge_utils.py:70-82) lacks. "
        "Changes derived deterministically from orders; verified through "
        "a per-status rollup of the post-CDC state.",
)
def q118_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.cdc import apply_cdc_batch

    od = _t(spark, sf_dir, "orders")
    changes = (
        od.filter(F.col("o_orderkey") % 7 <= 1)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn(
            "op",
            F.when(F.col("o_orderkey") % 7 == 0, "D").otherwise("U"),
        )
    )
    final = apply_cdc_batch(od, changes, ["o_orderkey"])
    return final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# q119 — overlapping document chunking (RAG / embedding prep)
# ---------------------------------------------------------------------------

@register(
    "q119_doc_chunking",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               string_split_regex(LOWER(TRIM(text)), '\s+') AS words
        FROM documents
    ),
    c AS (
        SELECT doc_id, words, unnest(range(0, len(words), 96)) AS s
        FROM w
    )
    SELECT doc_id,
           CAST(s // 96 AS BIGINT) AS chunk_idx,
           CAST(LEAST(128, len(words) - s) AS BIGINT) AS n_chunk_tokens,
           sha256(array_to_string(words[s+1:s+128], ' ')) AS chunk_hash
    FROM c
    """,
    doc="Sliding-window chunking for embedding/RAG pipelines: 128-token "
        "chunks with 32-token overlap (stride 96), generated by "
        "sequence+transform+explode entirely in codegen — each document "
        "expands to its chunks in the same task that scanned it, no "
        "shuffle until whatever aggregates the chunks. Chunk text is "
        "verified by sha256 so the oracle compares content, not just "
        "geometry. The words column is bound before the lambda (HOF "
        "re-evaluation pitfall).",
)
def q119_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("words")
    )
    n = F.size(F.col("words"))
    starts = F.sequence(F.lit(0), n - 1, F.lit(96))
    return (
        w.select("doc_id", "words", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            (F.col("s") / 96).cast("bigint").alias("chunk_idx"),
            F.least(F.lit(128), n - F.col("s")).cast("bigint").alias(
                "n_chunk_tokens"
            ),
            F.sha2(
                F.array_join(F.slice(F.col("words"), F.col("s") + 1, 128), " "),
                256,
            ).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# q120 — inverted index (posting lists) over documents
# ---------------------------------------------------------------------------

@register(
    "q120_inverted_index",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
        FROM documents
    ),
    td AS (
        SELECT term, doc_id, COUNT(*) AS occ FROM w GROUP BY term, doc_id
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(SUM(occ) AS BIGINT) AS term_freq,
           array_to_string(list_sort(list(doc_id))[1:8], ',') AS posting_sample
    FROM td GROUP BY term HAVING COUNT(*) >= 4
    """,
    doc="Search-index build: term -> document-frequency, corpus term "
        "frequency, and the first 8 doc_ids of the (sorted) posting list. "
        "Scale shape: explode -> (term, doc_id) pre-aggregation (map-side "
        "combined, collapses per-doc repeats BEFORE any per-term state), "
        "then a term-keyed window caps the posting sample at 8 doc_ids so "
        "no unbounded collect_list ever materializes a stop-word's full "
        "posting list; the final groupBy reuses the window's hash "
        "partitioning (no third exchange). Posting truncation happens "
        "pre-aggregation — the full list is never built.",
)
def q120_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    )
    td = exploded.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("occ"))
    rn = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    return (
        td.withColumn("rn", rn)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("occ").alias("term_freq"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(F.col("rn") <= 8, F.col("doc_id")))
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("posting_sample"),
        )
        .filter(F.col("doc_freq") >= 4)
    )


# ---------------------------------------------------------------------------
# q121 — deterministic weighted sampling (data mixing)
# ---------------------------------------------------------------------------

@register(
    "q121_weighted_sample",
    oracle=r"""
    WITH k AS (
        SELECT source, doc_id, n_chars,
               POW((CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 1) / 4294967296.0,
                   1.0 / n_chars) AS key
        FROM documents
    )
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY key DESC, doc_id) AS rk
          FROM k)
    WHERE rk <= 5
    """,
    doc="Efraimidis-Spirakis A-ES weighted sampling without RNG state: "
        "each row's key is u^(1/w) with u derived from sha256(doc_id) "
        "(engine-portable, partitioning-independent — the SAME rows are "
        "chosen on any cluster shape) and w = n_chars, so longer documents "
        "are proportionally more likely to be kept; top-5 per source = a "
        "deterministic weighted sample for corpus mixing. Scale: one "
        "shuffle on source + WindowGroupLimit prunes to 5 rows per "
        "partition map-side before the exchange. The float key is ranked "
        "but never output (libm pow may differ in the last ulp across "
        "engines; orderings are stable, exact bits are not).",
)
def q121_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.sampling import aes_key

    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        aes_key("doc_id", "n_chars").alias("key"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.desc("key"), F.asc("doc_id"))
    )
    return (
        keyed.withColumn("rk", rk)
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "n_chars", "rk")
    )


# ---------------------------------------------------------------------------
# q122 — one-pass per-column profiling report
# ---------------------------------------------------------------------------

@register(
    "q122_column_profile",
    oracle=r"""
    SELECT 'o_custkey' AS column_name,
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_count,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_custkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           printf('%.2f', MIN(o_totalprice)), printf('%.2f', MAX(o_totalprice))
    FROM orders
    """,
    doc="Data-profiling report (null count, exact distinct, min/max per "
        "column) in ONE scan. The naive formulation (the oracle, and most "
        "hand-written profilers) re-scans the table once per column — 4 "
        "scans vs 1 here. Deliberately NOT one big agg of N "
        "count_distincts: Spark plans multiple distincts as "
        "Expand(xN)+triple aggregation, and min/max over STRING columns "
        "has an immutable agg buffer that forces SortAggregate — the "
        "expanded row set gets globally sorted three times (~3x slower "
        "measured, and a guaranteed spill at 100 TB). Instead stack() "
        "unpivots to (column, value) long rows FIRST (pipelined, no "
        "shuffle), a hash aggregation collapses to distinct values with "
        "map-side combine, and the tiny per-column rollup sorts only "
        "|distinct values| rows. Numeric columns carry a parallel double "
        "so min/max stay numerically ordered; the formatter applies at "
        "the end.",
)
def q122_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rows = o.select(
        F.expr(
            """
            stack(4,
              'o_custkey',       cast(o_custkey as string),    cast(o_custkey as double),
              'o_orderpriority', o_orderpriority,              cast(null as double),
              'o_orderstatus',   o_orderstatus,                cast(null as double),
              'o_totalprice',    cast(o_totalprice as string), o_totalprice
            ) AS (column_name, value_str, value_num)
            """
        )
    )
    per_val = rows.groupBy("column_name", "value_str").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("value_num").alias("value_num")
    )
    prof = per_val.groupBy("column_name").agg(
        F.coalesce(
            F.sum(F.when(F.col("value_str").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("null_count"),
        F.count(F.when(F.col("value_str").isNotNull(), 1)).alias("n_distinct"),
        F.min("value_num").alias("min_num"),
        F.max("value_num").alias("max_num"),
        F.min("value_str").alias("min_str"),
        F.max("value_str").alias("max_str"),
    )

    def _fmt(num, s):
        return (
            F.when(
                F.col("column_name") == "o_custkey",
                num.cast("bigint").cast("string"),
            )
            .when(
                F.col("column_name") == "o_totalprice",
                F.format_string("%.2f", num),
            )
            .otherwise(s)
        )

    return prof.select(
        "column_name",
        F.col("null_count").cast("bigint").alias("null_count"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        _fmt(F.col("min_num"), F.col("min_str")).alias("min_val"),
        _fmt(F.col("max_num"), F.col("max_str")).alias("max_val"),
    )


# ---------------------------------------------------------------------------
# q123 — approximate percentiles (mergeable quantile sketch)
# ---------------------------------------------------------------------------

@register(
    "q123_approx_percentiles",
    oracle=None,  # sketch internals are engine-specific -> rows-only check;
    # tests/test_sketches.py bounds the error against exact percentiles.
    doc="Approximate p50/p90/p99 of l_extendedprice per return flag via "
        "approx_percentile (Greenwald-Khanna sketch, accuracy 10000 -> "
        "error <= 0.01%%). Completes the approximate-aggregate tier "
        "(q18/q101 HLL distinct, q111 count-min frequency): exact "
        "percentile (q19/q107) needs the full sorted value set per group "
        "— a massive state at 100 TB — while the GK sketch is fixed-size, "
        "map-side partial-merged, and one-pass, the only percentile that "
        "scales. Engine-specific sketch -> rows-only driver check; the "
        "pytest bounds it against the exact percentile (GK guarantees "
        "RANK error <= n/accuracy, so the value tolerance is "
        "distribution-dependent; 0.5%% relative holds easily here).",
)
def q123_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    acc = 10000
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.percentile_approx("l_extendedprice", 0.5, acc), 2
        ).alias("p50"),
        F.round(
            F.percentile_approx("l_extendedprice", 0.9, acc), 2
        ).alias("p90"),
        F.round(
            F.percentile_approx("l_extendedprice", 0.99, acc), 2
        ).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q133 — exact percentiles (oracle-paired twin of q123)
# ---------------------------------------------------------------------------

@register(
    "q133_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5) + 1e-6, 2) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9) + 1e-6, 2) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99) + 1e-6, 2) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="EXACT p50/p90/p99 per return flag — the hash-checked twin of "
        "q123's GK sketch (both engines define the continuous percentile "
        "as linear interpolation between order statistics, so values match "
        "to the cent). Exact percentile holds the full sorted value set "
        "per group, so at 100 TB it is the wrong default (q123 is); it "
        "earns its place as the driver-verifiable anchor that also bounds "
        "q123's sketch error in tests/test_sketches.py. The 1e-6 nudge "
        "before ROUND is a tie stabilizer, identical on both sides: "
        "2-decimal prices make interpolated percentiles land EXACTLY on "
        "the .005 rounding boundary (a p50 midpoint of two cents always "
        "does), where each engine's last-ulp arithmetic — not semantics — "
        "decides the direction; the nudge moves the boundary off that "
        "accumulation set.",
)
def q133_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.5) + 1e-6, 2).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.9) + 1e-6, 2).alias("p90"),
        F.round(F.percentile("l_extendedprice", 0.99) + 1e-6, 2).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q134 — deterministic epoch shuffle (training shard + order assignment)
# ---------------------------------------------------------------------------

@register(
    "q134_epoch_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               sha256('1:' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8 AS shard,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY CAST(('0x' || substr(hx, 1, 8)) AS BIGINT) % 8
                ORDER BY hx, doc_id) AS INT) AS pos
    FROM h
    """,
    doc="Deterministic epoch shuffle for training: shard in [0,8) and "
        "within-shard position both derive from sha256(seed:doc_id) "
        "(operators/sampling.py::epoch_shard_order). A new seed re-deals "
        "the whole corpus (next epoch); the same seed reproduces the deal "
        "bit-for-bit on any engine or cluster shape — what orderBy(rand) "
        "cannot promise. One shuffle on shard; each shard sorts N/8 rows.",
)
def q134_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import epoch_shard_order

    docs = _t(spark, sf_dir, "documents")
    return epoch_shard_order(docs, "doc_id", n_shards=8, seed=1).select(
        "doc_id", "shard", "pos"
    )


# ---------------------------------------------------------------------------
# q124 — distribution drift between corpus batches (KL divergence)
# ---------------------------------------------------------------------------

@register(
    "q124_lang_drift",
    oracle=r"""
    WITH d AS (
        SELECT source, lang,
               CASE WHEN doc_id % 2 = 0 THEN 'old' ELSE 'new' END AS batch
        FROM documents
    ),
    w AS (
        SELECT source, lang,
               CAST(COUNT(*) FILTER (WHERE batch = 'old') AS BIGINT) AS c_old,
               CAST(COUNT(*) FILTER (WHERE batch = 'new') AS BIGINT) AS c_new
        FROM d GROUP BY source, lang
    ),
    t AS (
        SELECT source,
               CAST(SUM(c_old) AS BIGINT) AS n_old,
               CAST(SUM(c_new) AS BIGINT) AS n_new,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM w GROUP BY source
    )
    SELECT w.source, t.n_old, t.n_new,
           ROUND(SUM(
               ((c_new + 1.0) / (n_new + v)) *
               LN(((c_new + 1.0) / (n_new + v)) /
                  ((c_old + 1.0) / (n_old + v)))
           ), 6) + 0.0 AS kl_new_vs_old
    FROM w JOIN t ON w.source = t.source
    GROUP BY w.source, t.n_old, t.n_new
    """,
    doc="Dataset-shift monitor: per source, the add-one-smoothed KL "
        "divergence of the NEW batch's language distribution against the "
        "OLD batch's (batch = deterministic doc_id parity split here; in "
        "production, ingestion date). This is the guard that catches a "
        "crawler or upstream filter silently changing the corpus mix "
        "before it poisons a training run. Scale: two map-side-combined "
        "aggregations over (source, lang) — the joined distribution table "
        "is |sources|x|langs| rows, trivially broadcast; the raw corpus "
        "is scanned once. Smoothing keeps langs absent from one batch "
        "finite; KL rounded at 6dp (ln is libm-identical to last-ulp "
        "noise only) and -0.0-canonicalized on both sides.",
)
def q124_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        F.when(F.col("doc_id") % 2 == 0, "old").otherwise("new").alias("batch"),
    )
    w = d.groupBy("source", "lang").agg(
        F.sum(F.when(F.col("batch") == "old", 1).otherwise(0)).alias("c_old"),
        F.sum(F.when(F.col("batch") == "new", 1).otherwise(0)).alias("c_new"),
    )
    t = w.groupBy("source").agg(
        F.sum("c_old").alias("n_old"),
        F.sum("c_new").alias("n_new"),
        F.count(F.lit(1)).alias("v"),
    )
    j = w.join(F.broadcast(t), "source")
    p = (F.col("c_new") + 1.0) / (F.col("n_new") + F.col("v"))
    q = (F.col("c_old") + 1.0) / (F.col("n_old") + F.col("v"))
    return (
        j.groupBy("source", "n_old", "n_new")
        .agg((F.round(F.sum(p * F.log(p / q)), 6) + F.lit(0.0)).alias("kl_new_vs_old"))
    )


# ---------------------------------------------------------------------------
# q125 — cross-modal join: text metadata ⋈ embedding vectors
# ---------------------------------------------------------------------------

@register(
    "q125_crossmodal_norms",
    oracle=r"""
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(d.n_chars), 2) AS avg_chars,
           ROUND(AVG(sqrt(list_sum(
               list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x)
           ))), 4) AS avg_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
    doc="Cross-modal audit joining the text table to its vector table "
        "(doc_id = vec_id): per language, document count, mean length, "
        "and mean embedding L2 norm — the sanity check that catches a "
        "mis-normalized or silently-truncated embedding batch per corpus "
        "slice. The norm is a codegen'd array fold (F.aggregate, elements "
        "cast to double BEFORE multiply so both engines accumulate in "
        "f64), computed map-side in the scan task; the join ships only "
        "(vec_id, norm), never the vectors. At 100 TB both sides are "
        "bucketed on the id so the join is shuffle-free.",
)
def q125_crossmodal_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    em = _t(spark, sf_dir, "embeddings")
    norms = em.select(
        "vec_id",
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("norm"),
    )
    return (
        docs.join(norms, docs.doc_id == norms.vec_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# q126 — corpus token-budget report (mixture shares per source)
# ---------------------------------------------------------------------------

@register(
    "q126_token_budget",
    oracle=r"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                    ELSE len(string_split_regex(TRIM(text), '\s+')) END)
                    AS BIGINT) AS tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, tokens,
           ROUND(tokens * 1.0 / SUM(tokens) OVER (), 4) AS share,
           ROUND(SUM(tokens) OVER (ORDER BY tokens DESC, source)
                 * 1.0 / SUM(tokens) OVER (), 4) AS cum_share
    FROM s
    """,
    doc="Training-mixture report: whitespace-token budget per source with "
        "each source's share of the corpus and the Pareto cumulative "
        "share (ordered largest-first, source as deterministic "
        "tie-break) — the table a data-mixing decision reads first. "
        "Token counting is a codegen'd map over the scan with map-side "
        "partial sums; the window runs over |sources| rows, so the "
        "whole report costs one corpus scan regardless of SF.",
)
def q126_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("tokens"),
    )
    total = Window.partitionBy()
    running = Window.partitionBy().orderBy(
        F.desc("tokens"), F.asc("source")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return s.select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.sum("tokens").over(total), 4).alias("share"),
        F.round(
            F.sum("tokens").over(running) / F.sum("tokens").over(total), 4
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# q140 — compaction maintenance report (exercises sinks/maintenance.py)
# ---------------------------------------------------------------------------

@register(
    "q140_compaction_report",
    oracle="""
    SELECT 16::INT AS files_before, 1::INT AS files_after,
           COUNT(*) AS n_rows, TRUE AS rows_preserved
    FROM documents
    """,
    doc="Small-file compaction under the driver gate: writes a "
        "deliberately fragmented copy of documents (repartition(16) -> "
        "exactly 16 parquet files), runs sinks/maintenance.py::"
        "compact_table (stats-sized repartition + stage/rename swap), and "
        "reports catalog-observed file counts plus row preservation. "
        "Deterministic because the fragment count is forced and the "
        "corpus is far under one 128MB target file -> files_after == 1; "
        "the oracle pins both plus COUNT(*) surviving the rewrite. This "
        "is an eager maintenance ACTION (file counts come from the "
        "catalog, not row data), so the result frame is assembled "
        "driver-side by design; scratch tables are dropped on exit.",
)
def q140_compaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.maintenance import compact_table

    docs = _t(spark, sf_dir, "documents")
    db = "maint_q140"
    tbl = f"{db}.doc_copy"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}__compact")
    docs.repartition(16).write.mode("overwrite").format("parquet").saveAsTable(tbl)
    n_before = spark.table(tbl).count()
    report = compact_table(spark, tbl, target_file_mb=128)
    n_after = spark.table(tbl).count()
    out = spark.createDataFrame(
        [
            (
                report["files_before"],
                report["files_after"],
                n_after,
                n_before == n_after,
            )
        ],
        "files_before int, files_after int, n_rows bigint, rows_preserved boolean",
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    return out


# ---------------------------------------------------------------------------
# q144 — leakage-safe train/val/test split (dedup-group-aware)
# ---------------------------------------------------------------------------

@register(
    "q144_leakage_safe_split",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY sha256(text)) AS canonical_id
        FROM documents
    ),
    b AS (
        SELECT doc_id, canonical_id,
               CAST(('0x' || substr(sha256(CAST(canonical_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bucket
        FROM g
    )
    SELECT doc_id, canonical_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="Leakage-safe 80/10/10 split (operators/sampling.py::"
        "leakage_safe_split): split derives from the exact-dedup group's "
        "canonical id (min doc_id per sha256(text)), so byte-identical "
        "copies can never straddle train and test — the failure mode of "
        "splitting on raw ids. One uniform-key shuffle on the content "
        "sha with the group min as a window, then map-only bucketing "
        "(q84's hash_bucket). Oracle replays the identical sha-derived "
        "assignment; the no-straddle invariant is additionally pinned by "
        "a planted-duplicate test.",
)
def q144_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    return leakage_safe_split(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# q162 — LATERAL correlated subquery (per-customer top-2 orders)
# ---------------------------------------------------------------------------

@register(
    "q162_lateral_top_orders",
    oracle="""
    SELECT c.c_custkey, l.o_orderkey, ROUND(l.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
    """,
    doc="LATERAL correlated subquery with ORDER BY + LIMIT — per-customer "
        "top-2 orders written the declarative per-row way (the same SQL "
        "text runs on both engines). Catalyst rewrites the lateral into a "
        "window-rank under the hood, so despite the correlated "
        "formulation the plan is the q20-style WindowGroupLimit shape — "
        "one customer-keyed shuffle, no per-row subquery execution.",
)
def q162_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql("""
        SELECT c.c_custkey, l.o_orderkey, ROUND(l.o_totalprice, 2) AS o_totalprice
        FROM customer_lat c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders_lat o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) l
    """)


# ---------------------------------------------------------------------------
# q163 — custom Python Data Source under the hash gate
# ---------------------------------------------------------------------------

@register(
    "q163_python_datasource",
    oracle="""
    WITH ids AS (SELECT unnest(generate_series(0, 1999)) AS doc_id),
    h AS (SELECT doc_id, sha256(CAST(doc_id AS VARCHAR)) AS hx FROM ids),
    d AS (
        SELECT doc_id, hx,
               (['en','de','fr','es'])[1 + CAST(('0x' || substr(hx, 1, 1)) AS INT) % 4]
                   AS lang,
               'src' || (CAST(('0x' || substr(hx, 2, 1)) AS INT) % 3) AS source,
               8 + CAST(('0x' || substr(hx, 3, 1)) AS INT) % 8 AS nw
        FROM h
    ),
    txt AS (
        SELECT doc_id, lang, source,
               array_to_string(
                   list_transform(generate_series(1, nw),
                       i -> (['spark','table','hash','join','scan','merge',
                              'batch','stream','row','value','sort','window',
                              'part','key','agg','line'])
                            [1 + CAST(('0x' || substr(hx, 2*i + 1, 2)) AS INT) % 16]),
                   ' ') AS text
        FROM d
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT)) AS BIGINT)
               AS content_fingerprint
    FROM txt
    GROUP BY lang, source
    """,
    doc="Custom Python Data Source (Spark 4 pyspark.sql.datasource API, "
        "sources/pydatasource.py): a synthetic-documents connector with "
        "real partition planning — n rows split into input splits that "
        "executors read independently, parallelizing like a parquet scan. "
        "The oracle REGENERATES the same corpus from generate_series + "
        "the sha-slice formula and compares an integer content "
        "fingerprint (sum of sha256(text) hex prefixes) per domain: a "
        "wrong split boundary, dropped row, or generation drift breaks "
        "the hash. This is the bring-your-own-source extension point the "
        "reference's fixed format list lacks.",
)
def q163_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import pydatasource

    pydatasource.register(spark)
    docs = (
        spark.read.format("synthetic_docs")
        .option("n", 2000)
        .option("partitions", 16)
        .load()
    )
    fp = F.conv(F.substring(F.sha2(F.col("text"), 256), 1, 8), 16, 10).cast("bigint")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(fp).cast("bigint").alias("content_fingerprint"),
    )


# ---------------------------------------------------------------------------
# q183 — df.stat.crosstab contingency table (DataFrame stat-function family)
# ---------------------------------------------------------------------------

@register(
    "q183_crosstab_status_priority",
    oracle="""
    SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
           CAST(COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
             AS "1-URGENT",
           CAST(COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT)
             AS "2-HIGH",
           CAST(COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT)
             AS "3-MEDIUM",
           CAST(COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT)
             AS "4-NOT SPECIFIED",
           CAST(COUNT(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT)
             AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
    doc="``df.stat.crosstab`` (pairwise frequency / contingency table — "
        "the DataFrameStatFunctions member of the pivot family, q31/q115) "
        "over orders status x priority. Spark computes it as ONE "
        "pair-count aggregation then pivots the <=  card(A) x card(B) "
        "count table on the driver; the oracle is the equivalent "
        "conditional aggregation with each distinct priority value as an "
        "identically-named count column. Guards both the counts and "
        "crosstab's value-to-column naming contract. The 3x5 result is "
        "dim-sized; the only data-sized cost is the pair groupBy "
        "(map-side combined).",
)
def q183_crosstab_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").stat.crosstab(
        "o_orderstatus", "o_orderpriority"
    )
