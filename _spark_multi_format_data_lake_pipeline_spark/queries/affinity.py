"""Behavioral-analytics & data-quality depth: gap-and-islands streaks,
market-basket affinity, PMI collocations, weighted median, Pareto
frontier, and a declarative expectations report.

These complete analytics families the catalog did not yet exercise:
islands detection (q168) is the window idiom behind retention/streak
product metrics; basket lift (q169) is the A-priori co-occurrence core of
recommendation pipelines; PMI (q170) detects multi-word expressions for
tokenizer/shingle design; weighted median (q171) is the order-statistic
aggregations family's weighted completion; the skyline operator (q172)
shows a sequential-looking computation parallelized with the same
range-partition + O(P) driver prefix trick as ``operators/ids.py``; the
expectations suite (q173) generalizes the reference's only runtime
verification (SHOW TABLES + counts, ``utils/spark_write_iceberg.py:
88-132``) into a composable rule engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..llm.retrieval import pmi_collocations
from ..operators.expectations import (
    expect,
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
)
from ..operators.skyline import pareto_frontier_2d
from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q168 — gap-and-islands: consecutive-day activity streaks per user
# ---------------------------------------------------------------------------

@register(
    "q168_activity_streaks",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (SELECT user_id, d,
            d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS anchor
            FROM days),
    st AS (SELECT user_id, anchor, COUNT(*) AS len FROM isl GROUP BY 1, 2)
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(len) AS BIGINT) AS active_days
    FROM st GROUP BY 1 HAVING MAX(len) >= 3
    """,
    doc="Gap-and-islands via the date-minus-row_number anchor: consecutive "
        "active days share one anchor, so streaks fall out of a groupBy. "
        "Everything is keyed by user_id — the distinct, the window, and "
        "both aggregations reuse ONE hash partitioning (the (user_id, "
        "anchor) groupBy is satisfied by the user_id exchange), so the "
        "whole query is a single shuffle of the deduped day list.",
)
def q168_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = isl.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").cast("bigint").alias("max_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.sum("len").cast("bigint").alias("active_days"),
        )
        .filter(F.col("max_streak") >= 3)
    )


# ---------------------------------------------------------------------------
# q169 — market-basket brand affinity (co-occurrence lift)
# ---------------------------------------------------------------------------

@register(
    "q169_basket_brand_lift",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lines),
    bc AS (SELECT p_brand, COUNT(*) AS c FROM lines GROUP BY 1),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS c_ab
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(c_ab AS BIGINT) AS n_co,
           ROUND(CAST(c_ab AS DOUBLE) * n_orders / (ca.c * cb.c), 4) AS lift
    FROM pairs
    JOIN bc ca ON pairs.brand_a = ca.p_brand
    JOIN bc cb ON pairs.brand_b = cb.p_brand
    CROSS JOIN n
    WHERE c_ab >= 20
    """,
    doc="A-priori-style item co-occurrence: distinct (order, brand) "
        "baskets (broadcast dim join), pair generation by an orderkey "
        "self-equi-join with brand_a < brand_b (fan-out bounded by "
        "per-basket item count k: sum k(k-1)/2 pairs — never all-pairs "
        "across orders), lift from per-brand counts + the 1-row order "
        "total as broadcasts. The A-priori prune is applied BEFORE "
        "pairing: c_ab >= 20 implies both brands' supports are >= 20 "
        "(anti-monotonicity), so the frequent-brand semi-join shrinks "
        "the self-join input losslessly — the oracle, which filters "
        "post-count only, hash-proves the prune drops nothing.",
)
def q169_basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lines = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = lines.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    bc = lines.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    # A-priori support prune: a pair seen in >= 20 baskets needs both
    # brands in >= 20 baskets, so infrequent brands cannot contribute.
    # The prune join CARRIES each brand's support, so the pair rows
    # arrive with both counts attached and no per-brand join is needed
    # after the aggregation (support is functional on the group key —
    # the max() is just how a carried constant exits a groupBy).
    pruned = lines.join(
        F.broadcast(bc.filter(F.col("c") >= 20)), "p_brand"
    )
    a = pruned.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_a"), F.col("c").alias("_ca")
    )
    b = pruned.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("p_brand").alias("brand_b"),
        F.col("c").alias("_cb"),
    )
    pairs = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).alias("c_ab"),
            F.max("_ca").alias("_ca"),
            F.max("_cb").alias("_cb"),
        )
        .filter(F.col("c_ab") >= 20)
    )
    lift = (F.col("c_ab").cast("double") * F.col("n_orders")) / (
        F.col("_ca") * F.col("_cb")
    )
    return pairs.crossJoin(F.broadcast(n)).select(
        "brand_a",
        "brand_b",
        F.col("c_ab").cast("bigint").alias("n_co"),
        F.round(lift, 4).alias("lift"),
    )


# ---------------------------------------------------------------------------
# q170 — PMI collocations (multi-word expression mining)
# ---------------------------------------------------------------------------

@register(
    "q170_pmi_collocations",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(LOWER(TRIM(text)), '\s+') AS w
        FROM documents
    ),
    pairs AS (
        SELECT w[i] AS w1, w[i+1] AS w2
        FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 2
    ),
    big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
    words AS (SELECT unnest(w) AS word FROM toks),
    uni AS (SELECT word, COUNT(*) AS c1 FROM words GROUP BY 1),
    tot AS (SELECT (SELECT COUNT(*) FROM pairs) AS nb,
                   (SELECT COUNT(*) FROM words) AS nu)
    SELECT w1, w2, CAST(c12 AS BIGINT) AS n_pair,
           -- + 0 normalizes -0.0 (both engines keep the sign bit when a
           -- near-1 ratio rounds to zero, but not consistently)
           ROUND(LN((CAST(c12 AS DOUBLE) * nu * nu)
                    / (CAST(nb AS DOUBLE) * u1.c1 * u2.c1)), 4) + 0 AS pmi
    FROM big
    JOIN uni u1 ON big.w1 = u1.word
    JOIN uni u2 ON big.w2 = u2.word
    CROSS JOIN tot
    WHERE c12 >= 5
    """,
    doc="Pointwise mutual information for every adjacent bigram with "
        "count >= 5 (llm/retrieval.py::pmi_collocations) — the corpus-"
        "level collocation complement of q149's per-doc surprisal. The "
        "membership filter is on exact integer counts (reproducible "
        "across engines); the pmi double is one mirrored expression on "
        "both sides so IEEE evaluation order is identical.",
)
def q170_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pmi_collocations(_t(spark, sf_dir, "documents"), min_count=5)


# ---------------------------------------------------------------------------
# q171 — weighted median (order statistic with weights)
# ---------------------------------------------------------------------------

@register(
    "q171_weighted_median",
    oracle="""
    WITH wp AS (
      SELECT l_returnflag, l_extendedprice AS price, SUM(l_quantity) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, price, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM wp
    )
    SELECT l_returnflag, ROUND(MIN(price), 2) AS weighted_median
    FROM c WHERE cw >= tw / 2 GROUP BY 1
    """,
    doc="Quantity-weighted median price per return flag: pre-aggregate "
        "weights per (group, value) — the shuffle collapses duplicates "
        "map-side and makes the cumulative sum tie-free — then the "
        "classic cumweight >= total/2 pick. The cumulative sum does NOT "
        "use a PARTITION BY group window (3 groups would funnel all "
        "rows through 3 tasks at 100 TB) — it uses operators/prefix.py's "
        "range-partitioned grouped running sum, which keeps every "
        "partition working and accumulates in the same order as the "
        "oracle's window, so integer-valued quantity sums stay exact "
        "and the cross-engine comparison is bit-stable.",
)
def q171_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import grouped_running_sum

    li = _t(spark, sf_dir, "lineitem")
    wp = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum("l_quantity").alias("w"))
    totals = wp.groupBy("l_returnflag").agg(F.sum("w").alias("tw"))
    rs = grouped_running_sum(wp, ["l_returnflag"], "price", "w", out_col="cw")
    return (
        rs.join(F.broadcast(totals), "l_returnflag")
        .filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(F.round(F.min("price"), 2).alias("weighted_median"))
    )


# ---------------------------------------------------------------------------
# q172 — Pareto frontier (skyline) of parts
# ---------------------------------------------------------------------------

@register(
    "q172_pareto_parts",
    oracle="""
    SELECT p_partkey, ROUND(p_retailprice, 2) AS price, p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    """,
    doc="2-D skyline — parts where no other part is cheaper-or-equal AND "
        "bigger-or-equal with one strict. operators/skyline.py replaces "
        "the O(n²) dominance anti-join (which the oracle deliberately "
        "keeps, as an independent formulation) with group-max per price "
        "+ range-partitioned exclusive prefix-max: one shuffle, an O(P) "
        "driver step, a mapInPandas sweep — no global sort, no task ever "
        "holds more than one partition.",
)
def q172_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part")
    return pareto_frontier_2d(pt, "p_retailprice", "p_size").select(
        "p_partkey",
        F.round("p_retailprice", 2).alias("price"),
        "p_size",
    )


# ---------------------------------------------------------------------------
# q173 — declarative expectations report
# ---------------------------------------------------------------------------

@register(
    "q173_expectations_report",
    oracle="""
    SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_checked AS BIGINT) AS n_checked
    FROM (VALUES
      ('orderkey_not_null',
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL),
       (SELECT COUNT(*) FROM orders)),
      ('price_range',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NOT NULL
          AND (o_totalprice < 0 OR o_totalprice > 400000)),
       (SELECT COUNT(*) FROM orders)),
      ('status_open_closed',
       (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('O', 'F')),
       (SELECT COUNT(*) FROM orders)),
      ('priority_urgent_fmt',
       (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NOT NULL
          AND NOT regexp_matches(o_orderpriority, '^[1-3]-')),
       (SELECT COUNT(*) FROM orders)),
      ('orderkey_unique',
       (SELECT COALESCE(SUM(c - 1), 0)
          FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)),
       (SELECT COUNT(*) FROM orders)),
      ('custkey_small_fk',
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_custkey < 1000)),
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL))
    ) AS t(rule, n_violations, n_checked)
    """,
    doc="operators/expectations.py rule suite over orders. Thresholds are "
        "deliberately tight (price cap 400k, status {O,F}, priority 1-3, "
        "FK against custkey<1000) so every counting path produces NONZERO "
        "violations — an all-green suite would not distinguish a correct "
        "validator from one that counts nothing. All four row-level rules "
        "share ONE full scan (conditional sums, map-side partials); "
        "unique adds one keyed groupBy; the FK adds one broadcast "
        "anti-join.",
)
def q173_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1000)
    rules = [
        not_null("orderkey_not_null", "o_orderkey"),
        in_range("price_range", "o_totalprice", 0, 400000),
        in_set("status_open_closed", "o_orderstatus", ["O", "F"]),
        matches("priority_urgent_fmt", "o_orderpriority", "^[1-3]-"),
        unique("orderkey_unique", "o_orderkey"),
        foreign_key("custkey_small_fk", "o_custkey", cu, "c_custkey"),
    ]
    return expect(od, rules)


# ---------------------------------------------------------------------------
# q174 — funnel time-to-convert percentiles
# ---------------------------------------------------------------------------

@register(
    "q174_funnel_time_percentiles",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1
    ),
    d AS (
      SELECT t1.user_id,
             CAST(epoch_us(t2.t2) - epoch_us(t1.t1) AS BIGINT) AS d12,
             CAST(epoch_us(t3.t3) - epoch_us(t2.t2) AS BIGINT) AS d23
      FROM t1 JOIN t2 ON t1.user_id = t2.user_id
              JOIN t3 ON t1.user_id = t3.user_id
    )
    SELECT 'view_to_click' AS step, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(quantile_cont(d12, 0.25) / 1e6, 3) AS p25_s,
           ROUND(quantile_cont(d12, 0.5) / 1e6, 3) AS p50_s,
           ROUND(quantile_cont(d12, 0.75) / 1e6, 3) AS p75_s
    FROM d
    UNION ALL
    SELECT 'click_to_purchase', CAST(COUNT(*) AS BIGINT),
           ROUND(quantile_cont(d23, 0.25) / 1e6, 3),
           ROUND(quantile_cont(d23, 0.5) / 1e6, 3),
           ROUND(quantile_cont(d23, 0.75) / 1e6, 3)
    FROM d
    """,
    doc="q98's ordered funnel (view -> first click after it -> first "
        "purchase after that) extended with per-step time-to-convert "
        "percentiles for fully-converting users — the composition the r5 "
        "pickup list promised (q98 staging + q133 exact interpolated "
        "percentiles). Deltas are integer microseconds (epoch_us on both "
        "engines — no sub-second truncation), percentiles interpolate in "
        "doubles the same way (quantile_cont == Spark percentile). Each "
        "stage is a user-keyed groupBy; the progressive joins stay on "
        "user_id so every exchange is reusable.",
)
def q174_funnel_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.join(t1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.join(t2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    d = (
        t1.join(t2, "user_id")
        .join(t3, "user_id")
        .select(
            # ts is TIMESTAMP_NTZ; session tz is UTC (sources/lake.py), so
            # the cast to TIMESTAMP is an identity reinterpretation and
            # unix_micros yields the same integers as DuckDB's epoch_us
            (
                F.unix_micros(F.col("t2").cast("timestamp"))
                - F.unix_micros(F.col("t1").cast("timestamp"))
            ).alias("d12"),
            (
                F.unix_micros(F.col("t3").cast("timestamp"))
                - F.unix_micros(F.col("t2").cast("timestamp"))
            ).alias("d23"),
        )
    )

    def _step(col: str, label: str) -> DataFrame:
        return d.agg(
            F.lit(label).alias("step"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.percentile(F.col(col), F.lit(0.25)) / 1e6, 3).alias("p25_s"),
            F.round(F.percentile(F.col(col), F.lit(0.5)) / 1e6, 3).alias("p50_s"),
            F.round(F.percentile(F.col(col), F.lit(0.75)) / 1e6, 3).alias("p75_s"),
        )

    return _step("d12", "view_to_click").unionByName(
        _step("d23", "click_to_purchase")
    )


# ---------------------------------------------------------------------------
# q175 — group-aware k-fold cross-validation assignment
# ---------------------------------------------------------------------------

@register(
    "q175_group_kfold_report",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([LOWER(TRIM(text))[i:i+2] for i in range(1, LENGTH(TRIM(text)) - 1)])
                   AS grams
        FROM documents WHERE doc_id < 100
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.grams, b.grams))::DOUBLE
              / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.65
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a AS node, a AS label FROM edges
        UNION
        SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
    ),
    groups AS (
        SELECT node AS doc_id, MIN(label) AS canonical_id
        FROM reach GROUP BY node
    ),
    full_map AS (
        SELECT d.doc_id, COALESCE(g.canonical_id, d.doc_id) AS canonical_id
        FROM (SELECT doc_id FROM documents WHERE doc_id < 100) d
        LEFT JOIN groups g ON g.doc_id = d.doc_id
    ),
    b AS (
        SELECT doc_id, canonical_id,
               CAST(('0x' || substr(sha256(CAST(canonical_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 5 AS fold
        FROM full_map
    ),
    g2 AS (
        SELECT fold, canonical_id, COUNT(*) AS gsz FROM b GROUP BY 1, 2
    )
    SELECT fold, CAST(SUM(gsz) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MAX(gsz) AS BIGINT) AS max_group_size
    FROM g2 GROUP BY fold
    """,
    doc="Group-aware k-fold CV assignment (k=5): fold = portable sha "
        "bucket of the near-dup component's canonical id, so no near-"
        "duplicate pair can straddle folds BY CONSTRUCTION (fold is a "
        "function of the group). Same component machinery as q145 "
        "(dedup_groups over exact-Jaccard pairs, bounded window), but "
        "the output is the fold-level report an experimenter reads: "
        "docs, groups, and the largest group per fold. At scale the "
        "group map comes from the persisted dedup output and the fold "
        "step stays map-only.",
)
def q175_group_kfold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash_bucket, with_char_ngrams
    from ..operators.graph import dedup_groups

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    sh = with_char_ngrams(docs, "text", "grams", 3).select("doc_id", "grams")
    a = sh.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    pairs = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(inter.cast("double") / union.cast("double") >= 0.65)
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    full = (
        docs.select("doc_id")
        .join(dedup_groups(pairs), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", F.col("doc_id")).alias("canonical_id"),
        )
    )
    folded = full.withColumn("fold", hash_bucket(F.col("canonical_id"), 5))
    per_group = folded.groupBy("fold", "canonical_id").agg(
        F.count(F.lit(1)).alias("gsz")
    )
    return per_group.groupBy("fold").agg(
        F.sum("gsz").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.max("gsz").cast("bigint").alias("max_group_size"),
    )


# ---------------------------------------------------------------------------
# q176 — MMR diversified top-k (re-ranking for retrieval-augmented corpora)
# ---------------------------------------------------------------------------

@register(
    "q176_mmr_rerank",
    oracle=r"""
    WITH RECURSIVE cand AS (
        SELECT e.vec_id,
               CAST(e.embedding AS DOUBLE[]) AS v,
               ROUND(list_sum(list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), q.v),
                        p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(CAST(e.embedding AS DOUBLE[]), x -> x*x)))
                    * sqrt(list_sum(list_transform(q.v, x -> x*x)))), 6) AS rel
        FROM embeddings e
        CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id BETWEEN 1 AND 60
    ),
    sim AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(a.v, x -> x*x)))
                    * sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS s
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel(step, picked) AS (
        SELECT 1, [(SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT 1)]
        UNION ALL
        SELECT step + 1,
               list_append(picked, (
                   SELECT c.vec_id
                   FROM cand c
                   WHERE NOT list_contains(sel.picked, c.vec_id)
                   ORDER BY 0.7 * c.rel - 0.3 * (
                       SELECT MAX(s.s) FROM sim s
                       WHERE s.ia = c.vec_id AND list_contains(sel.picked, s.ib)
                   ) DESC, c.vec_id
                   LIMIT 1
               ))
        FROM sel WHERE step < 10
    )
    SELECT CAST(u.i AS BIGINT) AS rank, CAST(u.vec_id AS BIGINT) AS vec_id
    FROM (SELECT picked FROM sel WHERE step = 10) f,
         LATERAL (SELECT generate_subscripts(f.picked, 1) AS i,
                         unnest(f.picked) AS vec_id) u
    """,
    doc="Greedy maximal-marginal-relevance re-rank of a 60-candidate "
        "window (llm/similarity.py::mmr_rerank, lam=0.7 mu=0.3, k=10) — "
        "the diversity-aware final stage of a retrieval pipeline. "
        "Relevance + the pairwise-sim matrix are computed JVM-side with "
        "the same cosine the q56/q128 oracles hash-match and rounded to "
        "6 decimals BEFORE the greedy, so no sub-ulp drift can flip an "
        "argmax; the oracle replays the identical greedy as a recursive "
        "CTE with LATERAL argmax steps. The greedy is driver-side over "
        "the bounded rerank head by design — the scale path is the "
        "LSH/IVF pruning (q58/q73) that produces the candidate window.",
)
def q176_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.similarity import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    return mmr_rerank(emb, query_id=0, lo=1, hi=60, k=10, lam=0.7, mu=0.3)


# ---------------------------------------------------------------------------
# q177-q181 — registered after this round's driver window filled: their
# first driver row lands next round (see __spark_entry__._QUEUED);
# correctness is already proven by tools/check.py at sf0.01 AND sf0.1.
# ---------------------------------------------------------------------------

@register(
    "q177_ranking_metrics",
    oracle="""
    WITH results AS (
      SELECT lang AS query_id, doc_id, rank FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents
      ) t WHERE rank <= 10
    ),
    qrels AS (
      SELECT lang AS query_id, doc_id,
             CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 5 = 0 THEN 2
                  WHEN CAST(SUBSTR(source, 4) AS INT) % 5 IN (1, 2) THEN 1
                  ELSE 0 END AS relevance
      FROM documents
    ),
    rel AS (SELECT query_id, doc_id, relevance FROM qrels WHERE relevance > 0),
    hits AS (
      SELECT r.query_id,
             SUM((POW(2.0, rel.relevance) - 1.0) / LOG2(r.rank + 1.0)) AS dcg,
             1.0 / MIN(r.rank) AS rr,
             CAST(COUNT(*) AS BIGINT) AS hits_at_k
      FROM results r JOIN rel ON r.query_id = rel.query_id AND r.doc_id = rel.doc_id
      WHERE r.rank <= 10
      GROUP BY r.query_id
    ),
    ideal AS (
      SELECT query_id, SUM((POW(2.0, relevance) - 1.0) / LOG2(irank + 1.0)) AS idcg
      FROM (SELECT query_id, relevance,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY relevance DESC, doc_id) AS irank
            FROM rel) t
      WHERE irank <= 10 GROUP BY query_id
    ),
    nr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY query_id),
    per_q AS (
      SELECT nr.query_id,
             COALESCE(hits.dcg / ideal.idcg, 0.0) AS ndcg,
             COALESCE(hits.rr, 0.0) AS rr,
             CAST(COALESCE(hits.hits_at_k, 0) AS DOUBLE) / LEAST(nr.n_rel, 10) AS recall
      FROM nr JOIN ideal ON nr.query_id = ideal.query_id
              LEFT JOIN hits ON nr.query_id = hits.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           COALESCE(ROUND(AVG(ndcg), 6), 0.0) AS ndcg_at_k,
           COALESCE(ROUND(AVG(rr), 6), 0.0) AS mrr_at_k,
           COALESCE(ROUND(AVG(recall), 6), 0.0) AS recall_at_k
    FROM per_q
    """,
    doc="llm/retrieval.py::ranking_metrics over a per-LANGUAGE system run "
        "(query = lang; top-10 docs per lang by n_chars, id tie-break) "
        "and graded qrels (source number mod 5: 0→2, 1/2→1, else 0) — "
        "NDCG@10, MRR@10, recall@10 with the attainable-at-k denominator, "
        "the evaluation gate a retrieval stage passes before feeding a "
        "training mixture. The harness is deliberately MULTI-query: with "
        "a single literal query_id Catalyst constant-folds every "
        "PARTITION BY query_id spec inside ranking_metrics into an "
        "unpartitioned window (the r5 VERDICT funnel); with lang as the "
        "query key the system run is a WindowGroupLimit top-k per group "
        "and every metric window parallelizes across queries. One "
        "(query, doc) join is the only data-sized shuffle; the oracle "
        "replays the identical log2 arithmetic.",
)
def q177_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.retrieval import ranking_metrics
    from ..operators.topk import top_k_per_group

    docs = _t(spark, sf_dir, "documents")
    results = top_k_per_group(
        docs.select("lang", "doc_id", "n_chars"),
        ["lang"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        10,
        rank_col="rank",
    ).select(F.col("lang").alias("query_id"), "doc_id", "rank")
    src_num = F.substring("source", 4, 10).cast("int")
    qrels = docs.select(
        F.col("lang").alias("query_id"),
        "doc_id",
        F.when(src_num % 5 == 0, 2)
        .when((src_num % 5).isin(1, 2), 1)
        .otherwise(0)
        .alias("relevance"),
    )
    return ranking_metrics(results, qrels, k=10)


@register(
    "q179_table_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      -- mutation is an exact IEEE add, NOT a decimal round: Spark's
      -- HALF_UP-on-BigDecimal and DuckDB's C-double rounding disagree
      -- on last-cent boundaries of x*1.1
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0
                  THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderkey IS NOT NULL AS in_old,
             n.o_orderkey IS NOT NULL AS in_new,
             o.o_orderstatus AS os, o.o_totalprice AS opr,
             n.o_orderstatus AS ns, n.o_totalprice AS npr
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN NOT in_new THEN os ELSE ns END AS o_orderstatus,
           CASE WHEN NOT in_new THEN opr ELSE npr END AS o_totalprice,
           CASE WHEN NOT in_old THEN 'I' WHEN NOT in_new THEN 'D'
                WHEN os IS DISTINCT FROM ns OR opr IS DISTINCT FROM npr
                THEN 'U' END AS op
    FROM j
    WHERE (NOT in_old) OR (NOT in_new)
       OR os IS DISTINCT FROM ns OR opr IS DISTINCT FROM npr
    """,
    doc="sinks/cdc.py::table_diff between two deterministic snapshots of "
        "orders (old: keys %7<>0; new: keys %5<>0 with a 10% price bump "
        "on %3==0) — the minimal I/U/D change set, snapshot-based CDC "
        "for sources without a change log. ONE full-outer key join; "
        "eqNullSafe change detection == the oracle's IS DISTINCT FROM; "
        "the round-trip law (apply(old, diff) == new) is property-"
        "tested in tests/test_cdc.py.",
)
def q179_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.cdc import table_diff

    od = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = od.filter(F.col("o_orderkey") % 7 != 0)
    new = od.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(old, new, ["o_orderkey"])


@register(
    "q180_merged_activity_spans",
    oracle="""
    WITH iv AS (
      -- explicit FLOOR everywhere: DuckDB CAST(double AS BIGINT) rounds
      -- to nearest while Spark's cast truncates — floor agrees on both
      SELECT user_id,
             CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS s,
             CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT)
               + CAST(FLOOR(value * 60) AS BIGINT) AS e
      FROM events WHERE value IS NOT NULL AND value >= 0
    ),
    o AS (
      SELECT user_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e) AS island
      FROM o
    )
    SELECT user_id, MIN(s) AS s, MAX(e) AS e,
           CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM isl GROUP BY user_id, island
    """,
    doc="operators/intervals.py::merge_intervals over per-event activity "
        "spans [ts, ts + value minutes] in integer epoch seconds — "
        "overlapping or touching spans coalesce into maximal runs per "
        "user (the gaps-and-islands idiom generalized from q168's unit "
        "days to arbitrary ranges). One shuffle to the user grain; the "
        "window parallelism is the user cardinality.",
)
def q180_merged_activity_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import merge_intervals

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    s = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).cast(
        "bigint"
    )
    iv = ev.select(
        "user_id",
        s.alias("s"),
        (s + F.floor(F.col("value") * 60).cast("bigint")).alias("e"),
    )
    return merge_intervals(iv, ["user_id"], "s", "e")


@register(
    "q181_attribution_linear",
    oracle="""
    WITH conv AS (
      SELECT user_id AS cu, ts AS cts, event_id AS cid
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS tu, ts AS tts, event_id AS tid, event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT cid, channel
      FROM conv JOIN touch ON cu = tu AND tts < cts
           AND tts >= cts - INTERVAL 604800 SECONDS
    ),
    wgt AS (
      SELECT channel, 1.0 / COUNT(*) OVER (PARTITION BY cid) AS w FROM j
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(w), 6) AS credit
    FROM wgt GROUP BY channel
    """,
    doc="operators/attribution.py::multi_touch_credits with the linear "
        "model: every purchase splits one unit of credit equally over "
        "its 7-day lookback touches — the multi-touch generalization of "
        "q90's single-touch attribution join. Per-user bounded range "
        "join + per-conversion count window; credit conservation "
        "(total == attributed conversions) is property-tested across "
        "all four models in tests/test_operators.py.",
)
def q181_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import multi_touch_credits

    return multi_touch_credits(_t(spark, sf_dir, "events"), model="linear")


# ---------------------------------------------------------------------------
# q182 — U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

@register(
    "q182_attribution_u",
    oracle="""
    WITH conv AS (
      SELECT user_id AS cu, ts AS cts, event_id AS cid
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id AS tu, ts AS tts, event_id AS tid, event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
      SELECT cid, tts, tid, channel
      FROM conv JOIN touch ON cu = tu AND tts < cts
           AND tts >= cts - INTERVAL 604800 SECONDS
    ),
    wgt AS (
      SELECT channel,
             ROW_NUMBER() OVER (PARTITION BY cid ORDER BY tts, tid) AS pos,
             COUNT(*) OVER (PARTITION BY cid) AS n
      FROM j
    )
    SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(CASE WHEN n = 1 THEN 1.0
                          WHEN n = 2 THEN 0.5
                          WHEN pos = 1 THEN 0.4
                          WHEN pos = n THEN 0.4
                          ELSE 0.2 / (n - 2) END), 6) AS credit
    FROM wgt GROUP BY channel
    """,
    doc="operators/attribution.py::multi_touch_credits with the U-shaped "
        "(position-based) model: 40% of each purchase's credit to the "
        "first touch, 40% to the last, 20% spread over the middle "
        "(degenerating to 100%/50-50 for 1/2 touches). Same bounded "
        "per-user range join + per-conversion position window as q181's "
        "linear model; the oracle replays the identical weight CASE in "
        "the same literal doubles (0.4 / 0.2/(n-2) — both engines parse "
        "the same IEEE values, and the 6-decimal round absorbs "
        "association drift in the channel sums). Credit conservation "
        "across all four models is property-tested in "
        "tests/test_affinity.py.",
)
def q182_attribution_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import multi_touch_credits

    return multi_touch_credits(_t(spark, sf_dir, "events"), model="u")


# ---------------------------------------------------------------------------
# q185 — GLOBAL interval coalescing (key-less gaps-and-islands, two-prefix)
# ---------------------------------------------------------------------------

@register(
    "q185_global_busy_spans",
    oracle="""
    WITH iv AS (
      SELECT CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT) AS s,
             CAST(FLOOR(epoch_us(ts) / 1000000) AS BIGINT)
               + CAST(FLOOR(value * 5) AS BIGINT) AS e
      FROM events WHERE value IS NOT NULL AND value >= 0
    ),
    o AS (
      SELECT s, e,
             MAX(e) OVER (ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM iv
    ),
    isl AS (
      SELECT s, e,
             SUM(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (ORDER BY s, e) AS island
      FROM o
    )
    SELECT MIN(s) AS s, MAX(e) AS e, CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM isl GROUP BY island
    """,
    doc="operators/intervals.py::merge_intervals with key_cols=[] — the "
        "system-wide busy timeline (spans [ts, ts + 5*value seconds] "
        "across ALL users coalesced into maximal runs). The oracle is "
        "the global-ORDER-BY gaps-and-islands window; the engine runs "
        "the range-partition + O(P) driver two-prefix recipe instead "
        "(prefix-MAX of ends for the island-start flag, prefix-SUM of "
        "flags for the island id — operators/ids.py's handoff applied "
        "twice over one frozen range partitioning), because the SQL "
        "form funnels every interval through ONE window task. "
        "Partition-count invariance is property-tested in "
        "tests/test_operators.py; q180 is the per-key sibling.",
)
def q185_global_busy_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import merge_intervals

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0)
    )
    s = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1000000).cast(
        "bigint"
    )
    iv = ev.select(
        "user_id",
        s.alias("s"),
        (s + F.floor(F.col("value") * 5).cast("bigint")).alias("e"),
    )
    return merge_intervals(iv, [], "s", "e")


# ---------------------------------------------------------------------------
# q187 — SCD type-2 dimension history from a change log
# ---------------------------------------------------------------------------

@register(
    "q187_scd2_user_state",
    oracle="""
    WITH log AS (
      SELECT user_id, epoch_us(ts) AS o, event_type AS state
      FROM events
    ),
    chg AS (
      SELECT user_id, o, state,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY o) AS rn,
             LAG(state) OVER (PARTITION BY user_id ORDER BY o) AS prev
      FROM log
    ),
    versions AS (
      SELECT user_id, o, state
      FROM chg WHERE rn = 1 OR state IS DISTINCT FROM prev
    )
    SELECT user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY o) AS BIGINT)
             AS version,
           state,
           o AS valid_from,
           LEAD(o) OVER (PARTITION BY user_id ORDER BY o) AS valid_to,
           LEAD(o) OVER (PARTITION BY user_id ORDER BY o) IS NULL AS is_current
    FROM versions
    """,
    doc="sinks/scd.py::scd2_from_change_log — Kimball type-2 history "
        "of each user's activity state (event_type) with no-op update "
        "suppression (consecutive identical states collapse into one "
        "version; null-safe change detection), half-open "
        "[valid_from, valid_to) validity in integer epoch-microseconds, "
        "open current version. The warehouse layout for point-in-time "
        "dimension joins — the WHEN-sibling of q179's snapshot diff. One "
        "shuffle to the user grain; every window (lag, row_number, lead) "
        "reuses it. Oracle replays the identical IS DISTINCT FROM "
        "suppression.",
)
def q187_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.scd import scd2_from_change_log

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("o"),
        F.col("event_type").alias("state"),
    )
    return scd2_from_change_log(ev, ["user_id"], "o", ["state"])


# ---------------------------------------------------------------------------
# q188 — fuzzy entity matching: blocked edit-distance near-miss pairs
# ---------------------------------------------------------------------------

@register(
    "q188_fuzzy_part_names",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 2
     AND a.p_name <> b.p_name
    """,
    doc="operators/fuzzy.py::blocked_edit_distance_pairs — entity-"
        "resolution candidate pairs: part names within the same brand "
        "block whose Levenshtein distance is 1..2 (exact duplicates are "
        "q50's job). Blocking bounds the pair fan-out to per-block "
        "k*(k-1)/2 — the prune-then-score shape of the near-dup family "
        "applied to short strings (q93 is the distinct-vocabulary sibling "
        "for tiny label spaces; this operator works on full ROWS, where "
        "distinct-projecting first is impossible); the distance runs "
        "JVM-side with the 3-arg early-exit form (DP bails once the running minimum "
        "exceeds the threshold). Both engines implement the same "
        "textbook edit distance, so the pair set hash-matches exactly.",
)
def q188_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import blocked_edit_distance_pairs

    return blocked_edit_distance_pairs(
        _t(spark, sf_dir, "part"),
        id_col="p_partkey",
        name_col="p_name",
        block_cols=["p_brand"],
        max_distance=2,
    )


# ---------------------------------------------------------------------------
# q191 — equi-width histogram (distributed binning)
# ---------------------------------------------------------------------------

@register(
    "q191_price_histogram",
    oracle="""
    SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS INT) AS bucket,
           CAST(CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS INT)
                * 30000.0 AS DOUBLE) AS lo,
           CAST((CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS INT) + 1)
                * 30000.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS min_in_bucket,
           ROUND(MAX(o_totalprice), 2) AS max_in_bucket
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram of order totals: 20 fixed 30k-wide buckets "
        "with the overflow clamped into the top bucket — the profiling "
        "primitive behind range-partition boundary picking, skew "
        "detection, and UI distributions. Binning is pure map-side "
        "column math (one floor/least per row) followed by a 20-group "
        "aggregation that combines map-side — the cheapest possible "
        "distributed shape, no sort, no percentile state. The "
        "FLOOR(x / width) both engines evaluate is the same IEEE "
        "division, so bucket assignment agrees exactly.",
)
def q191_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    b = F.least(F.floor(F.col("o_totalprice") / 30000.0), F.lit(19)).cast("int")
    return (
        o.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_in_bucket"),
            F.round(F.max("o_totalprice"), 2).alias("max_in_bucket"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 30000.0).alias("lo"),
            ((F.col("bucket") + 1) * 30000.0).alias("hi"),
            "n",
            "min_in_bucket",
            "max_in_bucket",
        )
    )


# ---------------------------------------------------------------------------
# q194 — point-in-time dimension join against the SCD2 history
# ---------------------------------------------------------------------------

@register(
    "q194_point_in_time_state",
    oracle="""
    WITH log AS (
      SELECT user_id, epoch_us(ts) AS o, event_type AS state
      FROM events WHERE event_type <> 'purchase'
    ),
    chg AS (
      SELECT user_id, o, state,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY o) AS rn,
             LAG(state) OVER (PARTITION BY user_id ORDER BY o) AS prev
      FROM log
    ),
    versions AS (
      SELECT user_id, o, state
      FROM chg WHERE rn = 1 OR state IS DISTINCT FROM prev
    ),
    scd AS (
      SELECT user_id, state, o AS valid_from,
             LEAD(o) OVER (PARTITION BY user_id ORDER BY o) AS valid_to
      FROM versions
    ),
    probes AS (
      SELECT user_id, epoch_us(ts) AS pt, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT scd.state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(probes.value), 4) AS total_value
    FROM probes JOIN scd
      ON probes.user_id = scd.user_id
     AND probes.pt >= scd.valid_from
     AND (scd.valid_to IS NULL OR probes.pt < scd.valid_to)
    GROUP BY scd.state
    """,
    doc="The query SCD2 exists to serve: a point-in-time dimension join. "
        "Purchases probe the q187-style user-state history (built from "
        "non-purchase events) for the version valid AT the purchase "
        "instant — valid_from <= t < valid_to with the open current "
        "version — answering 'what was the user doing when they bought'. "
        "Per-user equi-join with a range predicate (fan-out bounded by "
        "versions-per-user, never cross-user — the half-open tiling "
        "q187 guarantees means every probe matches AT MOST one "
        "version); rollup to per-state purchase counts and value. "
        "Purchases with no prior state (user's first event) drop out, "
        "as in any warehouse PIT join.",
)
def q194_point_in_time_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.scd import scd2_from_change_log

    ev = _t(spark, sf_dir, "events")
    log = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("o"),
        F.col("event_type").alias("state"),
    )
    scd = scd2_from_change_log(log, ["user_id"], "o", ["state"]).select(
        "user_id", "state", "valid_from", "valid_to"
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("pt"),
        "value",
    )
    j = probes.join(
        scd,
        (probes.user_id == scd.user_id)
        & (F.col("pt") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("pt") < F.col("valid_to"))),
    )
    return j.groupBy("state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q196 — smoothed + leave-one-out target encoding (categorical ML features)
# ---------------------------------------------------------------------------

@register(
    "q196_target_encoding",
    oracle="""
    WITH g AS (SELECT SUM(o_totalprice) / COUNT(*) AS gmean FROM orders),
    cat AS (
      SELECT o_orderpriority, COUNT(*) AS n,
             SUM(o_totalprice) AS s,
             MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority AS category,
           CAST(n AS BIGINT) AS n,
           ROUND(s / n, 4) AS mean_target,
           ROUND((s + 50 * gmean) / (n + 50), 4) AS smoothed,
           ROUND((s - mx) / (n - 1), 4) AS loo_min,
           ROUND((s - mn) / (n - 1), 4) AS loo_max
    FROM cat CROSS JOIN g
    """,
    doc="Target encoding, the workhorse categorical feature for gradient "
        "boosting / tabular ML: per-category target mean shrunk toward "
        "the global mean with m=50 pseudo-observations (the Micci-"
        "Barreca smoothing that keeps rare categories from memorizing "
        "noise), plus the leave-one-out envelope — every row's LOO "
        "encoding (sum - y)/(n-1) lies in [loo_min, loo_max], the "
        "closed form that makes LOO an aggregate instead of a per-row "
        "join. One map-side-combined groupBy; the global mean rides a "
        "1-row broadcast. Sums mirror textually; round-4 absorbs "
        "double-association drift (~1e-7 absolute here).",
)
def q196_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    g = o.agg((F.sum("o_totalprice") / F.count(F.lit(1))).alias("gmean"))
    cat = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").alias("s"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    return cat.crossJoin(F.broadcast(g)).select(
        F.col("o_orderpriority").alias("category"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("s") / F.col("n"), 4).alias("mean_target"),
        F.round((F.col("s") + 50 * F.col("gmean")) / (F.col("n") + 50), 4).alias(
            "smoothed"
        ),
        F.round((F.col("s") - F.col("mx")) / (F.col("n") - 1), 4).alias("loo_min"),
        F.round((F.col("s") - F.col("mn")) / (F.col("n") - 1), 4).alias("loo_max"),
    )


# ---------------------------------------------------------------------------
# q197 — per-partition additive row checksums (lake integrity audit)
# ---------------------------------------------------------------------------

@register(
    "q197_partition_checksums",
    oracle="""
    SELECT STRFTIME(l_shipdate, '%Y-%m') AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substr(sha256(
                  CAST(l_orderkey AS VARCHAR) || ':' ||
                  CAST(l_partkey AS VARCHAR) || ':' ||
                  CAST(l_suppkey AS VARCHAR) || ':' ||
                  CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT))
             AS BIGINT) AS checksum
    FROM lineitem GROUP BY 1
    """,
    doc="Order-independent per-partition content checksums: each row "
        "hashes its business key (sha256 hex prefix -> 32-bit int) and "
        "the partition checksum is the plain SUM — commutative, so any "
        "partitioning/engine/replay computes the same value, and two "
        "copies of a partition can be compared by exchanging ONE number "
        "instead of re-reading rows (the cheap layer of a Merkle-style "
        "lake audit; q179's table_diff is the row-level layer you "
        "escalate to when a month mismatches). Pure map + one "
        "month-grain groupBy, map-side combined; sums of 32-bit values "
        "over month partitions stay far below int64.",
)
def q197_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        ":",
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    h = F.conv(F.substring(F.sha2(key, 256), 1, 8), 16, 10).cast("bigint")
    return (
        li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(h).cast("bigint").alias("checksum"),
        )
    )


# ---------------------------------------------------------------------------
# q200 — time-weighted average (piecewise-constant integral per user)
# ---------------------------------------------------------------------------

@register(
    "q200_time_weighted_value",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t, value,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               AS t_next
      FROM events WHERE value IS NOT NULL
    ),
    seg AS (
      SELECT user_id, value * (t_next - t) AS area, t_next - t AS dur
      FROM s WHERE t_next IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(SUM(area) / SUM(dur), 6) AS twa_value
    FROM seg GROUP BY user_id
    """,
    doc="Time-weighted average: each observation holds until the next "
        "one (piecewise-constant), so the mean is integral/duration — "
        "sum(v_i * dt_i) / sum(dt_i) — the correct aggregate for "
        "irregularly-sampled series (billing meters, sensor gauges, "
        "position marks) where the row-mean over-weights bursts. One "
        "shuffle to the user grain; the lead window and the rollup "
        "share it. Durations are exact integer microseconds (epoch_us "
        "both engines); the 6-decimal round absorbs the double "
        "area-sum association.",
)
def q200_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    # event_id tie-break: two same-instant observations would otherwise
    # make segment attribution (and the oracle comparison) run-dependent
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = ev.select("user_id", t.alias("t"), "event_id", "value").withColumn(
        "t_next", F.lead("t").over(w)
    ).filter(F.col("t_next").isNotNull())
    dur = F.col("t_next") - F.col("t")
    return (
        s.select("user_id", (F.col("value") * dur).alias("area"), dur.alias("dur"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.round(F.sum("area") / F.sum("dur"), 6).alias("twa_value"),
        )
    )


# ---------------------------------------------------------------------------
# q201 — OHLC bars (open/high/low/close resample via min_by/max_by)
# ---------------------------------------------------------------------------

@register(
    "q201_hourly_ohlc",
    oracle="""
    SELECT user_id,
           STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H') AS bar,
           ROUND(arg_min(value, printf('%016d', epoch_us(ts))), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(arg_max(value, printf('%016d', epoch_us(ts))), 4) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="OHLC bar resample — the candlestick aggregation every metrics/"
        "finance stack needs: per (user, hour), the first and last "
        "observation (min_by/max_by on a zero-padded time key — ONE "
        "aggregation pass, no rank windows, no self-joins; q116's "
        "argmax pattern applied to temporal first/last) plus the "
        "extremes. (user, ts) is unique so the time key is already a "
        "total order. Map-side combinable like any min/max family — "
        "the cheapest possible shape for a resample at 100 TB, and the "
        "gap-fill spine (q152) composes downstream for empty bars.",
)
def q201_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    key = F.format_string("%016d", F.unix_micros(F.col("ts").cast("timestamp")))
    return (
        ev.groupBy(
            "user_id",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("bar"),
        )
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        )
    )


# ---------------------------------------------------------------------------
# q202/q203 — data-driven (Markov removal-effect) attribution
# ---------------------------------------------------------------------------

@register(
    "q202_markov_attribution",
    oracle=None,
    doc="operators/attribution.py::markov_attribution — data-driven "
        "multi-touch attribution (Anderl et al.): fit the first-order "
        "journey chain, then per channel measure how much absorption "
        "probability into CONV disappears when the channel is removed "
        "(graph surgery re-routing its inbound mass to the NULL "
        "absorber); credit = normalized removal effects. Spark does the "
        "data-sized pass (journey transition counts, one user-keyed "
        "window); the absorption solves are numpy over a "
        "(channels+1)^2 matrix on the driver. rows-only BY DESIGN: the "
        "matrix inversion has no tractable ANSI form — q203 is the "
        "hash-green twin of the distributed core, and the driver math "
        "is pinned by a hand-solved chain + conservation tests in "
        "tests/test_pipeline_ops.py (same twin protocol as q54/q141).",
)
def q202_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import markov_attribution

    return markov_attribution(_t(spark, sf_dir, "events"))


@register(
    "q203_journey_transitions",
    oracle="""
    WITH keep AS (
      SELECT user_id AS u, ts, event_id AS id, event_type AS t
      FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ),
    tagged AS (
      SELECT u, ts, id, t,
             COALESCE(SUM(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY u ORDER BY ts, id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS j
      FROM keep
    ),
    steps AS (
      SELECT COALESCE(LAG(t) OVER (PARTITION BY u, j ORDER BY ts, id),
                      'START') AS from_state,
             CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS to_state
      FROM tagged
    ),
    dead AS (
      SELECT t AS from_state, 'NULL' AS to_state
      FROM (SELECT t, LEAD(t) OVER (PARTITION BY u, j ORDER BY ts, id) AS nx
            FROM tagged) x
      WHERE nx IS NULL AND t <> 'purchase'
    )
    SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT * FROM steps UNION ALL SELECT * FROM dead)
    GROUP BY 1, 2
    """,
    doc="operators/attribution.py::journey_transitions — the distributed "
        "core q202 consumes, exposed as its oracle-paired twin: per-user "
        "streams segmented into journeys (a conversion ends one; the "
        "journey id is a running conversion count, EXCLUSIVE so the "
        "purchase terminates its own journey), with the Markov pseudo-"
        "states START / CONV / NULL. Differs from q158's plain "
        "transition matrix exactly by the journey segmentation and "
        "absorbing states. One user-keyed window; output is at most "
        "(channels+2)^2 rows.",
)
def q203_journey_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.attribution import journey_transitions

    return journey_transitions(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# q204 — concentration / inequality metrics (Gini + HHI per segment)
# ---------------------------------------------------------------------------

@register(
    "q204_revenue_concentration",
    oracle="""
    WITH cust AS (
      SELECT o_orderpriority AS pri, o_custkey, SUM(o_totalprice) AS x
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT pri, x,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY x, o_custkey) AS r
      FROM cust
    )
    SELECT pri AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(2.0 * SUM(r * x) / (COUNT(*) * SUM(x))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini,
           ROUND(SUM(x * x) / (SUM(x) * SUM(x)), 6) AS hhi
    FROM ranked GROUP BY pri
    """,
    doc="Concentration metrics per order-priority segment: the Gini "
        "coefficient of customer revenue (rank-weighted closed form "
        "2*sum(r*x)/(n*sum(x)) - (n+1)/n over ascending ranks — one "
        "window + one aggregation, no O(n^2) pairwise differences) and "
        "the Herfindahl-Hirschman index (sum of squared shares = "
        "sum(x^2)/sum(x)^2, pure aggregation). The inequality family "
        "behind data-mixture diversity audits ('is 90% of this domain's "
        "token mass 10 crawls?') and market-share reporting. The rank "
        "window partitions by segment over the CUSTOMER grain (already "
        "one aggregation down from facts); for billion-member groups "
        "hand the ranking to the operators/ids.py range-partition "
        "recipe, as q171 does for running sums.",
)
def q204_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy(
        F.col("o_orderpriority").alias("segment"), "o_custkey"
    ).agg(F.sum("o_totalprice").alias("x"))
    w = Window.partitionBy("segment").orderBy("x", "o_custkey")
    ranked = cust.withColumn("r", F.row_number().over(w))
    n = F.count(F.lit(1))
    tot = F.sum("x")
    return ranked.groupBy("segment").agg(
        n.cast("bigint").alias("n_customers"),
        F.round(
            2.0 * F.sum(F.col("r") * F.col("x")) / (n * tot) - (n + 1.0) / n, 6
        ).alias("gini"),
        F.round(F.sum(F.col("x") * F.col("x")) / (tot * tot), 6).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# q205 — A/B experiment readout with CUPED variance reduction
# ---------------------------------------------------------------------------

@register(
    "q205_cuped_ab_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             user_id % 2 AS arm,
             COALESCE(SUM(value) FILTER (ts < TIMESTAMP '2024-01-16'), 0.0) AS x,
             COALESCE(SUM(value) FILTER (ts >= TIMESTAMP '2024-01-16'), 0.0) AS y
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    theta AS (
      SELECT covar_samp(x, y) / var_samp(x) AS th, AVG(x) AS mx FROM per_user
    ),
    adj AS (
      SELECT arm, y, y - theta.th * (x - theta.mx) AS y_adj
      FROM per_user CROSS JOIN theta
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(y), 4) AS mean_raw,
           ROUND(AVG(y_adj), 4) AS mean_cuped,
           ROUND(var_samp(y), 4) AS var_raw,
           ROUND(var_samp(y_adj), 4) AS var_cuped
    FROM adj GROUP BY arm
    """,
    doc="Experimentation readout with CUPED (controlled-experiment using "
        "pre-experiment data, Deng et al. 2013): each user's post-period "
        "metric is adjusted by theta*(pre - mean(pre)) with theta = "
        "cov(pre, post)/var(pre), which strictly shrinks variance "
        "without biasing the arm difference — how every large "
        "experimentation platform tightens confidence intervals. One "
        "user-grain aggregation (both periods as conditional sums in "
        "the SAME pass), a 1-row theta broadcast, then per-arm moments "
        "— two map-side-combined shuffles total. Arms are the "
        "deterministic user_id parity so the oracle replays the split "
        "exactly; covar_samp/var_samp match across engines (q19's "
        "stats battery proved the estimator family).",
)
def q205_cuped_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cut, F.col("value"))), F.lit(0.0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cut, F.col("value"))), F.lit(0.0)
        ).alias("y"),
    ).withColumn("arm", F.col("user_id") % 2)
    theta = per_user.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = per_user.crossJoin(F.broadcast(theta)).withColumn(
        "y_adj", F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    )
    return adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("y"), 4).alias("mean_raw"),
        F.round(F.avg("y_adj"), 4).alias("mean_cuped"),
        F.round(F.var_samp("y"), 4).alias("var_raw"),
        F.round(F.var_samp("y_adj"), 4).alias("var_cuped"),
    )


# ---------------------------------------------------------------------------
# q206 — Neyman optimal stratified-sample allocation
# ---------------------------------------------------------------------------

@register(
    "q206_neyman_allocation",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             ROUND(stddev_samp(o_totalprice), 6) AS sd
      FROM orders GROUP BY o_orderpriority
    ),
    t AS (SELECT SUM(n_pop * sd) AS denom FROM s)
    SELECT stratum, n_pop, sd,
           CAST(FLOOR(1000 * (s.n_pop * s.sd) / t.denom) AS BIGINT)
             AS n_sample,
           ROUND(FLOOR(1000 * (s.n_pop * s.sd) / t.denom) / s.n_pop, 6)
             AS sampling_frac
    FROM s CROSS JOIN t
    """,
    doc="Neyman optimal allocation for a stratified sample of 1000: "
        "n_h proportional to N_h * S_h, the allocation that minimizes "
        "the variance of the estimated population mean for a fixed "
        "budget — what a profiling/labeling pipeline uses to decide how "
        "many rows to draw per segment before q106/q121's samplers "
        "actually draw them. One map-side-combined moments pass + a "
        "1-row denominator broadcast. Determinism across engines: the "
        "per-stratum stddev is pre-rounded to 6 BEFORE any downstream "
        "arithmetic, so both engines run the identical IEEE expression "
        "and FLOOR cannot straddle a boundary; counts use FLOOR, not "
        "ROUND (Spark's HALF_UP BigDecimal rounding and DuckDB's C "
        "rounding disagree at .5 boundaries).",
)
def q206_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sd"),
    )
    t = s.agg(F.sum(F.col("n_pop") * F.col("sd")).alias("denom"))
    n_sample = F.floor(1000 * (F.col("n_pop") * F.col("sd")) / F.col("denom"))
    return s.crossJoin(F.broadcast(t)).select(
        "stratum",
        "n_pop",
        "sd",
        n_sample.cast("bigint").alias("n_sample"),
        F.round(n_sample / F.col("n_pop"), 6).alias("sampling_frac"),
    )


# ---------------------------------------------------------------------------
# q215 — Fellegi-Sunter probabilistic record-linkage scores
# ---------------------------------------------------------------------------

# Trained m/u parameters (P(field agrees | match) / P(agrees | unmatch)),
# frozen like a shipped linkage model; the log2 agreement/disagreement
# weights are precomputed HERE so both engines consume identical double
# literals — no runtime log in either plan, no libm-vs-JVM ulp drift.
_FS_MU = {
    "name": (0.90, 0.05),
    "type": (0.85, 0.17),
    "size": (0.80, 0.02),
}
import math as _math

_FS_W = {
    f: (
        _math.log2(m / u),
        _math.log2((1.0 - m) / (1.0 - u)),
    )
    for f, (m, u) in _FS_MU.items()
}


@register(
    "q215_fs_linkage_scores",
    oracle=f"""
    WITH pairs AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_brand AS brand,
               levenshtein(a.p_name, b.p_name) <= 2 AS name_agree,
               a.p_type = b.p_type AS type_agree,
               a.p_size = b.p_size AS size_agree
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    ),
    scored AS (
        SELECT *,
               (CASE WHEN name_agree THEN {_FS_W['name'][0]!r}
                     ELSE {_FS_W['name'][1]!r} END
                + CASE WHEN type_agree THEN {_FS_W['type'][0]!r}
                       ELSE {_FS_W['type'][1]!r} END
                + CASE WHEN size_agree THEN {_FS_W['size'][0]!r}
                       ELSE {_FS_W['size'][1]!r} END) AS s
        FROM pairs
    )
    SELECT id_a, id_b, brand, name_agree, type_agree, size_agree,
           ROUND(CAST(s AS DOUBLE), 4) AS score
    FROM scored WHERE s > 0
    """,
    doc="operators/fuzzy.py candidate economics + Fellegi-Sunter (1969) "
        "scoring: within-brand-block pairs get per-field agreement "
        "weights log2(m/u) (name = 3-arg early-exit edit distance <= 2, "
        "type/size = equality), summed into the linkage log-odds; "
        "score > 0 keeps probable links (>= 2 agreeing fields under "
        "these parameters). The m/u weights are precomputed double "
        "literals shared by both engines, so the threshold and the "
        "4-dp score hash-match exactly. Blocking bounds pair fan-out "
        "to per-block k²; at 100 TB the block key is the shuffle key "
        "and u-probabilities come from a 1-row broadcast profile — "
        "q188 finds fuzzy candidates, THIS ranks them probabilistically.",
)
def q215_fs_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("id_a"),
        F.col("b.p_partkey").alias("id_b"),
        F.col("a.p_brand").alias("brand"),
        (F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 2) >= 0).alias(
            "name_agree"
        ),
        (F.col("a.p_type") == F.col("b.p_type")).alias("type_agree"),
        (F.col("a.p_size") == F.col("b.p_size")).alias("size_agree"),
    )
    score = (
        F.when(F.col("name_agree"), F.lit(_FS_W["name"][0])).otherwise(
            F.lit(_FS_W["name"][1])
        )
        + F.when(F.col("type_agree"), F.lit(_FS_W["type"][0])).otherwise(
            F.lit(_FS_W["type"][1])
        )
        + F.when(F.col("size_agree"), F.lit(_FS_W["size"][0])).otherwise(
            F.lit(_FS_W["size"][1])
        )
    )
    return (
        pairs.withColumn("_s", score)
        .filter(F.col("_s") > 0)
        .select(
            "id_a", "id_b", "brand", "name_agree", "type_agree", "size_agree",
            F.round("_s", 4).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# q220 — Benford first-digit audit (fraud/data-quality screen)
# ---------------------------------------------------------------------------

@register(
    "q220_benford_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT digit, n, CAST(SUM(n) OVER () AS DOUBLE) AS tot FROM g)
    SELECT digit, n,
           ROUND(n / tot, 6) AS obs_p,
           ROUND(LOG10(1 + CAST(1 AS DOUBLE) / digit), 6) AS exp_p,
           ROUND(n / tot - LOG10(1 + CAST(1 AS DOUBLE) / digit), 6) AS excess,
           ROUND(SUM(POWER(n / tot - LOG10(1 + CAST(1 AS DOUBLE) / digit), 2)
                     / LOG10(1 + CAST(1 AS DOUBLE) / digit)) OVER ()
                 * tot, 4) AS chi2
    FROM t
    """,
    doc="Benford's-law first-digit audit over order totals: observed vs "
        "expected log10(1+1/d) digit shares plus the chi-square "
        "goodness-of-fit statistic — the numeric-forensics screen beside "
        "q76's text-quality report and q122's column profile (synthetic "
        "uniform-ish prices FAIL Benford loudly, which is exactly what "
        "the audit exists to flag). First-digit extraction is string "
        "math on the floored total (no float log in the bucketing "
        "path); the fact table reduces to 9 digit rows in one map-side "
        "combine, and every window runs over that 9-row table.",
)
def q220_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    g = o.groupBy(digit.alias("digit")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = g.withColumn("tot", F.sum("n").over(w_all).cast("double"))
    exp_p = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    obs_p = F.col("n") / F.col("tot")
    return t.select(
        "digit",
        "n",
        F.round(obs_p, 6).alias("obs_p"),
        F.round(exp_p, 6).alias("exp_p"),
        F.round(obs_p - exp_p, 6).alias("excess"),
        F.round(
            F.sum(F.pow(obs_p - exp_p, 2) / exp_p).over(w_all) * F.col("tot"),
            4,
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# q228 — chi-square test of independence + Cramér's V (status × priority)
# ---------------------------------------------------------------------------

@register(
    "q228_chi_square_independence",
    oracle="""
    WITH c AS (
        SELECT o_orderstatus AS s, o_orderpriority AS p,
               CAST(COUNT(*) AS DOUBLE) AS obs
        FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT s, SUM(obs) AS rtot FROM c GROUP BY 1),
    ct AS (SELECT p, SUM(obs) AS ctot FROM c GROUP BY 1),
    tot AS (SELECT SUM(obs) AS n,
                   CAST(COUNT(DISTINCT s) AS DOUBLE) AS nr,
                   CAST(COUNT(DISTINCT p) AS DOUBLE) AS nc
            FROM c),
    x AS (
        SELECT c.obs, rt.rtot * ct.ctot / tot.n AS exp, tot.n, tot.nr, tot.nc
        FROM c JOIN rt ON c.s = rt.s JOIN ct ON c.p = ct.p CROSS JOIN tot
    ),
    a AS (
        SELECT SUM((obs - exp) * (obs - exp) / exp) AS chi2,
               ANY_VALUE(n) AS n, ANY_VALUE(nr) AS nr, ANY_VALUE(nc) AS nc
        FROM x
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           ROUND(chi2, 4) AS chi2,
           ROUND(SQRT(chi2 / (n * (LEAST(nr, nc) - 1.0))), 6) AS cramers_v
    FROM a
    """,
    doc="Pearson chi-square test of independence on the order status x "
        "priority contingency table, with Cramér's V effect size — the "
        "categorical-ASSOCIATION inference layer over q183's raw "
        "crosstab (and the independence sibling of q220's "
        "goodness-of-fit chi-square). One groupBy to the |statuses x "
        "priorities| cell grain, row/column/grand totals are dim-sized "
        "broadcast joins, the statistic sums over <= 18 cells. Expected "
        "counts mirror the exact expression tree (rtot*ctot/n) on both "
        "engines; chi2 rounds to 4dp, V to 6dp.",
)
def q228_chi_square_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    c = od.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    rt = c.groupBy("s").agg(F.sum("obs").alias("rtot"))
    ct = c.groupBy("p").agg(F.sum("obs").alias("ctot"))
    tot = c.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("s").cast("double").alias("nr"),
        F.countDistinct("p").cast("double").alias("nc"),
    )
    x = (
        c.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .crossJoin(F.broadcast(tot))
        .select(
            "obs",
            (F.col("rtot") * F.col("ctot") / F.col("n")).alias("exp"),
            "n",
            "nr",
            "nc",
        )
    )
    a = x.agg(
        F.sum(
            (F.col("obs") - F.col("exp"))
            * (F.col("obs") - F.col("exp"))
            / F.col("exp")
        ).alias("chi2"),
        F.any_value("n").alias("n"),
        F.any_value("nr").alias("nr"),
        F.any_value("nc").alias("nc"),
    )
    n, nr, nc, chi2 = F.col("n"), F.col("nr"), F.col("nc"), F.col("chi2")
    return a.select(
        n.cast("bigint").alias("n"),
        ((nr - F.lit(1)) * (nc - F.lit(1))).cast("bigint").alias("dof"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(chi2 / (n * (F.least(nr, nc) - F.lit(1.0)))), 6
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# q232 — RFM customer segmentation (quartile scores via exact percentiles)
# ---------------------------------------------------------------------------

@register(
    "q232_rfm_segments",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(CAST(o_orderdate AS DATE)) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY 1
    ),
    g AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS gmax FROM orders),
    r AS (
        SELECT o_custkey,
               CAST(date_diff('day', last_order, gmax) AS INT) AS recency_days,
               frequency, monetary_cents
        FROM per_cust CROSS JOIN g
    ),
    q AS (
        SELECT quantile_cont(recency_days, 0.25) AS r1,
               quantile_cont(recency_days, 0.50) AS r2,
               quantile_cont(recency_days, 0.75) AS r3,
               quantile_cont(frequency, 0.25) AS f1,
               quantile_cont(frequency, 0.50) AS f2,
               quantile_cont(frequency, 0.75) AS f3,
               quantile_cont(monetary_cents, 0.25) AS m1,
               quantile_cont(monetary_cents, 0.50) AS m2,
               quantile_cont(monetary_cents, 0.75) AS m3
        FROM r
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           4 - (CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
                + CAST(recency_days > r3 AS INT)) AS r_score,
           1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
             + CAST(frequency > f3 AS INT) AS f_score,
           1 + CAST(monetary_cents > m1 AS INT) + CAST(monetary_cents > m2 AS INT)
             + CAST(monetary_cents > m3 AS INT) AS m_score,
           (4 - (CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
                 + CAST(recency_days > r3 AS INT))) * 100
           + (1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
                + CAST(frequency > f3 AS INT)) * 10
           + (1 + CAST(monetary_cents > m1 AS INT) + CAST(monetary_cents > m2 AS INT)
                + CAST(monetary_cents > m3 AS INT)) AS rfm_cell
    FROM r CROSS JOIN q
    """,
    doc="RFM segmentation: per customer, recency (days since last order "
        "vs the corpus max date), frequency (order count) and monetary "
        "(lifetime spend in EXACT integer cents — each price rounds to "
        "cents per-row before the bigint sum, so both engines sum exactly "
        "and no float-order artifact exists), scored 1-4 against the "
        "exact quartiles of each metric and combined into the classic "
        "RxFxM cell (404 = best recency/monetary). The quartile scoring "
        "deliberately avoids a global NTILE window (a whole-table sort "
        "funnel): thresholds come from one 9-value exact-percentile "
        "reduce over the CUSTOMER-grain table, broadcast back via "
        "crossJoin — the q169/q228 1-row-stats shape. All metrics are "
        "integers, so the interpolated quartile doubles are identical "
        "across engines and the > comparisons can never straddle an "
        "ulp. 100 TB: swap percentile for approx_percentile (documented "
        "exact form kept for oracle parity).",
)
def q232_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    per_cust = od.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("monetary_cents"),
    )
    g = od.agg(F.max(F.col("o_orderdate").cast("date")).alias("gmax"))
    r = per_cust.crossJoin(F.broadcast(g)).select(
        "o_custkey",
        F.datediff("gmax", "last_order").cast("int").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    q = r.agg(
        *[
            F.percentile(c, p).alias(f"{c[0]}{i}")
            for c in ("recency_days", "frequency", "monetary_cents")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )
    x = r.crossJoin(F.broadcast(q))

    def bucket(col: str, k: str):
        return sum(
            (F.col(col) > F.col(f"{k}{i}")).cast("int") for i in (1, 2, 3)
        )

    r_s = F.lit(4) - bucket("recency_days", "r")
    f_s = F.lit(1) + bucket("frequency", "f")
    m_s = F.lit(1) + bucket("monetary_cents", "m")
    return x.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_s.alias("r_score"),
        f_s.alias("f_score"),
        m_s.alias("m_score"),
        (r_s * 100 + f_s * 10 + m_s).alias("rfm_cell"),
    )


# ---------------------------------------------------------------------------
# q233 — grouped multivariate OLS via normal equations (2 features)
# ---------------------------------------------------------------------------

@register(
    "q233_grouped_ols",
    oracle="""
    WITH b AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice) AS BIGINT) AS y
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x1) AS DOUBLE) AS sx1,
               CAST(SUM(x2) AS DOUBLE) AS sx2,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x1 * x1) AS DOUBLE) AS sx1x1,
               CAST(SUM(x2 * x2) AS DOUBLE) AS sx2x2,
               CAST(SUM(x1 * x2) AS DOUBLE) AS sx1x2,
               CAST(SUM(x1 * y) AS DOUBLE) AS sx1y,
               CAST(SUM(x2 * y) AS DOUBLE) AS sx2y,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM b GROUP BY 1
    ),
    m AS (
        SELECT l_returnflag, n,
               sx1x1 - sx1 * sx1 / n AS s11,
               sx2x2 - sx2 * sx2 / n AS s22,
               sx1x2 - sx1 * sx2 / n AS s12,
               sx1y - sx1 * sy / n AS s1y,
               sx2y - sx2 * sy / n AS s2y,
               syy - sy * sy / n AS syc,
               sx1, sx2, sy
        FROM s
    ),
    c AS (
        SELECT l_returnflag, n, s1y, s2y, syc, sx1, sx2, sy,
               (s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12) AS b1,
               (s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12) AS b2
        FROM m
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((sy - b1 * sx1 - b2 * sx2) / n, 6) AS b0,
           ROUND(b1, 6) AS b1,
           ROUND(b2, 6) AS b2,
           ROUND((b1 * s1y + b2 * s2y) / syc, 6) AS r2
    FROM c
    """,
    doc="Per-group multivariate OLS (y = extended price in whole dollars "
        "~ quantity + discount-pct, grouped by return flag) solved in "
        "closed form from the 2x2 normal equations — the multi-feature "
        "sibling of q06's single-slope forecast and q219's Theil-Sen. "
        "Inputs quantize to EXACT integers per-row (quantity is "
        "integral, discount to whole pct, price to whole dollars), so "
        "the nine sufficient statistics are exact bigint sums on both "
        "engines (largest, sum(y*y), stays < 2^53 through sf1, so the "
        "double conversion is exact too); every later double op mirrors "
        "the same IEEE expression tree, making 6dp rounding safe. ONE "
        "map-side-combined groupBy to |flags| rows, no window, no "
        "broadcast — the canonical sufficient-statistics pattern that "
        "runs at any scale (100 TB note: swap bigint sums for "
        "decimal(38,0) when group row counts pass ~1e9). R-squared = "
        "SSR/SST from the same statistics.",
)
def q233_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice")).cast("bigint").alias("y"),
    )
    c = [F.col(x) for x in ("x1", "x2", "y")]
    s = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(c[0] * c[0]).cast("double").alias("sx1x1"),
        F.sum(c[1] * c[1]).cast("double").alias("sx2x2"),
        F.sum(c[0] * c[1]).cast("double").alias("sx1x2"),
        F.sum(c[0] * c[2]).cast("double").alias("sx1y"),
        F.sum(c[1] * c[2]).cast("double").alias("sx2y"),
        F.sum(c[2] * c[2]).cast("double").alias("syy"),
    )
    n = F.col("n")
    m = s.select(
        "l_returnflag", "n", "sx1", "sx2", "sy",
        (F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n).alias("s11"),
        (F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n).alias("s22"),
        (F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n).alias("s12"),
        (F.col("sx1y") - F.col("sx1") * F.col("sy") / n).alias("s1y"),
        (F.col("sx2y") - F.col("sx2") * F.col("sy") / n).alias("s2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("syc"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    cdf = m.select(
        "l_returnflag", "n", "s1y", "s2y", "syc", "sx1", "sx2", "sy",
        ((F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det).alias("b1"),
        ((F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det).alias("b2"),
    )
    return cdf.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            (F.col("sy") - F.col("b1") * F.col("sx1") - F.col("b2") * F.col("sx2"))
            / F.col("n"),
            6,
        ).alias("b0"),
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
        F.round(
            (F.col("b1") * F.col("s1y") + F.col("b2") * F.col("s2y")) / F.col("syc"),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# q238 — Wilson score confidence intervals per segment
# ---------------------------------------------------------------------------

@register(
    "q238_wilson_ci",
    oracle="""
    WITH s AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS DOUBLE) AS k
        FROM orders GROUP BY 1
    )
    SELECT o_orderpriority,
           CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS successes,
           ROUND(k / n, 6) AS p_hat,
           ROUND(((k / n + 1.96 * 1.96 / (2.0 * n))
                  - 1.96 * SQRT((k / n) * (1.0 - k / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_lo,
           ROUND(((k / n + 1.96 * 1.96 / (2.0 * n))
                  + 1.96 * SQRT((k / n) * (1.0 - k / n) / n
                                + 1.96 * 1.96 / (4.0 * n * n)))
                 / (1.0 + 1.96 * 1.96 / n), 6) AS wilson_hi
    FROM s
    """,
    doc="Wilson score 95% confidence interval for the fulfilled-order "
        "proportion per order priority — the segment-level uncertainty "
        "quantification beside q228's association test and q205's CUPED "
        "lift: unlike the normal (Wald) interval it never exits [0, 1] "
        "and stays calibrated for small segments and extreme "
        "proportions, which is why it's the standard for conversion "
        "dashboards. Counts are exact integers from ONE "
        "map-side-combined groupBy (no window, no broadcast); the "
        "interval arithmetic mirrors the identical IEEE expression tree "
        "(z = 1.96 literal on both engines) so 6dp rounding is safe.",
)
def q238_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    s = od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        )
        .cast("double")
        .alias("k"),
    )
    n, k = F.col("n"), F.col("k")
    z = F.lit(1.96)
    p = k / n
    center = p + z * z / (F.lit(2.0) * n)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z * z / n
    return s.select(
        "o_orderpriority",
        n.cast("bigint").alias("n"),
        k.cast("bigint").alias("successes"),
        F.round(p, 6).alias("p_hat"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# q240 — population stability index (numeric drift on reference deciles)
# ---------------------------------------------------------------------------

@register(
    "q240_psi_price_drift",
    oracle="""
    WITH b AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 'ref' ELSE 'cur' END AS period
        FROM orders
    ),
    e AS (
        SELECT quantile_cont(cents, 0.1) AS e1, quantile_cont(cents, 0.2) AS e2,
               quantile_cont(cents, 0.3) AS e3, quantile_cont(cents, 0.4) AS e4,
               quantile_cont(cents, 0.5) AS e5, quantile_cont(cents, 0.6) AS e6,
               quantile_cont(cents, 0.7) AS e7, quantile_cont(cents, 0.8) AS e8,
               quantile_cont(cents, 0.9) AS e9
        FROM b WHERE period = 'ref'
    ),
    x AS (
        SELECT period,
               1 + CAST(cents > e1 AS INT) + CAST(cents > e2 AS INT)
                 + CAST(cents > e3 AS INT) + CAST(cents > e4 AS INT)
                 + CAST(cents > e5 AS INT) + CAST(cents > e6 AS INT)
                 + CAST(cents > e7 AS INT) + CAST(cents > e8 AS INT)
                 + CAST(cents > e9 AS INT) AS bin
        FROM b CROSS JOIN e
    ),
    c AS (
        SELECT bin,
               CAST(COUNT(*) FILTER (WHERE period = 'ref') AS DOUBLE) AS c_ref,
               CAST(COUNT(*) FILTER (WHERE period = 'cur') AS DOUBLE) AS c_cur
        FROM x GROUP BY 1
    ),
    t AS (SELECT SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur FROM c)
    SELECT bin,
           CAST(c_ref AS BIGINT) AS n_ref,
           CAST(c_cur AS BIGINT) AS n_cur,
           ROUND(((c_cur + 0.5) / (t.n_cur + 5.0)
                  - (c_ref + 0.5) / (t.n_ref + 5.0))
                 * LN(((c_cur + 0.5) / (t.n_cur + 5.0))
                      / ((c_ref + 0.5) / (t.n_ref + 5.0))), 6) AS psi_term
    FROM c CROSS JOIN t
    """,
    doc="Population stability index of the order-price distribution, "
        "pre- vs post-1998: deciles of the REFERENCE period become the "
        "fixed bin edges (the defining PSI move — current data is "
        "scored against the reference's quantiles, the scorecard-"
        "monitoring standard), each bin contributes (q-p)*ln(q/p) with "
        "+0.5/+5 Laplace smoothing so an emptied bin stays finite. The "
        "NUMERIC-drift sibling of q124's categorical language drift and "
        "q234's distributional JSD. Prices quantize to exact integer "
        "cents per-row, so the interpolated decile edges are identical "
        "doubles on both engines and bin membership can never straddle "
        "an ulp; binning is 9 JVM comparisons against a broadcast "
        "1-row edge table (never a width_bucket divergence); the PSI "
        "arithmetic mirrors the identical IEEE tree. Scale: one "
        "map-side groupBy to 10 bins + two 1-row reduces — the edge "
        "percentile swaps to approx_percentile at 100 TB.",
)
def q240_psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    b = od.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
            "ref",
        )
        .otherwise("cur")
        .alias("period"),
    )
    e = b.filter(F.col("period") == "ref").agg(
        *[
            F.percentile("cents", i / 10.0).alias(f"e{i}")
            for i in range(1, 10)
        ]
    )
    bin_expr = F.lit(1)
    for i in range(1, 10):
        bin_expr = bin_expr + (F.col("cents") > F.col(f"e{i}")).cast("int")
    x = b.crossJoin(F.broadcast(e)).select("period", bin_expr.alias("bin"))
    c = x.groupBy("bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0))
        .cast("double")
        .alias("c_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0))
        .cast("double")
        .alias("c_cur"),
    )
    t = c.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p = (F.col("c_cur") + F.lit(0.5)) / (F.col("n_cur") + F.lit(5.0))
    q = (F.col("c_ref") + F.lit(0.5)) / (F.col("n_ref") + F.lit(5.0))
    return c.crossJoin(F.broadcast(t)).select(
        "bin",
        F.col("c_ref").cast("bigint").alias("n_ref"),
        F.col("c_cur").cast("bigint").alias("n_cur"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )
