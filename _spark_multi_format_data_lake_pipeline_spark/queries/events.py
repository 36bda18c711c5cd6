"""Event-stream queries: JSON props extraction, time-window aggregation
(batch-equivalent of the streaming formulations in streaming/), and
sessionization (SURVEY.md §2 Part B "Scalar functions: JSON" /
"Streaming" rows).

The tumbling-window and sessionization queries here are the deterministic
batch twins of streaming/events.py — the driver oracle-checks these, the
streaming tests assert stream==batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.lake import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q40 — JSON extraction from the props string column
# ---------------------------------------------------------------------------

@register(
    "q40_props_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
    doc="get_json_object over the untyped props column — the schema-on-read path "
        "for semi-structured event payloads.",
)
def q40_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# q41 — from_json with an explicit schema (typed struct path)
# ---------------------------------------------------------------------------

@register(
    "q41_props_typed_struct",
    oracle="""
    SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) AS k_bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="from_json(props, 'k BIGINT') — parse once into a struct, then project; "
        "preferred over repeated get_json_object calls at scale.",
)
def q41_props_typed_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("props_s", F.from_json("props", "k BIGINT"))
    return (
        parsed.withColumn("k_bucket", F.col("props_s.k") % 10)
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q42 — tumbling window aggregation (batch twin of the streaming query)
# ---------------------------------------------------------------------------

@register(
    "q42_hourly_event_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h window: F.window on the streaming side == date_trunc here; "
        "group keys stringified for cross-engine hashing.",
)
def q42_hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").getField("start").alias("_hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("_hour", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# q43 — sessionization (gaps-and-islands, 30-min inactivity gap)
# ---------------------------------------------------------------------------

@register(
    "q43_user_sessions",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
                         - epoch_ms(CAST(LAG(ts) OVER w AS TIMESTAMP)) > 1800000
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM seq
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           (epoch_ms(CAST(MAX(ts) AS TIMESTAMP))
            - epoch_ms(CAST(MIN(ts) AS TIMESTAMP))) / 1000 AS duration_s
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc="Sessionize with a 30-min gap via gaps-and-islands: lag → flag → running sum. "
        "ONE shuffle by user_id; the streaming twin uses F.session_window.",
)
def q43_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # testdata ts is TIMESTAMP_NTZ (parquet timestamp[us] without tz);
    # unix_millis requires TIMESTAMP, so cast (session tz is UTC → identity).
    ts = F.col("ts").cast("timestamp")
    gap_ms = F.unix_millis(ts) - F.unix_millis(F.lag(ts).over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_ms > 1800000, 1)
        .when(F.lag(ts).over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(w_run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (
                F.unix_millis(F.max("ts").cast("timestamp"))
                - F.unix_millis(F.min("ts").cast("timestamp"))
            )
            / 1000
        ).alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# q90 — click→purchase attribution (batch twin of stream_stream_join)
# ---------------------------------------------------------------------------

@register(
    "q90_click_purchase_attribution",
    oracle="""
    SELECT c.user_id,
           c.event_id AS left_id,
           p.event_id AS right_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    doc="Interval join: every purchase within 30 min after a click by the "
        "same user. Batch twin of streaming/events.py::stream_stream_join "
        "(same column contract); the streaming test asserts stream==batch. "
        "At scale both sides shuffle once on user_id and the interval "
        "bound doubles as the state-eviction rule.",
)
def q90_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import stream_stream_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return stream_stream_join(clicks, purchases, within="30 minutes")


# ---------------------------------------------------------------------------
# q151 — attribution incl. unconverted clicks (batch twin of leftOuter join)
# ---------------------------------------------------------------------------

@register(
    "q151_attribution_with_unmatched",
    oracle="""
    SELECT c.user_id,
           c.event_id AS left_id,
           p.event_id AS right_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
    FROM events c
    LEFT JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
     AND p.event_type = 'purchase'
    WHERE c.event_type = 'click'
    """,
    doc="q90's left-outer variant: every click appears, converted or not "
        "(null right_id / lag_us when no purchase followed within 30 min) "
        "— the dead-letter side of attribution. Batch twin of "
        "streaming/events.py::stream_stream_join(how='leftOuter'); in "
        "streaming the same plan emits unmatched rows on watermark "
        "expiry (tests/test_streaming.py). Same one-shuffle-per-side "
        "scale shape as q90.",
)
def q151_attribution_with_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import stream_stream_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return stream_stream_join(
        clicks, purchases, within="30 minutes", how="leftOuter"
    )


# ---------------------------------------------------------------------------
# q97 — retention cohorts (signup-month cohort × month offset)
# ---------------------------------------------------------------------------

@register(
    "q97_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort,
               date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS day_offset
        FROM events e JOIN firsts f USING (user_id)
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           day_offset::INT AS day_offset,
           COUNT(*) AS n_users
    FROM activity
    GROUP BY 1, 2
    """,
    doc="Classic retention matrix: cohort = day of a user's first event; "
        "count distinct users active at each day offset. Two aggregations "
        "sharing the user_id shuffle key; the firsts table is |users|-sized "
        "so AQE broadcasts the join at scale.",
)
def q97_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("ts").cast("date"), F.col("cohort")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


# ---------------------------------------------------------------------------
# q98 — sequential conversion funnel (click → view → purchase)
# ---------------------------------------------------------------------------

@register(
    "q98_event_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(ts) FILTER (WHERE event_type = 'click') AS first_click,
               MIN(ts) FILTER (WHERE event_type = 'view'
                               AND ts > (SELECT MIN(ts) FROM events e2
                                         WHERE e2.user_id = e.user_id
                                           AND e2.event_type = 'click'))
                   AS first_view_after,
               MAX(ts) FILTER (WHERE event_type = 'purchase') AS last_purchase
        FROM events e
        GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE first_click IS NOT NULL) AS n_clicked,
           COUNT(*) FILTER (WHERE first_view_after IS NOT NULL) AS n_then_viewed,
           COUNT(*) FILTER (WHERE first_view_after IS NOT NULL
                            AND last_purchase > first_view_after) AS n_then_purchased
    FROM per_user
    """,
    doc="Ordered funnel: users who clicked, then viewed AFTER the first "
        "click, then purchased AFTER that view. One groupBy(user) with "
        "conditional aggregates — no self-joins; the step ordering is "
        "min/max timestamp logic, the scalable funnel formulation.",
)
def q98_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    click_ts = F.min(F.when(F.col("event_type") == "click", F.col("ts")))
    per_user = ev.groupBy("user_id").agg(
        click_ts.alias("first_click"),
        F.min(
            F.when(
                (F.col("event_type") == "view"), F.col("ts")
            )
        ).alias("first_view_any"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("last_purchase"),
    )
    # recompute first view AFTER first click with a second conditional pass
    view_after = (
        ev.alias("e")
        .join(
            per_user.select("user_id", "first_click").alias("p"),
            "user_id",
        )
        .filter(
            (F.col("event_type") == "view") & (F.col("ts") > F.col("first_click"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view_after"))
    )
    j = per_user.join(view_after, "user_id", "left")
    return j.agg(
        F.count(F.when(F.col("first_click").isNotNull(), 1)).alias("n_clicked"),
        F.count(F.when(F.col("first_view_after").isNotNull(), 1)).alias(
            "n_then_viewed"
        ),
        F.count(
            F.when(
                F.col("first_view_after").isNotNull()
                & (F.col("last_purchase") > F.col("first_view_after")),
                1,
            )
        ).alias("n_then_purchased"),
    )


# ---------------------------------------------------------------------------
# q100 — VARIANT semi-structured path (Spark 4 parse_json/variant_get)
# ---------------------------------------------------------------------------

@register(
    "q100_variant_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion of the untyped props column: parse_json "
        "once into a variant, then typed variant_get extraction — the "
        "shredded-at-read path that replaces repeated get_json_object "
        "string parsing (one parse per row instead of one per field). "
        "DuckDB twin uses its JSON extraction.",
)
def q100_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("vp")
    ).select(
        "event_type",
        F.expr("variant_get(vp, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.filter(F.col("k") % 2 == 0)
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.max("k").alias("max_k"))
    )


# ---------------------------------------------------------------------------
# q101 — mergeable HLL sketches (partials per day, union to total)
# ---------------------------------------------------------------------------

@register(
    "q101_hll_partial_union",
    oracle=None,
    doc="Mergeable distinct-count sketches: hll_sketch_agg builds one "
        "sketch per day, hll_union_agg merges them into the overall "
        "distinct-user estimate — the incremental pattern that lets a 100 "
        "TB pipeline maintain per-partition sketches and answer global "
        "count-distinct without rescanning history. Sketches are engine-"
        "specific -> rows-only; tests assert <5% error vs exact, and the "
        "explicit register-table twin q136 hash-checks the same partial->"
        "merge algebra cross-engine.",
)
def q101_hll_partial_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias(
            "approx_distinct_users"
        ),
    )


# ---------------------------------------------------------------------------
# q136 — explicit HLL register table (oracle-paired twin of q101)
# ---------------------------------------------------------------------------

@register(
    "q136_hll_register_twin",
    oracle="""
    WITH h AS (
        SELECT CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS hv
        FROM events
    ),
    r AS (
        SELECT CAST(hv % 64 AS INT) AS bucket,
               hv // 64 AS w
        FROM h
    )
    SELECT bucket,
           CAST(MAX(CASE WHEN w > 0 THEN 27 - length(bin(w)) ELSE 27 END)
                AS INT) AS rho
    FROM r GROUP BY bucket
    """,
    doc="Oracle-paired twin of q101: the same per-day-partial -> "
        "merge-by-union HLL shape, but with the sketch held as an explicit "
        "(bucket, rho) register table (functions/sketches.py "
        "hll_register_partials/hll_merge_registers) instead of the "
        "datasketches binary no other engine can parse. sha256 hex-prefix "
        "hash (q134 pattern), rho from length(bin(w)) — pure integer rows, "
        "so DuckDB rebuilds the merged registers exactly and the driver "
        "hash-checks the mergeable-sketch algebra q101 can only row-count. "
        "Per-day partials merged by MAX == global MAX, which is the "
        "mergeability property itself; the estimate step is pinned by a "
        "<25%-error test against exact count-distinct.",
)
def q136_hll_register_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.sketches import hll_merge_registers, hll_register_partials

    ev = _t(spark, sf_dir, "events")
    daily = hll_register_partials(ev, "user_id", F.to_date("ts"), p=6)
    return hll_merge_registers(daily)


# ---------------------------------------------------------------------------
# q152 — time-series gap-fill / daily resample (dense per-user activity)
# ---------------------------------------------------------------------------

@register(
    "q152_daily_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(SUM(COALESCE(d.n, 0))
                OVER (PARTITION BY s.user_id ORDER BY s.day) AS BIGINT) AS cum_events
    FROM spine s LEFT JOIN daily d USING (user_id, day)
    """,
    doc="Time-series resampling: densify each user's activity to one row "
        "per calendar day between their first and last event (zero-filled "
        "gaps) with a running cumulative count — the upsampling primitive "
        "feeding forward-fill (q117) and drift monitors. The spine comes "
        "from per-user min/max + sequence() explode, so its size is "
        "user-days, never a cross join against a global calendar; every "
        "stage (daily rollup, bounds, spine join, running sum) is keyed on "
        "user_id — one logical co-partitioning at scale, no skew beyond "
        "the busiest user's day range.",
)
def q152_daily_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    filled = (
        spine.join(daily, ["user_id", "day"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return filled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n_events"),
        F.sum("n").over(w).cast("bigint").alias("cum_events"),
    )


# ---------------------------------------------------------------------------
# q154 — DAU / trailing-7-day WAU / stickiness (sliding DISTINCT window)
# ---------------------------------------------------------------------------

@register(
    "q154_dau_wau_stickiness",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    days AS (SELECT DISTINCT day FROM activity),
    contrib AS (
        SELECT a.user_id,
               CAST(unnest(generate_series(a.day, a.day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS wday
        FROM activity a
    ),
    wau AS (
        SELECT c.wday AS day, COUNT(DISTINCT c.user_id) AS wau
        FROM contrib c JOIN days d ON d.day = c.wday
        GROUP BY 1
    ),
    dau AS (SELECT day, COUNT(*) AS dau FROM activity GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           ROUND(dau.dau::DOUBLE / wau.wau, 4) AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    """,
    doc="Product-analytics stickiness: daily actives, trailing-7-day "
        "actives (a sliding COUNT DISTINCT — inexpressible as a window "
        "frame since distinct does not decompose), and their ratio. The "
        "scale trick is contribution-explode: each (user, day) activity "
        "row fans out to the <=7 window-end days it supports, turning the "
        "sliding distinct into a plain groupBy count-distinct keyed by "
        "day. Cost is a bounded 7x of the DEDUPED activity table (users x "
        "days, already tiny next to raw events), not of the event log; "
        "every stage is day- or user-day-keyed, no skew.",
)
def q154_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = activity.select("day").distinct()
    contrib = activity.select(
        "user_id",
        F.explode(
            F.sequence("day", F.date_add("day", 6))
        ).alias("wday"),
    )
    wau = (
        contrib.join(days, contrib.wday == days.day)
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = activity.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q157 — temporal train/test split with embargo window
# ---------------------------------------------------------------------------

@register(
    "q157_temporal_split_embargo",
    oracle="""
    WITH tagged AS (
        SELECT user_id,
               CAST(ts AS DATE) AS day,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-20' THEN 'train'
                    WHEN CAST(ts AS DATE) < DATE '2024-01-23' THEN 'embargo'
                    ELSE 'test' END AS split
        FROM events
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           strftime(MIN(day), '%Y-%m-%d') AS min_day,
           strftime(MAX(day), '%Y-%m-%d') AS max_day
    FROM tagged
    GROUP BY split
    """,
    doc="Time-based train/test split with a 3-day embargo dropped between "
        "them — the temporal complement of q144/q145's content-based "
        "splits: models trained on pre-cutoff data must not be evaluated "
        "on events their features could leak into, so the embargo absorbs "
        "the feature-window overlap. Map-only tagging (the CASE costs "
        "nothing, prunes at the scan when the cutoff is a partition "
        "column) + one split-keyed rollup.",
)
def q157_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.to_date("ts")
    split = (
        F.when(day < F.lit("2024-01-20").cast("date"), "train")
        .when(day < F.lit("2024-01-23").cast("date"), "embargo")
        .otherwise("test")
    )
    return (
        ev.select(split.alias("split"), day.alias("day"), "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.date_format(F.min("day"), "yyyy-MM-dd").alias("min_day"),
            F.date_format(F.max("day"), "yyyy-MM-dd").alias("max_day"),
        )
    )


# ---------------------------------------------------------------------------
# q158 — event-type Markov transition matrix
# ---------------------------------------------------------------------------

@register(
    "q158_event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    t AS (
        SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           ROUND(n::DOUBLE / SUM(n) OVER (PARTITION BY from_type), 4) AS p
    FROM t
    """,
    doc="First-order Markov chain over user event streams: row-normalized "
        "transition probabilities between event types (the sequence-model "
        "prior behind next-event prediction and anomaly scoring). "
        "Deterministic ordering ties break on event_id in BOTH engines. "
        "One user-keyed window + one (from, to)-keyed rollup; the "
        "normalizing window runs over the |types|^2 transition table — "
        "tiny at any event volume.",
)
def q158_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.sum("n").over(norm), 4).alias("p"),
    )


# ---------------------------------------------------------------------------
# q214 — CUSUM changepoint scan over the daily event-volume series
# ---------------------------------------------------------------------------

@register(
    "q214_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    stats AS (
        SELECT AVG(n_events) AS mu, STDDEV_SAMP(n_events) AS sigma
        FROM daily
    ),
    z AS (
        SELECT day, n_events,
               ROUND((n_events - mu) / sigma, 6) + 0.0 AS z
        FROM daily, stats
    ),
    c AS (
        SELECT day, n_events, z,
               ROUND(SUM(z) OVER (ORDER BY day), 6) + 0.0 AS cusum
        FROM z
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_events, z, cusum,
           ABS(cusum) = MAX(ABS(cusum)) OVER () AS is_peak
    FROM c
    """,
    doc="CUSUM mean-shift scan (Page 1954): standardized daily event "
        "volumes accumulate into a cumulative-deviation walk whose peak "
        "|S| marks the most likely changepoint — the volume-drift "
        "monitor beside q124's distribution drift. Fact rows reduce to "
        "the |days| grain in one map-side-combined aggregation; the "
        "mean/stddev are a 1-row broadcast and the walk + peak windows "
        "run over the bounded day table (the sanctioned dim-window "
        "class, never fact-sized). z is pre-rounded so the running sum "
        "and the argmax flag compare identically in both engines; the "
        "+ 0.0 after each ROUND normalizes IEEE negative zero (a day "
        "sitting a hair under the mean rounds to -0.0 in one engine "
        "and 0.0 in the other, which value-hashes apart).",
)
def q214_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    stats = daily.agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sigma"),
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n_events",
        (
            F.round(
                (F.col("n_events") - F.col("mu")) / F.col("sigma"), 6
            )
            + F.lit(0.0)
        ).alias("z"),
    )
    w_run = Window.orderBy("day")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = z.withColumn(
        "cusum", F.round(F.sum("z").over(w_run), 6) + F.lit(0.0)
    )
    return c.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "z",
        "cusum",
        (F.abs("cusum") == F.max(F.abs("cusum")).over(w_all)).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# q216 — EWMA smoothing of the daily value series (truncated-weight form)
# ---------------------------------------------------------------------------

@register(
    "q216_ewma_daily_value",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS x
        FROM events GROUP BY 1
    ),
    arr AS (
        SELECT day, x,
               list(x) OVER (ORDER BY day
                             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS a
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           x AS daily_value,
           ROUND(
             list_sum(list_transform(range(1, len(a) + 1),
                      j -> a[j] * pow(0.8, len(a) - j)))
             / ((1 - pow(0.8, len(a))) / 0.2), 4) AS ewma
    FROM arr
    """,
    doc="Exponentially weighted moving average (alpha = 0.2, "
        "pandas-adjust form) over the daily value series — the smoothing "
        "primitive beside q06's trend forecast and q214's shift "
        "detector. EWMA's recursion is inherently sequential, so the "
        "distributed form is the TRUNCATED window: weights below "
        "(1-alpha)^30 ≈ 1e-3 are dropped, making each row a pure "
        "function of its bounded 30-row frame — collect_list over the "
        "day-grain window + one JVM weighted fold, embarrassingly "
        "parallel at any scale (the exact-recursion alternative is a "
        "single-partition scan). Daily sums are pre-rounded and both "
        "engines fold the same frame order, so the 4-dp EWMA matches.",
)
def q216_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("x")
    )
    w = Window.orderBy("day").rowsBetween(-29, Window.currentRow)
    arr = daily.select(
        "day", "x", F.collect_list("x").over(w).alias("_a")
    )
    n = F.size("_a")
    num = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at("_a", j) * F.pow(F.lit(0.8), (n - j).cast("double")),
    )
    den = (F.lit(1.0) - F.pow(F.lit(0.8), n.cast("double"))) / F.lit(0.2)
    return arr.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").alias("daily_value"),
        F.round(num / den, 4).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# q219 — Theil-Sen robust trend over the daily event-volume series
# ---------------------------------------------------------------------------

@register(
    "q219_theil_sen_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    ix AS (
        SELECT day, y,
               date_diff('day', MIN(day) OVER (), day) AS x
        FROM daily
    ),
    sl AS (
        SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS m
        FROM ix a JOIN ix b ON b.x > a.x
    ),
    med AS (SELECT quantile_cont(m, 0.5) AS slope FROM sl),
    res AS (SELECT ix.y - med.slope * ix.x AS r FROM ix, med)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           ROUND(med.slope, 6) AS slope,
           ROUND((SELECT quantile_cont(r, 0.5) FROM res), 4) AS intercept
    FROM med
    """,
    doc="Theil-Sen estimator: the median of all pairwise slopes over the "
        "daily volume series (plus the median-residual intercept) — the "
        "outlier-robust sibling of q06's least-squares forecast (one bad "
        "day cannot move it; breakdown point 29%). The fact table "
        "reduces to the |days| grain first, so the pairwise join is "
        "days², a bounded dim-side cost at any corpus size (long series "
        "at scale use the repeated-median or windowed variant — the "
        "median-of-slopes algebra is unchanged). Slopes are exact "
        "integer ratios and both engines interpolate the median the "
        "same way (percentile == quantile_cont, the q133 contract).",
)
def q219_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ix = daily.select(
        "day", "y", F.datediff("day", F.min("day").over(w_all)).alias("x")
    )
    a, b = ix.alias("a"), ix.alias("b")
    sl = a.join(b, F.col("b.x") > F.col("a.x")).select(
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("m")
    )
    med = sl.agg(F.expr("percentile(m, 0.5)").alias("slope"))
    res = ix.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("slope") * F.col("x")).alias("r")
    )
    icpt = res.agg(F.expr("percentile(r, 0.5)").alias("i"))
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        nd.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(icpt))
        .select(
            "n_days",
            F.round("slope", 6).alias("slope"),
            F.round("i", 4).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# q221 — Kaplan-Meier survival curve over user activity lifetimes
# ---------------------------------------------------------------------------

@register(
    "q221_kaplan_meier",
    oracle="""
    WITH u AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l
        FROM events GROUP BY user_id
    ),
    o AS (SELECT MAX(l) AS cutoff FROM u),
    dur AS (
        SELECT CASE WHEN date_diff('day', l, o.cutoff) >= 1
                    THEN date_diff('day', f, l)
                    ELSE date_diff('day', f, o.cutoff) END AS t,
               CASE WHEN date_diff('day', l, o.cutoff) >= 1
                    THEN 1 ELSE 0 END AS ev
        FROM u, o
    ),
    g AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(ev) AS BIGINT) AS d
        FROM dur GROUP BY t
    ),
    r AS (
        SELECT t, cnt, d,
               CAST(SUM(cnt) OVER (ORDER BY t DESC) AS BIGINT) AS at_risk
        FROM g
    ),
    f AS (
        SELECT t, d, at_risk,
               CAST(at_risk - d AS DOUBLE) / at_risk AS factor
        FROM r WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS t_days, d AS n_events, at_risk,
           ROUND(CASE WHEN MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
                          OVER (ORDER BY t) = 1
                      THEN 0.0
                      ELSE EXP(SUM(CASE WHEN factor > 0 THEN LN(factor)
                                        ELSE 0 END) OVER (ORDER BY t))
                 END, 6) AS survival
    FROM f
    """,
    doc="Kaplan-Meier survival estimate over user activity lifetimes "
        "(duration = first-to-last active day; users still active on the final observed day are right-censored at the cutoff) — "
        "the time-to-churn analytic beside q97's retention cohorts, "
        "with censoring handled correctly instead of cohort truncation. "
        "The fact table reduces to the user grain in one shuffle; "
        "everything after runs over the bounded distinct-duration table "
        "(reverse-cumulative at-risk counts, the log-sum product walk, "
        "an explicit zero-factor absorbing flag so S(t)=0 is exact, "
        "never EXP(LN(0))).",
)
def q221_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f"), F.max(F.to_date("ts")).alias("l")
    )
    o = u.agg(F.max("l").alias("cutoff"))
    du = u.crossJoin(F.broadcast(o)).select(
        F.when(
            F.datediff("cutoff", "l") >= 1, F.datediff("l", "f")
        ).otherwise(F.datediff("cutoff", "f")).alias("t"),
        F.when(F.datediff("cutoff", "l") >= 1, 1).otherwise(0).alias("ev"),
    )
    g = du.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("ev").cast("bigint").alias("d"),
    )
    w_desc = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = g.withColumn("at_risk", F.sum("cnt").over(w_desc).cast("bigint"))
    f = r.filter(F.col("d") > 0).withColumn(
        "factor",
        F.lit(1.0) * (F.col("at_risk") - F.col("d")) / F.col("at_risk"),
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hit_zero = (
        F.max(F.when(F.col("factor") == 0, 1).otherwise(0)).over(w_asc) == 1
    )
    ln_walk = F.sum(
        F.when(F.col("factor") > 0, F.log("factor")).otherwise(F.lit(0.0))
    ).over(w_asc)
    return f.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("d").alias("n_events"),
        "at_risk",
        F.round(
            F.when(hit_zero, F.lit(0.0)).otherwise(F.exp(ln_walk)), 6
        ).alias("survival"),
    )


# ---------------------------------------------------------------------------
# q226 — day-of-week seasonal profile (ratio-to-overall decomposition)
# ---------------------------------------------------------------------------

@register(
    "q226_seasonal_dow_profile",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, ROUND(SUM(value), 2) AS x
        FROM events GROUP BY 1
    ),
    g AS (SELECT AVG(x) AS overall FROM daily)
    SELECT CAST(isodow(day) AS INT) AS iso_dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(x), 4) AS dow_avg,
           ROUND(AVG(x) / g.overall, 6) AS seasonal_index
    FROM daily, g
    GROUP BY 1, g.overall
    """,
    doc="Multiplicative day-of-week seasonal indices (the "
        "ratio-to-overall form of classical decomposition): daily value "
        "sums reduce to 7 ISO-weekday strata whose mean over the grand "
        "mean is the seasonal factor a forecaster divides out before "
        "trending — the seasonality primitive beside q06 (trend), q216 "
        "(smoothing) and q214 (shift detection). Fact rows reduce to "
        "the |days| grain first; the index math runs on 7 rows against "
        "a 1-row broadcast grand mean. ISO weekday (Mon=1) on both "
        "engines: Spark weekday()+1 == DuckDB isodow.",
)
def q226_seasonal_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("x")
    )
    overall = daily.agg(F.avg("x").alias("overall"))
    return (
        daily.groupBy(
            (F.expr("weekday(day)") + F.lit(1)).cast("int").alias("iso_dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.avg("x").alias("_avg"),
        )
        .crossJoin(F.broadcast(overall))
        .select(
            "iso_dow",
            "n_days",
            F.round(F.col("_avg"), 4).alias("dow_avg"),
            F.round(F.col("_avg") / F.col("overall"), 6).alias(
                "seasonal_index"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q227 — Mann-Whitney U rank-sum test (distributed average ranks)
# ---------------------------------------------------------------------------

@register(
    "q227_mann_whitney_u",
    oracle="""
    WITH s AS (
        SELECT user_id % 2 AS grp, value AS v
        FROM events WHERE value IS NOT NULL
    ),
    vg AS (
        SELECT v, CAST(COUNT(*) AS DOUBLE) AS t,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS t1
        FROM s GROUP BY v
    ),
    r AS (
        SELECT v, t, t1,
               COALESCE(SUM(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0.0) AS cb
        FROM vg
    ),
    a AS (
        SELECT SUM(t1 * (cb + (t + 1.0) / 2)) AS r1,
               SUM(t1) AS n1, SUM(t) AS n, SUM(t * t * t - t) AS tie
        FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n - n1 AS BIGINT) AS n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0, 2) AS u1,
           ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * (n - n1) / 2.0)
                 / SQRT((n1 * (n - n1) / 12.0)
                        * ((n + 1) - tie / (n * (n - 1.0)))), 6) AS z
    FROM a
    """,
    doc="Mann-Whitney U / Wilcoxon rank-sum test between the two "
        "deterministic user cohorts (user_id parity) over event values — "
        "the NONPARAMETRIC location test beside q205's CUPED mean "
        "comparison (no normality assumption; immune to the outliers "
        "q107/q109 flag). Tie-corrected normal approximation. The "
        "textbook form ranks the pooled sample with ONE global sort "
        "window — a keyless data-sized funnel — so this reduces to the "
        "distinct-VALUE grain (t, t1 per value) and takes the "
        "cumulative-below count from operators/prefix.py's "
        "range-partition + O(P) driver-partials recipe (the q171 "
        "machinery): average rank of a tie group = count_below + "
        "(t+1)/2, so R1 = sum(t1 * avg_rank) needs no per-row ranks at "
        "all. Rank sums are exact half-integer doubles (order-invariant "
        "summation), so u1 matches bit-for-bit; z mirrors the exact "
        "expression tree on both engines and rounds to 6dp.",
)
def q227_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.prefix import grouped_running_sum

    ev = _t(spark, sf_dir, "events")
    s = ev.filter(F.col("value").isNotNull()).select(
        (F.col("user_id") % 2).alias("grp"), F.col("value").alias("v")
    )
    vg = s.groupBy("v").agg(
        F.count(F.lit(1)).cast("double").alias("t"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("double")
        .alias("t1"),
    )
    run = grouped_running_sum(
        vg.withColumn("_one", F.lit(0)), ["_one"], "v", "t", out_col="_run"
    )
    r = run.select(
        "t", "t1", (F.col("_run") - F.col("t")).alias("cb")
    )
    a = r.agg(
        F.sum(
            F.col("t1") * (F.col("cb") + (F.col("t") + F.lit(1.0)) / F.lit(2))
        ).alias("r1"),
        F.sum("t1").alias("n1"),
        F.sum("t").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie"),
    )
    n1, n, r1, tie = F.col("n1"), F.col("n"), F.col("r1"), F.col("tie")
    u1 = r1 - n1 * (n1 + F.lit(1)) / F.lit(2.0)
    z = (
        r1
        - n1 * (n1 + F.lit(1)) / F.lit(2.0)
        - n1 * (n - n1) / F.lit(2.0)
    ) / F.sqrt(
        (n1 * (n - n1) / F.lit(12.0))
        * ((n + F.lit(1)) - tie / (n * (n - F.lit(1.0))))
    )
    return a.select(
        n1.cast("bigint").alias("n1"),
        (n - n1).cast("bigint").alias("n2"),
        F.round(u1, 2).alias("u1"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q237 — lag-k autocorrelation of daily revenue (ACF, lags 1..7)
# ---------------------------------------------------------------------------

@register(
    "q237_revenue_acf",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   AS x
        FROM orders GROUP BY 1
    ),
    m AS (SELECT AVG(x) AS mu, SUM((x - (SELECT AVG(x) FROM d))
                                   * (x - (SELECT AVG(x) FROM d))) AS den
          FROM d),
    lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
    p AS (
        SELECT l.lag, (a.x - m.mu) * (b.x - m.mu) AS prod
        FROM lags l
        JOIN d a ON TRUE
        JOIN d b ON b.day = a.day + CAST(l.lag AS INT)
        CROSS JOIN m
    )
    SELECT p.lag AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(prod) / ANY_VALUE(m.den), 6) AS acf
    FROM p CROSS JOIN m
    GROUP BY 1
    """,
    doc="Sample autocorrelation of the daily-revenue series at lags "
        "1..7 — the memory/seasonality diagnostic beside q226's "
        "day-of-week profile, q216's EWMA and q214's CUSUM: acf(7) "
        "spiking confirms weekly structure, acf(1) measures "
        "persistence. Daily revenue is an exact integer-cents sum "
        "(per-row ROUND to cents before the bigint sum — no float-order "
        "artifact), lag pairs align on CALENDAR days (date_add join; "
        "gap days simply form no pair), and the classic ACF estimator "
        "divides by the full-series centered sum of squares. Shuffle "
        "shape: one groupBy to the bounded |days| grain, a |days|-sized "
        "self-join per lag, 1-row mean/denominator reduces broadcast "
        "back — nothing scales with raw order rows except the first "
        "groupBy.",
)
def q237_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    d = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("double")
        .alias("x")
    )
    mu = d.agg(F.avg("x").alias("mu"))
    m = (
        d.crossJoin(F.broadcast(mu))
        .agg(
            F.sum(
                (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
            ).alias("den"),
            F.any_value("mu").alias("mu"),
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = d.select(F.col("day").alias("a_day"), F.col("x").alias("a_x"))
    b = d.select(F.col("day").alias("b_day"), F.col("x").alias("b_x"))
    p = (
        F.broadcast(lags)
        .join(a)
        .join(
            b,
            F.col("b_day") == F.expr("date_add(a_day, lag)"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            "lag",
            ((F.col("a_x") - F.col("mu")) * (F.col("b_x") - F.col("mu"))).alias(
                "prod"
            ),
            "den",
        )
    )
    return p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.sum("prod") / F.any_value("den"), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q243 — Wald SPRT sequential test over daily conversion batches
# ---------------------------------------------------------------------------

@register(
    "q243_sprt_sequential",
    oracle="""
    WITH d AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM orders GROUP BY 1
    ),
    c AS (
        SELECT day, n, k,
               SUM(k * LN(0.52 / 0.48)
                   + (n - k) * LN((1.0 - 0.52) / (1.0 - 0.48)))
                   OVER (ORDER BY day) AS cum
        FROM d
    )
    SELECT CAST(day AS VARCHAR) AS day, n, k,
           ROUND(cum, 6) AS cum_llr,
           CASE WHEN cum >= LN(19.0) THEN 'accept_h1'
                WHEN cum <= -LN(19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM c
    """,
    doc="Wald's sequential probability ratio test on the daily "
        "fulfilled-order rate (H0 p=0.48 vs H1 p=0.52, alpha=beta=0.05 "
        "-> symmetric ln(19) thresholds): each day adds its batch "
        "log-likelihood k*ln(p1/p0) + (n-k)*ln(q1/q0) to a cumulative "
        "walk, and the decision column shows WHEN the experiment could "
        "have stopped — the always-valid sequential layer beside q238's "
        "fixed-n Wilson interval and q205's CUPED lift (SPRT is the "
        "optimal-stopping test; peeking at a fixed-n test inflates "
        "alpha, which is exactly what SPRT exists to fix). Daily k/n "
        "are exact ints from one map-side groupBy; the LLR literals "
        "mirror the identical IEEE expression; the cumulative sum is a "
        "window over the bounded |days| grain (sanctioned), never over "
        "raw orders.",
)
def q243_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = _t(spark, sf_dir, "orders")
    d = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        ).alias("k"),
    )
    lr1 = F.log(F.lit(0.52) / F.lit(0.48))
    lr0 = F.log((F.lit(1.0) - F.lit(0.52)) / (F.lit(1.0) - F.lit(0.48)))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = d.withColumn(
        "cum", F.sum(F.col("k") * lr1 + (F.col("n") - F.col("k")) * lr0).over(w)
    )
    thr = F.log(F.lit(19.0))
    return c.select(
        F.col("day").cast("string").alias("day"),
        "n",
        "k",
        F.round("cum", 6).alias("cum_llr"),
        F.when(F.col("cum") >= thr, "accept_h1")
        .when(F.col("cum") <= -thr, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )
