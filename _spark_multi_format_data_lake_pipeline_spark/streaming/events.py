"""Structured Streaming over the events table (SURVEY.md §2 Part B
"Streaming" row; absent from the reference, which is batch-only —
SURVEY.md §1.1).

Design:
- Every transformation takes/returns DataFrames, so the same function works
  on a batch frame (for the DuckDB-oracle twins in queries/events.py) and a
  ``readStream`` frame. Stream==batch equivalence is asserted in tests.
- Watermarks bound state: at 100 TB/day of events, the tumbling/session
  aggregations hold only (watermark + window) worth of state per key, and
  late rows beyond the watermark are dropped deterministically.
- ``run_available_now`` uses Trigger.AvailableNow for deterministic
  one-shot draining in tests (SURVEY.md §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Parquet-stream schema for event files written with microsecond timestamps.
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, schema: str = EVENTS_SCHEMA
) -> DataFrame:
    """File-source stream: picks up parquet files as they land in ``path``.
    maxFilesPerTrigger keeps micro-batches bounded on backfill."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` inactivity.
    The batch twin is queries/events.py::q43 (gaps-and-islands)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id; watermark bounds the dedup state
    (an id older than the watermark can re-enter — the standard trade)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful dedup tolerant of LATE duplicates: unlike ``dedup_events``
    (plain dropDuplicates keyed forever-or-until-watermark on event time),
    ``dropDuplicatesWithinWatermark`` keeps each id's state for the
    watermark delay measured from when the FIRST copy arrived — so a
    duplicate whose own timestamp is older than the watermark is still
    caught as long as it lands within the delay. The right choice when
    upstream retries re-emit events with their original (old) timestamps.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_join(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static join: the static side is broadcast per micro-batch."""
    return events.join(F.broadcast(dim), on=on, how="left")


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    within: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right events
    for the same key that occur in ``[left.ts, left.ts + within]``.

    Both sides carry watermarks so Spark can bound the join state buffer:
    a left row is dropped from state once the right watermark passes
    ``left.ts + within`` (and vice versa) — without the time-range
    condition the state would grow forever. The batch twin is
    queries/events.py::q90 (click→purchase attribution).

    ``how="leftOuter"`` additionally emits each unmatched left row once —
    with null right columns — when the watermark passes its state-eviction
    bound (the dead-letter side of attribution: clicks that never
    converted). Spark requires exactly this watermark + time-range
    combination for outer stream-stream joins; emission lags one
    micro-batch behind the watermark commit, which the streaming test
    drives with maxFilesPerTrigger=1. Batch twin: queries/events.py::q151.

    Precondition: ``spark.sql.session.timeZone`` must be UTC (asserted
    below; ``session.get_spark`` sets it). The NTZ→TIMESTAMP cast in
    ``lag_us`` reinterprets wall-clock values in the session zone — in a
    DST-shifting zone, a transition between ``l.ts`` and ``r.ts`` would
    skew the lag by the offset change.
    """
    tz = left.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        raise ValueError(
            f"stream_stream_join requires a UTC session (timeZone={tz!r}): "
            "the NTZ cast in lag_us is DST-sensitive in non-UTC zones"
        )
    l = left.alias("l").withWatermark("ts", left_watermark)
    r = right.alias("r").withWatermark("ts", right_watermark)
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).select(
        F.col(f"l.{on}").alias(on),
        F.col("l.event_id").alias("left_id"),
        F.col("r.event_id").alias("right_id"),
        # cast: NTZ parquet timestamps are rejected by unix_micros directly
        (
            F.unix_micros(F.col("r.ts").cast("timestamp"))
            - F.unix_micros(F.col("l.ts").cast("timestamp"))
        ).alias("lag_us"),
    )


def run_available_now(
    sdf: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available into an in-memory table named
    ``query_name``, then stop. Deterministic one-shot for tests."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
