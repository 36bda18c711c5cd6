"""applyInPandasWithState: running per-user totals across micro-batches
must converge to the batch groupBy result."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from _spark_multi_format_data_lake_pipeline_spark.sources.lake import load_table
from _spark_multi_format_data_lake_pipeline_spark.streaming.events import read_event_stream
from _spark_multi_format_data_lake_pipeline_spark.streaming.stateful import running_user_totals


def test_running_totals_converge_to_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events"
    # several files so the stream sees multiple micro-batches
    events.repartition(4).write.mode("overwrite").parquet(str(src))

    stream = read_event_stream(spark, str(src))
    name = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # running totals are monotonic in n_events — the max row per user is
    # the final state regardless of memory-sink row order
    out = spark.table(name).toPandas()
    final = out.sort_values("n_events").groupby("user_id").last()

    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {
        int(uid): (int(row["n_events"]), round(float(row["total_value"]), 2))
        for uid, row in final.iterrows()
    }
    assert got == want


def test_tws_plan_constructs_without_protobuf(spark, sf_dir, tmp_path):
    """transformWithStateInPandas: building the plan must work even where
    the protobuf-backed state protocol can't run (schema is the contract)."""
    from _spark_multi_format_data_lake_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events"
    events.limit(100).write.mode("overwrite").parquet(str(src))
    stream = read_event_stream(spark, str(src))
    out = running_user_totals_tws(stream, ttl_ms=60_000)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]


def test_tws_converges_to_batch(spark, sf_dir, tmp_path):
    """Execution twin of test_running_totals_converge_to_batch on the
    Spark 4 API; runs only where protobuf exists (see tws_available)."""
    import pytest

    from _spark_multi_format_data_lake_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf missing: transformWithState runner cannot start")

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events"
    events.repartition(4).write.mode("overwrite").parquet(str(src))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, str(src))
        name = f"tws_{uuid.uuid4().hex[:8]}"
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name).toPandas()
        final = out.sort_values("n_events").groupby("user_id").last()
        want = {
            r.user_id: (r.n, round(r.s, 2))
            for r in events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        got = {
            int(uid): (int(row["n_events"]), round(float(row["total_value"]), 2))
            for uid, row in final.iterrows()
        }
        assert got == want
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
