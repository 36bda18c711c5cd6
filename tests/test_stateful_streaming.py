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
