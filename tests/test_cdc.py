"""apply_cdc_batch: I/U/D semantics, in-batch sequencing, idempotency."""

from __future__ import annotations

from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch


def _state(df):
    return {r.k: (r.v,) for r in df.collect()}


def test_cdc_insert_update_delete(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    changes = spark.createDataFrame(
        [(2, "B", "U"), (3, None, "D"), (4, "d", "I")],
        "k int, v string, op string",
    )
    out = apply_cdc_batch(target, changes, ["k"])
    assert _state(out) == {1: ("a",), 2: ("B",), 4: ("d",)}


def test_cdc_seq_picks_last_change_per_key(spark):
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    changes = spark.createDataFrame(
        [
            (1, "x", "U", 10),
            (1, None, "D", 11),  # later delete wins
            (2, "first", "I", 5),
            (2, "second", "U", 6),  # later update wins
        ],
        "k int, v string, op string, seq int",
    )
    out = apply_cdc_batch(target, changes, ["k"], seq_col="seq")
    assert _state(out) == {2: ("second",)}


def test_cdc_reapply_is_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    changes = spark.createDataFrame(
        [(1, None, "D"), (2, "B2", "U"), (5, "e", "I")],
        "k int, v string, op string",
    )
    once = apply_cdc_batch(target, changes, ["k"])
    twice = apply_cdc_batch(once, changes, ["k"])
    assert _state(once) == _state(twice) == {2: ("B2",), 5: ("e",)}


def test_stream_cdc_sink_converges_to_batch_apply(spark, tmp_path):
    """CDC change files drained as a stream must leave the table in the
    same state as one batch application of all changes."""
    import uuid

    from _spark_multi_format_data_lake_pipeline_spark.streaming.sinks import stream_cdc_sink

    table = f"cdc_tgt_{uuid.uuid4().hex[:8]}"
    src = tmp_path / "changes"
    # batch 0: inserts; batch 1: update + delete + insert (file = batch)
    b0 = spark.createDataFrame(
        [(1, "a", "I", 1), (2, "b", "I", 2), (3, "c", "I", 3)],
        "k int, v string, op string, seq int",
    )
    b1 = spark.createDataFrame(
        [(2, "B", "U", 4), (3, None, "D", 5), (4, "d", "I", 6)],
        "k int, v string, op string, seq int",
    )
    b0.coalesce(1).write.mode("overwrite").parquet(str(src))
    b1.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("k int, v string, op string, seq int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_cdc_sink(
        stream, table, str(tmp_path / "ckpt"), ["k"], seq_col="seq"
    )
    q.awaitTermination()
    try:
        got = {r.k: r.v for r in spark.table(table).collect()}
        assert got == {1: "a", 2: "B", 4: "d"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
