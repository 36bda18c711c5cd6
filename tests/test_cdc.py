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
