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


def test_table_diff_classifies_and_round_trips(spark):
    """table_diff emits minimal I/U/D and apply(old, diff) == new."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id int, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),      # unchanged -> no row
         (2, "b2", 20.0),     # U (name)
         (3, "c", 30.0),      # U (NULL -> value)
         (5, "e", 50.0)],     # I; id 4 deleted
        "id int, name string, v double",
    )
    diff = table_diff(old, new, ["id"])
    got = {r["id"]: r["op"] for r in diff.collect()}
    assert got == {2: "U", 3: "U", 4: "D", 5: "I"}
    # D rows carry the old payload for audit
    d4 = diff.filter("id = 4").head()
    assert (d4["name"], d4["v"]) == ("d", 40.0)

    applied = apply_cdc_batch(old, diff, ["id"])
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))

    # diff of identical tables is empty; schema mismatch raises
    assert table_diff(new, new, ["id"]).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="schemas differ"):
        table_diff(old.drop("v"), new, ["id"])


def test_table_diff_round_trip_property(spark):
    """Randomized round-trip: apply(old, diff(old, new)) == new for
    arbitrary disjoint/overlapping key sets and payload churn."""
    import random

    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch, table_diff

    rng = random.Random(17)
    for trial in range(3):
        old_rows = [(i, rng.choice("xyz"), float(rng.randint(0, 5))) for i in rng.sample(range(30), 12)]
        new_rows = [(i, rng.choice("xyz"), float(rng.randint(0, 5))) for i in rng.sample(range(30), 12)]
        old = spark.createDataFrame(old_rows, "id int, s string, v double")
        new = spark.createDataFrame(new_rows, "id int, s string, v double")
        applied = apply_cdc_batch(old, table_diff(old, new, ["id"]), ["id"])
        assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new_rows)), trial


def test_cdc_conditional_merge_clause_matrix(spark):
    """Full Iceberg/Delta conditional MERGE: per-clause predicates over
    t_<col> (current row) / s_<col> (incoming row).  Matrix: matched
    update fires / blocked, matched delete fires / blocked, unmatched
    insert fires / blocked, unmatched delete is a no-op, NULL condition
    takes no action."""
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", None)],
        "k int, v string, n int",
    )
    changes = spark.createDataFrame(
        [
            (1, "A", 100, "U"),   # matched U, s_n>t_n     -> update
            (2, "B", 5, "U"),     # matched U, s_n<t_n     -> blocked
            (3, None, None, "D"), # matched D, t_n>=30     -> delete
            (4, "D2", 99, "U"),   # matched U, t_n NULL    -> cond NULL, no action
            (5, "e", 50, "I"),    # unmatched I, s_n>=50   -> insert
            (6, "f", 7, "I"),     # unmatched I, s_n<50    -> blocked
            (7, None, None, "D"), # unmatched D            -> no-op
        ],
        "k int, v string, n int, op string",
    )
    out = apply_cdc_batch(
        target,
        changes,
        ["k"],
        matched_condition="s_n > t_n",
        not_matched_condition="s_n >= 50",
        matched_delete_condition="t_n >= 30",
    )
    got = {r.k: (r.v, r.n) for r in out.collect()}
    assert got == {
        1: ("A", 100),
        2: ("b", 20),
        4: ("d", None),
        5: ("e", 50),
    }
    # all-None conditions == the unconditional fast path
    uncond = apply_cdc_batch(target, changes, ["k"])
    cond_equiv = apply_cdc_batch(
        target, changes, ["k"],
        matched_condition=None,
        not_matched_condition=None,
        matched_delete_condition=None,
    )
    assert {tuple(r) for r in uncond.collect()} == {
        tuple(r) for r in cond_equiv.collect()
    }


def test_cdc_conditional_merge_with_seq_dedup(spark):
    """Conditions compose with seq_col: the LAST change per key is
    picked first, then its clause predicate decides."""
    target = spark.createDataFrame([(1, "a", 10)], "k int, v string, n int")
    changes = spark.createDataFrame(
        [
            (1, "x", 999, "U", 1),
            (1, "y", 5, "U", 2),  # last change, but s_n<t_n -> blocked
        ],
        "k int, v string, n int, op string, seq int",
    )
    out = apply_cdc_batch(
        target, changes, ["k"], seq_col="seq", matched_condition="s_n > t_n"
    )
    assert [(r.k, r.v, r.n) for r in out.collect()] == [(1, "a", 10)]


def test_cdc_not_matched_by_source_clause_matrix(spark):
    """WHEN NOT MATCHED BY SOURCE (Delta three-way merge): target rows
    no change keys to can be deleted (sync) or updated (flag-stale),
    unconditionally or gated by a t_-prefixed condition; the delete
    clause wins over the update clause on the same row; absent clauses
    reproduce the two-way behavior exactly."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, v string, n int",
    )
    changes = spark.createDataFrame(
        [(2, "B", 200, "U"), (5, "e", 50, "I"), (3, None, None, "D")],
        "k int, v string, n int, op string",
    )
    # full sync: unmatched 1 and 4 deleted, matched D deletes 3
    out = apply_cdc_batch(
        target, changes, ["k"], not_matched_by_source_delete=True
    )
    assert sorted(map(tuple, out.collect())) == [
        (2, "B", 200), (5, "e", 50)
    ]
    # conditional by-source delete: only rows with t_n >= 40
    out = apply_cdc_batch(
        target, changes, ["k"], not_matched_by_source_delete="t_n >= 40"
    )
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 10), (2, "B", 200), (5, "e", 50)
    ]
    # by-source update: flag unmatched rows, others untouched
    out = apply_cdc_batch(
        target,
        changes,
        ["k"],
        not_matched_by_source_update={"v": "concat(t_v, '_stale')"},
    )
    assert sorted(map(tuple, out.collect())) == [
        (1, "a_stale", 10), (2, "B", 200), (4, "d_stale", 40), (5, "e", 50)
    ]
    # both clauses: delete t_n>=40 first, update the remaining
    # unmatched rows where the update condition holds
    out = apply_cdc_batch(
        target,
        changes,
        ["k"],
        not_matched_by_source_delete="t_n >= 40",
        not_matched_by_source_update={"n": "t_n + 1"},
        not_matched_by_source_update_condition="t_n < 15",
    )
    assert sorted(map(tuple, out.collect())) == [
        (1, "a", 11), (2, "B", 200), (5, "e", 50)
    ]
    # NULL condition (unknown) takes no action, SQL WHEN semantics
    t2 = spark.createDataFrame([(1, "a", None)], "k int, v string, n int")
    c2 = spark.createDataFrame([(9, "z", 1, "I")], "k int, v string, n int, op string")
    out = apply_cdc_batch(
        t2, c2, ["k"], not_matched_by_source_delete="t_n >= 0"
    )
    assert sorted(map(tuple, out.collect())) == [(1, "a", None), (9, "z", 1)]
    # key-column assignment refuses; unknown column refuses
    import pytest

    with pytest.raises(ValueError, match="key column"):
        apply_cdc_batch(
            target, changes, ["k"],
            not_matched_by_source_update={"k": "t_n"},
        )
    with pytest.raises(ValueError, match="unknown column"):
        apply_cdc_batch(
            target, changes, ["k"],
            not_matched_by_source_update={"nope": "t_n"},
        )
    # composes with the two-way clause conditions in one pass
    out = apply_cdc_batch(
        target,
        changes,
        ["k"],
        matched_condition="s_n > t_n",
        not_matched_condition="s_n >= 50",
        not_matched_by_source_delete=True,
    )
    assert sorted(map(tuple, out.collect())) == [
        (2, "B", 200), (5, "e", 50)
    ]


def test_versioned_apply_changes_by_source_sync(spark, tmp_path):
    """The by-source clauses reach versioned tables through
    versioned_apply_changes as ONE commit, and file confinement is
    disabled for it: unmatched rows in files the change batch's key
    range provably misses are still deleted/updated."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.versioned import (
        read_version,
        versioned_apply_changes,
        versioned_write,
    )

    t = str(tmp_path / "tbl")
    # two range-disjoint files: keys 1-3 and 100-102
    versioned_write(
        spark.createDataFrame(
            [(i, f"v{i}") for i in (1, 2, 3)], "k int, v string"
        ),
        t,
    )
    versioned_write(
        spark.createDataFrame(
            [(i, f"v{i}") for i in (100, 101, 102)], "k int, v string"
        ),
        t,
    )
    # change batch touches only the low range; by-source delete must
    # still remove unmatched HIGH-range rows (the confinement trap)
    changes = spark.createDataFrame(
        [(1, "V1", "U"), (2, "v2", "U")], "k int, v string, op string"
    )
    versioned_apply_changes(
        changes, t, ["k"], not_matched_by_source_delete=True
    )
    got = sorted(map(tuple, read_version(spark, t).collect()))
    assert got == [(1, "V1"), (2, "v2")]
    # by-source update across disjoint files
    t2 = str(tmp_path / "tbl2")
    versioned_write(
        spark.createDataFrame(
            [(1, "a"), (200, "b")], "k int, v string"
        ),
        t2,
    )
    versioned_apply_changes(
        spark.createDataFrame([(1, "A", "U")], "k int, v string, op string"),
        t2,
        ["k"],
        not_matched_by_source_update={"v": "concat(t_v, '!')"},
    )
    got = sorted(map(tuple, read_version(spark, t2).collect()))
    assert got == [(1, "A"), (200, "b!")]


def test_cdc_merge_schema_evolution(spark):
    """MERGE WITH SCHEMA EVOLUTION: extra change columns ADD to the
    result (existing rows read NULL), target columns absent from the
    batch stay untouched on updates and NULL on inserts; without the
    flag schema drift refuses in both directions."""
    import pytest

    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch

    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, v string, n int"
    )
    chg = spark.createDataFrame(
        [(2, "B", "hot", "U"), (3, "c", "new", "I")],
        "k int, v string, note string, op string",
    )
    with pytest.raises(ValueError, match="schema drift|drifts"):
        apply_cdc_batch(tgt, chg, ["k"])
    out = apply_cdc_batch(tgt, chg, ["k"], allow_schema_evolution=True)
    got = sorted(map(tuple, out.select("k", "v", "n", "note").collect()))
    assert got == [
        (1, "a", 10, None),     # untouched; new column NULL
        (2, "B", 20, "hot"),    # update keeps the unmentioned n
        (3, "c", None, "new"),  # insert reads NULL for absent n
    ]
    # composes with clause conditions and by-source clauses
    out = apply_cdc_batch(
        tgt,
        chg,
        ["k"],
        allow_schema_evolution=True,
        matched_condition="s_v > t_v",
        not_matched_by_source_delete="t_n >= 20",
    )
    got = sorted(map(tuple, out.select("k", "v", "n", "note").collect()))
    # k=1 unmatched-by-source, n=10 < 20 -> kept; k=2 matched, 'B' > 'b'
    # is FALSE (lowercase sorts after uppercase) -> blocked, stays 'b'
    assert got == [(1, "a", 10, None), (2, "b", 20, None), (3, "c", None, "new")]
    # seq dedup composes: last change per key wins, then evolution
    chg2 = spark.createDataFrame(
        [(2, "x", "first", "U", 1), (2, "y", "last", "U", 2)],
        "k int, v string, note string, op string, seq int",
    )
    out = apply_cdc_batch(
        tgt, chg2, ["k"], seq_col="seq", allow_schema_evolution=True
    )
    got = {r["k"]: (r["v"], r["n"], r["note"]) for r in out.collect()}
    assert got == {1: ("a", 10, None), 2: ("y", 20, "last")}


def test_versioned_apply_changes_schema_evolution(spark, tmp_path):
    """Evolution reaches versioned tables as one commit: the committed
    schema gains the new column, carried (untouched) files read NULL
    for it, rewritten candidates carry real values."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.versioned import (
        read_version,
        versioned_apply_changes,
        versioned_write,
    )

    t = str(tmp_path / "tbl")
    versioned_write(
        spark.createDataFrame(
            [(i, f"v{i}") for i in (1, 2, 100, 101)], "k int, v string"
        ).repartitionByRange(2, "k"),
        t,
    )
    versioned_apply_changes(
        spark.createDataFrame(
            [(1, "V1", "hot", "U")], "k int, v string, note string, op string"
        ),
        t,
        ["k"],
        allow_schema_evolution=True,
    )
    got = {r["k"]: (r["v"], r["note"]) for r in read_version(spark, t).collect()}
    assert got == {
        1: ("V1", "hot"),
        2: ("v2", None),
        100: ("v100", None),  # carried file: NULL via committed schema
        101: ("v101", None),
    }


def test_cdc_full_sync_law(spark):
    """Algebraic law of the three-way sync: with only U/I changes and
    an unconditional by-source delete, the result equals the change
    batch's latest-per-key rows — the target is fully replaced by the
    source, regardless of what the target held."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch

    target = spark.createDataFrame(
        [(i, f"old{i}", i * 10) for i in range(20)], "k int, v string, n int"
    )
    changes = spark.createDataFrame(
        [(k, f"new{k}", k, "U" if k % 2 else "I", s)
         for k in range(5, 15) for s in (1, 2)],
        "k int, v string, n int, op string, seq int",
    )
    out = apply_cdc_batch(
        target, changes, ["k"], seq_col="seq",
        not_matched_by_source_delete=True,
    )
    expect = sorted((k, f"new{k}", k) for k in range(5, 15))
    assert sorted(map(tuple, out.collect())) == expect


def test_cdc_missing_key_column_refuses_even_with_evolution(spark):
    """A change batch lacking a MERGE KEY column must refuse, schema
    evolution or not: NULL-filling the key makes the full-outer join
    match nothing, so every change inserts under a NULL key — and with
    not_matched_by_source_delete=True the whole target would be wiped.
    Delta refuses a MERGE source missing the merge-on columns too."""
    import pytest

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    changes = spark.createDataFrame([("X", "I")], "v string, op string")
    for kw in (
        {},
        {"allow_schema_evolution": True},
        {
            "allow_schema_evolution": True,
            "not_matched_by_source_delete": True,
        },
    ):
        with pytest.raises(ValueError, match="key"):
            apply_cdc_batch(target, changes, ["k"], **kw)
    # non-key columns stay eligible for the evolution NULL-fill
    part = spark.createDataFrame([(3, "I")], "k int, op string")
    out = apply_cdc_batch(
        target, part, ["k"], allow_schema_evolution=True
    )
    assert sorted(map(tuple, out.collect())) == [
        (1, "a"), (2, "b"), (3, None)
    ]


def test_apply_cdc_batch_feed_and_actions_with_by_source(spark):
    """with_feed/action_col through the by-source clause family: fired
    by-source deletes feed 'delete', fired by-source updates feed
    pre+post and classify as 'update', untouched rows classify as
    'carry', and an update clause that fires with UNCHANGED values
    still feeds pre+post (Delta rewrites and feeds it too)."""
    from _spark_multi_format_data_lake_pipeline_spark.sinks.cdc import apply_cdc_batch

    target = spark.createDataFrame(
        [(i, 10.0 * i) for i in range(6)], "id int, val double"
    )
    # U id=1 (changed), U id=2 (same value: no-op update still feeds)
    changes = spark.createDataFrame(
        [(1, 99.0, "U"), (2, 20.0, "U")], "id int, val double, op string"
    )
    state, feed = apply_cdc_batch(
        target,
        changes,
        ["id"],
        not_matched_by_source_delete="id = 3",
        not_matched_by_source_update={"val": "t_val + 0.5"},
        not_matched_by_source_update_condition="id >= 4",
        action_col="act",
        with_feed=True,
    )
    acts = {r["id"]: (r["val"], r["act"]) for r in state.collect()}
    assert acts == {
        0: (0.0, "carry"),
        1: (99.0, "update"),
        2: (20.0, "update"),
        4: (40.5, "update"),
        5: (50.5, "update"),
    }
    got = sorted(
        (r["id"], r["_change_type"], r["val"]) for r in feed.collect()
    )
    assert got == [
        (1, "update_postimage", 99.0),
        (1, "update_preimage", 10.0),
        (2, "update_postimage", 20.0),  # no-op update: fed anyway
        (2, "update_preimage", 20.0),
        (3, "delete", 30.0),
        (4, "update_postimage", 40.5),
        (4, "update_preimage", 40.0),
        (5, "update_postimage", 50.5),
        (5, "update_preimage", 50.0),
    ]
