"""Change-data-capture batch application (lakehouse write surface beyond
the reference's W2 MERGE upsert — reference utils/merge_utils.py:70-82
handles update/insert only; CDC adds deletes and in-batch ordering).

``apply_cdc_batch`` is a pure DataFrame transformation: given the current
table state and a batch of change rows (op column: I/U/D, optional
monotonic sequence column), produce the next state. Pure means it
composes everywhere — unit-testable without a catalog, usable inside
``foreachBatch`` for streaming CDC (pair with ``sinks/sinks.py``'s
stage+rename discipline for the actual write), and replayable: applying
the same batch twice yields the same state (upsert/delete are
idempotent), which is what exactly-once sinks lean on after a retry.

Scale shape: one shuffle of the target on the key (anti join), one tiny
window over the changes (batch-sized, not table-sized). With the target
bucketed on the key (sinks/writer.py bucketBy) the anti join is
shuffle-free on the table side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc_batch(
    target: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
    matched_condition: str | None = None,
    not_matched_condition: str | None = None,
    matched_delete_condition: str | None = None,
    not_matched_by_source_delete: bool | str = False,
    not_matched_by_source_update: dict[str, str] | None = None,
    not_matched_by_source_update_condition: str | None = None,
    allow_schema_evolution: bool = False,
    action_col: str | None = None,
    with_feed: bool = False,
    join_hook=None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Next table state = target ⊳ changes (anti on keys) ∪ latest upserts.

    ``changes`` columns: the target's columns plus ``op_col`` with values
    I (insert), U (update), D (delete); inserts and updates carry the
    full new row. When one key appears several times in a batch,
    ``seq_col`` (a monotonic change sequence) picks the LAST change per
    key — without it the winner is arbitrary, so it is required for
    correctness whenever upstream can emit multiple changes per key per
    batch.

    The three optional conditions are the per-clause predicates of full
    Iceberg/Delta MERGE (``WHEN MATCHED AND <cond> THEN UPDATE`` /
    ``WHEN MATCHED AND <cond> THEN DELETE`` / ``WHEN NOT MATCHED AND
    <cond> THEN INSERT``) — the reference's unconditional ``UPDATE SET *
    / INSERT *`` form (reference utils/merge_utils.py:74-80) is the
    all-``None`` special case.  Each is a SQL boolean expression over
    the key columns (unprefixed) plus ``t_<col>`` (the CURRENT target
    row) and ``s_<col>`` (the INCOMING change row) for every non-key
    column — the ``target.<col>`` / ``source.<col>`` qualifiers of SQL
    MERGE, spelled as prefixes so one flat row evaluates them:

    - ``matched_condition``: a matched U/I change updates the row only
      when TRUE; otherwise the target row stays unchanged.
    - ``matched_delete_condition``: a matched D change deletes only
      when TRUE ("delete only stale matches"); otherwise the row stays.
    - ``not_matched_condition``: an unmatched U/I change inserts only
      when TRUE; otherwise it is discarded.

    NULL conditions (unknown) take no action, SQL's WHEN-clause
    behavior.  With any condition set the plan is ONE full-outer join
    on the keys — the same single shuffle the unconditional anti-join
    path costs; per-row clause evaluation is pure JVM column math.

    ``WHEN NOT MATCHED BY SOURCE`` (the Delta three-way-merge clause
    family the two-way grammar above can't express — "sync: delete or
    flag target rows absent from the source") acts on TARGET rows no
    change row keys to.  There is no source row, so these conditions /
    assignments see only the unprefixed keys and ``t_<col>``:

    - ``not_matched_by_source_delete``: ``True`` deletes every
      unmatched target row (the full-sync form), a SQL string deletes
      those where it's TRUE (``WHEN NOT MATCHED BY SOURCE AND <cond>
      THEN DELETE``), ``False`` (default) leaves the clause absent —
      the two-way behavior, unmatched rows carry unchanged.
    - ``not_matched_by_source_update``: ``{col: sql_expr}`` assignments
      applied to unmatched target rows (``… THEN UPDATE SET``), gated
      by ``not_matched_by_source_update_condition`` when given.
      Assigning a key column refuses (rekeying rows the source never
      saw is a different operation).  Assignments cast to the target
      column's type, like ``UPDATE``.

    When both by-source clauses are present the DELETE clause is
    evaluated first (a row it deletes is never updated) — the
    clause-order rule of SQL MERGE with the delete written first.

    ``allow_schema_evolution=True`` is Delta's ``MERGE WITH SCHEMA
    EVOLUTION``: change columns missing from the target are ADDED to
    the result (existing target rows read NULL for them), and target
    columns missing from the change batch surface as NULL on inserted
    rows (updates keep the current value — Delta's rule: an unmentioned
    column is not an assignment to NULL).  Without the flag, a change
    batch whose non-key columns don't cover the target's refuses, and
    extra change columns refuse — schema drift must be explicit.

    ``action_col``: when set, the result carries one extra string
    column of that name classifying every SURVIVING row — ``carry``
    (target row untouched by any fired clause), ``update`` (a matched
    update or by-source update fired; the row holds the POST values),
    ``insert`` (an unmatched change row inserted).  Deleted rows are
    absent, as always.  This is the hook row tracking hangs off: carry
    keeps id+commit-version, update keeps id only, insert draws fresh.

    ``join_hook``: optional callable applied to the single full-outer
    merge join right after it is built (slow path only; the anti-join
    fast path has one consumer and never calls it).  Callers that
    consume BOTH returned frames (state + feed) pass a persist here so
    the join — the expensive shuffle of the merge — executes once
    instead of once per consuming action; the caller owns unpersist.

    ``with_feed=True`` returns ``(state, feed)`` where ``feed`` holds
    the Delta-CDF rows of this very merge — the target's columns plus
    ``_change_type`` ∈ insert / update_preimage / update_postimage /
    delete.  Clause-fired is what's emitted (a fired update whose
    values happen to be unchanged still emits pre+post — Delta rewrites
    and feeds that row too), so feed semantics match
    ``versioned_upsert``'s.  Both extras force the single full-outer
    join plan (the anti-join fast path cannot tell insert from update);
    the feed's frames are extra selects over the SAME join.
    """
    keys = list(key_cols)
    # A MERGE source must carry every merge-on column, schema evolution
    # or not (Delta refuses too): NULL-filling an absent KEY would make
    # the full-outer join match nothing, so every change row would
    # insert with a NULL key — and combined with a by-source delete
    # clause the entire target would be silently wiped.  Only non-key
    # columns are eligible for the evolution NULL-fill below.
    if absent_keys := [k for k in keys if k not in changes.columns]:
        raise ValueError(
            "apply_cdc_batch: change batch is missing merge key "
            f"column(s) {absent_keys}; a MERGE source must carry every "
            "key column — schema evolution only NULL-fills non-key "
            "columns"
        )
    meta_cols = {op_col} | ({seq_col} if seq_col else set())
    extra = [
        f
        for f in changes.schema.fields
        if f.name not in meta_cols and f.name not in target.columns
    ]
    missing = [
        f
        for f in target.schema.fields
        if f.name not in changes.columns
    ]
    if (extra or missing) and not allow_schema_evolution:
        raise ValueError(
            "apply_cdc_batch: change batch schema drifts from the "
            f"target (extra={[f.name for f in extra]}, "
            f"missing={[f.name for f in missing]}); pass "
            "allow_schema_evolution=True to add new columns / "
            "NULL-fill absent ones (Delta's MERGE WITH SCHEMA "
            "EVOLUTION), or align the schemas explicitly"
        )
    if extra:
        for f in extra:
            target = target.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
    missing_names = {f.name for f in missing}
    if missing:
        # inserted rows read NULL for the absent columns; matched
        # updates must KEEP the current value, not null it (Delta's
        # rule: an unmentioned column is not an assignment to NULL) —
        # forces the conditional path, whose per-column exprs below
        # emit t_<col> verbatim for these columns
        for f in missing:
            changes = changes.withColumn(
                f.name, F.lit(None).cast(f.dataType)
            )
    bs_update = dict(not_matched_by_source_update or {})
    if bad := sorted(set(bs_update) & set(keys)):
        raise ValueError(
            "apply_cdc_batch: not_matched_by_source_update cannot "
            f"assign key column(s) {bad}"
        )
    if bad := sorted(set(bs_update) - set(target.columns)):
        raise ValueError(
            "apply_cdc_batch: not_matched_by_source_update assigns "
            f"unknown column(s) {bad}"
        )
    has_by_source = bool(not_matched_by_source_delete) or bool(bs_update)
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        latest = (
            changes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk", seq_col)
        )
    else:
        latest = changes
    if (
        matched_condition is None
        and not_matched_condition is None
        and matched_delete_condition is None
        and not has_by_source
        and not missing_names
        and action_col is None
        and not with_feed
    ):
        survivors = target.join(latest.select(*keys), keys, "left_anti")
        upserts = latest.filter(F.col(op_col) != "D").drop(op_col)
        return survivors.unionByName(upserts)

    payload = [c for c in target.columns if c not in keys]
    t = target.select(
        *keys,
        *[F.col(c).alias(f"t_{c}") for c in payload],
        F.lit(True).alias("_t_present"),
    )
    s = latest.select(
        *keys,
        *[F.col(c).alias(f"s_{c}") for c in payload],
        F.col(op_col).alias("_s_op"),
    )
    j = t.join(s, keys, "full_outer")
    if join_hook is not None:
        j = join_hook(j)

    def _cond(expr: str | None):
        # SQL WHEN-clause semantics: only a provably-TRUE condition
        # fires the clause; NULL (unknown) does not
        return (
            F.lit(True)
            if expr is None
            else F.coalesce(F.expr(expr), F.lit(False))
        )

    matched = F.col("_t_present").isNotNull() & F.col("_s_op").isNotNull()
    deletes = matched & (F.col("_s_op") == "D") & _cond(
        matched_delete_condition
    )
    # WHEN NOT MATCHED BY SOURCE: target-present, no source row.  The
    # delete clause wins over the update clause on the same row.  The
    # conditions and assignments see the unprefixed keys plus t_<col>
    # (there IS no s_ row) — the same prefix convention as the other
    # clause conditions.
    by_source = F.col("_t_present").isNotNull() & F.col("_s_op").isNull()
    if not_matched_by_source_delete:
        bs_del = by_source & _cond(
            None
            if not_matched_by_source_delete is True
            else not_matched_by_source_delete
        )
    else:
        bs_del = F.lit(False)
    if bs_update:
        bs_upd = (
            by_source
            & ~bs_del
            & _cond(not_matched_by_source_update_condition)
        )
    else:
        bs_upd = F.lit(False)
    upd_src = matched & (F.col("_s_op") != "D") & _cond(matched_condition)
    ins_new = (
        F.col("_t_present").isNull()
        & (F.col("_s_op") != "D")
        & _cond(not_matched_condition)
    )
    take_source = upd_src | ins_new
    emit = take_source | (
        F.col("_t_present").isNotNull() & ~deletes & ~bs_del
    )
    out_cols = []
    for c in target.columns:
        if c in keys:
            out_cols.append(F.col(c))
            continue
        if c in missing_names:
            # column absent from the source: matched updates keep the
            # current value, inserts read NULL — both are t_<col>
            # (NULL when no target row exists)
            out_cols.append(F.col(f"t_{c}").alias(c))
            continue
        cur = F.when(take_source, F.col(f"s_{c}")).otherwise(
            F.col(f"t_{c}")
        )
        if c in bs_update:
            assigned = F.expr(bs_update[c]).cast(
                target.schema[c].dataType
            )
            cur = F.when(bs_upd, assigned).otherwise(cur)
        out_cols.append(cur.alias(c))
    updated = upd_src | bs_upd
    state_cols = list(out_cols)
    if action_col is not None:
        state_cols.append(
            F.when(updated, F.lit("update"))
            .when(ins_new, F.lit("insert"))
            .otherwise(F.lit("carry"))
            .alias(action_col)
        )
    state = j.filter(emit).select(*state_cols)
    if not with_feed:
        return state
    # Delta-CDF rows of this merge, selected off the same join: PRE
    # images are the t_ side verbatim, POST images are exactly the
    # state expressions, deletes carry the removed values (audit shape,
    # like table_diff's D rows).
    pre_cols = [
        F.col(c) if c in keys else F.col(f"t_{c}").alias(c)
        for c in target.columns
    ]
    _ct = "_change_type"
    feed = (
        j.filter(updated)
        .select(*pre_cols, F.lit("update_preimage").alias(_ct))
        .unionByName(
            j.filter(updated).select(
                *out_cols, F.lit("update_postimage").alias(_ct)
            )
        )
        .unionByName(
            j.filter(deletes | bs_del).select(
                *pre_cols, F.lit("delete").alias(_ct)
            )
        )
        .unionByName(
            j.filter(ins_new).select(*out_cols, F.lit("insert").alias(_ct))
        )
    )
    return state, feed


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """The INVERSE of :func:`apply_cdc_batch`: compare two versions of a
    table and emit the minimal I/U/D change set that transforms ``old``
    into ``new`` — snapshot-based CDC for sources without a change log,
    replication verification, and backfill validation.

    - I: key in new only (row payload = new row)
    - U: key in both, any non-key column differs (payload = new row)
    - D: key in old only (payload = old row — consumers often need the
      deleted values for audit)
    Unchanged rows emit nothing, so ``diff`` of identical tables is
    empty. Null-safe comparison: a column changing NULL→value or
    value→NULL counts as a change; NULL==NULL does not (eqNullSafe).

    Round-trip law, property-tested:
        apply_cdc_batch(old, table_diff(old, new, keys), keys) == new

    Scale shape: ONE full-outer join on the key — both sides shuffle
    once (bucketed tables join shuffle-free); change classification is
    pure column math on the joined row. Schemas must match (raises
    otherwise — a schema change is migration, not CDC).
    """
    keys = list(key_cols)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"table_diff: schemas differ (old={sorted(old.columns)}, "
            f"new={sorted(new.columns)}); migrate schemas before diffing"
        )
    payload = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in payload],
        *keys,
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in payload],
        *keys,
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")

    changed = F.lit(False)
    for c in payload:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))

    op = (
        F.when(F.col("_in_old").isNull(), F.lit("I"))
        .when(F.col("_in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_payload = [
        F.when(op == "D", F.col(f"_o_{c}")).otherwise(F.col(f"_n_{c}")).alias(c)
        for c in payload
    ]
    return (
        j.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*keys, *out_payload, op_col)
    )
