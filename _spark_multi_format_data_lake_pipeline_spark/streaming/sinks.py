"""Streaming sinks (SURVEY.md §2 Part B 'Streaming': foreachBatch).

``stream_upsert_sink`` closes the loop between the streaming surface and
the merge engine: each micro-batch is upserted into a lake table through
the same TableMerger used by the batch pipeline — the streaming-ingestion
pattern the reference's batch-only design points toward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..catalog import CatalogManager
from ..sinks.merge import TableMerger


def _txn_scope(checkpoint_dir: str) -> str:
    """Stable per-query scope for streaming txn ids: a short digest of
    the absolute checkpoint path (the stream's durable identity). Same
    checkpoint -> same scope across restarts; fresh checkpoint -> new
    scope, so its restarted batch numbering can't collide with another
    producer's ledger entries on a shared table."""
    import hashlib
    import os

    return hashlib.sha256(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:12]


def stream_upsert_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    key: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch upsert into ``target_table`` (key from ``key`` or the
    merge engine's auto-detection; first batch creates the table).
    Exactly-once per batch: foreachBatch may replay a batch on failure,
    and the key-based upsert makes the replay idempotent — which is the
    reason to upsert rather than append here."""
    outer_spark = stream.sparkSession

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # each micro-batch runs in a cloned session — temp views registered
        # by the merge engine are only visible through THAT session
        batch_spark = batch_df.sparkSession
        cat = CatalogManager(batch_spark)
        merger = TableMerger(batch_spark)
        merger.merge_table(
            batch_df, target_table, cat.table_exists(target_table), key=key
        )
        # the stage+rename swap invalidated file listings; the DEFINING
        # session caches its own FileIndex per table, so refresh it too or
        # the caller's next read lists vanished part files
        outer_spark.catalog.refreshTable(target_table)

    writer = stream.writeStream.foreachBatch(_upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_file_sink(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append-mode file sink with end-to-end exactly-once semantics: the
    checkpoint's WAL tracks which source files/offsets each batch covered
    and the sink's transaction log (``_spark_metadata``) records which
    output files a committed batch wrote, so a crash + restart with the
    SAME checkpoint neither loses nor duplicates rows. This is the lake
    landing-zone pattern: stream → partitioned parquet, compacted later by
    ``sinks/maintenance.py``. Partition by a low-cardinality time-derived
    column so downstream scans prune (100 TB guidance in SCALING.md)."""
    writer = (
        stream.writeStream.format(fmt)
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_cdc_sink(
    changes: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC: each micro-batch of I/U/D change rows is applied to
    ``target_table`` via sinks/cdc.py's pure transformation, using the
    same stage+rename swap as the merge engine. First batch creates the
    table from the batch's inserts. foreachBatch replays are safe: CDC
    application is idempotent per batch (tests/test_cdc.py), so a batch
    applied twice after a failure converges to the same state.
    """
    from ..sinks.cdc import apply_cdc_batch

    outer_spark = changes.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_spark = batch_df.sparkSession
        cat = CatalogManager(batch_spark)
        # finish/undo any crash-interrupted swap BEFORE the exists check —
        # a half-done swap must not read as "first batch" (state loss)
        _recover_swap(batch_spark, target_table)
        if not cat.table_exists(target_table):
            from pyspark.sql import functions as F

            # first state = the batch applied to an empty table (the empty
            # target's schema must be the PAYLOAD schema: no op, no seq)
            payload_cols = [
                c
                for c in batch_df.columns
                if c != op_col and c != (seq_col or "")
            ]
            empty = batch_df.select(*payload_cols).filter(F.lit(False))
            init = apply_cdc_batch(
                empty, batch_df, key_cols, op_col=op_col, seq_col=seq_col
            )
            init.write.mode("overwrite").format("parquet").saveAsTable(
                target_table
            )
            outer_spark.catalog.refreshTable(target_table)
            return
        target_df = batch_spark.table(target_table)
        nxt = apply_cdc_batch(
            target_df, batch_df, key_cols, op_col=op_col, seq_col=seq_col
        )
        _recover_and_swap(batch_spark, nxt, target_table)
        batch_spark.catalog.refreshTable(target_table)
        outer_spark.catalog.refreshTable(target_table)

    writer = changes.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_register_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    col: str,
    p: int = 6,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental distinct-count sketch: each micro-batch
    computes its own HLL register partials (functions/sketches.py) and
    folds them into the persisted register table by per-bucket MAX — the
    ingest posture where a 100 TB history is never rescanned and the
    global approx-distinct answer lives in m rows. Replays are safe
    because MAX-merge is idempotent: re-folding a batch cannot move any
    register. The merged table is bounded at 2^p rows, so the fold
    materializes driver-side (no read-while-overwrite staging needed)."""
    from pyspark.sql import functions as F

    from ..functions.sketches import hll_register_partials

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_spark = batch_df.sparkSession
        partials = hll_register_partials(batch_df, col, F.lit(0), p).select(
            "bucket", "rho"
        )
        if batch_spark.catalog.tableExists(target_table):
            partials = partials.unionByName(batch_spark.table(target_table))
        merged = (
            partials.groupBy("bucket").agg(F.max("rho").alias("rho")).collect()
        )
        batch_spark.createDataFrame(merged, "bucket int, rho int").write.mode(
            "overwrite"
        ).format("parquet").saveAsTable(target_table)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fold_partitioned(batch_spark, partial: DataFrame, target_table: str) -> None:
    """Shared exactly-once fold for ADDITIVE per-batch partials (CMS
    cells, expectations counts, any future sufficient-stats sink):
    ``partial`` must carry a trailing ``batch_id`` column; it lands in
    its own partition via dynamic partition overwrite, so a foreachBatch
    REPLAY rewrites the same partition with identical content —
    idempotent by construction. A read-merge-overwrite fold would
    double-count on replay, and a batch-id ledger doesn't fix it: a
    crash between the state write and the ledger write replays against
    state that already contains the batch."""
    if not batch_spark.catalog.tableExists(target_table):
        partial.write.partitionBy("batch_id").format("parquet").saveAsTable(
            target_table
        )
        return
    prev = batch_spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        batch_spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # insertInto is position-based; the partial's column order with the
        # trailing partition column matches the create order above
        partial.write.mode("overwrite").insertInto(target_table)
    finally:
        if prev is None:
            batch_spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            batch_spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def fold_cms_batch(
    batch_spark,
    batch_df: DataFrame,
    batch_id: int,
    target_table: str,
    col: str,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """Fold one micro-batch into a persisted count-min sketch, exactly
    once (see ``_fold_partitioned`` — CMS counters ADD, unlike the HLL
    register fold's idempotent MAX). The queryable sketch is the
    cell-wise sum over partitions (``cms_stream_merged``); at scale a
    periodic compaction collapses old partitions. Module-level (not a
    closure) so tests can drive a replay directly."""
    from pyspark.sql import functions as F

    from ..functions.sketches import cms_build

    sketch = cms_build(batch_df, col, depth=depth, width=width).withColumn(
        "batch_id", F.lit(batch_id)
    )
    _fold_partitioned(batch_spark, sketch, target_table)


def cms_stream_merged(spark, target_table: str) -> DataFrame:
    """The queryable counter matrix: cell-wise sum of all batch partials."""
    from pyspark.sql import functions as F

    return (
        spark.table(target_table)
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )


def stream_cms_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    col: str,
    depth: int = 4,
    width: int = 1024,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental count-min sketch (see fold_cms_batch for
    the exactly-once design): per-batch sketch partitions, merged on read
    by cell-wise addition."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_cms_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            target_table,
            col,
            depth,
            width,
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fold_expectations_batch(
    batch_spark,
    batch_df: DataFrame,
    batch_id: int,
    target_table: str,
    rules,
) -> None:
    """Fold one micro-batch's data-quality report into a persisted
    monitor table, exactly once. Violation/checked counts ADD across
    batches (like CMS counters, unlike HLL's idempotent MAX) — shared
    machinery in ``_fold_partitioned``. Module-level so tests can drive
    a replay directly."""
    from pyspark.sql import functions as F

    from ..operators.expectations import expect

    report = expect(batch_df, rules).withColumn("batch_id", F.lit(batch_id))
    _fold_partitioned(batch_spark, report, target_table)


def expectations_stream_merged(spark, target_table: str) -> DataFrame:
    """The queryable monitor: per-rule totals over all folded batches —
    the exact report ``expect()`` would produce on the full history,
    without rescanning it (proven by the converges-to-batch test)."""
    from pyspark.sql import functions as F

    return (
        spark.table(target_table)
        .groupBy("rule")
        .agg(
            F.sum("n_violations").cast("long").alias("n_violations"),
            F.sum("n_checked").cast("long").alias("n_checked"),
        )
    )


def stream_expectations_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    rules,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental data-quality monitor: every micro-batch
    is validated by ``operators/expectations.py::expect`` (all row-level
    rules in one scan of the BATCH, never the history) and folded into
    ``target_table``. Caveat vs the batch semantics, by design:
    ``unique`` rules count duplicates WITHIN each batch only — a key
    seen once per batch in two batches is not flagged (cross-batch
    uniqueness needs stateful dedup, streaming/events.py, or a
    post-ingest batch audit); additive rules (not_null / in_range /
    in_set / matches / foreign_key against a static dim) aggregate
    exactly."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_expectations_batch(
            batch_df.sparkSession, batch_df, batch_id, target_table, rules
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def kmeans_partials(
    batch_df: DataFrame, centroids: list, vec_col: str = "embedding"
) -> DataFrame:
    """One batch's per-cluster sufficient statistics — (cluster, n,
    per-dimension sums) under a FIXED centroid assignment. Counts and
    sums are ADDITIVE, so partials from any batch split merge to the
    one-pass batch answer (``merge_kmeans_stats``; q184 hash-proves the
    algebra against a direct per-cluster mean oracle). Shared by the
    streaming fold sink and the batch twin."""
    from pyspark.sql import functions as F

    from ..llm.clustering import assign_clusters

    cluster, _ = assign_clusters(F.col(vec_col), centroids)
    dim = len(centroids[0])
    # null vectors would assign to a spurious cluster=NULL group (squared
    # distance is null-propagating) — drop them like kmeans_lloyd does
    assigned = batch_df.filter(F.col(vec_col).isNotNull()).select(
        cluster.alias("cluster"), F.col(vec_col).alias("_v")
    )
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.array(
            *[
                F.sum(F.element_at(F.col("_v"), i + 1).cast("double")).alias(f"_s{i}")
                for i in range(dim)
            ]
        ).alias("sums"),
    )


def merge_kmeans_stats(stats: DataFrame, dim: int) -> DataFrame:
    """(cluster, n, centroid) from any pile of additive partial rows:
    totals per cluster, centroid = element-wise sum/count — identical to
    a one-pass batch computation over the union of the batches."""
    from pyspark.sql import functions as F

    totals = stats.groupBy("cluster").agg(
        F.sum("n").cast("long").alias("n"),
        F.array(
            *[F.sum(F.element_at("sums", i + 1)).alias(f"_t{i}") for i in range(dim)]
        ).alias("sums"),
    )
    return totals.select(
        "cluster",
        "n",
        F.transform("sums", lambda s: s / F.col("n")).alias("centroid"),
    )


def fold_kmeans_stats_batch(
    batch_spark,
    batch_df: DataFrame,
    batch_id: int,
    target_table: str,
    centroids: list,
    vec_col: str = "embedding",
) -> None:
    """Fold one micro-batch's per-cluster sufficient statistics
    (``kmeans_partials``) into a persisted stats table, exactly once
    (``_fold_partitioned``; sums and counts ADD). Fixing the assignment
    centroids is what makes the fold order-independent and
    replay-idempotent: assignment depends only on the batch's own
    vectors, never on evolving state. The merged stats yield refreshed
    centroids (``kmeans_stats_merged``) — the mini-batch k-means
    maintenance loop: periodically re-fit, swap the centroid list, keep
    folding. Module-level so tests can drive a replay."""
    from pyspark.sql import functions as F

    partial = kmeans_partials(batch_df, centroids, vec_col).withColumn(
        "batch_id", F.lit(batch_id)
    )
    _fold_partitioned(batch_spark, partial, target_table)


def kmeans_stats_merged(spark, target_table: str, dim: int) -> DataFrame:
    """(cluster, n, centroid): totals over all folded batches; centroid =
    element-wise sum/count — the refreshed mean under the fixed
    assignment, identical to a one-pass batch computation over the full
    history (converges-to-batch test). ``dim`` is the vector dimension
    the caller already knows from its centroid list (deriving it with a
    head() probe would cost an extra driver job per re-fit and break on
    an empty stats table)."""
    return merge_kmeans_stats(spark.table(target_table), dim)


def stream_kmeans_stats_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    centroids: list,
    vec_col: str = "embedding",
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental mini-batch k-means sufficient statistics
    under a fixed quantizer — per-batch cluster (count, sum) partials
    folded partition-per-batch (additive → same exactly-once design as
    the CMS and expectations sinks)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_kmeans_stats_batch(
            batch_df.sparkSession, batch_df, batch_id, target_table, centroids, vec_col
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _recover_swap(batch_spark, target_table: str) -> None:
    """Finish (or undo) a stage+rename swap a crash left half-done —
    the shared recovery step of every read-modify-write streaming sink
    (CDC, SCD2, and ``_recover_and_swap`` itself), extracted so a fix to
    the recovery protocol lands in exactly one place:

        target missing + __old present
          -> __stage present: previous swap had fully staged the new
             state; finish it (rename __stage -> target)
          -> else: restore __old -> target

    Must run BEFORE any "does the target exist" decision: a half-done
    swap must never read as "first batch" (silent history loss)."""
    stage, old = f"{target_table}__stage", f"{target_table}__old"
    exists = batch_spark.catalog.tableExists
    if not exists(target_table) and exists(old):
        if exists(stage):
            batch_spark.sql(f"ALTER TABLE {stage} RENAME TO {target_table}")
        else:
            batch_spark.sql(f"ALTER TABLE {old} RENAME TO {target_table}")


def _recover_and_swap(batch_spark, nxt: DataFrame, target_table: str) -> None:
    """Crash-recoverable stage+rename table swap for the stateful
    streaming sinks (CDC, SCD2). The naive DROP TABLE + RENAME pair has
    a window where the target does not exist; a driver crash inside it
    would make the NEXT foreachBatch replay see "no table" and rebuild
    state from ONE batch — silent history loss for a read-modify-write
    sink. This swap (a) keeps the previous state under ``__old`` until
    the new state is in place and (b) starts every call with a recovery
    step that can finish (or undo) a swap a crash left half-done:

        recovery: target missing + __old present
                    -> __stage present: previous swap had fully staged the
                       new state; finish it (rename __stage -> target)
                    -> else: restore __old -> target
        swap:     write __stage (full new state)
                  target -> __old        (target briefly missing)
                  __stage -> target
                  drop __old

    Every crash point replays into a state where target exists and holds
    either the old or the new COMPLETE dimension — never one batch's.
    The stray-__stage drop at the top also collects an incomplete stage
    write from a crash mid-save."""
    stage, old = f"{target_table}__stage", f"{target_table}__old"
    exists = batch_spark.catalog.tableExists
    _recover_swap(batch_spark, target_table)
    batch_spark.sql(f"DROP TABLE IF EXISTS {stage}")
    batch_spark.sql(f"DROP TABLE IF EXISTS {old}")

    nxt.write.mode("overwrite").format("parquet").saveAsTable(stage)
    if exists(target_table):
        batch_spark.sql(f"ALTER TABLE {target_table} RENAME TO {old}")
    batch_spark.sql(f"ALTER TABLE {stage} RENAME TO {target_table}")
    batch_spark.sql(f"DROP TABLE IF EXISTS {old}")


def fold_scd2_batch(
    batch_spark,
    batch_df: DataFrame,
    batch_id: int,
    target_table: str,
    key: str,
    attrs: list,
    ts_col: str,
) -> None:
    """Apply one micro-batch of attribute updates to a persisted SCD2
    dimension (``sinks/scd.py::scd2_apply``) with the stage+rename swap
    the merge engine uses (a dimension can't be overwritten while its
    scan is live). Replay-safe WITHOUT the partition-per-batch machinery:
    scd2_apply's no-op suppression makes re-applying an already-applied
    batch the identity (the current row already carries the update's
    attribute hash, so every row classifies as unchanged) — the
    exactly-once argument is idempotence of the transformation, same as
    the CDC sink, not additivity of partials. Module-level so tests can
    drive a replay directly."""
    from pyspark.sql import functions as F

    from ..sinks.scd import scd2_apply

    cat = CatalogManager(batch_spark)
    # finish/undo any crash-interrupted swap BEFORE deciding whether the
    # dimension exists — a half-done swap must not read as "first batch"
    _recover_swap(batch_spark, target_table)
    if cat.table_exists(target_table):
        dim = batch_spark.table(target_table)
        first = False
    else:
        # empty dimension with the target schema: scd2_apply then routes
        # every batch key through its insert branch
        dim = batch_df.select(
            key,
            *attrs,
            F.col(ts_col).cast("timestamp").alias("valid_from"),
            F.col(ts_col).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        ).filter(F.lit(False))
        first = True
    nxt = scd2_apply(dim, batch_df, key, list(attrs), ts_col)
    if first:
        nxt.write.mode("overwrite").format("parquet").saveAsTable(target_table)
    else:
        _recover_and_swap(batch_spark, nxt, target_table)
    batch_spark.catalog.refreshTable(target_table)


def stream_scd2_sink(
    updates: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    key: str,
    attrs: list,
    ts_col: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming dimension maintenance: each micro-batch of (key, attrs,
    ts) updates folds into a persisted SCD2 dimension — changed keys
    close their current version and open a new one, unchanged updates
    are no-ops, new keys insert (``sinks/scd.py::scd2_apply``). The
    streaming member of the SCD2 family: ``scd2_from_change_log``
    rebuilds history from a full log, this MAINTAINS it as updates
    arrive, and ``scd2_as_of`` serves point-in-time reads from either.
    Batches must arrive in event-time order for faithful history (the
    same contract as batch scd2_apply); within a batch the latest update
    per key wins."""
    outer_spark = updates.sparkSession

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_scd2_batch(
            batch_df.sparkSession, batch_df, batch_id, target_table, key, attrs, ts_col
        )
        outer_spark.catalog.refreshTable(target_table)

    writer = updates.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_versioned_sink(
    stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    partition_by: list[str] | None = None,
    catalog=None,
) -> StreamingQuery:
    """Stream into a versioned parquet table (sinks/versioned.py): each
    micro-batch commits one snapshot, so the landing zone gets time
    travel and atomic visibility for free. Exactly-once comes from the
    transaction-id ledger, the Delta ``txn`` design: the batch id is the
    txn id, a foreachBatch replay finds its id on the last committed
    manifest and skips — no partition-overwrite machinery, no
    idempotent-transformation argument, just the commit log refusing the
    duplicate. The third exactly-once mechanism in this module, each
    matched to its sink's algebra (additive partials -> partition
    overwrite; idempotent transformations -> re-apply; plain appends ->
    txn ledger). Txn ids are scoped by the checkpoint path (the Delta
    appId+version pairing): batch ids restart at 0 under a fresh
    checkpoint, so an unscoped ``stream-{batch_id}`` would let a NEW
    query pointed at an existing table silently skip its batch N as a
    "replay" of the old producer's batch N. The checkpoint path is the
    stream's durable identity — stable across restarts (so true replays
    still skip) and distinct for a new checkpoint (so they don't).
    runId would be wrong here: it changes per restart, which would
    un-skip genuine replays.  ``partition_by`` lays the landing table
    out Hive-style on first commit (later batches inherit the
    committed spec) — the stream→partitioned-lake pattern, with the
    partition values feeding the manifest zone maps so downstream
    pruned reads and copy-on-write upserts stay partition-confined.

    One-release shim: tables written before txn ids were checkpoint-
    scoped recorded ``stream-{batch_id}``; a head manifest carrying that
    LEGACY id for the replayed batch is also treated as a match, so the
    first replay after upgrading doesn't double-append an already-landed
    batch (new commits always write the scoped form).

    ``catalog`` (a ``catalog.VersionedCatalog``) makes ``table_path``
    NAME-addressable — the sink-side twin of the r15 source-side naming
    (``option("table", ...)``): a registered ``db.table`` resolves to
    its bound root, an UNREGISTERED name lands at the registry's
    default path and is REGISTERED on the first committed batch (the
    W5 create-by-name contract — an empty stream never registers a
    table with no commits).  Strings that fail the registry's name
    validator stay plain paths; spell a bare relative path that looks
    like a name with a separator (``./backup.v2``)."""
    from ..sinks.versioned import last_txn_id, versioned_write_txn

    dst_name: str | None = None
    if catalog is not None:
        resolved = catalog.try_resolve(table_path)
        if resolved is not None:
            table_path = resolved
        elif "/" not in table_path and type(catalog).is_name(table_path):
            dst_name, table_path = (
                table_path,
                catalog.default_path(table_path),
            )

    scope = _txn_scope(checkpoint_dir)

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if last_txn_id(table_path) == f"stream-{batch_id}":
            return  # replay of a batch committed under the pre-scope id format
        versioned_write_txn(
            batch_df,
            table_path,
            txn_id=f"stream-{scope}-{batch_id}",
            partition_by=partition_by,
        )
        if dst_name is not None and not catalog.exists(dst_name):
            # first commit created the table: register it by name
            # (same-path re-registration is idempotent, so a replayed
            # batch can never trip the already-bound guard)
            catalog.register(dst_name, table_path)

    writer = stream.writeStream.foreachBatch(_commit_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_quarantine_sink(
    stream: DataFrame,
    rules: list,
    good_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Dead-letter routing for streaming ingest: rows violating any
    row-level expectation rule (operators/expectations.py — not_null /
    in_range / in_set / matches) land in a quarantine table carrying a
    ``_violated`` column naming the failed rules; clean rows land in the
    good table. Both sides commit as versioned-table snapshots under ONE
    txn id per batch (sinks/versioned.py), so a foreachBatch replay
    skips both sides together — a replay can never route the same batch
    into good twice or split it inconsistently. The split itself is one
    scan: each rule's violation predicate becomes a when() label,
    rows aggregate their failed-rule names into an array. Unique/FK
    rules are batch-relative in a stream and deliberately rejected —
    run them as a post-ingest expectations audit instead (the same
    reasoning as the streaming expectations sink's within-batch-unique
    caveat).  Same legacy-id shim as ``stream_versioned_sink``: a head
    manifest carrying the pre-scope ``quarantine-{batch_id}`` id skips
    that side of the replayed batch."""
    from pyspark.sql import functions as F

    from ..operators.expectations import _ROW_KINDS, _violation_expr
    from ..sinks.versioned import last_txn_id, versioned_write_txn

    bad_kinds = [r.name for r in rules if r.kind not in _ROW_KINDS]
    if bad_kinds:
        raise ValueError(
            f"stream_quarantine_sink: only row-level rules are streamable; "
            f"move {bad_kinds} to a batch expectations audit"
        )
    if not rules:
        raise ValueError("stream_quarantine_sink: need at least one rule")

    violated = F.array_compact(
        F.array(
            *[
                F.when(_violation_expr(r), F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        )
    )

    scope = _txn_scope(checkpoint_dir)

    def _route(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        tagged = batch_df.withColumn("_violated", violated)
        txn = f"quarantine-{scope}-{batch_id}"
        legacy = f"quarantine-{batch_id}"
        good = tagged.filter(F.size("_violated") == 0).drop("_violated")
        bad = tagged.filter(F.size("_violated") > 0)
        if last_txn_id(good_path) != legacy:
            versioned_write_txn(good, good_path, txn_id=txn)
        if last_txn_id(quarantine_path) != legacy:
            versioned_write_txn(bad, quarantine_path, txn_id=txn)

    writer = stream.writeStream.foreachBatch(_route).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- streaming drift monitor (PSI / JSD vs a fixed reference) ---------


def drift_bin_expr(col: str, edges: list | None):
    """The binning expression shared by the batch PSI query (q240,
    queries/affinity.py) and the streaming fold: with ``edges`` (the
    reference period's quantile cuts, ascending), bin = 1 + #(value >
    edge) — pure JVM comparisons, no width_bucket divergence; without
    edges the column IS the bin (categorical drift, q124/q234's
    shape)."""
    from pyspark.sql import functions as F

    if edges is None:
        return F.col(col).cast("string")
    b = F.lit(1)
    for e in edges:
        b = b + (F.col(col) > F.lit(e)).cast("int")
    return b.cast("string")


def fold_drift_batch(
    batch_spark,
    batch_df: DataFrame,
    batch_id: int,
    target_table: str,
    col: str,
    edges: list | None = None,
) -> None:
    """Fold one micro-batch's per-bin counts into the persisted drift
    monitor, exactly once: counts ADD across batches (CMS-counter
    algebra), so each batch's partial lands in its own ``batch_id``
    partition via ``_fold_partitioned`` and a foreachBatch replay
    rewrites the same partition with identical content. Module-level so
    tests can drive a replay directly."""
    from pyspark.sql import functions as F

    partial = (
        batch_df.select(drift_bin_expr(col, edges).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("batch_id", F.lit(batch_id))
    )
    _fold_partitioned(batch_spark, partial, target_table)


def drift_stream_merged(spark, target_table: str) -> DataFrame:
    """The queryable observed histogram: per-bin totals over all folded
    batches — identical to one groupBy over the full history, without
    rescanning it (proven by the converges-to-batch test)."""
    from pyspark.sql import functions as F

    return spark.table(target_table).groupBy("bin").agg(
        F.sum("n").alias("n")
    )


def drift_report(cur: DataFrame, ref: DataFrame) -> DataFrame:
    """Score the OBSERVED (streamed) histogram against the REFERENCE
    one: per-bin PSI terms with the batch twin's +0.5/+5.0 Laplace
    smoothing (q240 — an emptied bin stays finite) and exact JSD terms
    (zeros need no smoothing: p=0 term is 0, q=0 term is p*ln2; sums
    are bounded by ln2).  Inputs are (bin, n) DataFrames — ``cur``
    from ``drift_stream_merged``, ``ref`` from one groupBy of the
    reference period (or a persisted baseline).  Plan: full outer join
    on bin + two 1-row broadcast totals — O(bins), never O(rows);
    ``sum(psi_term)`` / ``sum(jsd_term)`` give the headline indices."""
    from pyspark.sql import functions as F

    c = cur.select("bin", F.col("n").cast("double").alias("c_cur"))
    r = ref.select("bin", F.col("n").cast("double").alias("c_ref"))
    j = c.join(r, "bin", "full_outer").select(
        "bin",
        F.coalesce("c_cur", F.lit(0.0)).alias("c_cur"),
        F.coalesce("c_ref", F.lit(0.0)).alias("c_ref"),
    )
    t = j.agg(
        F.sum("c_cur").alias("n_cur"), F.sum("c_ref").alias("n_ref")
    )
    j = j.crossJoin(F.broadcast(t))
    p_s = (F.col("c_cur") + F.lit(0.5)) / (F.col("n_cur") + F.lit(5.0))
    q_s = (F.col("c_ref") + F.lit(0.5)) / (F.col("n_ref") + F.lit(5.0))
    p = F.col("c_cur") / F.col("n_cur")
    q = F.col("c_ref") / F.col("n_ref")
    jsd_p = F.when(
        F.col("c_cur") > 0, p * F.log(F.lit(2.0) * p / (p + q))
    ).otherwise(F.lit(0.0))
    jsd_q = F.when(
        F.col("c_ref") > 0, q * F.log(F.lit(2.0) * q / (p + q))
    ).otherwise(F.lit(0.0))
    return j.select(
        "bin",
        F.col("c_ref").cast("bigint").alias("n_ref"),
        F.col("c_cur").cast("bigint").alias("n_cur"),
        ((p_s - q_s) * F.log(p_s / q_s)).alias("psi_term"),
        (F.lit(0.5) * (jsd_p + jsd_q)).alias("jsd_term"),
    )


def stream_drift_sink(
    stream: DataFrame,
    target_table: str,
    checkpoint_dir: str,
    col: str,
    edges: list | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """foreachBatch incremental drift monitor — the streaming fold of
    the batch PSI/JSD twins (q240 numeric deciles-of-reference, q234's
    categorical shape): every micro-batch reduces to per-bin counts
    (map-side, O(bins) rows) folded exactly-once into ``target_table``;
    ``drift_report(drift_stream_merged(...), ref)`` scores the stream's
    full observed history against the fixed reference at any moment
    without rescanning it.  ``edges`` = the reference quantile cuts for
    numeric drift (computed ONCE from the reference period — PSI's
    defining move); None = categorical (the column's values are the
    bins)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_drift_batch(
            batch_df.sparkSession, batch_df, batch_id, target_table, col, edges
        )

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
