"""Streaming surface.

The reference has no streaming engine (SURVEY.md §2.8): its closest
surfaces are micro-batched appends of a RecordBatchReader
(table/__init__.py:460-534) and the incremental append scan (:2372).
We expose the Spark-native equivalents and deliberately do NOT build
custom watermark machinery (§7 watch-list item 7):

- ``append_stream``      — writeStream.foreachBatch into table.append():
  each micro-batch becomes one append snapshot (exactly the reference's
  bounded-memory micro-batching, but with Structured Streaming's trigger
  and checkpoint semantics on top).
- ``incremental_source`` — poll-based incremental reads: each call
  returns (df_of_new_appends, new_cursor), the CDC-read building block
  for Trigger.AvailableNow-style pipelines.
- ``windowed_event_counts`` — reference implementation of a watermarked
  tumbling-window aggregation over an event-time column, usable both on
  a stream (readStream) and as a batch backfill (same code path).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from ..table import Table


def _query_key(checkpoint_dir: str) -> str:
    """Stable identity of one streaming query across restarts: derived
    from its checkpoint location (as Spark itself scopes a query's
    progress to the checkpoint)."""
    return hashlib.md5(checkpoint_dir.rstrip("/").encode("utf-8")).hexdigest()[:16]


def _last_committed_batch_id(table: Table, query_key: str) -> Optional[int]:
    """Most recent streaming-batch-id this query committed: walk the
    current branch's ancestry newest-first and stop at the first snapshot
    tagged with this query key (other writers' snapshots interleave, so
    only a marker MATCH terminates early). O(snapshots-since-last-batch)
    per restart; steady-state batches use the in-memory cursor instead.

    This is the exactly-once half Structured Streaming can't provide:
    foreachBatch replays a batch after a failure (at-least-once), and the
    sink must detect "this batch already committed" — the same
    snapshot-marker scheme Iceberg's Spark streaming sink uses."""
    by_id = {s.snapshot_id: s for s in table.metadata.snapshots}
    snap = table.current_snapshot()
    while snap is not None:
        if snap.summary.get("streaming-query") == query_key:
            return int(snap.summary["streaming-batch-id"])
        pid = snap.parent_snapshot_id
        snap = by_id.get(pid) if pid is not None else None
    return None


def append_stream(stream_df: DataFrame, table: Table, checkpoint_dir: str, trigger_seconds: Optional[int] = None):
    """Sink a streaming DataFrame into an engine table: one append
    snapshot per micro-batch. Exactly-once: each commit is tagged with
    (query-key, batch-id); a batch replayed after failure recovery finds
    its marker already on the branch and is skipped."""
    qk = _query_key(checkpoint_dir)
    cursor = {"last": None, "primed": False}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = table.refresh()
        if not cursor["primed"]:
            cursor["last"] = _last_committed_batch_id(fresh, qk)
            cursor["primed"] = True
        if cursor["last"] is not None and batch_id <= cursor["last"]:
            return  # replayed batch — already committed
        fresh.append(
            batch_df,
            snapshot_properties={"streaming-query": qk, "streaming-batch-id": str(batch_id)},
        )
        cursor["last"] = batch_id

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_stream(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    join_cols: Optional[list] = None,
    mode: Optional[str] = None,
    dedupe_keep_last_by: Optional[str] = None,
    op_col: Optional[str] = None,
    delete_values: Tuple[str, ...] = ("D", "d", "delete"),
    trigger_seconds: Optional[int] = None,
):
    """CDC apply: MERGE each micro-batch into an engine table (update
    matched rows, insert unmatched) — one commit per batch, so the batch
    is the exactly-once unit just like :func:`append_stream`.

    A CDC feed can carry several updates for one key inside a batch;
    ``dedupe_keep_last_by`` names an ordering column (e.g. the change
    LSN / event time) and keeps only the latest row per key before the
    merge — without it the upsert's duplicate-key guard would abort.

    ``op_col`` turns the sink into a full changefeed apply: rows whose
    ``op_col`` value is in ``delete_values`` delete their key (written as
    EQUALITY DELETES — pure metadata, no target scan or rewrite, the
    100 TB delete path), every other row upserts; both land in ONE
    transaction. Dedup runs before the split, so a delete+reinsert of the
    same key within a batch resolves to whichever change is latest.
    ``mode`` picks copy-on-write or merge-on-read for the upsert half,
    defaulting to the table's ``write.merge.mode``.

    Exactly-once like :func:`append_stream`: every commit (including both
    snapshots of a delete+upsert transaction) carries the (query-key,
    batch-id) marker, and a replayed batch is skipped. An upsert replay
    would not just duplicate — re-merging the same keys against the
    already-updated table corrupts MoR delete sequencing."""
    qk = _query_key(checkpoint_dir)
    cursor = {"last": None, "primed": False}

    def _keys() -> list:
        if join_cols:
            return list(join_cols)
        sch = table.metadata.schema()
        keys = [sch.find_column_name(fid) for fid in sch.identifier_field_ids]
        if not keys:
            raise ValueError("upsert_stream needs join_cols or identifier_field_ids on the schema")
        return keys

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = table.refresh()
        if not cursor["primed"]:
            cursor["last"] = _last_committed_batch_id(fresh, qk)
            cursor["primed"] = True
        if cursor["last"] is not None and batch_id <= cursor["last"]:
            return  # replayed batch — already committed
        if dedupe_keep_last_by is not None:
            from pyspark.sql import Window

            w = Window.partitionBy(*_keys()).orderBy(F.col(dedupe_keep_last_by).desc())
            batch_df = (
                batch_df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
            )
        if batch_df.isEmpty():
            return
        marker = {"streaming-query": qk, "streaming-batch-id": str(batch_id)}
        if op_col is None:
            with fresh.transaction() as tx:
                tx.default_snapshot_properties = marker
                tx.upsert(batch_df, join_cols=join_cols, mode=mode)
            cursor["last"] = batch_id
            return
        # null-guard: isin() is NULL for NULL ops, which would fail BOTH
        # branches below and silently drop the row from the apply — treat
        # a missing op as an upsert so no change is ever lost
        is_delete = F.coalesce(F.col(op_col).isin(list(delete_values)), F.lit(False))
        dels = batch_df.where(is_delete).select(*_keys())
        ups = batch_df.where(~is_delete).drop(op_col)
        with fresh.transaction() as tx:
            tx.default_snapshot_properties = marker
            if not dels.isEmpty():
                tx.add_equality_deletes(dels, _keys())
            if not ups.isEmpty():
                tx.upsert(ups, join_cols=join_cols, mode=mode)
        cursor["last"] = batch_id

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _bounded_target(table: Table, cursor: Optional[int], max_snapshots: Optional[int]) -> Optional[int]:
    """The snapshot id a poll should advance to: the branch head, or —
    with ``max_snapshots`` — at most that many snapshots past ``cursor``
    along the ancestry (Spark's maxFilesPerTrigger idea at snapshot
    granularity: a reader that fell far behind catches up in bounded
    batches instead of one giant read)."""
    current = table.current_snapshot()
    if current is None:
        return cursor
    if max_snapshots is None:
        return current.snapshot_id
    if max_snapshots <= 0:
        raise ValueError(f"max_snapshots must be positive, got {max_snapshots}")
    by_id = {s.snapshot_id: s for s in table.metadata.snapshots}
    chain = []
    s = current
    while s is not None and s.snapshot_id != cursor:
        chain.append(s.snapshot_id)
        s = by_id.get(s.parent_snapshot_id) if s.parent_snapshot_id is not None else None
    if not chain:
        return cursor
    chain.reverse()  # oldest-first, starting just past the cursor
    return chain[min(max_snapshots, len(chain)) - 1]


def incremental_source(
    table: Table, cursor: Optional[int] = None, max_snapshots: Optional[int] = None
) -> Tuple[DataFrame, Optional[int]]:
    """Rows appended since ``cursor`` (a snapshot id), plus the new cursor.
    Poll in a loop (or from foreachBatch) for CDC-style pipelines.
    ``max_snapshots`` bounds each poll to that many snapshots of appends —
    repeated polls walk the history in rate-limited steps until caught up
    (cursor stops advancing)."""
    table.refresh()
    new_cursor = _bounded_target(table, cursor, max_snapshots)
    df = table.incremental_append_scan(
        from_snapshot_id_exclusive=cursor, to_snapshot_id_inclusive=new_cursor
    ).to_df()
    return df, new_cursor


def net_changes(changes: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Collapse a changelog frame (from ``incremental_changelog_scan`` /
    :func:`changelog_source`) to the NET effect per key: the last change
    wins, an upsert's delete+insert pair within one ordinal resolves to
    the insert, and keys whose final change is a delete drop out.
    Returns the key's final row (data columns only) — feeding this to a
    plain upsert-with-deletes sink applies a whole range in one shot
    instead of per-snapshot.

    One window shuffle on the key columns; no driver state."""
    from pyspark.sql import Window

    data_cols = [c for c in changes.columns if not c.startswith("_change_")]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_change_ordinal").desc(),
        F.when(F.col("_change_type") == "insert", 1).otherwise(0).desc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("_change_type") == "insert"))
        .select(*data_cols)
    )


def changelog_source(
    table: Table, cursor: Optional[int] = None, max_snapshots: Optional[int] = None
) -> Tuple[DataFrame, Optional[int]]:
    """Row-level changes (inserts AND deletes) since ``cursor``, plus the
    new cursor — the full-CDC sibling of :func:`incremental_source`,
    backed by ``incremental_changelog_scan``. The emitted frame carries
    ``_change_type`` / ``_change_ordinal`` / ``_change_snapshot_id``, so a
    downstream ``upsert_stream`` (op_col=\"_change_type\",
    delete_values=(\"delete\",)) replicates this table into another —
    table-to-table CDC without an external log. ``max_snapshots`` bounds
    each poll as in :func:`incremental_source`."""
    table.refresh()
    new_cursor = _bounded_target(table, cursor, max_snapshots)
    df = table.incremental_changelog_scan(
        from_snapshot_id_exclusive=cursor, to_snapshot_id_inclusive=new_cursor
    ).to_df()
    return df, new_cursor


def _epoch_us(df: DataFrame, ts_col: str):
    """Epoch-µs long for a timestamp column, robust to both TIMESTAMP and
    TIMESTAMP_NTZ inputs (parquet naive timestamps read as NTZ when
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` is on — ``unix_micros``
    rejects NTZ, so the NTZ path diffs against the NTZ epoch literal,
    which is timezone-independent)."""
    from pyspark.sql import types as T

    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization (batch): consecutive events of a key
    belong to one session while the gap stays under ``gap_minutes``.

    Spark shape: one window shuffle by key — lag() marks session breaks,
    a running sum numbers sessions, one groupBy aggregates them. Returns
    (key, session_id, session_start_us, session_end_us, n_events).
    Timestamps are emitted as epoch-µs longs so results are exact across
    engines. For the streaming equivalent see
    :func:`sessionize_stream`."""
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    # materialize epoch-µs once; every downstream expression reuses it
    ev = events.withColumn("_ts_us", _epoch_us(events, ts_col))
    w = Window.partitionBy(key_col).orderBy(F.col("_ts_us").asc(), F.col(order_tiebreak).asc())
    brk = F.when(F.col("_ts_us") - F.lag("_ts_us").over(w) > gap_us, 1).otherwise(0)
    with_sid = ev.withColumn("_brk", brk).withColumn(
        "session_id", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy(key_col, "session_id")
        .agg(
            F.min("_ts_us").alias("session_start_us"),
            F.max("_ts_us").alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization on a STREAM via a custom stateful
    operator (``applyInPandasWithState``): per-key state holds the open
    session (start, last-event, count); a batch's events extend or close
    it, and event-time timeout flushes sessions the watermark has passed.

    Emits one row per CLOSED session: (key, session_start_us,
    session_end_us, n_events). State per key is O(1) — this is the
    bounded-state custom operator the built-in window aggregation can't
    express (session windows with per-key gap + incremental emission)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("count", T.LongType()),
        ]
    )

    def update(key, pdf_iter, state):
        k = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((k, start_us, last_us, n))
                state.remove()
        else:
            ts_us: list = []
            for pdf in pdf_iter:
                # normalize to epoch-µs regardless of pandas datetime unit
                ts_us.extend(pdf[ts_col].values.astype("datetime64[us]").astype("int64").tolist())
            ts_us.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            for t in ts_us:
                if last_us is not None and t - last_us > gap_us:
                    closed.append((k, start_us, last_us, n))
                    start_us, n = t, 0
                if start_us is None:
                    start_us = t
                last_us = t
                n += 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                # close when the watermark passes the gap after the last event
                state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)
        yield pd.DataFrame(closed, columns=["key", "session_start_us", "session_end_us", "n_events"])

    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark: Optional[str] = "10 minutes",
) -> DataFrame:
    """Tumbling-window count+sum per key. On a streaming input the
    watermark bounds state and handles late data; on a batch input the
    same expression is a plain group-by (Spark unifies the two)."""
    df = events
    if watermark and events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream_exact(
    stream_df: DataFrame,
    key_cols: Optional[Sequence[str]] = None,
    text_col: Optional[str] = None,
    watermark_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming deduplication — the ingestion-side twin of
    ``operators.dedup.exact_dedup``: one row survives per key (or
    content digest). Across micro-batches the FIRST batch's row wins
    (later arrivals are dropped by the state store); within a single
    batch Spark keeps an arbitrary representative of the duplicates —
    standard ``dropDuplicates`` semantics.

    Spark-first: this is exactly what the built-in streaming
    deduplication state store is for, so we compose rather than build:

    - ``text_col`` given → dedup on a sha2-256 digest of the content
      (same digest as the batch dedup family, so batch and stream agree
      on identity);
    - ``watermark_col`` given → ``dropDuplicatesWithinWatermark``:
      state for a key is dropped once the watermark passes it, which is
      the ONLY way streaming dedup state stays bounded on an unbounded
      feed. 100 TB guidance: always pass one for continuous pipelines;
      unbounded ``dropDuplicates`` state is a slow OOM.
    - neither → plain ``dropDuplicates`` (exact global dedup; fine for
      Trigger.AvailableNow backfills where the stream is finite).
    """
    df = stream_df
    keys = list(key_cols or [])
    if text_col is not None:
        df = df.withColumn("_digest", F.sha2(F.col(text_col), 256))
        keys.append("_digest")
    if not keys:
        raise ValueError("dedup_stream_exact needs key_cols and/or text_col")
    if watermark_col is not None:
        return df.withWatermark(watermark_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def append_stream_dedup(
    stream_df: DataFrame,
    table: Table,
    checkpoint_dir: str,
    key_cols: Sequence[str],
    trigger_seconds: Optional[int] = None,
):
    """Idempotent dedup ingestion: append each micro-batch MINUS the
    keys the table already holds — so replays, overlapping sources, and
    in-feed duplicates all land exactly one row per key.

    Per batch: (1) in-batch dropDuplicates on the keys, (2) left-anti
    join against the target projected to the key columns (column-pruned
    scan — at 100 TB the right side is the key column only, shuffled on
    the same key as the join; no wide row ever moves), (3) append with
    the (query-key, batch-id) exactly-once marker of
    :func:`append_stream`, so a replayed batch is skipped wholesale
    without re-scanning the target."""
    qk = _query_key(checkpoint_dir)
    cursor = {"last": None, "primed": False}
    keys = list(key_cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = table.refresh()
        if not cursor["primed"]:
            cursor["last"] = _last_committed_batch_id(fresh, qk)
            cursor["primed"] = True
        if cursor["last"] is not None and batch_id <= cursor["last"]:
            return  # replayed batch — already committed
        batch = batch_df.dropDuplicates(keys)
        if fresh.current_snapshot() is not None:
            existing = fresh.scan(selected_fields=tuple(keys)).to_df()
            batch = batch.join(existing, keys, "left_anti")
        fresh.append(
            batch,
            snapshot_properties={"streaming-query": qk, "streaming-batch-id": str(batch_id)},
        )
        cursor["last"] = batch_id

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def append_stream_neardup(
    stream_df: DataFrame,
    target: Table,
    index: Table,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    in_batch_threshold: Optional[float] = 0.8,
    trigger_seconds: Optional[int] = None,
):
    """Streaming NEAR-dup ingestion (VERDICT r10 #6): the incremental
    crawl story end-to-end on live appends. Per micro-batch: (1)
    in-batch :func:`minhash_dedup` (``in_batch_threshold=None`` skips
    it), (2) flag against the PERSISTED ``index`` table's (band, bucket)
    rows — one semi-join keyed on (band, bucket), O(batch), never
    O(corpus), never all-pairs, (3) append the surviving docs to
    ``target`` and their :func:`lsh_index` delta to ``index``.

    Exactly-once across TWO tables without a cross-table transaction:
    each append carries the (query-key, batch-id) snapshot marker,
    checked independently per table, and the ORDER is survivors first.
    A crash between the two commits replays the batch as
    flag-vs-UNCHANGED-index (the delta never landed), which recomputes
    the same survivor set deterministically (hash-based signatures),
    finds the target marker already present, skips the data append, and
    lands only the missing index delta. A crash before either commit
    replays fully; after both, the batch is skipped wholesale.

    LSH parameters must match the ones the index table was built with,
    or buckets cannot collide."""
    from ..operators.dedup import dedup_against_lsh_index, minhash_dedup

    qk = _query_key(checkpoint_dir)
    cursor = {"t": None, "i": None, "primed": False}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ft, fi = target.refresh(), index.refresh()
        if not cursor["primed"]:
            cursor["t"] = _last_committed_batch_id(ft, qk)
            cursor["i"] = _last_committed_batch_id(fi, qk)
            cursor["primed"] = True
        done_t = cursor["t"] is not None and batch_id <= cursor["t"]
        done_i = cursor["i"] is not None and batch_id <= cursor["i"]
        if done_t and done_i:
            return  # replayed batch — both halves already committed
        batch = batch_df
        if in_batch_threshold is not None:
            # max_bucket_size=None keeps the identical-content guarantee
            batch = minhash_dedup(
                batch, id_col, text_col, threshold=in_batch_threshold, max_bucket_size=None
            )
        if fi.current_snapshot() is not None:
            idx_df = fi.scan(selected_fields=("band", "bucket")).to_df()
        else:
            idx_df = batch_df.sparkSession.createDataFrame([], "band: int, bucket: bigint")
        parts = dedup_against_lsh_index(
            batch, idx_df, id_col, text_col, num_hashes=num_hashes,
            bands=bands, rows_per_band=rows_per_band, shingle_n=shingle_n,
        )
        marker = {"streaming-query": qk, "streaming-batch-id": str(batch_id)}
        if not done_t:
            ft.append(parts["survivors"], snapshot_properties=marker)
            cursor["t"] = batch_id
        if not done_i:
            # index table schema = (id_col, band, bucket), caller-created
            fi.append(parts["index_delta"], snapshot_properties=marker)
            cursor["i"] = batch_id

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_stream(
    stream_df: DataFrame,
    source: Table,
    rollup: Table,
    checkpoint_dir: str,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    widths_seconds: Sequence[int],
    trigger_seconds: Optional[int] = None,
):
    """STREAMING multi-resolution rollup (hypertable continuous
    aggregate on live appends — VERDICT r09 #7): each micro-batch (1)
    lands in ``source`` exactly-once via the (query-key, batch-id)
    snapshot marker, then (2) folds into the materialized ``rollup``
    table through :func:`refresh_time_rollup` — whose own snapshot
    high-water makes the fold idempotent, so a foreachBatch replay
    after failure recovery re-applies NEITHER step.

    State story at 100 TB: Spark holds no aggregation state at all
    (stateless foreachBatch) — the "state" IS the rollup table, sized
    sum over widths of (span/width × key cardinality) rows, compacted
    like any table. Late data needs no watermark: a late event lands
    in a later batch and merges into its (old) bucket exactly like an
    on-time one — the rollup is eventually exact, not
    watermark-truncated."""
    from ..materialize import refresh_time_rollup

    qk = _query_key(checkpoint_dir)
    cursor = {"last": None, "primed": False}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = source.refresh()
        if not cursor["primed"]:
            cursor["last"] = _last_committed_batch_id(fresh, qk)
            cursor["primed"] = True
        if cursor["last"] is None or batch_id > cursor["last"]:
            fresh.append(
                batch_df,
                snapshot_properties={"streaming-query": qk, "streaming-batch-id": str(batch_id)},
            )
            cursor["last"] = batch_id
        # idempotent by high-water; also catches up appends from other
        # writers of the source table
        refresh_time_rollup(source.refresh(), rollup.refresh(), ts_col, key_cols, value_col, widths_seconds)

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def time_rollup(
    events: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    widths_seconds: Sequence[int],
    round_dp: Optional[int] = 4,
) -> DataFrame:
    """Multi-resolution continuous-aggregate rollup (the hypertable
    pattern): every requested bucket width is materialized from ONE
    pass over the events — each row explodes to its (width, bucket)
    memberships and a single groupBy aggregates all resolutions
    together, instead of one scan+shuffle per resolution.
    ``round_dp=None`` keeps sum_value unrounded — REQUIRED when the
    output is a mergeable partial (rounding is not associative), e.g.
    the streaming materialization path (:func:`rollup_stream`).

    Bucket arithmetic is INTEGER (epoch-micros floor-division), so any
    engine reproduces bucket edges exactly; the value sum is rounded
    to 4 dp (float-sum order caveat, same as windowed_event_counts).

    Shuffle: one groupBy keyed on (width, bucket, *keys) — cardinality
    = sum over widths of (span/width × key cardinality), uniform in
    time. At 100 TB this is the pre-aggregation you keep MATERIALIZED
    via the engine's own tables (append rollup deltas per ingest batch
    and compact), not a query you re-run; the operator is the batch
    body of that loop. Returns (width_s, bucket_start, *keys,
    n_events, sum_value, min_value, max_value)."""
    widths = [int(w) for w in widths_seconds]
    if not widths or any(w <= 0 for w in widths):
        raise ValueError(f"widths_seconds must be positive, got {widths_seconds}")
    us = _epoch_us(events, ts_col)
    exploded = events.select(
        *[F.col(c) for c in key_cols],
        F.col(value_col).alias("_v"),
        us.alias("_us"),
        F.explode(F.array(*[F.lit(w).cast("long") for w in widths])).alias("width_s"),
    ).withColumn(
        # floor to the bucket edge in PURE int64 arithmetic: pmod is
        # non-negative, so _us - pmod(_us, w) is the floor multiple even
        # for pre-epoch timestamps — no double division anywhere (double
        # rounding microsecond-close to a day edge can flip the bucket)
        "bucket_start",
        F.timestamp_micros(
            F.col("_us")
            - F.pmod(F.col("_us"), F.col("width_s") * F.lit(1_000_000).cast("long"))
        ),
    )
    return exploded.groupBy("width_s", "bucket_start", *key_cols).agg(
        F.count("*").cast("long").alias("n_events"),
        (F.round(F.sum("_v"), round_dp) if round_dp is not None else F.sum("_v")).alias("sum_value"),
        F.min("_v").alias("min_value"),
        F.max("_v").alias("max_value"),
    )


def gapfill(
    events: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    width_seconds: int,
    fill: Sequence[str] = ("locf", "interp"),
) -> DataFrame:
    """Time-bucket gap filling (the TimescaleDB
    ``time_bucket_gapfill`` / InfluxDB ``fill()`` pattern): bucket the
    events per key, then DENSIFY — every key gets a row for every
    bucket in the observed global span, with ``n_events = 0``,
    ``sum_value = NULL`` and ``filled = true`` where nothing happened.

    Fill strategies (each adds a column, all pure window functions):

    - ``locf``  → ``value_locf``: last observed ``sum_value`` carried
      forward (NULL before the first observation);
    - ``interp`` → ``value_interp``: linear interpolation between the
      previous and next observed buckets (NULL outside them).

    Scale shape: the dense grid is GENERATED, not shuffled —
    ``spark.range`` over the bucket index cross-joined with the
    distinct keys, O(keys × span/width) rows; up to ~1e6 buckets the
    axis broadcasts, beyond that the (far smaller) distinct-keys side
    broadcasts and the axis stays distributed — neither side ever
    funnels a year-at-1s axis through the driver. The left join and
    the fill windows both key on (key, bucket), so at 1000 executors
    each key's timeline lands in one partition and the windows never
    see another key's rows. Bucket arithmetic is integer epoch-micros
    (same rule as :func:`time_rollup`), so any engine reproduces the
    edges exactly. The global span is two scalar aggregates
    (driver-side metadata, not data)."""
    w_us = int(width_seconds) * 1_000_000
    if w_us <= 0:
        raise ValueError(f"width_seconds must be positive, got {width_seconds}")
    unknown = [f for f in fill if f not in ("locf", "interp")]
    if unknown:  # validate BEFORE any early return (ADVICE r13)
        raise ValueError(f"unknown fill strategies {unknown}; supported: locf, interp")
    keys = list(key_cols)
    us = _epoch_us(events, ts_col)
    src = events.select(
        *keys, F.col(value_col).alias("_v"), (us - F.pmod(us, F.lit(w_us))).alias("_b")
    )
    agg = src.groupBy(*keys, "_b").agg(
        F.count("*").cast("long").alias("n_events"), F.sum("_v").alias("sum_value")
    )
    span = src.agg(
        F.min("_b").alias("lo"),
        F.max("_b").alias("hi"),
        F.approx_count_distinct(F.struct(*keys)).alias("nk"),
    ).collect()[0]
    if span["lo"] is None:
        return agg.select(
            *keys,
            F.timestamp_micros("_b").alias("bucket_start"),
            "n_events",
            "sum_value",
            F.lit(False).alias("filled"),
            *[F.col("sum_value").alias(f"value_{f}") for f in fill],
        )
    # spark.range generates the bucket axis DISTRIBUTED — a sequence()
    # literal would materialize one span/width-element array in a
    # single task (3e7 elements for a year at 1s buckets)
    n_buckets = (int(span["hi"]) - int(span["lo"])) // w_us + 1
    buckets = events.sparkSession.range(
        int(span["lo"]), int(span["hi"]) + 1, w_us
    ).select(F.col("id").alias("_b"))
    # broadcast the axis only while it is genuinely broadcast-sized;
    # past ~1e6 buckets ship the distinct-keys side instead — but only
    # hint ITS broadcast while the key cardinality (estimated in the
    # same span aggregate, ±2%) is broadcast-sized too; with a long
    # span AND high key cardinality BOTH sides are large, so leave the
    # cross join unhinted and let AQE choose rather than force the
    # OOM the axis guard was meant to remove (ADVICE r13 / r14 #4)
    dkeys = src.select(*keys).distinct()
    if n_buckets <= 1_000_000:
        grid = dkeys.crossJoin(F.broadcast(buckets))
    elif int(span["nk"] or 0) <= 1_000_000:
        grid = buckets.crossJoin(F.broadcast(dkeys))
    else:
        grid = buckets.crossJoin(dkeys)
    dense = grid.join(agg, [*keys, "_b"], "left").select(
        *keys,
        "_b",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "sum_value",
        F.col("n_events").isNull().alias("filled"),
    )
    from pyspark.sql import Window as _W

    w_all = _W.partitionBy(*keys).orderBy("_b")
    out_cols = {}
    if "locf" in fill:
        out_cols["value_locf"] = F.last("sum_value", ignorenulls=True).over(
            w_all.rowsBetween(_W.unboundedPreceding, 0)
        )
    if "interp" in fill:
        prev_v = F.last("sum_value", ignorenulls=True).over(
            w_all.rowsBetween(_W.unboundedPreceding, -1)
        )
        prev_b = F.last(F.when(F.col("sum_value").isNotNull(), F.col("_b")), ignorenulls=True).over(
            w_all.rowsBetween(_W.unboundedPreceding, -1)
        )
        next_v = F.first("sum_value", ignorenulls=True).over(
            w_all.rowsBetween(1, _W.unboundedFollowing)
        )
        next_b = F.first(F.when(F.col("sum_value").isNotNull(), F.col("_b")), ignorenulls=True).over(
            w_all.rowsBetween(1, _W.unboundedFollowing)
        )
        frac = (F.col("_b") - prev_b).cast("double") / (next_b - prev_b).cast("double")
        out_cols["value_interp"] = F.when(
            F.col("sum_value").isNotNull(), F.col("sum_value").cast("double")
        ).otherwise(prev_v.cast("double") + (next_v - prev_v).cast("double") * frac)
    return dense.select(
        *keys,
        F.timestamp_micros("_b").alias("bucket_start"),
        "n_events",
        "sum_value",
        "filled",
        *[c.alias(name) for name, c in out_cols.items()],
    )


def funnel(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    step_col: str,
    steps: Sequence[str],
    window_seconds: int,
) -> DataFrame:
    """Ordered-funnel analysis (the ClickHouse ``windowFunnel`` family
    of questions: how far down ``steps`` does each user get, and
    when?).

    Semantics — EARLIEST-ANCHOR GREEDY, chosen because it is
    deterministic and exactly reproducible in ANSI SQL (the oracle):
    the chain anchors at the user's earliest step-1 event; each later
    step matches its earliest event STRICTLY after the previous match
    and within ``window_seconds`` of the anchor. (ClickHouse's
    max-level variant re-anchors at every step-1 event; a user greedy
    misses at one anchor may complete from a later one — callers who
    need that can re-run on events after the first anchor.)

    Returns one row per user with at least one step event: ``(user,
    level int, step1_us .. stepK_us long)`` — matched event times in
    epoch micros (exact integers, NULL where the chain stopped).

    Scale shape: ONE groupBy(user) shuffle; each user's timeline folds
    JVM-side with a Catalyst higher-order ``aggregate`` over the
    sorted (ts, step) array — no Python, no window over the corpus, no
    self-joins (a k-step funnel as k self-joins shuffles the events
    table k times; this shuffles it once). Per-user event lists
    materialize in executor memory — bounded by the heaviest user, the
    same constraint as sessionize."""
    k = len(steps)
    if k < 2:
        raise ValueError("funnel needs at least 2 steps")
    win_us = int(window_seconds) * 1_000_000
    us = _epoch_us(events, ts_col)
    idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )[F.col(step_col)]
    src = events.select(
        F.col(user_col).alias("user"), us.alias("_us"), idx.alias("_idx")
    ).where(F.col("_idx").isNotNull())
    per_user = src.groupBy("user").agg(
        F.array_sort(F.collect_list(F.struct(F.col("_us").alias("us"), F.col("_idx").alias("idx")))).alias(
            "_tl"
        )
    )
    init = F.struct(
        F.lit(0).alias("lvl"),
        F.array_repeat(F.lit(None).cast("long"), k).alias("t"),
    )

    def fold(acc, e):
        anchor = F.try_element_at(acc["t"], F.lit(1))
        last = F.try_element_at(acc["t"], acc["lvl"])  # NULL when lvl=0
        ok = (
            (acc["lvl"] < k)
            & (e["idx"] == acc["lvl"])
            & ((acc["lvl"] == 0) | ((e["us"] > last) & (e["us"] <= anchor + F.lit(win_us))))
        )
        new_t = F.transform(
            acc["t"],
            lambda x, i: F.when(i == acc["lvl"], e["us"]).otherwise(x),
        )
        return F.when(
            ok, F.struct((acc["lvl"] + 1).alias("lvl"), new_t.alias("t"))
        ).otherwise(acc)

    res = per_user.select(
        "user", F.aggregate("_tl", init, fold).alias("_r")
    )
    return res.select(
        "user",
        F.col("_r.lvl").alias("level"),
        *[
            F.try_element_at(F.col("_r.t"), F.lit(i + 1)).alias(f"step{i + 1}_us")
            for i in range(k)
        ],
    )


def transition_matrix(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences: one row per observed ``(from_state, to_state)`` with
    the transition count and an integer micro-unit row probability
    (``floor(n * 1e6 / from_total)`` — float-free, so any engine
    reproduces it exactly).

    ONE window (lead over each user's timeline, keyed and sorted once)
    + ONE groupBy(from, to); the per-from totals come from a window
    over the AGGREGATED pair table (O(states²) rows), never a second
    pass over the events. Ties in ``ts`` order deterministically by
    the state value."""
    pairs = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(ts_col).alias("_ts"),
            F.col(state_col).alias("from_state"),
        )
        .withColumn("to_state", F.lead("from_state").over(
            Window.partitionBy("_u").orderBy("_ts", "from_state")
        ))
        .where(F.col("to_state").isNotNull())
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count("*").cast("long").alias("n")
    )
    tot = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        # explicit floor: Spark's cast truncates but DuckDB's rounds —
        # floor is the one spelling both engines reproduce exactly
        F.floor(F.col("n") * F.lit(1_000_000) / F.sum("n").over(tot)).cast("long").alias("p_micro"),
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period, one
    row per ``(cohort_start, period_index)`` with the distinct users
    from that cohort active ``period_index`` periods later (index 0 =
    the cohort period itself).

    Shape: one groupBy(user) for first-seen, one distinct over
    (user, period) — both key on the user id so the second reuses the
    first's partitioning under AQE — then one count per (cohort,
    index). Period edges are integer epoch-micros arithmetic."""
    p_us = int(period_seconds) * 1_000_000
    if p_us <= 0:
        raise ValueError(f"period_seconds must be positive, got {period_seconds}")
    us = _epoch_us(events, ts_col)
    acts = events.select(
        F.col(user_col).alias("_u"), (us - F.pmod(us, F.lit(p_us))).alias("_p")
    ).distinct()
    first = acts.groupBy("_u").agg(F.min("_p").alias("_c"))
    return (
        acts.join(first, "_u")
        .groupBy(
            F.timestamp_micros(F.col("_c")).alias("cohort_start"),
            ((F.col("_p") - F.col("_c")) / F.lit(p_us)).cast("int").alias("period_index"),
        )
        .agg(F.count_distinct("_u").cast("long").alias("n_users"))
    )


def interval_coverage(
    intervals: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Union-of-intervals coverage per key: merge overlapping/touching
    ``[start, end]`` intervals into islands and report per key the
    total covered length, the island count, and the raw interval count
    — the classic "how much wall-clock was this user active" question
    that naive SUM(end - start) double-counts.

    ONE window per key (sorted by start; island boundary = start
    strictly greater than the running max of previous ends) + ONE
    groupBy — per-key state is a single running max, cost is the sort
    a merge join needs anyway. Works on any orderable numeric/
    timestamp pair; length is end - start in the column's own units
    (epoch micros for timestamps)."""
    keys = list(key_cols)
    s, e = F.col("_s"), F.col("_e")

    def _as_long(c: str):
        # timestamp cast("long") would silently truncate to SECONDS —
        # route temporal columns through epoch micros instead
        dt = intervals.schema[c].dataType.typeName()
        if dt in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(F.col(c).cast("timestamp"))
        if dt == "date":
            return F.unix_micros(F.col(c).cast("timestamp"))
        return F.col(c).cast("long")

    src = intervals.select(
        *keys, _as_long(start_col).alias("_s"), _as_long(end_col).alias("_e")
    ).where(s <= e)
    w = Window.partitionBy(*keys).orderBy("_s", "_e")
    prev_max = F.max("_e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = src.withColumn(
        "_new", F.when(prev_max.isNull() | (s > prev_max), 1).otherwise(0)
    )
    islands = marked.withColumn(
        "_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy(*keys, "_isl").agg(
        F.min("_s").alias("_lo"), F.max("_e").alias("_hi"), F.count("*").alias("_n")
    )
    return per_island.groupBy(*keys).agg(
        F.sum(F.col("_hi") - F.col("_lo")).cast("long").alias("covered"),
        F.count("*").cast("long").alias("n_islands"),
        F.sum("_n").cast("long").alias("n_intervals"),
    )


def funnel_stream(
    stream_df: DataFrame,
    ts_col: str,
    user_col: str,
    state_col: str,
    steps: Sequence[str],
    window_seconds: int,
    watermark: str = "10 minutes",
    buckets: Optional[int] = None,
) -> DataFrame:
    """Ordered-funnel analysis on a STREAM via a custom stateful
    operator (``applyInPandasWithState``) — the incremental
    counterpart of :func:`funnel`, same earliest-anchor greedy
    semantics. Per-user state is O(k): the reached level and the k
    matched step times.

    Emission is exact and final for ANCHORED users: no event can
    extend a chain past ``anchor + window``, so once the watermark
    passes that instant the row (user, level, step times) is frozen —
    it emits then, or immediately on completion (level = k). Users
    who never anchored emit their level-0 row when the watermark
    passes their last event + window; a user reappearing after that
    re-evaluates from scratch (one row per appearance epoch — the
    same replay semantics as session close).

    Ordering contract (same as :func:`sessionize_stream`): events fold
    in event-time order WITHIN each micro-batch; a late cross-batch
    event older than already-folded ones is folded late (bounded by
    the watermark). Feed near-ordered streams or widen the trigger —
    the batch operator is the arbiter for backfills.

    Execution shape: state is keyed by a hash BUCKET of the user id,
    not the user id itself — ``applyInPandasWithState`` serializes one
    pandas frame per KEY per micro-batch, so per-user keys pay the
    Python round-trip protocol once per active user per batch. A
    bucket's state is the dict of its users' O(k) records; per-user
    emission timing is reproduced exactly by sweeping the dict against
    the current watermark with the same ``freeze`` rule the per-user
    event-time timeout used (a user emits in the first micro-batch
    whose watermark passes ``freeze_ms + 1`` — Spark fires an
    event-time timeout when its timestamp < watermark). ``buckets``
    defaults to the session's shuffle-partition setting (one state
    store per shuffle partition); the result set is bucket-invariant.
    """
    import json as _json

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    if k < 2:
        raise ValueError("funnel needs at least 2 steps")
    win_us = int(window_seconds) * 1_000_000
    idx_of = {s: i for i, s in enumerate(steps)}
    step_cols = [f"step{i + 1}_us" for i in range(k)]
    out_schema = T.StructType(
        [T.StructField("user", T.LongType()), T.StructField("level", T.IntegerType())]
        + [T.StructField(c, T.LongType()) for c in step_cols]
    )
    # one JSON string per bucket: {user: [lvl, t0..t(k-1), last_seen]}
    # (flat state schemas only — array/map-typed state rows trip
    # Spark's row decoder in applyInPandasWithState)
    state_schema = T.StructType([T.StructField("js", T.StringType())])
    if buckets is None:
        buckets = int(stream_df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_buckets = max(1, int(buckets))

    def update(key, pdf_iter, state):
        st = _json.loads(state.get[0]) if state.exists else {}
        out = []
        if not state.hasTimedOut:
            per_user: dict = {}
            for pdf in pdf_iter:
                ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
                for u, t_us, s in zip(
                    pdf[user_col].values.tolist(), ts_us.tolist(), pdf[state_col]
                ):
                    i = idx_of.get(s)
                    if i is not None:
                        per_user.setdefault(u, []).append((t_us, i))
            for u, evs in per_user.items():
                evs.sort()
                ku = str(u)
                rec = st.get(ku)
                if rec is None:
                    lvl, t, last_seen = 0, [None] * k, 0
                else:
                    lvl, t, last_seen = int(rec[0]), list(rec[1 : 1 + k]), rec[1 + k]
                for t_us, i in evs:
                    last_seen = max(last_seen, t_us)
                    if lvl >= k or i != lvl:
                        continue
                    if lvl == 0:
                        t[0], lvl = t_us, 1
                    elif t_us > t[lvl - 1] and t_us <= t[0] + win_us:
                        t[lvl], lvl = t_us, lvl + 1
                if lvl >= k:
                    out.append((u, int(lvl), *t))
                    st.pop(ku, None)
                else:
                    st[ku] = [lvl, *t, last_seen]
        # per-user freeze sweep — the event-time-timeout firing rule
        # (timestamp = freeze_ms + 1 fires when < watermark) applied
        # per user inside the bucket
        wm = state.getCurrentWatermarkMs()

        def _freeze_ms(rec) -> int:
            t0 = rec[1]
            base_us = (t0 + win_us) if t0 is not None else (rec[1 + k] + win_us)
            return base_us // 1000 + 1

        for ku in list(st):
            rec = st[ku]
            if _freeze_ms(rec) < wm:
                t = [None if x is None else int(x) for x in rec[1 : 1 + k]]
                out.append((int(ku), int(rec[0]), *t))
                del st[ku]
        if st:
            state.update((_json.dumps(st),))
            state.setTimeoutTimestamp(max(min(_freeze_ms(r) for r in st.values()), wm + 1))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out, columns=["user", "level", *step_cols])

    return (
        stream_df.withWatermark(ts_col, watermark)
        # grouping expressions must be plain attributes for
        # applyInPandasWithState — materialize the bucket as a column
        .withColumn("_bucket", F.pmod(F.xxhash64(F.col(user_col)), F.lit(n_buckets)))
        .groupBy("_bucket")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def heavy_hitters_stream(
    stream_df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    m: int = 64,
    watermark_col: Optional[str] = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming heavy hitters: a Misra-Gries summary as PER-GROUP
    STREAMING STATE (``applyInPandasWithState``) — the third custom
    stateful operator beside sessionize and the funnel. Each
    micro-batch folds its exact per-group counts into the summary
    (MG merges commute with ANY arrival order, so the batch boundary
    is invisible to the guarantees) and emits the group's refreshed
    snapshot: one row per surviving item plus a marker row
    (item = NULL) carrying ``deducted`` and ``n`` — consumers keep
    the latest snapshot per group.

    The deterministic certificates are the batch operator's, at every
    emission: est ≤ true ≤ est + deducted, every item with
    true > deducted present, deducted ≤ n/(m+1). State per group is
    O(m) — serialized as one JSON string (flat state schemas only;
    array-typed state rows trip Spark's row decoder)."""
    import json as _json

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    grp = list(group_cols)
    if not grp:
        raise ValueError("heavy_hitters_stream needs at least one group column")
    out_schema = T.StructType(
        [T.StructField(g, T.StringType()) for g in grp]
        + [
            T.StructField("item", T.StringType()),
            T.StructField("est", T.LongType()),
            T.StructField("deducted", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("js", T.StringType())])

    def update(key, pdf_iter, state):
        counts: dict = {}
        n_new = 0
        for pdf in pdf_iter:
            vc = pdf[value_col].dropna().astype(str).value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            n_new += int(vc.sum())
        if state.exists:
            st = _json.loads(state.get[0])
        else:
            st = {"items": {}, "deducted": 0, "n": 0}
        for item, c in counts.items():
            st["items"][item] = st["items"].get(item, 0) + c
        st["n"] += n_new
        if len(st["items"]) > m:
            vals = sorted(st["items"].values(), reverse=True)
            t = vals[m]  # the (m+1)-th largest
            st["items"] = {k: v - t for k, v in st["items"].items() if v > t}
            st["deducted"] += t
        state.update((_json.dumps(st),))
        rows = [(*key, it, int(est), int(st["deducted"]), int(st["n"])) for it, est in st["items"].items()]
        rows.append((*key, None, None, int(st["deducted"]), int(st["n"])))
        yield pd.DataFrame(rows, columns=[*grp, "item", "est", "deducted", "n"])

    src = stream_df
    if watermark_col:
        src = src.withWatermark(watermark_col, watermark)
    return src.groupBy(*[F.col(g).cast("string").alias(g) for g in grp]).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
