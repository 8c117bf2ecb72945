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

from typing import Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from ..table import Table


def append_stream(stream_df: DataFrame, table: Table, checkpoint_dir: str, trigger_seconds: Optional[int] = None):
    """Sink a streaming DataFrame into an engine table: one append
    snapshot per micro-batch (commit = the batch's exactly-once unit)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        fresh = table.refresh()
        fresh.append(batch_df, snapshot_properties={"streaming-batch-id": str(batch_id)})

    writer = stream_df.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_source(table: Table, cursor: Optional[int] = None) -> Tuple[DataFrame, Optional[int]]:
    """Rows appended since ``cursor`` (a snapshot id), plus the new cursor.
    Poll in a loop (or from foreachBatch) for CDC-style pipelines."""
    table.refresh()
    current = table.current_snapshot()
    new_cursor = current.snapshot_id if current else cursor
    df = table.incremental_append_scan(
        from_snapshot_id_exclusive=cursor, to_snapshot_id_inclusive=new_cursor
    ).to_df()
    return df, new_cursor


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
