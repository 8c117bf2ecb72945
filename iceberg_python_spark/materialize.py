"""Incremental materialized aggregates over engine tables.

The missing half of the rollup story: ``time_rollup`` / ``groupBy``
answer a rollup QUERY, but at 100 TB you don't re-aggregate the fact
table per dashboard load — you maintain a small rollup TABLE and merge
each ingest batch's delta into it. ``refresh_rollup`` is that
maintenance tick, built from machinery the engine already has:

- the delta is ``IncrementalAppendScan`` rows between the target's
  recorded high-water snapshot and the source's current one — cost is
  O(batch), never O(history);
- the delta collapses map-side to one partial-aggregate row per
  touched group BEFORE any shuffle (sum/count/min/max are all
  algebraic, so partials merge exactly);
- only the touched groups' current values are read back from the
  target (left-semi on the group keys — file-level pruning applies when
  the target is sorted/partitioned by key), combined, and upserted —
  the target's CoW upsert rewrites only the files containing touched
  groups;
- the merge AND the new high-water property commit in ONE transaction,
  so a crashed refresh can never double-apply a batch: re-running is
  idempotent (exactly-once refresh semantics without any external
  state store).

If the source range contains a logical rewrite (overwrite / delete /
non-ancestor history, e.g. after a rollback), incremental maintenance
would be wrong for non-invertible aggregates (min/max can't subtract),
so the refresh degrades to a full recompute — the same contract as
Iceberg's materialized-view spec draft. REPLACE (compaction) snapshots
carry no logical change and stay on the incremental path.

Reference anchor: the reference has no materialized-view machinery;
this composes its incremental scan (table/__init__.py:2372) with
upsert (table/upsert_util.py) semantics. The aggregate algebra is the
standard self-maintainable-view result (Palpanas et al., "Incremental
Maintenance for Non-Distributive Aggregate Functions", VLDB 2002).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .table import Table
from .table.snapshots import Operation

#: target-table property holding the source snapshot already folded in
SOURCE_SNAPSHOT_PROP = "rollup.source-snapshot-id"

_MERGEABLE = ("sum", "count", "min", "max")


def _agg_exprs(aggs: Mapping[str, Tuple[str, str]]):
    """Partial-aggregate expressions for the delta groupBy."""
    exprs = []
    for out, (fn, src) in aggs.items():
        fn = fn.lower()
        if fn not in _MERGEABLE:
            raise ValueError(
                f"{out}: '{fn}' is not incrementally mergeable - use one of "
                f"{_MERGEABLE} (derive avg as sum/count at query time)"
            )
        col = F.expr(src) if src else F.lit(1)
        exprs.append(
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
        )
    return exprs


def _merge_col(fn: str, out: str):
    """Combine an existing group value with a delta partial (both may be
    missing: a group can be new to the delta or untouched by it)."""
    e, d = F.col(f"e.{out}"), F.col(f"d.{out}")
    if fn in ("sum", "count"):
        # SUM of an all-null group is NULL, so 0-coalescing both sides
        # unconditionally would invent a 0 - keep NULL when neither side
        # ever saw a value
        return (
            F.when(e.isNull() & d.isNull(), F.lit(None))
            .otherwise(F.coalesce(e, F.lit(0)) + F.coalesce(d, F.lit(0)))
            .alias(out)
        )
    return (F.least(e, d) if fn == "min" else F.greatest(e, d)).alias(out)


def rollup_schema_df(source: Table, keys, aggs: Mapping[str, Tuple[str, str]]) -> DataFrame:
    """Zero-row DataFrame with the rollup's output schema (keys then
    aggregate columns) - the schema source for creating the target."""
    df = source.scan().to_df().limit(0)
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(*_agg_exprs(aggs))
    # count() comes back non-nullable, but merged values are built from
    # nullable conditionals - the target schema must accept them
    schema = agg.schema
    for f in schema.fields:
        f.nullable = True
    return df.sparkSession.createDataFrame([], schema)


def create_rollup(
    catalog,
    identifier: str,
    source: Table,
    keys,
    aggs: Mapping[str, Tuple[str, str]],
    partition_spec=None,
) -> Table:
    """Create an empty rollup target whose schema is derived from the
    source and the aggregate spec. Partition/bucket the target by a
    group key for co-located merges at scale."""
    from . import UNPARTITIONED
    from .schema import schema_from_spark

    schema = schema_from_spark(rollup_schema_df(source, keys, aggs).schema)
    return catalog.create_table(
        identifier, schema, partition_spec=partition_spec or UNPARTITIONED
    )


def refresh_rollup(
    source: Table,
    target: Table,
    keys,
    aggs: Mapping[str, Tuple[str, str]],
    to_snapshot_id: Optional[int] = None,
) -> Dict[str, object]:
    """Fold source rows committed since the last refresh into the
    rollup target; returns ``{"mode", "source_snapshot_id",
    "affected_groups", "delta_rows"}``.

    ``keys`` are the grouping columns; ``aggs`` maps each output column
    to ``(fn, source_expr)`` with fn in sum/count/min/max — the source
    expression is any SQL expression over source columns (use an
    integer-exact expression, e.g. cents as BIGINT, when the rollup
    must reproduce bit-identically across engines).

    ``to_snapshot_id`` pins the refresh point (default: source current)
    — the replay/backfill control.
    """
    keys = list(keys)
    cur_id = to_snapshot_id
    if cur_id is None:
        cur = source.current_snapshot()
        if cur is None:  # empty source: nothing to fold
            return {"mode": "noop", "source_snapshot_id": None, "affected_groups": 0, "delta_rows": 0}
        cur_id = cur.snapshot_id

    last = target.properties.get(SOURCE_SNAPSHOT_PROP)
    last_id = int(last) if last is not None else None
    if last_id == cur_id:
        return {"mode": "noop", "source_snapshot_id": cur_id, "affected_groups": 0, "delta_rows": 0}

    mode = "full"
    if last_id is not None:
        try:
            chain = _append_only_chain(source, last_id, cur_id)
            if chain is not None:
                mode = "incremental"
        except ValueError:
            mode = "full"  # non-ancestor (rollback) or expired history

    exprs = _agg_exprs(aggs)
    if mode == "full":
        full = source.scan(snapshot_id=cur_id).to_df().groupBy(*keys).agg(*exprs)
        full = full.localCheckpoint(eager=True)
        n_groups = full.count()
        with target.transaction() as tx:
            tx.overwrite(full)
            tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
        return {
            "mode": "full",
            "source_snapshot_id": cur_id,
            "affected_groups": n_groups,
            "delta_rows": None,
        }

    delta = (
        source.incremental_append_scan(
            from_snapshot_id_exclusive=last_id, to_snapshot_id_inclusive=cur_id
        ).to_df()
    )
    # one partial row per touched group, map-side combined before the
    # single shuffle; checkpointed because it feeds both the semi-join
    # and the merge
    partial = delta.groupBy(*keys).agg(*exprs).localCheckpoint(eager=True)
    affected = partial.count()
    if affected == 0:
        with target.transaction() as tx:
            tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "incremental", "source_snapshot_id": cur_id, "affected_groups": 0, "delta_rows": 0}

    # current values for ONLY the touched groups (semi-join prunes the
    # target scan; with a key-sorted/bucketed target this is file-level)
    existing = target.scan().to_df().join(partial.select(*keys), keys, "left_semi")
    merged = existing.alias("e").join(partial.alias("d"), keys, "full_outer").select(
        *keys, *[_merge_col(fn.lower(), out) for out, (fn, _) in aggs.items()]
    )
    with target.transaction() as tx:
        tx.upsert(merged, join_cols=keys)
        tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
    return {
        "mode": "incremental",
        "source_snapshot_id": cur_id,
        "affected_groups": affected,
        "delta_rows": None,
    }


def refresh_time_rollup(
    source: Table,
    target: Table,
    ts_col: str,
    key_cols,
    value_col: str,
    widths_seconds,
    to_snapshot_id: Optional[int] = None,
) -> Dict[str, object]:
    """Incremental maintenance of a MULTI-RESOLUTION time rollup: the
    delta (incremental append scan) folds through
    :func:`~iceberg_python_spark.streaming.time_rollup` with
    ``round_dp=None`` (rounding is not associative, so the stored
    partials stay raw — round at query time), then merges into the
    target exactly like :func:`refresh_rollup` (touched-groups-only
    upsert + high-water snapshot property in one transaction =
    idempotent / exactly-once). Group keys are
    (width_s, bucket_start, *key_cols). This is the maintenance tick
    behind :func:`~iceberg_python_spark.streaming.rollup_stream` —
    the hypertable continuous aggregate on live appends."""
    from .streaming import time_rollup

    keys = ["width_s", "bucket_start", *key_cols]
    fns = {"n_events": "sum", "sum_value": "sum", "min_value": "min", "max_value": "max"}
    cur_id = to_snapshot_id
    if cur_id is None:
        cur = source.current_snapshot()
        if cur is None:
            return {"mode": "noop", "source_snapshot_id": None, "affected_groups": 0, "delta_rows": 0}
        cur_id = cur.snapshot_id
    last = target.properties.get(SOURCE_SNAPSHOT_PROP)
    last_id = int(last) if last is not None else None
    if last_id == cur_id:
        return {"mode": "noop", "source_snapshot_id": cur_id, "affected_groups": 0, "delta_rows": 0}
    mode = "full"
    if last_id is not None:
        try:
            if _append_only_chain(source, last_id, cur_id) is not None:
                mode = "incremental"
        except ValueError:
            mode = "full"

    def fold(df):
        return time_rollup(df, ts_col, key_cols, value_col, widths_seconds, round_dp=None)

    if mode == "full":
        full = fold(source.scan(snapshot_id=cur_id).to_df()).localCheckpoint(eager=True)
        n_groups = full.count()
        with target.transaction() as tx:
            tx.overwrite(full)
            tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "full", "source_snapshot_id": cur_id, "affected_groups": n_groups, "delta_rows": None}

    delta = source.incremental_append_scan(
        from_snapshot_id_exclusive=last_id, to_snapshot_id_inclusive=cur_id
    ).to_df()
    partial = fold(delta).localCheckpoint(eager=True)
    affected = partial.count()
    if affected == 0:
        with target.transaction() as tx:
            tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "incremental", "source_snapshot_id": cur_id, "affected_groups": 0, "delta_rows": 0}
    existing = target.scan().to_df().join(partial.select(*keys), keys, "left_semi")
    merged = existing.alias("e").join(partial.alias("d"), keys, "full_outer").select(
        *keys, *[_merge_col(fn, out) for out, fn in fns.items()]
    )
    with target.transaction() as tx:
        tx.upsert(merged, join_cols=keys)
        tx.set_properties({SOURCE_SNAPSHOT_PROP: str(cur_id)})
    return {"mode": "incremental", "source_snapshot_id": cur_id, "affected_groups": affected, "delta_rows": None}


def _append_only_chain(source: Table, last_id: int, cur_id: int):
    """The snapshots between last (exclusive) and cur (inclusive) if
    every logical change in the range is an append — REPLACE
    (compaction) rewrites carry no logical change and are allowed;
    overwrite/delete make the delta non-derivable, so return None to
    force a full recompute. Raises ValueError when last is not an
    ancestor of cur (rollback) or the chain is broken (expired)."""
    from .table import _ancestor_chain

    chain = _ancestor_chain(source.metadata, last_id, cur_id)
    for s in chain:
        if s.operation not in (Operation.APPEND, Operation.REPLACE):
            return None
    return chain
