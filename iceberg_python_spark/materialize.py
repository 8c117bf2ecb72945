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


#: retrieval-index targets record their high-water mark under the same
#: exactly-once contract; a separate key so a table can't be mistaken
#: for a rollup target
INDEX_SNAPSHOT_PROP = "index.source-snapshot-id"
SKETCH_SNAPSHOT_PROP = "sketch.source-snapshot-id"


def refresh_postings(
    source: Table,
    target: Table,
    text_col: str,
    id_col: str,
    positional: bool = False,
    to_snapshot_id: Optional[int] = None,
) -> Dict[str, object]:
    """Incremental maintenance of a persisted retrieval index — BM25
    postings (``build_postings``: one row per (doc, term) with tf and
    dl) or, with ``positional=True``, the positional index
    (``build_positional_index``: one row per (doc, pos, term)) behind
    :func:`~iceberg_python_spark.operators.retrieval.phrase_search`.

    Every index row derives from its OWN document's text only, so on
    an append-only source the delta docs' rows simply APPEND to the
    target — no merge, no read-back, cost O(batch). The corpus
    constants BM25 needs (N, avgdl, df) are metadata-sized aggregates
    over the index itself, recomputed at query time. The append and
    the high-water snapshot property commit in ONE transaction
    (exactly-once, same contract as :func:`refresh_rollup`); a
    non-append-only range (overwrite/delete/rollback) degrades to a
    full rebuild, because dropped docs' postings cannot be subtracted.

    ``id_col`` must be unique across the corpus (appending a second
    version of a doc would double its postings — the same contract as
    the persisted LSH index)."""
    from .operators.retrieval import build_positional_index, build_postings

    build = build_positional_index if positional else build_postings
    cur_id = to_snapshot_id
    if cur_id is None:
        cur = source.current_snapshot()
        if cur is None:
            return {"mode": "noop", "source_snapshot_id": None, "index_rows": 0}
        cur_id = cur.snapshot_id
    last = target.properties.get(INDEX_SNAPSHOT_PROP)
    last_id = int(last) if last is not None else None
    if last_id == cur_id:
        return {"mode": "noop", "source_snapshot_id": cur_id, "index_rows": 0}
    mode = "full"
    if last_id is not None:
        try:
            if _append_only_chain(source, last_id, cur_id) is not None:
                mode = "incremental"
        except ValueError:
            mode = "full"

    if mode == "full":
        rows = build(source.scan(snapshot_id=cur_id).to_df(), text_col, id_col)
        rows = rows.localCheckpoint(eager=True)
        n = rows.count()
        with target.transaction() as tx:
            tx.overwrite(rows)
            tx.set_properties({INDEX_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "full", "source_snapshot_id": cur_id, "index_rows": n}

    delta = source.incremental_append_scan(
        from_snapshot_id_exclusive=last_id, to_snapshot_id_inclusive=cur_id
    ).to_df()
    rows = build(delta, text_col, id_col).localCheckpoint(eager=True)
    n = rows.count()
    with target.transaction() as tx:
        if n:
            tx.append(rows)
        tx.set_properties({INDEX_SNAPSHOT_PROP: str(cur_id)})
    return {"mode": "incremental", "source_snapshot_id": cur_id, "index_rows": n}


_SKETCH_KINDS = ("hll", "theta", "tdigest")


def _all_nullable(dt):
    """Recursively nullable copy of a Spark type — merged sketch rows
    come back through scans/unions with relaxed nullability, and the
    write path must cast them into the target schema."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _all_nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_all_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_all_nullable(dt.keyType), _all_nullable(dt.valueType), True)
    return dt


def create_sketch_table(
    catalog, identifier: str, source: Table, col: str, group_cols, kind: str = "hll",
    partition_spec=None, **kind_kwargs,
):
    """Create an empty sketch target whose schema derives from the
    family's build output (fully nullable — see :func:`_all_nullable`).
    The :func:`refresh_sketch` counterpart of :func:`create_rollup`."""
    if kind not in _SKETCH_KINDS:
        raise ValueError(f"kind must be one of {_SKETCH_KINDS}, got {kind!r}")
    from . import UNPARTITIONED
    from .operators import sketch as _sk
    from .schema import schema_from_spark

    build = getattr(_sk, f"{kind}_build")
    proto = build(source.scan().to_df().limit(0), col, list(group_cols), **kind_kwargs)
    spark = proto.sparkSession
    schema = _all_nullable(proto.schema)
    empty = spark.createDataFrame([], schema)
    return catalog.create_table(
        identifier, schema_from_spark(empty.schema), partition_spec=partition_spec or UNPARTITIONED
    )


def refresh_sketch(
    source: Table,
    target: Table,
    col: str,
    group_cols,
    kind: str = "hll",
    to_snapshot_id: Optional[int] = None,
    **kind_kwargs,
) -> Dict[str, object]:
    """Incremental maintenance of a per-group SKETCH table (HLL /
    theta / t-digest): the batch-per-tick pattern the sketch rows in
    ``operators/sketch.py`` pitch, with the rollup machinery's
    exactly-once contract.

    The delta (incremental append scan) builds one partial sketch row
    per touched group — the only corpus-wide work, and the corpus
    never reshuffles (each family builds partials per partition and
    merges sketch rows). Touched groups' current sketches are read
    back (left-semi prunes the target scan), merged through the
    family's OWN merge (register-max for HLL, exact KMV union for
    theta, centroid re-compression for t-digest), and upserted
    together with the high-water property in one transaction.
    Merge-associativity is what makes this EXACT for HLL/theta: the
    maintained sketch is register-for-register / hash-for-hash equal
    to a from-scratch sketch of the whole corpus; t-digest keeps its
    rank-error bound (compression is order-sensitive but the bound
    is not). Non-append-only history degrades to a full rebuild
    (sketches cannot subtract).

    ``group_cols`` must be non-empty — the group key is the upsert
    join key (sketch a constant column to keep one global row)."""
    if kind not in _SKETCH_KINDS:
        raise ValueError(f"kind must be one of {_SKETCH_KINDS}, got {kind!r}")
    keys = list(group_cols)
    if not keys:
        raise ValueError("refresh_sketch needs >=1 group col (the upsert key)")
    from .operators import sketch as _sk

    build = getattr(_sk, f"{kind}_build")
    _merge_fn = getattr(_sk, f"{kind}_merge")
    # hll_merge is parameter-free (register-max), theta/tdigest merges
    # take their size knob — forward only what each accepts
    import inspect as _inspect

    _merge_params = set(_inspect.signature(_merge_fn).parameters)

    def merge(rows, keys_):
        kw = {k: v for k, v in kind_kwargs.items() if k in _merge_params}
        return _merge_fn(rows, keys_, **kw)
    cur_id = to_snapshot_id
    if cur_id is None:
        cur = source.current_snapshot()
        if cur is None:
            return {"mode": "noop", "source_snapshot_id": None, "affected_groups": 0}
        cur_id = cur.snapshot_id
    last = target.properties.get(SKETCH_SNAPSHOT_PROP)
    last_id = int(last) if last is not None else None
    if last_id == cur_id:
        return {"mode": "noop", "source_snapshot_id": cur_id, "affected_groups": 0}
    mode = "full"
    if last_id is not None:
        try:
            if _append_only_chain(source, last_id, cur_id) is not None:
                mode = "incremental"
        except ValueError:
            mode = "full"

    if mode == "full":
        rows = build(
            source.scan(snapshot_id=cur_id).to_df(), col, keys, **kind_kwargs
        ).localCheckpoint(eager=True)
        n = rows.count()
        with target.transaction() as tx:
            tx.overwrite(rows)
            tx.set_properties({SKETCH_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "full", "source_snapshot_id": cur_id, "affected_groups": n}

    delta = source.incremental_append_scan(
        from_snapshot_id_exclusive=last_id, to_snapshot_id_inclusive=cur_id
    ).to_df()
    partial = build(delta, col, keys, **kind_kwargs).localCheckpoint(eager=True)
    affected = partial.count()
    if affected == 0:
        with target.transaction() as tx:
            tx.set_properties({SKETCH_SNAPSHOT_PROP: str(cur_id)})
        return {"mode": "incremental", "source_snapshot_id": cur_id, "affected_groups": 0}
    existing = target.scan().to_df().join(partial.select(*keys), keys, "left_semi")
    merged = merge(
        existing.unionByName(partial, allowMissingColumns=False), keys
    ).localCheckpoint(eager=True)
    with target.transaction() as tx:
        tx.upsert(merged, join_cols=keys)
        tx.set_properties({SKETCH_SNAPSHOT_PROP: str(cur_id)})
    return {"mode": "incremental", "source_snapshot_id": cur_id, "affected_groups": affected}
