"""Native Spark DataSource integration (PySpark 4 Python DataSource API).

Registers the engine's tables as a first-class Spark format, so the
DataFrame reader surfaces work with no library calls in between:

    from iceberg_python_spark.spark_datasource import register_data_source
    register_data_source(spark)
    df = spark.read.format("iceberg_python_spark").option("table_location", loc).load()
    stream = spark.readStream.format("iceberg_python_spark").option("table_location", loc).load()

Why this exists alongside ``table.scan().to_df()`` (which remains the
primary, fastest path — native JVM parquet scan with pushdown):

- **batch**: one InputPartition per data file, each read by an
  executor-side Python worker with pyarrow and yielded as Arrow record
  batches — a fully distributed read that never touches ``spark._jvm``,
  usable from environments where only the Python plane is available.
- **streaming**: a real Structured Streaming source. Offsets are
  SNAPSHOT IDS — each micro-batch is exactly the rows appended between
  two snapshots (the incremental append scan semantics), so the source
  composes with checkpoints/restarts for exactly-once pipelines without
  the poll-based ``incremental_source`` helper.

Table handle: ``table_location`` (the table root; the current metadata
file is discovered via ``metadata/version-hint.text``, which every
catalog commit writes) or an explicit ``metadata_location``. All IO in
this module is pure Python (pyarrow + fileio's no-JVM paths) because
DataSource code runs inside Python workers with no SparkSession.

Scope (documented, loud): reads the CURRENT schema; data files only —
a table carrying position/equality delete files raises (use
table.scan(), which applies deletes; or compact() first). Filter
pushdown prunes FILES (partition-tuple + min/max-metrics evaluation,
the same pure-Python evaluator stack the native planner uses); row
groups and rows are filtered by Spark after the source, so pruning is
always sound.

Reference anchor: this surface has no pyiceberg equivalent — it is the
Spark-native answer to pyiceberg's role of "library that hands your
engine a table".
"""

from __future__ import annotations

import json
import posixpath
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)


# ---------------------------------------------------------------------------
# pure-Python planning helpers (no SparkSession anywhere in this module)
# ---------------------------------------------------------------------------


def _resolve_metadata_location(options: Dict[str, str]) -> str:
    loc = options.get("metadata_location")
    if loc:
        return loc
    root = options.get("table_location")
    if not root:
        raise ValueError(
            "iceberg_python_spark source needs option 'table_location' (table root) "
            "or 'metadata_location' (explicit metadata JSON)"
        )
    from .io import fileio

    hint = posixpath.join(root, "metadata", "version-hint.text")
    if not fileio.exists(hint):
        raise ValueError(f"no metadata/version-hint.text under {root!r}")
    base = fileio.read_text(hint).strip()
    if "/" in base:
        # full metadata path: the table writes metadata elsewhere via
        # write.metadata.path, but the hint stays at the probe location
        return base
    if not base.endswith(".metadata.json"):
        base = f"v{base}.metadata.json"
    return posixpath.join(root, "metadata", base)


def _load_metadata(options: Dict[str, str]):
    from .table.metadata import TableMetadata

    return TableMetadata.read(_resolve_metadata_location(options))


def _live_data_entries(meta, snapshot) -> List[Tuple[int, Dict[str, Any]]]:
    """(spec_id, data_file) entries of a snapshot; raises on delete
    content (scope)."""
    from .table.manifests import CONTENT_DATA, STATUS_DELETED, read_manifest, read_manifest_list

    if snapshot is None:
        return []
    schema = meta.schema()
    entries: List[Tuple[int, Dict[str, Any]]] = []
    for m in read_manifest_list(snapshot.manifest_list, meta.spec_by_id, schema):
        spec = meta.spec_by_id(m["spec_id"])
        for e in read_manifest(m["manifest_path"], schema, spec, manifest=m):
            if e["status"] == STATUS_DELETED:
                continue
            d = e["data_file"]
            if d.get("content", CONTENT_DATA) != CONTENT_DATA:
                raise ValueError(
                    "iceberg_python_spark source reads data files only; this table "
                    "carries delete files — scan it via table.scan() (which applies "
                    "deletes) or compact() first"
                )
            entries.append((m["spec_id"], d))
    return entries


def _live_data_files(meta, snapshot) -> List[str]:
    """Data-file paths of a snapshot; raises on delete content (scope)."""
    return [d["file_path"] for _sid, d in _live_data_entries(meta, snapshot)]


def _spark_filters_to_expression(filters):
    """Translate PySpark DataSource ``Filter`` dataclasses into the
    engine's unbound expression tree. Returns (expression, supported):
    any filter shape we can't express is left OUT of the expression —
    sound, because file pruning only SKIPS files the expression proves
    empty, and Spark re-applies every filter row-level after the scan."""
    from pyspark.sql import datasource as pds

    from .expressions import (
        AlwaysTrue,
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        IsNull,
        LessThan,
        LessThanOrEqual,
        Not,
        NotNull,
        StartsWith,
        and_all,
    )

    def convert(f):
        attr = getattr(f, "attribute", None)
        if attr is not None and len(attr) != 1:
            return None  # nested column — not addressable by our terms
        name = attr[0] if attr else None
        if isinstance(f, pds.EqualTo):
            return EqualTo(name, f.value)
        if isinstance(f, pds.GreaterThan):
            return GreaterThan(name, f.value)
        if isinstance(f, pds.GreaterThanOrEqual):
            return GreaterThanOrEqual(name, f.value)
        if isinstance(f, pds.LessThan):
            return LessThan(name, f.value)
        if isinstance(f, pds.LessThanOrEqual):
            return LessThanOrEqual(name, f.value)
        if isinstance(f, pds.In):
            return In(name, list(f.values))
        if isinstance(f, pds.IsNull):
            return IsNull(name)
        if isinstance(f, pds.IsNotNull):
            return NotNull(name)
        if isinstance(f, pds.StringStartsWith):
            return StartsWith(name, f.value)
        if isinstance(f, pds.Not):
            child = convert(f.child)
            return Not(child) if child is not None else None
        return None

    converted = [convert(f) for f in filters]
    supported = [c for c in converted if c is not None]
    return (and_all(supported) if supported else AlwaysTrue()), len(supported)


def _prune_entries(meta, entries, expr):
    """File-level pruning with the SAME pure-Python evaluator stack the
    native scan's driver planner uses (plan_files): bind the filter to
    the current schema, project it per-spec into partition space for
    exact partition-tuple evaluation, and bound-check column min/max/
    null metrics. Advisory-only: a kept file may still contain no
    matching rows (Spark filters after the scan)."""
    from .expressions import AlwaysFalse, AlwaysTrue, bind
    from .expressions.visitors import expression_evaluator, inclusive_metrics_evaluator

    bound = bind(expr, meta.schema())
    if isinstance(bound, AlwaysTrue):
        return entries
    if isinstance(bound, AlwaysFalse):
        return []
    metrics_eval = inclusive_metrics_evaluator(bound)
    part_eval_by_spec: Dict[int, Any] = {}
    out = []
    for spec_id, d in entries:
        if spec_id not in part_eval_by_spec:
            spec = meta.spec_by_id(spec_id)
            pf = spec.inclusive_projection(meta.schema(), bound)
            part_eval_by_spec[spec_id] = None if isinstance(pf, AlwaysTrue) else (
                AlwaysFalse() if isinstance(pf, AlwaysFalse) else expression_evaluator(pf)
            )
        pe = part_eval_by_spec[spec_id]
        if isinstance(pe, AlwaysFalse):
            continue
        if pe is not None and not pe(d.get("partition", {})):
            continue
        if not metrics_eval(d):
            continue
        out.append((spec_id, d))
    return out


def _appended_files_between(meta, from_id: Optional[int], to_id: Optional[int]) -> List[str]:
    """ADDED data files of append snapshots in (from_id, to_id] —
    incremental-append-scan semantics, pure Python."""
    from .table import Operation, _ancestor_chain
    from .table.manifests import CONTENT_DATA, STATUS_ADDED, read_manifest, read_manifest_list

    chain = [s for s in _ancestor_chain(meta, from_id, to_id) if s.operation == Operation.APPEND]
    schema = meta.schema()
    paths: List[str] = []
    # Attribute each manifest to exactly ONE snapshot (the one that
    # added it): a manifest carried forward into a later snapshot's
    # manifest list still has its original added_snapshot_id and ADDED
    # entries, so filtering against the whole chain would double-count
    # files whenever the range spans multiple appends (backfill/restart).
    for s in chain:
        for m in read_manifest_list(s.manifest_list, meta.spec_by_id, schema):
            if m.get("added_snapshot_id") != s.snapshot_id:
                continue
            spec = meta.spec_by_id(m["spec_id"])
            for e in read_manifest(m["manifest_path"], schema, spec, manifest=m):
                d = e["data_file"]
                if (
                    e["status"] == STATUS_ADDED
                    and e["snapshot_id"] == s.snapshot_id
                    and d.get("content", CONTENT_DATA) == CONTENT_DATA
                ):
                    paths.append(d["file_path"])
    return paths


def _arrow_batches_for_file(
    path: str, field_names: Sequence[str], target: Optional[Any] = None
) -> Iterator[Any]:
    """Read one parquet file with pyarrow, projected+reordered to the
    table schema by name (absent columns filled with nulls). ``target``
    (a pyarrow schema over exactly ``field_names``) types the null fill
    and casts mismatched physical types — needed when the file set
    spans added-column schema evolution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .io import fileio

    if fileio.is_remote(path):
        import io as _io

        src = _io.BytesIO(fileio.read_bytes(path))
    else:
        src = fileio.to_local(path)
    # project at the parquet reader: only the requested columns decode
    present = pq.ParquetFile(src).schema_arrow.names
    want = [n for n in field_names if n in present]
    table = pq.read_table(src, columns=want)
    cols = []
    n = table.num_rows
    for name in field_names:
        t = target.field(name).type if target is not None else None
        if name in table.column_names:
            col = table.column(name)
            if t is not None and col.type != t:
                col = col.cast(t)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=t) if t is not None else pa.nulls(n))
    out = pa.table(dict(zip(field_names, cols)))
    yield from out.to_batches(max_chunksize=1 << 16)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class IcebergBatchReader(DataSourceReader):
    """One InputPartition per data file; each executor Python worker
    reads its file with pyarrow and yields Arrow record batches.
    ``pushFilters`` prunes FILES (partition tuples + min/max metrics,
    the native planner's evaluator stack); every filter is returned to
    Spark for row-level application, so pruning is advisory and always
    sound."""

    def __init__(self, options: Dict[str, str]):
        self.options = dict(options)
        self._meta = _load_metadata(self.options)
        self._field_names = [f.name for f in self._meta.schema().fields]
        snapshot_id = self.options.get("snapshot_id")
        snap = (
            self._meta.snapshot_by_id(int(snapshot_id))
            if snapshot_id is not None
            else self._meta.current_snapshot()
        )
        self._entries = _live_data_entries(self._meta, snap)

    def pushFilters(self, filters):
        expr, n_supported = _spark_filters_to_expression(filters)
        if n_supported:
            self._entries = _prune_entries(self._meta, self._entries, expr)
        # row-level filtering stays with Spark: file skipping is advisory
        return filters

    def partitions(self) -> List[InputPartition]:
        paths = [d["file_path"] for _sid, d in self._entries]
        return [_FilePartition(p) for p in paths] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return _arrow_batches_for_file(partition.path, self._field_names)


class _ManifestChunkPartition(InputPartition):
    """A slice of ONE path-manifest part file: rows [offset, offset+count).
    The partition handle carries the manifest part path, never the data
    file paths themselves — the driver's memory stays O(task count)."""

    def __init__(self, manifest_part: str, offset: int, count: int):
        self.manifest_part = manifest_part
        self.offset = offset
        self.count = count


class IcebergPlannedReader(DataSourceReader):
    """Executor-side read of a PRE-PLANNED file set: ``path_manifest_dir``
    points at a parquet directory (written by the engine's distributed
    planner as a Spark job) whose rows carry ``file_path``. The driver
    reads ONLY the part-file footers (row counts, O(part files)) to cut
    chunk handles; each executor task opens its manifest slice and
    streams the listed data files as Arrow batches. This is how a scan
    over 10^7 surviving files avoids materializing the path list on the
    driver — the known limit of the collect-based distributed planner
    (SCALE.md r08).

    ``lineage=true`` (the streamed MoR mode): the trailing
    ``_ips_file`` / ``_ips_pos`` / ``_ips_seq`` fields of
    ``schema_json`` are SYNTHESIZED per batch — the file's plan path,
    the physical row position (running index over the file's batches,
    exact because the file is read fully and in order), and the file's
    data sequence number carried in the path manifest. The engine
    anti-joins position/equality deletes against these after the scan —
    deletes stream executor-side too, never through the driver."""

    LINEAGE_FIELDS = ("_ips_file", "_ips_pos", "_ips_seq")

    def __init__(self, options: Dict[str, str]):
        self.options = dict(options)
        self._dir = self.options["path_manifest_dir"]
        self._lineage = str(self.options.get("lineage", "false")).lower() == "true"
        all_fields = [f["name"] for f in json.loads(self.options["schema_json"])["fields"]]
        self._fields = [f for f in all_fields if f not in self.LINEAGE_FIELDS]
        self._files_per_task = max(1, int(self.options.get("files_per_task", "1")))

    @staticmethod
    def _open_manifest(path: str):
        """Seekable handle on a manifest part: remote goes through the
        pyarrow FileSystem (range reads — the footer probe must not
        download the file), local by path."""
        from .io import fileio

        if fileio.is_remote(path):
            fs, rel = fileio._pa_fs(path)
            return fs.open_input_file(rel)
        return fileio.to_local(path)

    def partitions(self) -> List[InputPartition]:
        import pyarrow.parquet as pq

        from .io import fileio

        parts: List[InputPartition] = []
        for part in sorted(fileio.list_files(self._dir, suffix=".parquet", spark=None)):
            n = pq.ParquetFile(self._open_manifest(part)).metadata.num_rows
            for off in range(0, n, self._files_per_task):
                parts.append(
                    _ManifestChunkPartition(part, off, min(self._files_per_task, n - off))
                )
        return parts or [_ManifestChunkPartition("", 0, 0)]

    def read(self, partition: _ManifestChunkPartition):
        if not partition.manifest_part:
            return iter(())

        def gen():
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql import types as T
            from pyspark.sql.pandas.types import to_arrow_schema

            from .io import fileio

            full = to_arrow_schema(
                T.StructType.fromJson(json.loads(self.options["schema_json"]))
            )
            if self._lineage:
                data_target = pa.schema([full.field(n) for n in self._fields])
            else:
                data_target = full
            mcols = ["file_path"] + (["sequence_number"] if self._lineage else [])
            chunk = pq.read_table(
                self._open_manifest(partition.manifest_part), columns=mcols
            ).slice(partition.offset, partition.count)
            seqs = (
                chunk.column("sequence_number").to_pylist()
                if self._lineage
                else [None] * chunk.num_rows
            )
            for path, seq in zip(chunk.column("file_path").to_pylist(), seqs):
                if not self._lineage:
                    yield from _arrow_batches_for_file(path, self._fields, target=data_target)
                    continue
                off = 0
                for b in _arrow_batches_for_file(path, self._fields, target=data_target):
                    n = b.num_rows
                    arrays = list(b.columns) + [
                        pa.repeat(pa.scalar(path, pa.string()), n),
                        pa.array(range(off, off + n), pa.int64()),
                        pa.repeat(pa.scalar(seq, pa.int64()), n),
                    ]
                    off += n
                    yield pa.RecordBatch.from_arrays(arrays, schema=full)

        return gen()


class IcebergStreamReader(DataSourceStreamReader):
    """Structured Streaming source over append snapshots, PARTITIONED:
    offset = {"snapshot_id": id} (-1 = before the first snapshot), each
    micro-batch covers the snapshots in (start, end], and
    ``partitions(start, end)`` returns one InputPartition per data file
    appended in that range. Only the manifest walk happens driver-side
    (metadata-scale); the rows themselves are read by executor Python
    workers as Arrow record batches — a large backfill batch (first
    batch = every existing append) therefore fans out across the
    cluster instead of materializing on the driver, matching the batch
    reader's shape."""

    def __init__(self, options: Dict[str, str]):
        self.options = dict(options)
        meta = _load_metadata(self.options)
        self._field_names = [f.name for f in meta.schema().fields]
        start = self.options.get("starting_snapshot_id", self.options.get("starting-snapshot-id"))
        self._start = int(start) if start is not None else -1

    def initialOffset(self) -> dict:
        return {"snapshot_id": self._start}

    def latestOffset(self) -> dict:
        meta = _load_metadata(self.options)
        current = meta.current_snapshot_id
        return {"snapshot_id": self._start if current is None else current}

    def partitions(self, start: dict, end: dict) -> List[InputPartition]:
        start_id = start.get("snapshot_id", -1)
        from_id = None if start_id == -1 else start_id
        meta = _load_metadata(self.options)
        paths = _appended_files_between(meta, from_id, end.get("snapshot_id"))
        # Spark requires >=1 partition per planned batch (an equal
        # start/end replay plans an empty range): a sentinel empty
        # partition yields zero rows
        return [_FilePartition(p) for p in paths] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return _arrow_batches_for_file(partition.path, self._field_names)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint


# ---------------------------------------------------------------------------
# write path (PySpark 4 DataSourceWriter protocol — VERDICT r10 missing #2)
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    """Per-task commit message: the written data files, each as
    (path, footer stats, partition dict — internal values)."""

    def __init__(self, files: List[Tuple[str, Dict[str, Any], Dict[str, Any]]]):
        self.files = files


def _writer_catalog(options: Dict[str, str]):
    """Reconstruct the committing catalog inside the driver-side Python
    worker (DataSource code never sees the user's SparkSession or
    objects — everything must rebuild from string options). SQLite is
    the one pointer store whose full state lives on disk under the
    warehouse, so (warehouse, catalog_name) suffices; service-backed
    catalogs would additionally need credentials, which don't belong in
    writer options."""
    from .catalog import SqliteCatalog

    warehouse = options.get("warehouse")
    table = options.get("table")
    if not warehouse or not table:
        raise ValueError(
            "iceberg_python_spark writes need options 'warehouse' and 'table' "
            "(the committing catalog is rebuilt from them; reads only need "
            "'table_location')"
        )
    ctype = options.get("catalog_type", "sqlite")
    if ctype != "sqlite":
        raise NotImplementedError(
            f"DataSource writes commit via a SqliteCatalog pointer store; "
            f"catalog_type={ctype!r} needs credentials that don't belong in "
            "writer options — use the library API (table.append) instead"
        )
    return SqliteCatalog(options.get("catalog_name", "entry"), warehouse, None)


class IcebergBatchWriter(DataSourceArrowWriter):
    """``df.write.format("iceberg_python_spark")`` — the write half of
    the DataSource (reads shipped in r08). Each executor task streams
    its Arrow record batches into parquet data files placed by the
    table's location provider (object-storage entropy layout included)
    and returns (path, footer stats, partition tuple) triples as its
    commit message; the driver side then assembles the DataFile
    entries and commits ONE engine snapshot through the catalog CAS —
    append for SaveMode.append, overwrite (remove-all + add) for
    SaveMode.overwrite. Data rows never pass through the driver; abort
    removes the orphaned files.

    Partitioned tables (r11): partition tuples are computed row-wise
    with the engine's own Python transform callables (identity /
    bucket / truncate / temporal — the same code the pruning
    evaluators trust), rows group per batch via pandas, and each task
    keeps a bounded pool of open per-partition writers (evicted files
    simply become additional DataFiles). For best file sizes
    repartition the DataFrame by the partition source columns first —
    the DataSource cannot reshuffle for you; ``table.append(df)`` can.

    Scope (loud): parquet format only."""

    def __init__(self, options: Dict[str, str], spark_schema, overwrite: bool):
        self.options = dict(options)
        self.overwrite = overwrite
        cat = _writer_catalog(self.options)
        table = cat.load_table(self.options["table"])
        meta = table.metadata
        fmt = (meta.properties.get("write.format.default") or "parquet").lower()
        if fmt != "parquet":
            raise NotImplementedError(
                f"DataSource writes emit parquet; write.format.default={fmt!r} "
                "— use table.append(df)"
            )
        table_schema = meta.schema()
        want = {f.name: f.dataType for f in table_schema.to_spark().fields}
        got = {f.name: f.dataType for f in spark_schema.fields}
        if want != got:
            raise ValueError(
                f"DataFrame schema {sorted(got)} does not match table schema "
                f"{sorted(want)} (names and types must align exactly)"
            )
        self.location = meta.location
        self.properties = dict(meta.properties or {})
        self.schema_json = json.dumps(table_schema.to_dict())
        self.table_schema = table_schema  # picklable, ships to executors
        self.spec = meta.spec()
        self.spec_id = self.spec.spec_id
        self.schema_id = table_schema.schema_id
        # fail at PLANNING time if any partition transform cannot run
        # Python-side (void/unknown cannot place rows)
        for pf in self.spec.fields:
            src = table_schema.find_field(pf.source_id).field_type
            try:
                pf.transform.transform(src)
            except Exception as exc:
                raise NotImplementedError(
                    f"partition transform {pf.transform.name!r} on field "
                    f"{pf.name!r} has no Python-side evaluator ({exc}); "
                    "use table.append(df)"
                )
        import uuid as _uuid

        self.commit_uuid = str(_uuid.uuid4())

    # -- executor side ------------------------------------------------------
    _MAX_OPEN_WRITERS = 16

    def _open_writer(self, provider, schema, partition: Dict[str, Any]):
        import os as _os
        import uuid as _uuid

        import pyarrow.parquet as pq

        from .io.fileio import is_remote, to_local

        ppath = (
            self.spec.partition_to_path(partition, self.table_schema) if partition else None
        )
        fname = f"{self.commit_uuid}-{_uuid.uuid4()}.parquet"
        path = provider.new_data_location(fname, ppath)
        where = path if is_remote(path) else to_local(path)
        if not is_remote(path):
            _os.makedirs(_os.path.dirname(where), exist_ok=True)
        return path, pq.ParquetWriter(where, schema)

    def write(self, iterator) -> _FileCommit:
        import pyarrow as pa

        from .expressions import to_internal
        from .io.write import _file_stats_fn, metrics_modes_for_schema
        from .locations import load_location_provider
        from .schema import Schema

        provider = load_location_provider(self.location, self.properties)
        spec = self.spec
        converters = [
            (
                pf.name,
                self.table_schema.find_field(pf.source_id).name,
                self.table_schema.find_field(pf.source_id).field_type,
                pf.transform.transform(self.table_schema.find_field(pf.source_id).field_type),
            )
            for pf in spec.fields
        ]
        # (partition key tuple) -> [path, writer, partition dict]; a
        # bounded pool — an evicted partition that reappears simply
        # opens another file (more DataFiles, never wrong data)
        open_writers: Dict[Tuple, list] = {}
        done: List[Tuple[str, Dict[str, Any]]] = []  # (path, partition)

        def close_one(key) -> None:
            path, w, part = open_writers.pop(key)
            w.close()
            done.append((path, part))

        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if not converters:
                    groups = {(): (None, {})}
                    idx_by_key = {(): None}  # whole batch
                else:
                    import pandas as _pd

                    pdf = batch.to_pandas()
                    keys = []
                    for _pname, src_name, src_type, tf in converters:
                        keys.append(
                            pdf[src_name].map(
                                lambda v: None if _pd.isna(v) else tf(to_internal(v, src_type))
                            )
                        )
                    kf = _pd.concat(keys, axis=1)
                    kf.columns = [c[0] for c in converters]
                    idx_by_key = _pd.DataFrame(kf).groupby(
                        list(kf.columns), dropna=False, sort=False
                    ).indices
                    # pandas promotes int key columns with nulls to float
                    # — re-coerce through to_internal on the transform's
                    # RESULT type so partition dicts hold spec-typed values
                    rtypes = [
                        pf.transform.result_type(self.table_schema.find_field(pf.source_id).field_type)
                        for pf in spec.fields
                    ]
                    groups = {}
                    for key in idx_by_key:
                        kt = key if isinstance(key, tuple) else (key,)
                        kt = tuple(
                            None if _pd.isna(k) else to_internal(k, rt)
                            for k, rt in zip(kt, rtypes)
                        )
                        groups[key] = (None, dict(zip([c[0] for c in converters], kt)))
                for key, (_, part) in groups.items():
                    sub = (
                        batch
                        if idx_by_key.get(key) is None
                        else batch.take(pa.array(idx_by_key[key]))
                    )
                    if sub.num_rows == 0:
                        continue
                    hkey = key if isinstance(key, tuple) else (key,)
                    if hkey not in open_writers:
                        if len(open_writers) >= self._MAX_OPEN_WRITERS:
                            close_one(next(iter(open_writers)))
                        path, w = self._open_writer(provider, batch.schema, part)
                        open_writers[hkey] = [path, w, part]
                    open_writers[hkey][1].write_table(pa.Table.from_batches([sub]))
        finally:
            for key in list(open_writers):
                close_one(key)
        if not done:
            return _FileCommit([])  # empty task — no files
        modes = metrics_modes_for_schema(Schema.from_dict(json.loads(self.schema_json)), self.properties)
        fn = _file_stats_fn(
            self.schema_json,
            None,
            json.dumps({str(k): list(v) for k, v in modes.items()}) if modes else None,
        )
        return _FileCommit([(path, fn(path)[1], part) for path, part in done])

    # -- driver side ----------------------------------------------------------
    def _data_files(self, messages) -> List[Dict[str, Any]]:
        files = []
        for m in messages:
            if m is None:
                continue
            for path, st, partition in m.files:
                files.append(
                    {
                        "content": 0,
                        "file_path": path,
                        "file_format": "PARQUET",
                        "spec_id": self.spec_id,
                        "schema_id": self.schema_id,
                        "partition": partition,
                        "record_count": st["record_count"],
                        "file_size_in_bytes": st["file_size_in_bytes"],
                        "value_counts": st["value_counts"],
                        "null_value_counts": st["null_value_counts"],
                        "nan_value_counts": st["nan_value_counts"],
                        "lower_bounds": st["lower_bounds"],
                        "upper_bounds": st["upper_bounds"],
                    }
                )
        return files

    def _commit(self, files: List[Dict[str, Any]], snapshot_properties=None) -> None:
        from .table.manifests import CONTENT_DATA
        from .table.snapshots import Operation

        cat = _writer_catalog(self.options)
        table = cat.load_table(self.options["table"])
        with table.transaction() as tx:
            if self.overwrite:
                parent = tx._parent()
                removed = {
                    e["data_file"]["file_path"]
                    for e in (table._live_entries(parent) if parent else [])
                    if e["data_file"].get("content", 0) == CONTENT_DATA
                }
                tx._commit_snapshot(
                    Operation.OVERWRITE, files, removed_paths=removed,
                    snapshot_properties=snapshot_properties,
                )
            else:
                tx._commit_snapshot(
                    Operation.APPEND, files, snapshot_properties=snapshot_properties
                )

    def commit(self, messages) -> None:
        self._commit(self._data_files(messages))

    def abort(self, messages) -> None:
        from .io import fileio

        for m in messages or []:
            for path, _st, _part in getattr(m, "files", None) or []:
                try:
                    fileio.remove(path)
                except Exception:
                    pass  # abort is best-effort; orphan sweeps catch the rest


class IcebergStreamWriter(IcebergBatchWriter, DataSourceStreamArrowWriter):
    """``df.writeStream.format("iceberg_python_spark")`` — one engine
    snapshot per micro-batch, exactly-once via the same (query-key,
    batch-id) snapshot markers the library's foreachBatch sinks use:
    a replayed batch finds its marker on the branch, skips the commit,
    and removes the files the replay just wrote. The marker key comes
    from the ``query_key`` option (set it per distinct sink; default
    derives from the table identity)."""

    def __init__(self, options: Dict[str, str], spark_schema, overwrite: bool):
        super().__init__(options, spark_schema, overwrite=False)
        self.query_key = options.get("query_key", f"datasource-write-{options['table']}")

    def commit(self, messages, batchId: int) -> None:
        from .streaming import _last_committed_batch_id

        cat = _writer_catalog(self.options)
        table = cat.load_table(self.options["table"])
        last = _last_committed_batch_id(table, self.query_key)
        if last is not None and batchId <= last:
            self.abort(messages, batchId)  # replay — drop the duplicate files
            return
        self._commit(
            self._data_files(messages),
            snapshot_properties={
                "streaming-query": self.query_key,
                "streaming-batch-id": str(batchId),
            },
        )

    def abort(self, messages, batchId: int) -> None:
        IcebergBatchWriter.abort(self, messages)


class IcebergDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "iceberg_python_spark"

    def schema(self):
        from pyspark.sql import types as T

        if "path_manifest_dir" in self.options:
            # planned-read mode: the scan ships the (projected) schema
            # explicitly — there is no table handle to derive it from
            return T.StructType.fromJson(json.loads(self.options["schema_json"]))
        meta = _load_metadata(self.options)
        base = meta.schema().to_spark()
        # plain fields only: the streaming runner round-trips this schema
        # through Arrow and asserts equality — our field-id metadata (and
        # non-null flags the Python rows can't prove) would break it
        return T.StructType([T.StructField(f.name, f.dataType, True) for f in base.fields])

    def reader(self, schema) -> DataSourceReader:
        if "path_manifest_dir" in self.options:
            return IcebergPlannedReader(self.options)
        return IcebergBatchReader(self.options)

    def streamReader(self, schema) -> IcebergStreamReader:
        return IcebergStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> IcebergBatchWriter:
        return IcebergBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> IcebergStreamWriter:
        return IcebergStreamWriter(self.options, schema, overwrite)


def register_data_source(spark) -> None:
    """Register the format with a SparkSession:
    ``spark.read.format("iceberg_python_spark")`` et al.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (a runtime
    SQL conf, default false): Spark 4.1 refuses to plan a Python source
    whose reader implements ``pushFilters`` while the conf is off, and
    our batch reader implements it for file-level pruning. NOTE: the
    conf is session-wide — it changes planning for EVERY Python data
    source in the session (they all gain pushdown planning; sources not
    implementing pushFilters are unaffected). It is only set when still
    unset, so an explicit user choice (either value) is never
    overridden (ADVICE r8). Sessions registering the class manually
    must set the conf themselves (the Spark error says exactly that)."""
    key = "spark.sql.python.filterPushdown.enabled"
    if spark.conf.get(key, None) is None:
        spark.conf.set(key, "true")
    spark.dataSource.register(IcebergDataSource)
