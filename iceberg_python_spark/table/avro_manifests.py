"""Avro manifest interop — open (and write) real Iceberg table metadata.

Real Iceberg tables (written by Spark, Flink, Trino, pyiceberg, …) store
the manifest list and manifests as Avro per the public Iceberg table
spec; this module maps those Avro records into the same entry dicts the
rest of the engine already plans from, so ``StaticTable.from_metadata``
on a foreign table Just Works.

Reference parity:
- manifest-list fields       — pyiceberg/manifest.py:723 (v1/v2/v3)
- manifest entry / data_file — pyiceberg/manifest.py:135-565
- sequence-number inheritance — pyiceberg/manifest.py:869-905
  (null entry sequence number + ADDED status inherits the manifest's
  sequence number from the manifest list)
- binary bound decoding      — pyiceberg/conversions.py (spec Appendix D)

Decoding is name-based over the writer schema embedded in each Avro
file, so v1 (no content/sequence fields, ``added_data_files_count``
naming) and v2/v3 decode through one path with defaults.
"""

from __future__ import annotations

import json
import math
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple

from .. import avro
from ..conversions import from_bytes, to_bytes
from ..partitioning import PartitionSpec
from ..schema import Schema
from ..types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FixedType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    StringType,
    TimestamptzType,
    TimestampType,
    TimeType,
    UUIDType,
)

UNASSIGNED_SEQ = -1


def local_path(path: str) -> str:
    """Strip a file scheme for driver-side local opens; remote reads go
    through :func:`..io.fileio.read_bytes` instead."""
    from ..io.fileio import is_remote, to_local

    return path if is_remote(path) else to_local(path)


def _read_avro(path: str):
    from ..io.fileio import is_remote, read_bytes

    if is_remote(path):
        return avro.read_file(read_bytes(path))
    return avro.read_file(local_path(path))


def _kv_map(v: Any) -> Dict[int, Any]:
    """Iceberg writes int-keyed maps as Avro arrays of {key, value}
    records (logicalType map); plain Avro maps appear as dicts."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return {int(k): val for k, val in v.items()}
    return {int(kv["key"]): kv["value"] for kv in v}


def _first(d: Mapping[str, Any], *names: str, default: Any = None) -> Any:
    for n in names:
        if n in d and d[n] is not None:
            return d[n]
    return default


# ---------------------------------------------------------------------------
# read: manifest list
# ---------------------------------------------------------------------------


def read_avro_manifest_list(
    path: str, spec_by_id: Callable[[int], PartitionSpec], schema: Schema
) -> List[Dict[str, Any]]:
    """Decode an Avro manifest list into the engine's manifest-file dicts."""
    _, _, records = _read_avro(path)
    out = []
    for r in records:
        spec_id = int(_first(r, "partition_spec_id", default=0))
        try:
            spec = spec_by_id(spec_id)
            part_schema = spec.partition_schema(schema)
        except ValueError:
            spec = None
            part_schema = None
        summaries: Dict[str, Dict[str, Any]] = {}
        parts = r.get("partitions") or []
        if spec is not None and part_schema is not None:
            for pf, s in zip(spec.fields, parts):
                t = part_schema.find_field(pf.name).field_type
                lo = from_bytes(s.get("lower_bound"), t)
                hi = from_bytes(s.get("upper_bound"), t)
                summaries[pf.name] = {
                    "lower": lo,
                    "upper": hi,
                    "contains_null": bool(s.get("contains_null", False)),
                    "contains_nan": bool(s.get("contains_nan") or False),
                }
        out.append(
            {
                "manifest_path": r["manifest_path"],
                "added_snapshot_id": _first(r, "added_snapshot_id", default=-1),
                "sequence_number": int(_first(r, "sequence_number", default=0)),
                "min_sequence_number": int(_first(r, "min_sequence_number", default=0)),
                "spec_id": spec_id,
                "content": int(_first(r, "content", default=0)),
                "added_files_count": int(_first(r, "added_files_count", "added_data_files_count", default=0)),
                "existing_files_count": int(
                    _first(r, "existing_files_count", "existing_data_files_count", default=0)
                ),
                "deleted_files_count": int(
                    _first(r, "deleted_files_count", "deleted_data_files_count", default=0)
                ),
                "added_rows_count": int(_first(r, "added_rows_count", default=0)),
                "existing_rows_count": int(_first(r, "existing_rows_count", default=0)),
                "partition_summaries": summaries,
            }
        )
    return out


# ---------------------------------------------------------------------------
# read: manifest
# ---------------------------------------------------------------------------


def read_avro_manifest(
    path: str,
    schema: Schema,
    spec: PartitionSpec,
    manifest: Optional[Mapping[str, Any]] = None,
) -> List[Dict[str, Any]]:
    """Decode an Avro manifest into the engine's entry dicts.

    ``manifest`` is the manifest-list row for this file, used for
    sequence-number / snapshot-id inheritance (reference
    manifest.py:869-905): a null sequence number on an ADDED entry means
    "the manifest's own sequence number"."""
    _, meta, records = _read_avro(path)
    # the manifest header carries its own spec + schema (authoritative for
    # partition decoding — the table's current spec may have evolved)
    spec_id = int(meta.get("partition-spec-id", b"%d" % spec.spec_id))
    schema_id = schema.schema_id
    if "schema" in meta:
        try:
            schema_id = int(json.loads(meta["schema"]).get("schema-id", schema_id))
        except (ValueError, KeyError):
            pass
    inherit_seq = int(manifest.get("sequence_number", 0)) if manifest else 0
    inherit_snap = manifest.get("added_snapshot_id") if manifest else None

    out = []
    for r in records:
        status = int(r.get("status", 1))
        d = r["data_file"]
        seq = r.get("sequence_number")
        if seq is None or seq == UNASSIGNED_SEQ:
            # v1 manifests have no sequence numbers; v2 ADDED entries
            # inherit from the manifest list
            seq = inherit_seq
        snap = r.get("snapshot_id")
        if snap is None:
            snap = inherit_snap if inherit_snap is not None else -1
        partition = dict(d.get("partition") or {})
        bounds_type = lambda fid: schema.find_field(fid).field_type  # noqa: E731
        lowers: Dict[int, Any] = {}
        uppers: Dict[int, Any] = {}
        for fid, b in _kv_map(d.get("lower_bounds")).items():
            try:
                lowers[fid] = from_bytes(b, bounds_type(fid))
            except ValueError:
                continue  # column not in the read schema; bound unusable
        for fid, b in _kv_map(d.get("upper_bounds")).items():
            try:
                uppers[fid] = from_bytes(b, bounds_type(fid))
            except ValueError:
                continue
        data_file = {
            "content": int(_first(d, "content", default=0)),
            "file_path": d["file_path"],
            "file_format": str(d.get("file_format", "PARQUET")).upper(),
            "spec_id": spec_id,
            "schema_id": schema_id,
            "partition": partition,
            "record_count": int(d.get("record_count", 0)),
            "file_size_in_bytes": int(d.get("file_size_in_bytes", 0)),
            "value_counts": _kv_map(d.get("value_counts")),
            "null_value_counts": _kv_map(d.get("null_value_counts")),
            "nan_value_counts": _kv_map(d.get("nan_value_counts")),
            "lower_bounds": lowers,
            "upper_bounds": uppers,
        }
        if d.get("equality_ids"):
            data_file["equality_ids"] = [int(x) for x in d["equality_ids"]]
        out.append(
            {
                "status": status,
                "snapshot_id": snap,
                "sequence_number": int(seq),
                "data_file": data_file,
            }
        )
    return out


# ---------------------------------------------------------------------------
# write: spec-conformant Avro metadata (fixtures + export interop)
# ---------------------------------------------------------------------------


def _avro_type(t: IcebergType, fid: int) -> Any:
    """Iceberg type -> Avro schema node (spec Appendix C mapping)."""
    if isinstance(t, BooleanType):
        return "boolean"
    if isinstance(t, IntegerType):
        return "int"
    if isinstance(t, LongType):
        return "long"
    if isinstance(t, FloatType):
        return "float"
    if isinstance(t, DoubleType):
        return "double"
    if isinstance(t, StringType):
        return "string"
    if isinstance(t, BinaryType):
        return "bytes"
    if isinstance(t, DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(t, TimeType):
        return {"type": "long", "logicalType": "time-micros"}
    if isinstance(t, TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": False}
    if isinstance(t, TimestamptzType):
        return {"type": "long", "logicalType": "timestamp-micros", "adjust-to-utc": True}
    if isinstance(t, UUIDType):
        return {"type": "fixed", "name": f"uuid_{fid}", "size": 16, "logicalType": "uuid"}
    if isinstance(t, FixedType):
        return {"type": "fixed", "name": f"fixed_{fid}", "size": t.length}
    if isinstance(t, DecimalType):
        nbytes = max(1, math.ceil((t.precision * math.log2(10) + 1) / 8))
        return {
            "type": "fixed",
            "name": f"decimal_{fid}",
            "size": nbytes,
            "logicalType": "decimal",
            "precision": t.precision,
            "scale": t.scale,
        }
    raise ValueError(f"no Avro mapping for {t}")


def _int_kv_array(name: str, key_id: int, value_id: int, value_type: Any) -> Dict[str, Any]:
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": value_type, "field-id": value_id},
            ],
        },
    }


def _opt(t: Any) -> List[Any]:
    return ["null", t]


def manifest_entry_avro_schema(part_fields: List[Tuple[str, IcebergType, int]]) -> Dict[str, Any]:
    """v2 manifest_entry writer schema with the given partition struct
    (field-id props per the spec so other readers resolve by ID)."""
    partition = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": name, "type": _opt(_avro_type(t, fid)), "default": None, "field-id": fid}
            for name, t, fid in part_fields
        ],
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition", "type": partition, "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            {"name": "column_sizes", "type": _opt(_int_kv_array("k117_v118", 117, 118, "long")), "default": None, "field-id": 108},
            {"name": "value_counts", "type": _opt(_int_kv_array("k119_v120", 119, 120, "long")), "default": None, "field-id": 109},
            {"name": "null_value_counts", "type": _opt(_int_kv_array("k121_v122", 121, 122, "long")), "default": None, "field-id": 110},
            {"name": "nan_value_counts", "type": _opt(_int_kv_array("k138_v139", 138, 139, "long")), "default": None, "field-id": 137},
            {"name": "lower_bounds", "type": _opt(_int_kv_array("k126_v127", 126, 127, "bytes")), "default": None, "field-id": 125},
            {"name": "upper_bounds", "type": _opt(_int_kv_array("k129_v130", 129, 130, "bytes")), "default": None, "field-id": 128},
            {"name": "key_metadata", "type": _opt("bytes"), "default": None, "field-id": 131},
            {"name": "split_offsets", "type": _opt({"type": "array", "items": "long", "element-id": 133}), "default": None, "field-id": 132},
            {"name": "equality_ids", "type": _opt({"type": "array", "items": "long", "element-id": 136}), "default": None, "field-id": 135},
            {"name": "sort_order_id", "type": _opt("int"), "default": None, "field-id": 140},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": _opt("long"), "default": None, "field-id": 1},
            {"name": "sequence_number", "type": _opt("long"), "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": _opt("long"), "default": None, "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def manifest_list_avro_schema() -> Dict[str, Any]:
    summary = {
        "type": "record",
        "name": "r508",
        "fields": [
            {"name": "contains_null", "type": "boolean", "field-id": 509},
            {"name": "contains_nan", "type": _opt("boolean"), "default": None, "field-id": 518},
            {"name": "lower_bound", "type": _opt("bytes"), "default": None, "field-id": 510},
            {"name": "upper_bound", "type": _opt("bytes"), "default": None, "field-id": 511},
        ],
    }
    return {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_files_count", "type": "int", "field-id": 504},
            {"name": "existing_files_count", "type": "int", "field-id": 505},
            {"name": "deleted_files_count", "type": "int", "field-id": 506},
            {"name": "added_rows_count", "type": "long", "field-id": 512},
            {"name": "existing_rows_count", "type": "long", "field-id": 513},
            {"name": "deleted_rows_count", "type": "long", "field-id": 514},
            {"name": "partitions", "type": _opt({"type": "array", "items": summary, "element-id": 508}), "default": None, "field-id": 507},
            {"name": "key_metadata", "type": _opt("bytes"), "default": None, "field-id": 519},
        ],
    }


def write_avro_manifest(
    path: str,
    entries: List[Dict[str, Any]],
    schema: Schema,
    spec: PartitionSpec,
    format_version: int = 2,
    codec: str = "deflate",
) -> int:
    """Write entries as a spec-conformant v2 Avro manifest; returns the
    file length (the manifest list records it)."""
    part_schema = spec.partition_schema(schema)
    part_fields = [(pf.name, part_schema.find_field(pf.name).field_type, pf.field_id) for pf in spec.fields]
    avsc = manifest_entry_avro_schema(part_fields)

    def enc_bounds(m: Mapping[int, Any]) -> Optional[List[Dict[str, Any]]]:
        if not m:
            return None
        out = []
        for fid, v in m.items():
            try:
                t = schema.find_field(int(fid)).field_type
            except ValueError:
                continue
            out.append({"key": int(fid), "value": to_bytes(v, t)})
        return out or None

    def enc_counts(m: Mapping[int, Any]) -> Optional[List[Dict[str, Any]]]:
        if not m:
            return None
        return [{"key": int(k), "value": int(v)} for k, v in m.items()]

    records = []
    for e in entries:
        d = e["data_file"]
        records.append(
            {
                "status": e["status"],
                "snapshot_id": e["snapshot_id"],
                "sequence_number": e.get("sequence_number"),
                "file_sequence_number": e.get("sequence_number"),
                "data_file": {
                    "content": d.get("content", 0),
                    "file_path": d["file_path"],
                    "file_format": d.get("file_format", "PARQUET"),
                    "partition": {name: d.get("partition", {}).get(name) for name, _t, _f in part_fields},
                    "record_count": d.get("record_count", 0),
                    "file_size_in_bytes": d.get("file_size_in_bytes", 0),
                    "column_sizes": None,
                    "value_counts": enc_counts(d.get("value_counts") or {}),
                    "null_value_counts": enc_counts(d.get("null_value_counts") or {}),
                    "nan_value_counts": enc_counts(d.get("nan_value_counts") or {}),
                    "lower_bounds": enc_bounds(d.get("lower_bounds") or {}),
                    "upper_bounds": enc_bounds(d.get("upper_bounds") or {}),
                    "key_metadata": None,
                    "split_offsets": None,
                    "equality_ids": [int(x) for x in d["equality_ids"]] if d.get("equality_ids") else None,
                    "sort_order_id": None,
                },
            }
        )
    import os as _os

    meta = {
        "schema": json.dumps(schema.to_dict()),
        "schema-id": str(schema.schema_id),
        "partition-spec": json.dumps([f.to_dict() for f in spec.fields]),
        "partition-spec-id": str(spec.spec_id),
        "format-version": str(format_version),
        "content": "deletes" if entries and entries[0]["data_file"].get("content", 0) != 0 else "data",
    }
    avro.write_file(local_path(path), avsc, records, metadata=meta, codec=codec)
    return _os.path.getsize(local_path(path))


def write_avro_manifest_list(
    path: str,
    manifest_files: List[Dict[str, Any]],
    spec: PartitionSpec,
    schema: Schema,
    snapshot_id: int,
    sequence_number: int,
    format_version: int = 2,
    codec: str = "deflate",
) -> None:
    part_schema = spec.partition_schema(schema)

    def enc_summaries(s: Mapping[str, Mapping[str, Any]]) -> Optional[List[Dict[str, Any]]]:
        if not s:
            return None
        out = []
        for pf in spec.fields:
            d = s.get(pf.name)
            if d is None:
                out.append({"contains_null": True, "contains_nan": None, "lower_bound": None, "upper_bound": None})
                continue
            t = part_schema.find_field(pf.name).field_type
            out.append(
                {
                    "contains_null": bool(d.get("contains_null", False)),
                    "contains_nan": bool(d.get("contains_nan", False)),
                    "lower_bound": to_bytes(d["lower"], t) if d.get("lower") is not None else None,
                    "upper_bound": to_bytes(d["upper"], t) if d.get("upper") is not None else None,
                }
            )
        return out

    records = []
    for m in manifest_files:
        records.append(
            {
                "manifest_path": m["manifest_path"],
                "manifest_length": int(m.get("manifest_length", 0)),
                "partition_spec_id": m["spec_id"],
                "content": m.get("content", 0),
                "sequence_number": int(m.get("sequence_number", sequence_number)),
                "min_sequence_number": int(m.get("min_sequence_number", 0)),
                "added_snapshot_id": m.get("added_snapshot_id", snapshot_id),
                "added_files_count": m.get("added_files_count", 0),
                "existing_files_count": m.get("existing_files_count", 0),
                "deleted_files_count": m.get("deleted_files_count", 0),
                "added_rows_count": m.get("added_rows_count", 0),
                "existing_rows_count": m.get("existing_rows_count", 0),
                "deleted_rows_count": m.get("deleted_rows_count", 0),
                "partitions": enc_summaries(m.get("partition_summaries") or {}),
                "key_metadata": None,
            }
        )
    meta = {"snapshot-id": str(snapshot_id), "sequence-number": str(sequence_number), "format-version": str(format_version)}
    avro.write_file(local_path(path), manifest_list_avro_schema(), records, metadata=meta, codec=codec)


# ---------------------------------------------------------------------------
# export: our table -> spec-conformant Iceberg Avro metadata
# ---------------------------------------------------------------------------


def export_avro_metadata(table, dest_dir: str) -> str:
    """Write the table's CURRENT snapshot as real Iceberg v2 metadata
    (metadata.json + Avro manifest list + Avro manifests) under
    ``dest_dir``, referencing the existing parquet data files in place.

    The output is what any spec-conformant reader expects —
    ``StaticTable.from_metadata`` round-trips it, and the Avro files are
    readable by Java Avro (cross-validated in tests). Returns the
    metadata JSON path."""
    import os as _os
    import uuid as _uuid

    from .manifests import CONTENT_DATA, STATUS_DELETED, construct_partition_summaries, read_manifest, read_manifest_list

    meta = table.metadata
    snap = meta.current_snapshot()
    if snap is None:
        raise ValueError("table has no current snapshot to export")
    schema = meta.schema()
    out_meta_dir = _os.path.join(dest_dir, "metadata")
    _os.makedirs(out_meta_dir, exist_ok=True)

    manifest_files = []
    for m in read_manifest_list(snap.manifest_list, meta.spec_by_id, schema):
        spec = meta.spec_by_id(m["spec_id"])
        entries = [
            e
            for e in read_manifest(m["manifest_path"], schema, spec, manifest=m)
            if e["status"] != STATUS_DELETED
        ]
        if not entries:
            continue
        path = _os.path.join(out_meta_dir, f"{_uuid.uuid4()}-m0.avro")
        length = write_avro_manifest(path, entries, schema, spec)
        live_parts = [e["data_file"].get("partition", {}) for e in entries]
        manifest_files.append(
            {
                "manifest_path": path,
                "manifest_length": length,
                "spec_id": spec.spec_id,
                "content": 0 if entries[0]["data_file"].get("content", 0) == CONTENT_DATA else 1,
                "sequence_number": max(e["sequence_number"] for e in entries),
                "min_sequence_number": min(e["sequence_number"] for e in entries),
                "added_snapshot_id": snap.snapshot_id,
                "added_files_count": m.get("added_files_count", len(entries)),
                "existing_files_count": m.get("existing_files_count", 0),
                "deleted_files_count": 0,
                "added_rows_count": m.get("added_rows_count", 0),
                "existing_rows_count": m.get("existing_rows_count", 0),
                "partition_summaries": construct_partition_summaries(live_parts, spec, schema),
            }
        )
    list_path = _os.path.join(out_meta_dir, f"snap-{snap.snapshot_id}-1-{_uuid.uuid4()}.avro")
    write_avro_manifest_list(
        list_path, manifest_files, meta.spec(), schema, snap.snapshot_id, snap.sequence_number
    )

    d = meta.to_dict()
    d["location"] = meta.location  # data files referenced in place
    d["snapshots"] = [
        {
            "snapshot-id": snap.snapshot_id,
            "parent-snapshot-id": None,
            "sequence-number": snap.sequence_number,
            "timestamp-ms": snap.timestamp_ms,
            "manifest-list": list_path,
            "summary": snap.summary,
            "schema-id": snap.schema_id,
        }
    ]
    d["current-snapshot-id"] = snap.snapshot_id
    d["snapshot-log"] = [{"snapshot-id": snap.snapshot_id, "timestamp-ms": snap.timestamp_ms}]
    d["metadata-log"] = []
    d["refs"] = {"main": {"snapshot-id": snap.snapshot_id, "type": "branch"}}
    json_path = _os.path.join(out_meta_dir, "v1.metadata.json")
    with open(json_path, "w") as f:
        json.dump(d, f)
    with open(_os.path.join(out_meta_dir, "version-hint.text"), "w") as f:
        f.write("v1.metadata.json")
    return json_path
