"""Table metadata — the spec's metadata.json shape.

Reference: pyiceberg/table/metadata.py:128 (TableMetadataCommonFields).
One JSON file per metadata version at ``<location>/metadata/vN.metadata.json``
plus a ``version-hint.text`` pointer for catalog-free (static) opens.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from ..partitioning import PartitionSpec
from ..schema import Schema
from .snapshots import Snapshot, SnapshotLogEntry


@dataclass
class SortField:
    source_id: int
    transform: str = "identity"
    direction: str = "asc"
    null_order: str = "nulls-first"

    def to_dict(self) -> Dict[str, Any]:
        return {
            "source-id": self.source_id,
            "transform": self.transform,
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SortField":
        return cls(d["source-id"], d.get("transform", "identity"), d.get("direction", "asc"), d.get("null-order", "nulls-first"))


@dataclass
class SortOrder:
    order_id: int = 0
    fields: List[SortField] = field(default_factory=list)

    @property
    def is_unsorted(self) -> bool:
        return len(self.fields) == 0

    def to_dict(self) -> Dict[str, Any]:
        return {"order-id": self.order_id, "fields": [f.to_dict() for f in self.fields]}

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SortOrder":
        return cls(d["order-id"], [SortField.from_dict(f) for f in d.get("fields", [])])


UNSORTED = SortOrder(0, [])

MAIN_BRANCH = "main"


@dataclass
class SnapshotRef:
    """Branch/tag pointer with optional retention policy (reference
    table/refs.py:41; spec: min-snapshots-to-keep and max-snapshot-age-ms
    govern branch-ancestor expiration, max-ref-age-ms expires the ref
    itself — branch-only fields rejected on tags like the reference's
    validators, refs.py:49-60)."""

    snapshot_id: int
    type: str = "branch"  # "branch" | "tag"
    min_snapshots_to_keep: Optional[int] = None
    max_snapshot_age_ms: Optional[int] = None
    max_ref_age_ms: Optional[int] = None

    def __post_init__(self) -> None:
        if self.min_snapshots_to_keep is not None and self.min_snapshots_to_keep <= 0:
            raise ValueError("min-snapshots-to-keep must be positive")
        if self.max_snapshot_age_ms is not None and self.max_snapshot_age_ms <= 0:
            raise ValueError("max-snapshot-age-ms must be positive")
        if self.max_ref_age_ms is not None and self.max_ref_age_ms <= 0:
            raise ValueError("max-ref-age-ms must be positive")
        if self.type == "tag" and (
            self.min_snapshots_to_keep is not None or self.max_snapshot_age_ms is not None
        ):
            raise ValueError("tags only support max-ref-age-ms retention")

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {"snapshot-id": self.snapshot_id, "type": self.type}
        if self.min_snapshots_to_keep is not None:
            d["min-snapshots-to-keep"] = self.min_snapshots_to_keep
        if self.max_snapshot_age_ms is not None:
            d["max-snapshot-age-ms"] = self.max_snapshot_age_ms
        if self.max_ref_age_ms is not None:
            d["max-ref-age-ms"] = self.max_ref_age_ms
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SnapshotRef":
        return cls(
            d["snapshot-id"],
            d.get("type", "branch"),
            d.get("min-snapshots-to-keep"),
            d.get("max-snapshot-age-ms"),
            d.get("max-ref-age-ms"),
        )


@dataclass
class TableMetadata:
    format_version: int
    table_uuid: str
    location: str
    last_sequence_number: int
    last_updated_ms: int
    last_column_id: int
    schemas: List[Schema]
    current_schema_id: int
    partition_specs: List[PartitionSpec]
    default_spec_id: int
    last_partition_id: int
    sort_orders: List[SortOrder]
    default_sort_order_id: int
    properties: Dict[str, str]
    current_snapshot_id: Optional[int]
    snapshots: List[Snapshot]
    snapshot_log: List[SnapshotLogEntry]
    metadata_log: List[Dict[str, Any]]
    refs: Dict[str, SnapshotRef]
    # spec-shaped raw dicts (snapshot-id, statistics-path,
    # file-size-in-bytes, file-footer-size-in-bytes, blob-metadata);
    # reference table/statistics.py StatisticsFile
    statistics: List[Dict[str, Any]] = field(default_factory=list)
    # spec-shaped raw dicts (snapshot-id, statistics-path,
    # file-size-in-bytes); reference table/statistics.py
    # PartitionStatisticsFile
    partition_statistics: List[Dict[str, Any]] = field(default_factory=list)
    # v3 row lineage: the next unassigned implicit row id (reference
    # table/metadata.py:574; commits assign snapshot.first-row-id from it)
    next_row_id: Optional[int] = None

    # -- lookups -----------------------------------------------------------
    def schema(self) -> Schema:
        return self.schema_by_id(self.current_schema_id)

    def schema_by_id(self, schema_id: int) -> Schema:
        for s in self.schemas:
            if s.schema_id == schema_id:
                return s
        raise ValueError(f"no schema with id {schema_id}")

    def spec(self) -> PartitionSpec:
        return self.spec_by_id(self.default_spec_id)

    def spec_by_id(self, spec_id: int) -> PartitionSpec:
        for s in self.partition_specs:
            if s.spec_id == spec_id:
                return s
        raise ValueError(f"no partition spec with id {spec_id}")

    def sort_order(self) -> SortOrder:
        for o in self.sort_orders:
            if o.order_id == self.default_sort_order_id:
                return o
        return UNSORTED

    def snapshot_by_id(self, snapshot_id: int) -> Optional[Snapshot]:
        for s in self.snapshots:
            if s.snapshot_id == snapshot_id:
                return s
        return None

    def current_snapshot(self) -> Optional[Snapshot]:
        if self.current_snapshot_id is None:
            return None
        return self.snapshot_by_id(self.current_snapshot_id)

    def snapshot_by_name(self, name: str) -> Optional[Snapshot]:
        ref = self.refs.get(name)
        return self.snapshot_by_id(ref.snapshot_id) if ref else None

    def snapshot_as_of_timestamp(self, timestamp_ms: int) -> Optional[Snapshot]:
        best = None
        for entry in self.snapshot_log:
            if entry.timestamp_ms <= timestamp_ms:
                best = entry.snapshot_id
        return self.snapshot_by_id(best) if best is not None else None

    # -- serialization -----------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return {
            "format-version": self.format_version,
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "last-column-id": self.last_column_id,
            "schemas": [s.to_dict() for s in self.schemas],
            "current-schema-id": self.current_schema_id,
            "partition-specs": [s.to_dict() for s in self.partition_specs],
            "default-spec-id": self.default_spec_id,
            "last-partition-id": self.last_partition_id,
            "sort-orders": [o.to_dict() for o in self.sort_orders],
            "default-sort-order-id": self.default_sort_order_id,
            "properties": self.properties,
            "current-snapshot-id": self.current_snapshot_id,
            "snapshots": [s.to_dict() for s in self.snapshots],
            "snapshot-log": [e.to_dict() for e in self.snapshot_log],
            "metadata-log": self.metadata_log,
            "refs": {k: v.to_dict() for k, v in self.refs.items()},
            "statistics": self.statistics,
            "partition-statistics": self.partition_statistics,
            **({"next-row-id": self.next_row_id} if self.next_row_id is not None else {}),
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TableMetadata":
        # v1 metadata interop (reference table/metadata.py:393
        # TableMetadataV1.construct_refs/to_v2): singular "schema" /
        # "partition-spec" forms predate the v2 lists
        if "schemas" in d:
            schemas = [Schema.from_dict(s) for s in d["schemas"]]
            current_schema_id = d["current-schema-id"]
        else:
            schemas = [Schema.from_dict(d["schema"])]
            current_schema_id = schemas[0].schema_id
        if "partition-specs" in d:
            specs = [PartitionSpec.from_dict(s) for s in d["partition-specs"]]
            default_spec_id = d["default-spec-id"]
        else:
            from ..partitioning import PartitionField
            from ..transforms import parse_transform

            fields = [
                PartitionField(
                    f["source-id"], f.get("field-id", 1000 + i), parse_transform(f["transform"]), f["name"]
                )
                for i, f in enumerate(d.get("partition-spec", []))
            ]
            specs = [PartitionSpec(*fields, spec_id=0)]
            default_spec_id = 0
        return cls(
            format_version=d["format-version"],
            table_uuid=d["table-uuid"],
            location=d["location"],
            last_sequence_number=d.get("last-sequence-number", 0),
            last_updated_ms=d["last-updated-ms"],
            last_column_id=d["last-column-id"],
            schemas=schemas,
            current_schema_id=current_schema_id,
            partition_specs=specs,
            default_spec_id=default_spec_id,
            last_partition_id=d.get("last-partition-id", 999),
            sort_orders=[SortOrder.from_dict(o) for o in d.get("sort-orders", [])],
            default_sort_order_id=d.get("default-sort-order-id", 0),
            properties=d.get("properties", {}),
            current_snapshot_id=d.get("current-snapshot-id"),
            snapshots=[Snapshot.from_dict(s) for s in d.get("snapshots", [])],
            snapshot_log=[SnapshotLogEntry.from_dict(e) for e in d.get("snapshot-log", [])],
            metadata_log=d.get("metadata-log", []),
            refs={k: SnapshotRef.from_dict(v) for k, v in d.get("refs", {}).items()},
            statistics=d.get("statistics", []),
            partition_statistics=d.get("partition-statistics", []),
            next_row_id=d.get("next-row-id"),
        )

    def write(self, path: str) -> None:
        from ..io.fileio import write_text

        write_text(path, json.dumps(self.to_dict()))

    @classmethod
    def read(cls, path: str) -> "TableMetadata":
        from ..io.fileio import read_text

        return cls.from_dict(json.loads(read_text(path)))


def new_table_metadata(
    schema: Schema,
    spec: PartitionSpec,
    location: str,
    properties: Optional[Dict[str, str]] = None,
    sort_order: Optional[SortOrder] = None,
) -> TableMetadata:
    last_partition_id = max([f.field_id for f in spec.fields], default=999)
    # "format-version" table property picks the spec version at create
    # time (2 = default; 3 enables row lineage — next-row-id starts at 0)
    fv = int((properties or {}).get("format-version", "2"))
    if fv not in (1, 2, 3):
        raise ValueError(f"unsupported format-version {fv}")
    return TableMetadata(
        format_version=fv,
        next_row_id=0 if fv >= 3 else None,
        table_uuid=str(uuid.uuid4()),
        location=location,
        last_sequence_number=0,
        last_updated_ms=int(time.time() * 1000),
        last_column_id=schema.highest_field_id,
        schemas=[schema],
        current_schema_id=schema.schema_id,
        partition_specs=[spec],
        default_spec_id=spec.spec_id,
        last_partition_id=last_partition_id,
        sort_orders=[sort_order or UNSORTED],
        default_sort_order_id=(sort_order or UNSORTED).order_id,
        properties=properties or {},
        current_snapshot_id=None,
        snapshots=[],
        snapshot_log=[],
        metadata_log=[],
        refs={},
    )
