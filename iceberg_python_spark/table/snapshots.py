"""Snapshots and snapshot summaries.

Reference: pyiceberg/table/snapshots.py:241 (Snapshot), :180 (Summary),
:67 (Operation), :295 (SnapshotSummaryCollector counters).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


class Operation:
    APPEND = "append"
    REPLACE = "replace"
    OVERWRITE = "overwrite"
    DELETE = "delete"


@dataclass
class Snapshot:
    snapshot_id: int
    parent_snapshot_id: Optional[int]
    sequence_number: int
    timestamp_ms: int
    manifest_list: str  # path to the manifest-list parquet
    summary: Dict[str, Any]
    schema_id: int
    # v3 row lineage (spec: first-row-id; reference table/metadata.py:574
    # next-row-id and update/__init__.py:447-468 assignment): the base of
    # the implicit _row_id range this snapshot's new rows occupy
    first_row_id: Optional[int] = None

    @property
    def operation(self) -> str:
        return self.summary.get("operation", Operation.APPEND)

    def to_dict(self) -> Dict[str, Any]:
        d = {
            "snapshot-id": self.snapshot_id,
            "parent-snapshot-id": self.parent_snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "manifest-list": self.manifest_list,
            "summary": self.summary,
            "schema-id": self.schema_id,
        }
        if self.first_row_id is not None:
            d["first-row-id"] = self.first_row_id
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Snapshot":
        return cls(
            snapshot_id=d["snapshot-id"],
            parent_snapshot_id=d.get("parent-snapshot-id"),
            sequence_number=d.get("sequence-number", 0),
            timestamp_ms=d["timestamp-ms"],
            manifest_list=d["manifest-list"],
            summary=d.get("summary", {}),
            schema_id=d.get("schema-id", 0),
            first_row_id=d.get("first-row-id"),
        )


@dataclass
class SnapshotLogEntry:
    snapshot_id: int
    timestamp_ms: int

    def to_dict(self) -> Dict[str, Any]:
        return {"snapshot-id": self.snapshot_id, "timestamp-ms": self.timestamp_ms}

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SnapshotLogEntry":
        return cls(d["snapshot-id"], d["timestamp-ms"])


class _PartitionMetrics:
    """Per-partition change counters (reference snapshots.py:90-177
    UpdateMetrics): only non-zero counters render, matching
    ``set_when_positive``."""

    __slots__ = (
        "added_file_size", "removed_file_size", "added_data_files",
        "removed_data_files", "added_delete_files", "removed_delete_files",
        "added_pos_delete_files", "removed_pos_delete_files",
        "added_eq_delete_files", "removed_eq_delete_files",
        "added_records", "deleted_records", "added_pos_deletes",
        "removed_pos_deletes", "added_eq_deletes", "removed_eq_deletes",
    )

    def __init__(self) -> None:
        for name in self.__slots__:
            setattr(self, name, 0)

    def apply(self, data_file: Dict[str, Any], is_add: bool) -> None:
        content = data_file.get("content", 0)
        records = data_file.get("record_count", 0)
        size = data_file.get("file_size_in_bytes", 0)
        if is_add:
            self.added_file_size += size
            if content == 0:
                self.added_data_files += 1
                self.added_records += records
            elif content == 1:
                self.added_delete_files += 1
                self.added_pos_delete_files += 1
                self.added_pos_deletes += records
            else:
                self.added_delete_files += 1
                self.added_eq_delete_files += 1
                self.added_eq_deletes += records
        else:
            self.removed_file_size += size
            if content == 0:
                self.removed_data_files += 1
                self.deleted_records += records
            elif content == 1:
                self.removed_delete_files += 1
                self.removed_pos_delete_files += 1
                self.removed_pos_deletes += records
            else:
                self.removed_delete_files += 1
                self.removed_eq_delete_files += 1
                self.removed_eq_deletes += records

    def to_dict(self) -> Dict[str, str]:
        pairs = [
            ("added-files-size", self.added_file_size),
            ("removed-files-size", self.removed_file_size),
            ("added-data-files", self.added_data_files),
            ("deleted-data-files", self.removed_data_files),
            ("added-equality-delete-files", self.added_eq_delete_files),
            ("removed-equality-delete-files", self.removed_eq_delete_files),
            ("added-position-delete-files", self.added_pos_delete_files),
            ("removed-position-delete-files", self.removed_pos_delete_files),
            ("added-delete-files", self.added_delete_files),
            ("removed-delete-files", self.removed_delete_files),
            ("added-records", self.added_records),
            ("deleted-records", self.deleted_records),
            ("added-position-deletes", self.added_pos_deletes),
            ("removed-position-deletes", self.removed_pos_deletes),
            ("added-equality-deletes", self.added_eq_deletes),
            ("removed-equality-deletes", self.removed_eq_deletes),
        ]
        return {k: str(v) for k, v in pairs if v > 0}


def partition_summary_properties(
    changed: List[Any],  # (partition_path, data_file_dict, is_add) triples
    limit: int,
) -> Dict[str, str]:
    """Optional per-partition summary entries (reference snapshots.py:
    300-345 SnapshotSummaryCollector.build + write.summary.partition-limit,
    table/__init__.py:168): always emits ``changed-partition-count``; when
    the changed-partition count fits under the limit, also emits
    ``partition-summaries-included=true`` and one
    ``partitions.<hive-path>`` counter string per partition. The limit
    (default 0 = off) bounds summary size — at 100 TB a commit can touch
    millions of partitions and the summary lives in every metadata.json."""
    per_partition: Dict[str, _PartitionMetrics] = {}
    for path, data_file, is_add in changed:
        per_partition.setdefault(path, _PartitionMetrics()).apply(data_file, is_add)
    props: Dict[str, str] = {}
    if not per_partition:
        return props
    props["changed-partition-count"] = str(len(per_partition))
    if len(per_partition) <= limit:
        props["partition-summaries-included"] = "true"
        for path, metrics in per_partition.items():
            rendered = ",".join(f"{k}={v}" for k, v in metrics.to_dict().items())
            if rendered:
                props[f"partitions.{path}"] = rendered
    return props


def build_summary(
    operation: str,
    added_files: int = 0,
    added_records: int = 0,
    added_size: int = 0,
    deleted_files: int = 0,
    deleted_records: int = 0,
    deleted_size: int = 0,
    total_files: int = 0,
    total_records: int = 0,
    extra: Optional[Dict[str, str]] = None,
) -> Dict[str, Any]:
    """Counter summary (reference snapshots.py:37-67 keys)."""
    s: Dict[str, Any] = {"operation": operation}
    if added_files:
        s["added-data-files"] = str(added_files)
        s["added-records"] = str(added_records)
        s["added-files-size"] = str(added_size)
    if deleted_files:
        s["deleted-data-files"] = str(deleted_files)
        s["deleted-records"] = str(deleted_records)
        s["removed-files-size"] = str(deleted_size)
    s["total-data-files"] = str(total_files)
    s["total-records"] = str(total_records)
    if extra:
        s.update(extra)
    return s
