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
