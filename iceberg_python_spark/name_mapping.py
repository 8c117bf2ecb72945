"""Name mapping — ``schema.name-mapping.default`` (Iceberg spec §Column
Projection; reference pyiceberg/table/name_mapping.py).

Parquet written by non-Iceberg writers carries no field-id metadata, so
schema resolution falls back to a name mapping: a JSON list of
``{"field-id": N, "names": [...]}`` entries (recursively for nested
fields) stored as a table property. ``add_files`` consults it to assign
field ids to ID-less footers; scans of such files resolve columns by
mapped name."""

from __future__ import annotations

import json
from typing import Any, Dict, Iterable, List, Optional

from .schema import Schema


class MappedField:
    def __init__(self, field_id: Optional[int], names: List[str], fields: Optional[List["MappedField"]] = None):
        self.field_id = field_id
        self.names = list(names)
        self.fields = list(fields or [])

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {"names": self.names}
        if self.field_id is not None:
            d["field-id"] = self.field_id
        if self.fields:
            d["fields"] = [f.to_dict() for f in self.fields]
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "MappedField":
        return cls(
            d.get("field-id"),
            d.get("names", []),
            [cls.from_dict(f) for f in d.get("fields", [])],
        )


class NameMapping:
    def __init__(self, fields: List[MappedField]):
        self.fields = list(fields)
        self._by_name: Dict[str, MappedField] = {}
        for f in self.fields:
            for n in f.names:
                self._by_name[n] = f
                self._by_name.setdefault(n.lower(), f)

    def id_for(self, name: str) -> Optional[int]:
        """Top-level column name -> field id (None when unmapped)."""
        f = self._by_name.get(name) or self._by_name.get(name.lower())
        return f.field_id if f else None

    def to_json(self) -> str:
        return json.dumps([f.to_dict() for f in self.fields])

    @classmethod
    def from_json(cls, s: str) -> "NameMapping":
        return cls([MappedField.from_dict(d) for d in json.loads(s)])

    @classmethod
    def from_schema(cls, schema: Schema) -> "NameMapping":
        """Default mapping: every schema column under its own name
        (reference name_mapping.py:create_mapping_from_schema)."""
        return cls([MappedField(f.field_id, [f.name]) for f in schema.fields])


PROPERTY_KEY = "schema.name-mapping.default"


def load_name_mapping(properties: Dict[str, str]) -> Optional[NameMapping]:
    s = properties.get(PROPERTY_KEY)
    return NameMapping.from_json(s) if s else None
