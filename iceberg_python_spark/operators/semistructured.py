"""Semi-structured (JSON) metadata columns: inference + extraction.

Crawl corpora carry per-record metadata as JSON sidecars (WARC
headers, fetch stats, page annotations). At 100 TB the metadata
column must stay a plain string at rest and become TYPED columns only
at query time, JVM-side:

- :func:`infer_json_fields` reads a BOUNDED sample (driver work is
  O(sample), never O(corpus)) and unions each dotted path's observed
  types into a Spark type per field (conflicts widen: int+float ->
  double, anything+string -> string; objects recurse, arrays stop at
  ``array`` — explode them explicitly instead).
- :func:`extract_json_fields` projects each field with
  ``get_json_object`` + a cast — a NARROW whole-stage-codegen
  projection: no shuffle, no Python, no UDF (plan test-pinned).
  Missing keys and type mismatches become NULL, malformed JSON rows
  become all-NULL — a bad record costs its fields, not the job.

Spark's own ``from_json`` needs the schema handed to it and
``schema_of_json`` infers from ONE row; the sample-union here is the
pipeline-shaped middle: schema from data, extraction still built-in.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

# observed-python-type -> spark type, and the widening lattice
_WIDEN = {
    frozenset(["bigint"]): "bigint",
    frozenset(["double"]): "double",
    frozenset(["bigint", "double"]): "double",
    frozenset(["boolean"]): "boolean",
}


def _walk(obj, prefix: str, seen: Dict[str, set]) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            path = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                _walk(v, path, seen)
            elif isinstance(v, bool):
                seen.setdefault(path, set()).add("boolean")
            elif isinstance(v, int):
                seen.setdefault(path, set()).add("bigint")
            elif isinstance(v, float):
                seen.setdefault(path, set()).add("double")
            elif isinstance(v, list):
                seen.setdefault(path, set()).add("array")
            elif v is None:
                seen.setdefault(path, set())
            else:
                seen.setdefault(path, set()).add("string")


def infer_json_fields(
    df: DataFrame, col: str, sample_rows: int = 1000
) -> Dict[str, str]:
    """``{dotted.path: spark_type}`` from a bounded sample of ``col``.
    Paths seen only as null map to ``string`` (the safe carrier);
    conflicting scalar types widen (int+float → double, else string);
    arrays report ``array`` so callers know to explode, not cast."""
    sample = df.select(F.col(col).alias("_j")).where(F.col("_j").isNotNull())
    seen: Dict[str, set] = {}
    for row in sample.limit(sample_rows).collect():
        try:
            _walk(json.loads(row["_j"]), "", seen)
        except (ValueError, TypeError):
            continue  # malformed sample rows don't poison inference
    out: Dict[str, str] = {}
    for path, types in seen.items():
        if "array" in types:
            out[path] = "array"
        else:
            out[path] = _WIDEN.get(frozenset(types), "string") if types else "string"
    return dict(sorted(out.items()))


def extract_json_fields(
    df: DataFrame,
    col: str,
    fields: Optional[Dict[str, str]] = None,
    keep: Sequence[str] = ("*",),
    prefix: str = "",
    sample_rows: int = 1000,
) -> DataFrame:
    """Append one typed column per field (dots become underscores,
    ``prefix`` prepended) extracted JVM-side with ``get_json_object``.
    ``fields=None`` infers from a bounded sample first. ``array``
    fields come back as their JSON text (explode downstream with
    ``from_json`` once the element schema is known)."""
    if fields is None:
        fields = infer_json_fields(df, col, sample_rows)
    cols = list(df.columns) if keep == ("*",) else list(keep)
    extracted = []
    for path, typ in fields.items():
        name = prefix + path.replace(".", "_")
        raw = F.get_json_object(F.col(col), "$." + path)
        if typ in ("bigint", "double", "boolean"):
            raw = raw.cast(typ)
        # else string and array-as-text: keep the raw JSON text
        extracted.append(raw.alias(name))
    return df.select(*cols, *extracted)
