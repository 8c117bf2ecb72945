"""REST-spec JSON serialization of filter expressions (Iceberg REST
catalog `Expression` schema, used by the scan-planning API; reference
pyiceberg/expressions/__init__.py pydantic type tags — and/or/not nest,
predicates carry term + value(s), References serialize as plain column
names)."""

from __future__ import annotations

import base64
import datetime
from typing import Any, Dict

from . import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BooleanExpression,
    Not,
    Or,
    UnboundPredicate,
)

_UNARY = {"is-null", "not-null", "is-nan", "not-nan"}
_SET = {"in", "not-in"}


def _value_to_json(v: Any) -> Any:
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.date, datetime.datetime, datetime.time)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    return str(v)  # Decimal, UUID, ...


def expression_to_rest(expr: BooleanExpression) -> Dict[str, Any]:
    if isinstance(expr, AlwaysTrue):
        return {"type": "true"}
    if isinstance(expr, AlwaysFalse):
        return {"type": "false"}
    if isinstance(expr, And):
        return {"type": "and", "left": expression_to_rest(expr.left), "right": expression_to_rest(expr.right)}
    if isinstance(expr, Or):
        return {"type": "or", "left": expression_to_rest(expr.left), "right": expression_to_rest(expr.right)}
    if isinstance(expr, Not):
        return {"type": "not", "child": expression_to_rest(expr.child)}
    if isinstance(expr, UnboundPredicate):
        t = expr.op.replace("_", "-")
        out: Dict[str, Any] = {"type": t, "term": expr.term}
        if t in _SET:
            out["values"] = [_value_to_json(v) for v in expr.values]
        elif t not in _UNARY:
            out["value"] = _value_to_json(expr.values[0])
        return out
    raise ValueError(f"cannot serialize {type(expr).__name__} for REST (bind-free expressions only)")


def expression_from_rest(d: Dict[str, Any]) -> BooleanExpression:
    t = d["type"]
    if t == "true":
        return AlwaysTrue()
    if t == "false":
        return AlwaysFalse()
    if t == "and":
        return And(expression_from_rest(d["left"]), expression_from_rest(d["right"]))
    if t == "or":
        return Or(expression_from_rest(d["left"]), expression_from_rest(d["right"]))
    if t == "not":
        return Not(expression_from_rest(d["child"]))
    term = d["term"]
    if isinstance(term, dict):  # TransformTerm not supported; bare reference dicts tolerated
        term = term.get("term") or term.get("name")
    op = t.replace("-", "_")
    if t in _UNARY:
        return UnboundPredicate(op, term)
    if t in _SET:
        return UnboundPredicate(op, term, *d.get("values", []))
    return UnboundPredicate(op, term, d["value"])
