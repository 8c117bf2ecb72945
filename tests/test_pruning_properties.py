"""Property-based soundness tests for the metadata evaluators.

The invariants that make pruning safe (SURVEY.md §7 watch-list item 4):

- inclusive metrics evaluator: if a file contains ANY row matching the
  predicate, the evaluator must say might-match (false negatives lose
  rows silently);
- strict metrics evaluator: if it says must-match, EVERY row matches
  (false positives delete live rows in metadata-only deletes);
- inclusive partition projection: any row's partition tuple must satisfy
  the projected partition predicate whenever the row satisfies the
  original predicate;
- residual: AlwaysTrue residual ⇒ every row in the partition matches;
  AlwaysFalse ⇒ none do.

Pure-Python checks over generated data (no Spark), so hypothesis can run
hundreds of cases quickly.
"""

import math

from hypothesis import given, settings, strategies as st

from iceberg_python_spark import types as it
from iceberg_python_spark.expressions import UnboundPredicate, bind
from iceberg_python_spark.expressions.visitors import (
    expression_evaluator,
    inclusive_metrics_evaluator,
    residual,
    strict_metrics_evaluator,
)
from iceberg_python_spark.partitioning import spec_from_names
from iceberg_python_spark.schema import Schema
from iceberg_python_spark.transforms import BucketTransform, MonthTransform, TruncateTransform

SCHEMA = Schema(
    it.NestedField(1, "x", it.LongType()),
    it.NestedField(2, "s", it.StringType()),
)

values = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))
strings = st.one_of(st.none(), st.text(alphabet="abcxyz", min_size=0, max_size=6))

ops_binary = st.sampled_from(["eq", "not_eq", "lt", "lt_eq", "gt", "gt_eq"])


def _file_stats(xs, ss):
    non_null_x = [v for v in xs if v is not None]
    non_null_s = [v for v in ss if v is not None]
    stats = {
        "record_count": len(xs),
        "value_counts": {1: len(xs), 2: len(ss)},
        "null_value_counts": {1: len(xs) - len(non_null_x), 2: len(ss) - len(non_null_s)},
        "nan_value_counts": {},
        "lower_bounds": {},
        "upper_bounds": {},
    }
    if non_null_x:
        stats["lower_bounds"][1] = min(non_null_x)
        stats["upper_bounds"][1] = max(non_null_x)
    if non_null_s:
        stats["lower_bounds"][2] = min(non_null_s)
        stats["upper_bounds"][2] = max(non_null_s)
    return stats


def _predicate(op, lit_x, lit_s, target):
    if target == "x":
        return UnboundPredicate(op, "x", lit_x)
    return UnboundPredicate(op, "s", lit_s)


@given(
    xs=st.lists(values, min_size=1, max_size=30),
    ss=st.lists(strings, min_size=1, max_size=30),
    op=ops_binary,
    lit_x=st.integers(min_value=-1000, max_value=1000),
    lit_s=st.text(alphabet="abcxyz", min_size=0, max_size=6),
    target=st.sampled_from(["x", "s"]),
)
@settings(max_examples=300, deadline=None)
def test_metrics_evaluators_sound(xs, ss, op, lit_x, lit_s, target):
    n = max(len(xs), len(ss))
    xs = (xs * n)[:n]
    ss = (ss * n)[:n]
    stats = _file_stats(xs, ss)
    expr = bind(_predicate(op, lit_x, lit_s, target), SCHEMA)
    rows = [{"x": x, "s": s} for x, s in zip(xs, ss)]
    ev = expression_evaluator(expr)
    matches = [r for r in rows if ev(r)]

    might = inclusive_metrics_evaluator(expr)(stats)
    must = strict_metrics_evaluator(expr)(stats)

    if matches:
        assert might, f"inclusive evaluator lost rows: {expr}, stats={stats}"
    if must:
        assert len(matches) == len(rows), f"strict evaluator over-claimed: {expr}, stats={stats}"


@given(
    xs=st.lists(st.integers(min_value=-10000, max_value=10000), min_size=1, max_size=25),
    op=ops_binary,
    lit=st.integers(min_value=-10000, max_value=10000),
    width=st.sampled_from([2, 10, 50]),
    buckets=st.sampled_from([4, 16]),
)
@settings(max_examples=300, deadline=None)
def test_partition_projection_sound(xs, op, lit, width, buckets):
    schema = Schema(it.NestedField(1, "x", it.LongType()))
    for spec in (
        spec_from_names(schema, ("x", f"truncate[{width}]")),
        spec_from_names(schema, ("x", f"bucket[{buckets}]")),
        spec_from_names(schema, "x"),
    ):
        pf = spec.fields[0]
        fn = pf.transform.transform(it.LongType())
        expr = bind(UnboundPredicate(op, "x", lit), schema)
        proj = spec.inclusive_projection(schema, expr)
        proj_ev = expression_evaluator(proj)
        row_ev = expression_evaluator(expr)
        for x in xs:
            row = {"x": x}
            part = {pf.name: fn(x)}
            if row_ev(row):
                # inclusive projection may never exclude a matching row's partition
                assert proj_ev(part), f"projection lost row x={x}: {expr} -> {proj} part={part}"


@given(
    days=st.lists(st.integers(min_value=8000, max_value=12000), min_size=1, max_size=25),
    op=ops_binary,
    lit_day=st.integers(min_value=8000, max_value=12000),
)
@settings(max_examples=200, deadline=None)
def test_residual_sound_month_transform(days, op, lit_day):
    schema = Schema(it.NestedField(1, "d", it.DateType()))
    spec = spec_from_names(schema, ("d", "month"))
    month_of = spec.fields[0].transform.transform(it.DateType())
    expr = bind(UnboundPredicate(op, "d", lit_day), schema)
    row_ev = expression_evaluator(expr)
    from iceberg_python_spark.expressions import AlwaysFalse, AlwaysTrue

    by_month = {}
    for d in days:
        by_month.setdefault(month_of(d), []).append(d)
    for month, ds in by_month.items():
        res = residual(spec, schema, expr, {"d_month": month})
        if isinstance(res, AlwaysTrue):
            assert all(row_ev({"d": d}) for d in ds), f"residual=True but non-matching row in month {month}"
        elif isinstance(res, AlwaysFalse):
            assert not any(row_ev({"d": d}) for d in ds), f"residual=False but matching row in month {month}"
        else:
            res_ev = expression_evaluator(res)
            for d in ds:
                assert res_ev({"d": d}) == row_ev({"d": d}), f"residual disagrees for d={d}"
