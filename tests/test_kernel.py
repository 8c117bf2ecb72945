"""M0 kernel tests: types, schema, expressions, parser, transforms,
metadata evaluators. Mirrors the reference's unit-test strategy
(tests/test_transforms.py golden hashes, tests/expressions/* truth tables).
"""

import datetime as dt
import math
from decimal import Decimal

import pytest

from iceberg_python_spark import types as it
from iceberg_python_spark.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    NotEqualTo,
    NotNull,
    Or,
    StartsWith,
    UnboundPredicate,
    bind,
    rewrite_not,
    to_internal,
)
from iceberg_python_spark.expressions.parser import parse
from iceberg_python_spark.expressions.visitors import (
    expression_evaluator,
    inclusive_metrics_evaluator,
    manifest_evaluator,
    residual,
    strict_metrics_evaluator,
)
from iceberg_python_spark.partitioning import spec_from_names
from iceberg_python_spark.schema import Schema, promote, schema_from_spark
from iceberg_python_spark.transforms import (
    BucketTransform,
    DayTransform,
    HourTransform,
    MonthTransform,
    TruncateTransform,
    YearTransform,
    bucket_hash,
    murmur3_32,
)

SCHEMA = Schema(
    it.NestedField(1, "id", it.LongType(), required=True),
    it.NestedField(2, "name", it.StringType()),
    it.NestedField(3, "price", it.DoubleType()),
    it.NestedField(4, "ship_date", it.DateType()),
    it.NestedField(5, "ts", it.TimestampType()),
    it.NestedField(6, "qty", it.IntegerType()),
)


# -- types / schema ----------------------------------------------------------


def test_type_json_roundtrip():
    s = Schema(
        it.NestedField(1, "a", it.DecimalType(10, 2), required=True),
        it.NestedField(2, "b", it.ListType(3, it.StringType())),
        it.NestedField(4, "m", it.MapType(5, it.StringType(), 6, it.DoubleType())),
        it.NestedField(7, "s", it.StructType(it.NestedField(8, "x", it.IntegerType()))),
        schema_id=3,
        identifier_field_ids=[1],
    )
    assert Schema.from_dict(s.to_dict()) == s
    assert Schema.from_dict(s.to_dict()).identifier_field_ids == [1]


def test_schema_spark_roundtrip():
    spark_struct = SCHEMA.to_spark()
    back = schema_from_spark(spark_struct)
    assert back.as_struct() == SCHEMA.as_struct()


def test_nested_name_lookup():
    s = Schema(it.NestedField(1, "s", it.StructType(it.NestedField(2, "x", it.IntegerType()))))
    assert s.find_field("s.x").field_id == 2
    assert s.find_column_name(2) == "s.x"


def test_promote():
    assert promote(it.IntegerType(), it.LongType())
    assert promote(it.FloatType(), it.DoubleType())
    assert promote(it.DecimalType(10, 2), it.DecimalType(18, 2))
    assert not promote(it.DecimalType(10, 2), it.DecimalType(18, 3))
    assert not promote(it.LongType(), it.IntegerType())


# -- expressions -------------------------------------------------------------


def test_bind_folds_out_of_range():
    assert isinstance(bind(GreaterThan("qty", 2**40), SCHEMA), AlwaysFalse)
    assert isinstance(bind(LessThan("qty", 2**40), SCHEMA), AlwaysTrue)
    assert isinstance(bind(LessThan("qty", -(2**40)), SCHEMA), AlwaysFalse)


def test_bind_null_on_required_folds():
    assert isinstance(bind(IsNull("id"), SCHEMA), AlwaysFalse)
    assert isinstance(bind(NotNull("id"), SCHEMA), AlwaysTrue)


def test_in_simplification():
    assert isinstance(bind(In("qty", []), SCHEMA), AlwaysFalse)
    b = bind(In("qty", [5]), SCHEMA)
    assert b.op == "eq" and b.value == 5
    b2 = bind(In("qty", [5, 5, 6]), SCHEMA)
    assert b2.op == "in" and set(b2.values) == {5, 6}


def test_date_literal_coercion():
    b = bind(LessThanOrEqual("ship_date", "1998-09-02"), SCHEMA)
    assert b.value == (dt.date(1998, 9, 2) - dt.date(1970, 1, 1)).days
    b2 = bind(LessThan("ts", "1998-09-02T00:00:00"), SCHEMA)
    assert b2.value == to_internal(dt.datetime(1998, 9, 2), it.TimestampType())


def test_rewrite_not_demorgan():
    e = Not(And(EqualTo("name", "a"), GreaterThan("qty", 1)))
    r = rewrite_not(e)
    assert isinstance(r, Or)
    assert r.left.op == "not_eq" and r.right.op == "lt_eq"


def test_parser():
    e = parse("l_shipdate <= '1998-09-02' and (qty > 5 or name is not null)")
    assert isinstance(e, And)
    e2 = parse("name in ('a', 'b') and not price between 1 and 2")
    assert isinstance(e2, And)
    e3 = parse("name like 'abc%'")
    assert e3.op == "starts_with" and e3.values == ("abc",)
    e4 = parse('"quoted col" == 3.5')
    assert e4.term == "quoted col"
    e5 = parse("5 < qty")
    assert e5.op == "gt" and e5.term == "qty"
    with pytest.raises(ValueError):
        parse("name like '%middle%'")


# -- transforms ---------------------------------------------------------------

SPEC_GOLDEN = [
    (34, it.IntegerType(), 2017239379),
    (34, it.LongType(), 2017239379),
    (to_internal(dt.date(2017, 11, 16), it.DateType()), it.DateType(), -653330422),
    (to_internal(dt.time(22, 31, 8), it.TimeType()), it.TimeType(), -662762989),
    (to_internal(dt.datetime(2017, 11, 16, 22, 31, 8), it.TimestampType()), it.TimestampType(), -2047944441),
    ("iceberg", it.StringType(), 1210000089),
    ("f79c3e09-677c-4bbd-a479-3f349cb785e7", it.UUIDType(), 1488055340),
    (b"\x00\x01\x02\x03", it.BinaryType(), -188683207),
    (Decimal("14.20"), it.DecimalType(9, 2), -500754589),
]


@pytest.mark.parametrize("value,typ,expected", SPEC_GOLDEN)
def test_bucket_hash_spec_golden(value, typ, expected):
    assert bucket_hash(value, typ) == expected


def test_bucket_transform():
    fn = BucketTransform(16).transform(it.IntegerType())
    assert fn(34) == (2017239379 & 0x7FFFFFFF) % 16
    assert fn(None) is None


def test_truncate_transform():
    assert TruncateTransform(10).transform(it.IntegerType())(17) == 10
    assert TruncateTransform(10).transform(it.IntegerType())(-3) == -10  # floor semantics
    assert TruncateTransform(3).transform(it.StringType())("iceberg") == "ice"
    assert TruncateTransform(2).transform(it.BinaryType())(b"\x01\x02\x03") == b"\x01\x02"
    assert TruncateTransform(50).transform(it.DecimalType(9, 2))(Decimal("10.65")) == Decimal("10.50")


def test_temporal_transforms():
    d = to_internal(dt.date(2017, 11, 16), it.DateType())
    assert YearTransform().transform(it.DateType())(d) == 47
    assert MonthTransform().transform(it.DateType())(d) == 47 * 12 + 10
    assert DayTransform().transform(it.DateType())(d) == d
    ts = to_internal(dt.datetime(2017, 11, 16, 22, 31, 8), it.TimestampType())
    assert YearTransform().transform(it.TimestampType())(ts) == 47
    assert HourTransform().transform(it.TimestampType())(ts) == ts // 3_600_000_000
    # pre-epoch
    d2 = to_internal(dt.date(1969, 12, 31), it.DateType())
    assert YearTransform().transform(it.DateType())(d2) == -1
    assert MonthTransform().transform(it.DateType())(d2) == -1


# -- evaluators ---------------------------------------------------------------


def _stats(fid, lower=None, upper=None, nulls=0, values=100, nans=None):
    return {
        "record_count": 100,
        "value_counts": {fid: values},
        "null_value_counts": {fid: nulls},
        "nan_value_counts": {fid: nans} if nans is not None else {},
        "lower_bounds": {fid: lower} if lower is not None else {},
        "upper_bounds": {fid: upper} if upper is not None else {},
    }


def test_inclusive_metrics_evaluator():
    e = bind(parse("qty < 5"), SCHEMA)
    ev = inclusive_metrics_evaluator(e)
    assert ev(_stats(6, lower=10, upper=20)) is False
    assert ev(_stats(6, lower=1, upper=20)) is True
    assert ev(_stats(6)) is True  # missing stats -> might match
    # all null
    assert ev(_stats(6, lower=None, upper=None, nulls=100)) is False
    e2 = bind(parse("name like 'br%'"), SCHEMA)
    ev2 = inclusive_metrics_evaluator(e2)
    assert ev2(_stats(2, lower="aa", upper="bq")) is False
    assert ev2(_stats(2, lower="aa", upper="bz")) is True


def test_strict_metrics_evaluator():
    e = bind(parse("qty < 50"), SCHEMA)
    ev = strict_metrics_evaluator(e)
    assert ev(_stats(6, lower=10, upper=20)) is True
    assert ev(_stats(6, lower=10, upper=60)) is False
    assert ev(_stats(6, lower=10, upper=20, nulls=5)) is False  # nulls don't match <
    e2 = bind(parse("qty != 15"), SCHEMA)
    ev2 = strict_metrics_evaluator(e2)
    assert ev2(_stats(6, lower=20, upper=30)) is True
    assert ev2(_stats(6, lower=10, upper=20)) is False


def test_manifest_evaluator():
    part_schema = Schema(it.NestedField(1000, "qty_bucket", it.IntegerType()))
    e = bind(UnboundPredicate("eq", "qty_bucket", 3), part_schema)
    ev = manifest_evaluator({"qty_bucket": {"lower": 0, "upper": 2, "contains_null": False}})
    assert ev(e) is False
    ev2 = manifest_evaluator({"qty_bucket": {"lower": 0, "upper": 5, "contains_null": False}})
    assert ev2(e) is True


def test_projection_and_residual():
    spec = spec_from_names(SCHEMA, ("ship_date", "month"))
    e = bind(parse("ship_date <= '1998-09-02'"), SCHEMA)
    proj = spec.inclusive_projection(SCHEMA, e)
    # month(1998-09-02) = (1998-1970)*12 + 8 = 344
    fn = expression_evaluator(proj)
    assert fn({"ship_date_month": 344}) is True
    assert fn({"ship_date_month": 345}) is False
    assert fn({"ship_date_month": 100}) is True
    # residual: partition strictly before the bound -> AlwaysTrue
    r = residual(spec, SCHEMA, e, {"ship_date_month": 343})
    assert isinstance(r, AlwaysTrue)
    # partition at the boundary month -> residual keeps the predicate
    r2 = residual(spec, SCHEMA, e, {"ship_date_month": 344})
    assert not isinstance(r2, (AlwaysTrue, AlwaysFalse))
    # partition after -> AlwaysFalse
    r3 = residual(spec, SCHEMA, e, {"ship_date_month": 345})
    assert isinstance(r3, AlwaysFalse)


def test_bucket_projection():
    spec = spec_from_names(SCHEMA, ("id", "bucket[16]"))
    e = bind(parse("id = 34"), SCHEMA)
    proj = spec.inclusive_projection(SCHEMA, e)
    fn = expression_evaluator(proj)
    expected_bucket = (2017239379 & 0x7FFFFFFF) % 16
    assert fn({"id_bucket": expected_bucket}) is True
    assert fn({"id_bucket": (expected_bucket + 1) % 16}) is False
    # range predicates do not project through bucket -> AlwaysTrue
    e2 = bind(parse("id > 10"), SCHEMA)
    assert isinstance(spec.inclusive_projection(SCHEMA, e2), AlwaysTrue)


def test_row_evaluator():
    e = bind(parse("price > 10 and name is not null"), SCHEMA)
    fn = expression_evaluator(e)
    assert fn({"price": 11.0, "name": "x"}) is True
    assert fn({"price": 9.0, "name": "x"}) is False
    assert fn({"price": 11.0, "name": None}) is False
    assert fn({"price": None, "name": "x"}) is False


def test_murmur3_32_longs_vectorized_matches_scalar():
    """The numpy-vectorized 8-byte murmur3 (bucket write hot path) must
    match the scalar spec implementation bit-for-bit."""
    import struct

    import numpy as np

    from iceberg_python_spark.transforms import murmur3_32_longs

    vals = [0, 1, -1, 34, -34, 2**62, -(2**62), 2**63 - 1, -(2**63)] + list(
        np.random.default_rng(7).integers(-(2**63), 2**63 - 1, 5000)
    )
    arr = np.array(vals, dtype=np.int64)
    vec = murmur3_32_longs(arr)
    for v, h in zip(vals, vec):
        assert murmur3_32(struct.pack("<q", int(v))) == int(h), v


def test_unknown_transform():
    """Metadata naming an unrecognized transform still loads (reference
    transforms.py UnknownTransform): pruning degrades to no-projection,
    write-path application raises, and the name round-trips."""
    from iceberg_python_spark.partitioning import PartitionField, PartitionSpec
    from iceberg_python_spark.transforms import UnknownTransform, parse_transform

    t = parse_transform("zorder[4]")
    assert isinstance(t, UnknownTransform)
    pf = PartitionField(1, 1000, t, "zp")
    assert PartitionField.from_dict(pf.to_dict()) == pf
    assert t.project("zp", None) is None and t.strict_project("zp", None) is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported transform"):
        t.transform(None)
