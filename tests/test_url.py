"""URL canonicalization: RFC 3986 §6 rules, PSL-subset domains."""

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.url import (
    normalize_url,
    registered_domain,
    with_normalized_url,
)


def _norm(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "u: string")
    return [r["n"] for r in df.select(normalize_url(F.col("u"), **kw).alias("n")).collect()]


def test_normalize_url_rfc_rules(spark):
    got = _norm(
        spark,
        [
            "HTTP://Example.COM:80/a/../b",        # case + default port + dotseg
            "https://Example.com:443/",            # https default port
            "https://example.com:8443/x",          # non-default port kept
            "http://example.com",                  # empty path -> /
            "http://example.com/a/./b#frag",       # . segment + fragment drop
            "http://example.com/a/b/..",           # trailing .. keeps the slash
            "http://example.com/a/b/../",
            "http://example.com/../../x",          # over-pop clamps at root
            "relative/path",                       # non-absolute: unchanged
            "http://example.com/a?z=1&a=2",        # query kept, unsorted
        ],
    )
    assert got == [
        "http://example.com/b",
        "https://example.com/",
        "https://example.com:8443/x",
        "http://example.com/",
        "http://example.com/a/b",
        "http://example.com/a/",
        "http://example.com/a/",
        "http://example.com/x",
        "relative/path",
        "http://example.com/a?z=1&a=2",
    ]
    # sort_query opts in
    assert _norm(spark, ["http://e.com/a?z=1&a=2"], sort_query=True) == [
        "http://e.com/a?a=2&z=1"
    ]


def test_registered_domain_psl_subset(spark):
    cases = [
        ("a.b.Example.COM", "example.com"),
        ("example.com", "example.com"),
        ("blog.news.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("co.uk", "co.uk"),           # the bare suffix itself
        ("localhost", "localhost"),
        ("192.168.0.1", "192.168.0.1"),
        ("sub.shop.com.au", "shop.com.au"),
    ]
    df = spark.createDataFrame(cases, "h: string, want: string")
    bad = df.where(registered_domain(F.col("h")) != F.col("want")).collect()
    assert bad == []


def test_with_normalized_url_projection_is_narrow(spark):
    df = spark.createDataFrame(
        [(1, "HTTP://A.Example.com:80/p/../q?x=1#f")], "id: long, url: string"
    )
    out = with_normalized_url(df, "url")
    row = out.collect()[0]
    assert row["url_norm"] == "http://a.example.com/q?x=1"
    assert row["domain"] == "example.com"
    # narrow plan: no Exchange, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_normalize_url_unparseable_authority_falls_back(spark):
    got = _norm(spark, ["mailto:someone@example.com", "data:text/plain,hi"])
    assert got == ["mailto:someone@example.com", "data:text/plain,hi"]
