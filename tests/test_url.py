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


def test_normalize_url_preserves_userinfo(spark):
    """ADVICE r13: userinfo is part of the fetch identity — it must
    survive normalization verbatim (case-sensitive), so URL-keyed
    dedup never merges distinct identities."""
    got = _norm(
        spark,
        [
            "HTTP://User:Pw@Example.COM:80/a/../b",
            "http://example.com/a/../b",
            "https://token@Host.example/x",
        ],
    )
    assert got == [
        "http://User:Pw@example.com/b",
        "http://example.com/b",
        "https://token@host.example/x",
    ]
    assert got[0] != got[1]  # distinct fetch identities stay distinct


from hypothesis import given, settings
from hypothesis import strategies as st

_host = st.from_regex(r"[A-Za-z]([A-Za-z0-9-]{0,8}[A-Za-z0-9])?(\.[A-Za-z]([A-Za-z0-9-]{0,6})?){0,3}", fullmatch=True)
_path = st.from_regex(r"(/(([a-zA-Z0-9._~-]{0,6})|\.|\.\.)){0,5}/?", fullmatch=True)
_q = st.one_of(st.just(""), st.from_regex(r"\?[a-z0-9=&]{0,12}", fullmatch=True))


@given(
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    _host,
    st.sampled_from(["", ":80", ":443", ":8080"]),
    _path,
    _q,
    st.sampled_from(["", "#frag", "#x/y?z"]),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_normalize_url_idempotent_property(scheme, host, port, path, q, frag, sortq):
    """normalize(normalize(u)) == normalize(u) on generated absolute
    URLs — the fixpoint property every canonicalizer must have."""
    import iceberg_python_spark.operators.url as url_mod

    spark = _SPARK["s"]
    u = f"{scheme}://{host}{port}{path}{q}{frag}"
    df = spark.createDataFrame([(u,)], "u: string")
    once = df.select(url_mod.normalize_url(F.col("u"), sort_query=sortq).alias("n"))
    row = once.select(
        "n", url_mod.normalize_url(F.col("n"), sort_query=sortq).alias("n2")
    ).collect()[0]
    assert row["n"] == row["n2"], u


_SPARK = {}


@pytest.fixture(autouse=True)
def _capture_spark(spark):
    _SPARK["s"] = spark
    yield
