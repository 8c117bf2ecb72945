"""BM25 ranked retrieval and the mergeable HLL sketch family."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.retrieval import bm25_topk, build_postings
from iceberg_python_spark.operators.sketch import (
    _hll_rho,
    hll_build,
    hll_estimate,
    hll_merge,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown cat naps"),
    (2, "dogs and foxes: a field study of the brown fox"),
    (3, "completely unrelated text about databases and queries"),
    (4, "the fox! the fox! the fox!"),
    (5, ""),
]
QUERIES = [(100, "brown fox"), (101, "database query text"), (102, "zzz-notfound")]


def _toks(t):
    return [x for x in re.sub(r"[^a-z0-9\s]", " ", t.lower()).split() if x]


def _ref_bm25(k=3, k1=1.2, b=0.75):
    tf = {d: Counter(_toks(t)) for d, t in DOCS if _toks(t)}
    n = len(tf)
    avgdl = sum(sum(c.values()) for c in tf.values()) / n
    dfc = Counter()
    for c in tf.values():
        for term in c:
            dfc[term] += 1
    ref = {}
    for qid, qt in QUERIES:
        scores = {}
        for d, c in tf.items():
            s = 0
            hit = False
            for term in set(_toks(qt)):
                if term in c:
                    hit = True
                    idf = math.log(1 + (n - dfc[term] + 0.5) / (dfc[term] + 0.5))
                    tfv, dl = c[term], sum(c.values())
                    s += math.floor(
                        idf * (tfv * (k1 + 1)) / (tfv + k1 * (1 - b + b * dl / avgdl)) * 1e6
                    )
            if hit:
                scores[d] = s
        ref[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ref


def test_bm25_matches_reference(spark):
    """Spark BM25 == the straight-line Python implementation, including
    the integer micro-unit scores (addition-order independence) and
    deterministic (score DESC, doc_id ASC) tie-breaks. Empty docs leave
    the corpus stats; no-hit queries return no rows."""
    ddf = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    qdf = spark.createDataFrame(QUERIES, "query_id: long, query_text: string")
    got = {}
    for r in bm25_topk(ddf, qdf, "text", "doc_id", k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score_micro"]))
    ref = _ref_bm25()
    for qid, expect in ref.items():
        rows = sorted(got.get(qid, []))
        assert [(d, s) for _, d, s in rows] == expect, qid
    assert 102 not in got  # no term matches anywhere


def test_bm25_prebuilt_postings_and_plan(spark):
    """A pre-built postings table gives identical results, and the
    scoring side touches postings only through broadcast joins (the
    corpus is never reshuffled for a query batch)."""
    ddf = spark.createDataFrame(DOCS, "doc_id: long, text: string")
    qdf = spark.createDataFrame(QUERIES, "query_id: long, query_text: string")
    post = build_postings(ddf, "text", "doc_id").localCheckpoint(eager=True)
    a = sorted(
        map(tuple, bm25_topk(ddf, qdf, "text", "doc_id", k=3).collect())
    )
    out = bm25_topk(ddf, qdf, "text", "doc_id", k=3, postings=post)
    assert sorted(map(tuple, out.collect())) == a
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hll_rho_matches_bit_length(spark):
    """The bin()-length register value equals the exact Python
    bit-twiddled leading-zero count for real xxhash64 outputs."""
    rows = (
        spark.range(300)
        .select(F.concat(F.lit("x"), F.col("id")).alias("v"))
        .select(F.xxhash64("v").alias("h"), _hll_rho(F.xxhash64("v"), 12).alias("rho"))
        .collect()
    )
    for r in rows:
        w = (r["h"] & 0xFFFFFFFFFFFFFFFF) >> 12
        assert r["rho"] == ((64 - 12 + 1) if w == 0 else (64 - 12 + 1 - w.bit_length()))


def test_hll_estimate_within_tolerance(spark):
    """Estimates land within ~3 rsd of exact across regimes that cross
    the linear-counting boundary, grouped and global."""
    df = spark.range(30000).select(
        (F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 4211)).alias("val"),
    )
    est = {
        r["g"]: r["est_distinct"]
        for r in hll_estimate(hll_build(df, "val", ["g"]), ["g"]).collect()
    }
    exact = {
        r["g"]: r["c"]
        for r in df.groupBy("g").agg(F.countDistinct("val").alias("c")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) <= 0.05 * exact[g] + 2
    small = spark.range(40).select(F.concat(F.lit("s"), F.col("id")).alias("val"))
    (row,) = hll_estimate(hll_build(small, "val")).collect()
    assert abs(row["est_distinct"] - 40) <= 3  # linear-counting regime


def test_hll_merge_equals_union_sketch(spark):
    """The defining algebra: merging per-batch sketches is register-
    for-register identical to sketching the union — on any batch split,
    including overlapping batches (max is idempotent)."""
    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 997)).alias("val"),
    )
    whole = hll_build(df, "val", ["g"])
    batches = [hll_build(df.where(F.col("id") % 3 == i), "val", ["g"]) for i in range(3)]
    overlap = hll_build(df.where("id < 3000"), "val", ["g"])  # overlaps batch 0/1/2
    parts = batches[0]
    for b in batches[1:] + [overlap]:
        parts = parts.unionByName(b)
    merged = hll_merge(parts, ["g"])
    bad = (
        whole.alias("a")
        .join(merged.alias("b"), "g")
        .where(F.col("a.sketch") != F.col("b.sketch"))
        .count()
    )
    assert bad == 0 and merged.count() == whole.count()


def test_hll_nulls_ignored(spark):
    """NULL values do not contribute registers (COUNT DISTINCT
    semantics)."""
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "val: string")
    (row,) = hll_estimate(hll_build(df, "val")).collect()
    assert row["est_distinct"] == pytest.approx(2, abs=0.5)
