"""Hashed n-gram quality classifier: featurizer engine-parity,
distributed training convergence, JVM-side scoring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_python_spark.operators.classifier import (
    _doc_buckets,
    gram_bucket_col,
    score_quality_classifier,
    train_quality_classifier,
)


def test_featurizer_python_jvm_parity(spark):
    """The Python (training) and built-in-expression (scoring)
    featurizers must agree bucket-for-bucket — including empties,
    punctuation stripping, and single-token docs."""
    texts = [
        "Hello, World! This is a TEST.",
        "the quick brown fox; the quick brown fox",
        "", "   ", "one",
        "a b c d e f g h",
        "punctuation... only!!! ---",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id: long, text: string")
    got = {r.id: sorted(r.b or []) for r in df.select("id", gram_bucket_col("text", 4096).alias("b")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == sorted(_doc_buckets(t, 4096).tolist()), (i, repr(t))


def _corpus(spark, n=150):
    pos_v = [f"goodword{i}" for i in range(30)]
    neg_v = [f"junktok{i}" for i in range(30)]
    shared = [f"common{i}" for i in range(50)]

    def mk(vocab, seed):
        r = np.random.default_rng(seed)
        return " ".join(list(r.choice(vocab, 8)) + list(r.choice(shared, 12)))

    pos = spark.createDataFrame([(i, mk(pos_v, i)) for i in range(n)], "id: long, text: string")
    neg = spark.createDataFrame([(i, mk(neg_v, 1000 + i)) for i in range(n)], "id: long, text: string")
    return pos, neg


def test_train_and_score_separable(spark):
    """Full-batch distributed logistic regression separates a
    synthetic quality/junk corpus: loss decreases monotonically-ish
    and HELD-OUT accuracy is >= 0.95; scoring stays JVM-side."""
    pos, neg = _corpus(spark)
    w, b, losses = train_quality_classifier(
        pos.where("id < 120"), neg.where("id < 120"), "text", dim=2048, iters=15
    )
    assert losses[-1] < 0.2 < losses[0]
    held = pos.where("id >= 120").withColumn("y", F.lit(1)).unionByName(
        neg.where("id >= 120").withColumn("y", F.lit(0))
    )
    scored = score_quality_classifier(held, "text", w, b)
    acc = scored.agg(
        F.avg(((F.col("quality_logit") > 0).cast("int") == F.col("y")).cast("int"))
    ).collect()[0][0]
    assert acc >= 0.95
    # a doc with no grams scores exactly the bias
    empty = spark.createDataFrame([(0, "")], "id: long, text: string")
    got = score_quality_classifier(empty, "text", w, b).collect()[0]["quality_logit"]
    assert got == pytest.approx(b)
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(pos.where("id < 0"), neg.where("id < 0"), "text")


def test_training_iteration_width_is_data_derived(spark):
    """The gradient-pass frame's partition count must derive from the
    row count clamped to the session width — not a fixed local-mode
    cap: a tiny corpus collapses to 1 partition; a wide-partitioned
    input never exceeds min(defaultParallelism, ceil(n/2048)), and the
    coalesce happens AFTER the full-width featurize checkpoint."""
    from iceberg_python_spark.operators import classifier as C

    pos, neg = _corpus(spark, n=40)
    dp = spark.sparkContext.defaultParallelism
    # tiny corpus (80 rows): one iteration partition, regardless of how
    # wide the input arrives
    C.train_quality_classifier(
        pos.repartition(max(dp, 8)), neg.repartition(max(dp, 8)), "text", dim=512, iters=1
    )
    assert C._last_iteration_width == 1
    # wide input with n > 2048: width scales with the data, clamped to
    # the session width (no fixed 8-partition cap)
    big = spark.range(3000).select(
        F.col("id"), F.concat(F.lit("tok"), (F.col("id") % 97).cast("string")).alias("text")
    )
    C.train_quality_classifier(big, big, "text", dim=256, iters=1)
    expected = max(1, min(dp, (6000 + 2047) // 2048))
    assert C._last_iteration_width == expected


def test_scoring_plan_stays_jvm_side_and_narrow(spark):
    """The corpus-wide scoring path must contain no Python evaluation
    (BatchEvalPython / ArrowEvalPython / mapInPandas nodes) — and for
    literal-fold-sized models, no shuffle or join either: per-doc
    scoring is embarrassingly parallel and the plan must say so."""
    pos, _ = _corpus(spark, n=5)
    w = np.zeros(64)
    w[3] = 1.0
    plan = score_quality_classifier(pos, "text", w, 0.0)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_scoring_fold_and_explode_paths_match(spark):
    """The narrow literal-fold path (dim <= _FOLD_DIM_MAX) and the
    explode + broadcast-join fallback (dim above it) return identical
    scores and keep all columns — exercised by padding the same weight
    vector past the threshold with zeros (same buckets modulo a larger
    dim would change featurization, so compare via id_col fallback on
    the SAME dim instead)."""
    from iceberg_python_spark.operators import classifier as C

    pos, _ = _corpus(spark, n=20)
    w = np.random.default_rng(3).normal(size=256)
    fold_rows = score_quality_classifier(pos, "text", w, 0.5, id_col="id").collect()
    assert set(fold_rows[0].asDict()) == {"id", "text", "quality_logit"}
    fold = {r["id"]: r["quality_logit"] for r in fold_rows}
    old_max = C._FOLD_DIM_MAX
    C._FOLD_DIM_MAX = 0  # force the explode + broadcast-join fallback
    try:
        slow = {
            r["id"]: r["quality_logit"]
            for r in score_quality_classifier(pos, "text", w, 0.5).collect()
        }
        fast = {
            r["id"]: r["quality_logit"]
            for r in score_quality_classifier(pos, "text", w, 0.5, id_col="id").collect()
        }
    finally:
        C._FOLD_DIM_MAX = old_max
    assert set(fold) == set(slow) == set(fast)
    for k in slow:
        assert slow[k] == pytest.approx(fold[k], abs=1e-9)
        assert slow[k] == pytest.approx(fast[k], abs=1e-12)


def test_fused_single_partition_training_matches_loop(spark):
    """A training set that fits one iteration partition runs all
    gradient passes fused inside that task; the result must be
    BIT-IDENTICAL to the per-iteration distributed loop (same float64
    ops in the same order — this is an execution fusion, not an
    algorithm change)."""
    from iceberg_python_spark.operators import classifier as C

    pos, neg = _corpus(spark, n=60)
    w1, b1, l1 = C.train_quality_classifier(pos, neg, "text", dim=512, iters=5)
    assert C._last_iteration_width == 1  # fused path ran
    old = C._FUSE_MAX_ROWS
    C._FUSE_MAX_ROWS = 0  # force the distributed per-iteration loop
    try:
        w2, b2, l2 = C.train_quality_classifier(pos, neg, "text", dim=512, iters=5)
    finally:
        C._FUSE_MAX_ROWS = old
    assert np.array_equal(w1, w2)
    assert b1 == b2
    assert l1 == l2
