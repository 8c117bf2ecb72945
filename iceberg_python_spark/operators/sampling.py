"""Deterministic sampling operators for training-data pipelines.

Hash-threshold sampling: a row is kept iff the first 8 hex digits of
``md5(key)`` compare below a per-stratum threshold string. Because the
decision is a pure function of the row key, the sample is

- reproducible across runs, engines, and partitionings (no RNG state),
- stable under re-partitioning and retries (exactly-once semantics
  without bookkeeping), and
- consistent across derived tables (joining two tables sampled on the
  same key keeps matching rows together).

This is the standard "salted-hash bucket" pattern used to carve
held-out / train / calibration splits out of a 100 TB corpus without a
shuffle: the filter is a narrow projection evaluated at scan time, so
Catalyst pushes everything into the file scan.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F


def rate_to_hex_threshold(rate: float) -> str:
    """Map a keep-rate in [0, 1] to the 8-hex-digit threshold the hash
    bucket is compared against (lexicographic compare on lowercase hex ==
    numeric compare on the first 32 bits of the digest)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        # 'g' sorts above every hex digest, making the strict '<' a
        # keep-all — 'ffffffff' would drop the ~2^-32 keys hashing there
        return "g"
    return format(min(int(rate * 2**32), 2**32 - 1), "08x")


def hash_bucket(key_col, salt: str = ""):
    """First 8 hex chars of md5(key || salt) — the sampling coordinate."""
    return F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 8)


def hash_stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with a per-stratum deterministic probability.

    ``rates`` maps stratum value -> keep rate; strata not listed fall
    back to ``default_rate``. ``salt`` decorrelates independent samples
    drawn from the same keys (e.g. train vs eval splits)."""
    thr = F.lit(rate_to_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(rate_to_hex_threshold(rate))).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), salt) < thr)


def dataset_split(
    df: DataFrame,
    key_col: str,
    fractions: Mapping[str, float],
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic, content-stable train/val/test assignment.

    Each row's split is a pure function of ``md5(key || salt)`` compared
    against cumulative hex thresholds, so the assignment is reproducible
    across runs, engines and partitionings, stable when the corpus grows
    (existing rows never migrate between splits), and consistent across
    derived tables keyed the same way — the properties an RNG-based
    ``randomSplit`` cannot give a 100 TB pipeline. The label is a narrow
    projection: no shuffle, evaluated at scan time.

    ``fractions`` maps label -> fraction; they must sum to 1 (±1e-9).
    Labels are assigned in sorted order over ascending hash ranges."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    bad = {k: v for k, v in fractions.items() if v <= 0}
    if bad:
        # a non-positive fraction would make the cumulative thresholds
        # non-increasing and silently shadow a split with zero rows
        raise ValueError(f"fractions must be positive, got {bad}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    labels = sorted(fractions)
    for label in labels[:-1]:
        cum += fractions[label]
        cond = bucket < F.lit(rate_to_hex_threshold(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))


def dsir_importance_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets_hex: int = 3,
    out: str = "dsir_weight",
) -> DataFrame:
    """Per-document DSIR importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by how much more likely its hashed-n-gram bag is
    under the TARGET distribution than under the RAW distribution,

        w(doc) = sum over doc grams of log( p_target[b] / p_raw[b] ),

    where grams are unigrams+bigrams of normalized tokens hashed into
    ``16^n_buckets_hex`` buckets (the paper's hashed feature space) and
    both bucket distributions are add-one smoothed.

    Engine-reproducibility choices (the same discipline as
    dataset_split / mixture_temperature): the bucket is the first
    ``n_buckets_hex`` hex chars of md5(gram) — a deterministic,
    engine-portable hash with no int conversion — and the weight is a
    float sum of logs rounded to 6 dp by the caller for oracle
    comparison (log/ln agree across engines well past 6 dp; the same
    precision argument as ngram_lm_perplexity, which hash-matches).

    Spark shape (bounded state end to end):
    - both corpora explode to (bucket) and aggregate to bucket counts —
      two groupBys over at most 16^n_buckets_hex keys, map-side
      combinable;
    - the two count tables join into one bucket->logratio table
      (bucket-space sized, broadcastable) and the raw gram stream joins
      it once, then one groupBy(id) sums — every shuffle keys on the
      uniform bucket hash or the doc id.
    At 100 TB the bucket table is O(16^k) regardless of corpus size —
    the point of hashed features. Returns (id, n_grams, dsir_weight).
    """
    n_space = 16 ** n_buckets_hex

    def gram_stream(d: DataFrame) -> DataFrame:
        # bigrams are WITHIN-document (lead over the per-doc position
        # window) — both corpora carry the id column for that, even
        # though the target side only contributes gram counts
        from pyspark.sql import Window

        toks = F.split(
            F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", " ")), r"\s+"
        )
        t = d.select(F.col(id_col), F.posexplode(toks).alias("pos", "tok")).where(F.col("tok") != "")
        w = Window.partitionBy(id_col).orderBy("pos")
        uni = t.select(F.col(id_col), F.col("tok").alias("gram"))
        bi = (
            t.withColumn("_nxt", F.lead("tok", 1).over(w))
            .where(F.col("_nxt").isNotNull())
            .select(F.col(id_col), F.concat_ws(" ", "tok", "_nxt").alias("gram"))
        )
        return uni.unionByName(bi).withColumn(
            "bucket", F.substring(F.md5("gram"), 1, n_buckets_hex)
        )

    raw_grams = gram_stream(raw_df).localCheckpoint(eager=True)
    target_grams = gram_stream(target_df)
    raw_counts = raw_grams.groupBy("bucket").agg(F.count("*").alias("_rc"))
    target_counts = target_grams.groupBy("bucket").agg(F.count("*").alias("_tc"))
    # coalesce: an EMPTY corpus side degrades to the uniform smoothed
    # distribution (all-1 numerators over the bucket space) instead of
    # NULL-poisoning every weight
    raw_tot = raw_counts.agg(F.coalesce(F.sum("_rc"), F.lit(0)).alias("_rt"))
    target_tot = target_counts.agg(F.coalesce(F.sum("_tc"), F.lit(0)).alias("_tt"))
    # add-one smoothing over the FULL bucket space: p[b] = (c+1)/(total+B)
    ratios = (
        raw_counts.join(target_counts, "bucket", "full")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(target_tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("_tc"), F.lit(0)) + 1) / (F.col("_tt") + F.lit(n_space)))
                - F.log((F.coalesce(F.col("_rc"), F.lit(0)) + 1) / (F.col("_rt") + F.lit(n_space)))
            ).alias("_lr"),
        )
    )
    return (
        raw_grams.join(ratios, "bucket")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_grams"), F.sum("_lr").alias(out))
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    mode: str = "topk",
    salt: str = "",
    n_buckets_hex: int = 3,
) -> DataFrame:
    """Select ``k`` raw documents toward the target distribution using
    DSIR importance weights.

    ``mode="topk"`` (default) takes the k highest-weight documents —
    deterministic, engine-reproducible (ties break on ascending id), the
    right mode for oracle-checked selection. ``mode="gumbel"`` is the
    paper's importance RESAMPLING: each doc's key is weight + Gumbel
    noise derived from md5(id||salt) (content-stable, no RNG state), so
    selection probability is proportional to exp(weight) — more diverse,
    still deterministic given the salt, but float-transcendental-heavy
    (documented engine-portability caveat, like pow in the mixtures).

    One extra shuffle beyond the weights: a global top-k. Spark plans
    ORDER BY .. LIMIT k as per-partition TakeOrdered + a k-sized merge
    on the driver — no full sort materializes. Returns the selected
    (id, n_grams, weight-or-key) rows.
    """
    if mode not in ("topk", "gumbel"):
        raise ValueError(f"unknown dsir mode {mode!r}")
    w = dsir_importance_weights(raw_df, target_df, text_col, id_col, n_buckets_hex)
    if mode == "gumbel":
        # u in (0,1) from the first 8 hex chars of md5(id||salt); the
        # +0.5 offset keeps u strictly inside the interval
        u = (
            F.conv(F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8), 16, 10)
            .cast("double")
            + F.lit(0.5)
        ) / F.lit(float(2**32))
        key = (F.col("dsir_weight") - F.log(-F.log(u))).alias("_key")
        return w.select(id_col, "n_grams", "dsir_weight", key).orderBy(
            F.col("_key").desc(), F.col(id_col)
        ).limit(k)
    return w.orderBy(F.round(F.col("dsir_weight"), 6).desc(), F.col(id_col)).limit(k)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    max_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group document cap — the C4/RefinedWeb-style
    guard against any single domain/source dominating the corpus: keep
    at most ``max_per_group`` rows per group, chosen by md5(id || salt)
    rank (ties broken by id), so the selection is reproducible across
    engines and runs with no RNG state.

    Spark shape: one ``row_number`` window per group key — the same
    shuffle as any per-group top-k. A mega-domain concentrates its rows
    in one window partition; that is bounded by the domain's own size
    (linear, never a pair join) and AQE's skew handling splits
    oversized partitions for the sort. Returns the surviving rows
    (original columns)."""
    from pyspark.sql import Window

    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    w = Window.partitionBy(group_col).orderBy(hash_bucket(F.col(id_col), salt), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_group)
        .drop("_rk")
    )
