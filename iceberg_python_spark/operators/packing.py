"""Training-data layout operators: sequence packing and mixture sampling.

The two pipeline steps between a cleaned corpus and a pretraining run:

- ``pack_sequences``: the concatenate-and-chunk layout — order documents
  deterministically, lay their tokens end-to-end, and cut fixed-length
  training sequences; each document gets its sequence id and offset.
- ``mixture_sample``: per-source token budgets — deterministically keep
  documents from each stratum (in hash order) until that stratum's token
  budget is filled, the "data mixture" step of corpus assembly.

Both are pure Spark built-ins over a **distributed prefix sum**: a naive
``sum() over (order by …)`` with no partition key funnels the whole
corpus through ONE window task — fine at 60k rows, dead at 100 TB. Here
rows are bucketed by their hash prefix (256 buckets), the running sum is
computed per bucket in parallel, and each bucket's starting offset comes
from a tiny 256-row aggregate broadcast back. Results are byte-identical
to the single-window formulation (the oracle SQL uses exactly that), at
the cost of one narrow aggregate + broadcast join instead of a global
serial window.

Token counts use the whitespace tokenization of ``text.token_stats`` so
every operator in the family agrees on "tokens".
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS = r"\s+"


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    t = F.col(text_col)
    n = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(F.split(F.trim(t), _WS)))
    return df.withColumn("n_tokens", n.cast("long"))


def _with_order_hash(df: DataFrame, key_col: str, salt: str) -> DataFrame:
    """Deterministic shuffle order: full md5 as the sort key, its first
    two hex chars as the prefix-sum bucket (256-way)."""
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn("_h", h).withColumn("_bkt", F.substring(h, 1, 2))


def _distributed_prefix_sum(df: DataFrame, part_cols: list, value_col: str, tiebreak: str) -> DataFrame:
    """cum_end = running sum of `value_col` in (part_cols…, _h, tiebreak)
    order, computed without a global serial window: per-(part, bucket)
    windows run in parallel; per-bucket totals (|parts|·256 rows) get
    their own cumulative offsets and are broadcast back."""
    in_bucket = Window.partitionBy(*part_cols, "_bkt").orderBy("_h", tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    df = df.withColumn("_cum_in_bkt", F.sum(value_col).over(in_bucket))
    bucket_totals = df.groupBy(*part_cols, "_bkt").agg(F.sum(value_col).alias("_bkt_total"))
    offs = bucket_totals.withColumn(
        "_bkt_offset",
        F.coalesce(
            F.sum("_bkt_total").over(
                Window.partitionBy(*part_cols).orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).drop("_bkt_total")
    df = df.join(F.broadcast(offs), [*part_cols, "_bkt"])
    return df.withColumn("_cum_end", F.col("_bkt_offset") + F.col("_cum_in_bkt")).drop(
        "_cum_in_bkt", "_bkt_offset"
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 2048,
    salt: str = "",
) -> DataFrame:
    """Concatenate-and-chunk packing plan: documents are laid end-to-end
    in deterministic hash order and cut into ``seq_len``-token training
    sequences. Returns one row per document:

    - ``n_tokens`` — whitespace token count
    - ``start_offset`` — global token offset where the document begins
    - ``seq_id`` — index of the training sequence containing that offset
    - ``offset_in_seq`` — position within that sequence
    - ``crosses_boundary`` — true when the document spills into the next
      sequence (its tail continues there)

    The assignment is a pure function of (doc ids, texts, seq_len, salt),
    so re-running over re-partitioned / re-ordered input produces the
    identical layout — what makes checkpoint-resume of a tokenization job
    safe. One parallel prefix sum + a 256-row broadcast; no global
    serial window, no driver collect of per-doc state.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    base = _with_order_hash(_with_tokens(df.select(id_col, text_col), text_col), id_col, salt)
    base = base.select(id_col, "n_tokens", "_h", "_bkt")
    summed = _distributed_prefix_sum(base, [], "n_tokens", id_col)
    start = (F.col("_cum_end") - F.col("n_tokens")).alias("start_offset")
    return (
        summed.select(
            F.col(id_col),
            F.col("n_tokens"),
            start,
            F.floor((F.col("_cum_end") - F.col("n_tokens")) / seq_len).cast("long").alias("seq_id"),
            ((F.col("_cum_end") - F.col("n_tokens")) % seq_len).cast("long").alias("offset_in_seq"),
            (
                (F.col("n_tokens") > 0)
                & (F.floor((F.col("_cum_end") - 1) / seq_len) > F.floor((F.col("_cum_end") - F.col("n_tokens")) / seq_len))
            ).alias("crosses_boundary"),
        )
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    text_col: str,
    token_budgets: Mapping[str, int],
    salt: str = "",
    allow_repeats: bool = False,
) -> DataFrame:
    """Per-stratum token-budget sampling (the corpus-mixture step): for
    each stratum, keep documents in deterministic hash order until the
    stratum's token budget is reached — a document is kept if it STARTS
    before the budget boundary, so each stratum overshoots by at most one
    document (standard practice; exact-trim happens at tokenization).
    Strata without a budget are dropped.

    ``allow_repeats=True`` handles budgets ABOVE a stratum's total token
    count by repeating the stratum in whole epochs plus a deterministic
    partial epoch (the standard upsampling recipe for scarce high-quality
    sources); every output row then carries a 0-based ``epoch`` column.
    With it False (default), a budget past the total just keeps the whole
    stratum once.

    Deterministic in (keys, texts, budgets, salt): growing a 50B-token
    mixture to 100B keeps every previously selected document — hash-order
    prefixes are nested, so mixtures are reproducible and monotonic
    (with repeats: epochs only extend). Same distributed prefix sum as
    ``pack_sequences``; per-stratum totals are a strata-sized broadcast.
    """
    if not token_budgets:
        raise ValueError("token_budgets must name at least one stratum")
    base = _with_order_hash(_with_tokens(df, text_col), key_col, salt)
    keep = base.where(F.col(strata_col).isin(list(token_budgets)))
    summed = _distributed_prefix_sum(keep, [strata_col], "n_tokens", key_col)
    budget = F.lit(None).cast("long")
    for value, b in sorted(token_budgets.items()):
        budget = F.when(F.col(strata_col) == value, F.lit(int(b))).otherwise(budget)
    if not allow_repeats:
        return (
            summed.where((F.col("_cum_end") - F.col("n_tokens")) < budget)
            .drop("_h", "_bkt", "_cum_end")
        )
    totals = (
        summed.groupBy(strata_col)
        .agg(F.max("_cum_end").alias("_total"))
        .withColumn("_budget", budget)
        .withColumn("_n_full", F.floor(F.col("_budget") / F.col("_total")).cast("long"))
        .withColumn("_rem", (F.col("_budget") % F.col("_total")).cast("long"))
    )
    joined = summed.join(F.broadcast(totals), strata_col)
    full = (
        joined.where(F.col("_n_full") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_full") - 1)))
    )
    partial = joined.where((F.col("_cum_end") - F.col("n_tokens")) < F.col("_rem")).withColumn(
        "epoch", F.col("_n_full")
    )
    drop = ["_h", "_bkt", "_cum_end", "_total", "_budget", "_n_full", "_rem"]
    return full.unionByName(partial).drop(*drop)


def temperature_budgets(
    totals: Mapping[str, int], total_token_budget: int, alpha: float = 0.5
) -> dict:
    """Per-stratum token budgets from temperature-scaled corpus sizes —
    the multilingual/multi-source LM recipe (alpha-sampling, mBERT/XLM-R
    style): p_i ∝ n_i^alpha, alpha<1 upweights small sources.

    INTEGER-EXACT so any engine reproduces the budgets bit-for-bit:
    weights are floor(n_i^alpha * 1e6) (for the default alpha=0.5,
    sqrt is IEEE-correctly-rounded, so the weight is identical in
    Python, the JVM and DuckDB; other alphas go through pow, whose last
    ulp may differ across libms), the normalizer is an INTEGER sum
    (associative — no float-order sensitivity), and each budget is the
    integer division (B * w_i) // Z."""
    import math

    if not totals:
        raise ValueError("totals must name at least one stratum")
    weights = {
        s: int(math.floor((math.sqrt(n) if alpha == 0.5 else float(n) ** alpha) * 1_000_000))
        for s, n in totals.items()
    }
    z = sum(weights.values())
    if z <= 0:
        raise ValueError("all strata are empty")
    return {s: (int(total_token_budget) * w) // z for s, w in weights.items()}


def mixture_temperature(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    text_col: str,
    total_token_budget: int,
    alpha: float = 0.5,
    salt: str = "",
    allow_repeats: bool = False,
) -> DataFrame:
    """Temperature-based mixture: derive per-stratum budgets from the
    corpus's own size distribution (``temperature_budgets``) and select
    with the deterministic hash-order prefix of ``mixture_sample``.

    The per-stratum totals are a strata-sized aggregate collected to the
    driver (metadata scale — same stance as IVF centroid training); the
    selection pass stays fully distributed. Inherits mixture_sample's
    monotonicity: growing the budget only extends each stratum's
    prefix."""
    # NULL strata are dropped here (they'd get no budget and be dropped
    # by mixture_sample anyway, and a None key breaks the deterministic
    # sorted() ordering budgets rely on)
    totals = {
        r[strata_col]: r["_n"]
        for r in _with_tokens(df.where(F.col(strata_col).isNotNull()), text_col)
        .groupBy(strata_col)
        .agg(F.sum("n_tokens").alias("_n"))
        .collect()
    }
    if not totals:
        # every row had a NULL stratum (or the input was empty): the
        # mixture is empty, returned schema-correct rather than raising
        # so pipeline compositions stay total
        empty = _with_tokens(df, text_col).limit(0)
        if allow_repeats:
            empty = empty.withColumn("epoch", F.lit(0).cast("long"))
        return empty
    budgets = temperature_budgets(totals, total_token_budget, alpha)
    return mixture_sample(
        df, strata_col, key_col, text_col, budgets, salt=salt, allow_repeats=allow_repeats
    )
