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
