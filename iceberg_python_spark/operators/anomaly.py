"""Robust anomaly flagging: median/MAD outliers per group.

The curation-pipeline question "which rows are wildly off for their
group" (documents 100× longer than their source's norm, events with
impossible values) answered with the ROBUST statistics pair — median
and MAD (median absolute deviation) — because mean/stddev are
themselves dragged by the outliers they're supposed to find (one 1e9
value moves a mean arbitrarily; it moves a median one rank).

``|x − median| > k · 1.4826 · MAD`` is the standard cut: 1.4826
scales MAD to the σ of a normal distribution, k=3.5 is the usual
"definitely anomalous" threshold (Iglewicz-Hoaglin).

Spark shape (100 TB): two aggregation passes over the value column —
one for the per-group median, one (after a broadcast-or-shuffle join
of the O(groups) median table) for the MAD — then flagging is a
narrow projection. `percentile` is Spark's EXACT aggregator: it
materializes each group's value multiset on the agg side, which is
the honest cost of an exact median (O(group size) memory in the agg
state); at extreme group sizes switch to `approx=True`
(`percentile_approx`, GK sketch, bounded state) — flags then carry
the sketch's rank-error, which is fine for anomaly cuts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["mad_outliers"]


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: float = 3.5,
    approx: bool = False,
    out: str = "is_outlier",
    small_groups: bool = True,
) -> DataFrame:
    """Append ``out`` (boolean), ``group_median`` and ``group_mad``
    (doubles) to ``df``. NULL values are never outliers. Groups where
    MAD = 0 (over half the values identical) flag any value different
    from the median — the conventional degenerate-case reading.

    ``small_groups`` (ADVICE r13): the per-group median/MAD tables are
    O(distinct groups) rows; with the default ``True`` they join via a
    broadcast hint — the caller asserts groups fit executor memory,
    the same documented contract as ``salted_join``'s ``hot_keys`` or
    LSH's ``max_bucket``. Pass ``False`` at high group cardinality to
    take unhinted shuffled joins (AQE may still broadcast if small)."""
    grp = list(group_cols)
    v = F.col(value_col).cast("double")
    pct = (
        (lambda c: F.percentile_approx(c, 0.5))
        if approx
        else (lambda c: F.percentile(c, 0.5))
    )
    # the keyless case IS a single row, so its hint is unconditional
    hint = (lambda t: F.broadcast(t)) if small_groups else (lambda t: t)
    med = df.groupBy(*grp).agg(pct(v).alias("group_median"))
    j = df.join(hint(med), grp) if grp else df.crossJoin(F.broadcast(med))
    dev = F.abs(v - F.col("group_median"))
    mad = j.groupBy(*grp).agg(pct(dev).alias("group_mad"))
    j2 = j.join(hint(mad), grp) if grp else j.crossJoin(F.broadcast(mad))
    cut = F.lit(float(k) * 1.4826) * F.col("group_mad")
    flag = F.when(v.isNull(), F.lit(False)).otherwise(
        F.when(F.col("group_mad") == 0, dev > 0).otherwise(dev > cut)
    )
    return j2.withColumn(out, flag)
