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
) -> DataFrame:
    """Append ``out`` (boolean), ``group_median`` and ``group_mad``
    (doubles) to ``df``. NULL values are never outliers. Groups where
    MAD = 0 (over half the values identical) flag any value different
    from the median — the conventional degenerate-case reading."""
    grp = list(group_cols)
    v = F.col(value_col).cast("double")
    pct = (
        (lambda c: F.percentile_approx(c, 0.5))
        if approx
        else (lambda c: F.percentile(c, 0.5))
    )
    # the median/MAD tables are O(distinct groups) rows: the broadcast
    # hint is GATED on the materialized group count (ADVICE r13 — a
    # forced hint OOMs at high cardinality, while relying on AQE alone
    # costs extra adaptive stages when the table is obviously tiny).
    # The keyless case IS a single row, so its hint is unconditional.
    _BCAST_MAX_GROUPS = 100_000

    def _maybe_broadcast(t):
        return F.broadcast(t) if t.count() <= _BCAST_MAX_GROUPS else t

    med = df.groupBy(*grp).agg(pct(v).alias("group_median"))
    if grp:
        med = _maybe_broadcast(med.localCheckpoint(eager=True))
        j = df.join(med, grp)
    else:
        j = df.crossJoin(F.broadcast(med))
    dev = F.abs(v - F.col("group_median"))
    mad = j.groupBy(*grp).agg(pct(dev).alias("group_mad"))
    if grp:
        mad = _maybe_broadcast(mad.localCheckpoint(eager=True))
        j2 = j.join(mad, grp)
    else:
        j2 = j.crossJoin(F.broadcast(mad))
    cut = F.lit(float(k) * 1.4826) * F.col("group_mad")
    flag = F.when(v.isNull(), F.lit(False)).otherwise(
        F.when(F.col("group_mad") == 0, dev > 0).otherwise(dev > cut)
    )
    return j2.withColumn(out, flag)
