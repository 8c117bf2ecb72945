"""Market-basket affinity: co-occurrence mining over grouped items.

The classic association-rule core (support / confidence / lift for
item PAIRS) as plain DataFrame algebra — the "what parts ship
together" / "what docs co-cite" question over any (basket, item)
table. Full Apriori beyond pairs explodes combinatorially and almost
never earns its cost on modern corpora; pairs cover the ranking use
cases (recommendation shortlists, co-occurrence graphs for clustering)
and stay quadratic only WITHIN a basket.

Spark shape (100 TB):
- distinct (basket, item) once, then ONE self-equi-join on the basket
  key with ``item_a < item_b`` — pair volume is Σ |basket|² over
  baskets, bounded by the largest basket (a hot basket is a data
  hotspot: AQE skew-split or cap basket size upstream);
- supports aggregate with one groupBy(pair); item marginals with one
  groupBy(item) — both map-side combinable;
- confidence/lift emit as FLOOR-of-double micro-units (one IEEE
  division each, identically rounded on any engine) so results
  value-hash cross-engine.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["basket_affinity"]


def basket_affinity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Pair co-occurrence table: ``(item_a, item_b, support,
    support_a, support_b, confidence_micro, lift_micro)`` with
    ``item_a < item_b``, pairs below ``min_support`` dropped.

    ``confidence_micro`` = floor(1e6 · P(b|a)); ``lift_micro`` =
    floor(1e6 · P(a,b) / (P(a)·P(b))) — lift > 1e6 means the pair
    co-occurs more than independence predicts."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    items = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    n_baskets = items.select("_b").distinct().count()
    if n_baskets == 0:
        raise ValueError("basket_affinity: no baskets")
    marg = items.groupBy("_i").agg(F.count("*").cast("long").alias("_m"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(b, (F.col("a._b") == F.col("b._b")) & (F.col("a._i") < F.col("b._i")))
        .groupBy(F.col("a._i").alias("item_a"), F.col("b._i").alias("item_b"))
        .agg(F.count("*").cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    out = (
        pairs.join(marg.select(F.col("_i").alias("item_a"), F.col("_m").alias("support_a")), "item_a")
        .join(marg.select(F.col("_i").alias("item_b"), F.col("_m").alias("support_b")), "item_b")
    )
    conf = F.floor(F.col("support") * F.lit(1_000_000) / F.col("support_a")).cast("long")
    lift = F.floor(
        F.col("support").cast("double")
        * F.lit(float(n_baskets))
        * F.lit(1_000_000.0)
        / (F.col("support_a").cast("double") * F.col("support_b").cast("double"))
    ).cast("long")
    return out.select(
        "item_a", "item_b", "support", "support_a", "support_b",
        conf.alias("confidence_micro"), lift.alias("lift_micro"),
    )
