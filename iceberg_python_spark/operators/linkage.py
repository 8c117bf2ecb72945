"""Record linkage / entity resolution: blocked fuzzy matching.

The classic Fellegi-Sunter shape reduced to its scalable core: a
BLOCKING join bounds the candidate space (never all-pairs), a
JVM-side string distance scores candidates, and a deterministic
best-match rule resolves each left record. This is the dedup family's
cross-table sibling — `dedup.py` collapses near-identical rows inside
one corpus; linkage aligns two corpora that describe the same
entities with different spellings (crawl metadata vs. canonical
catalogs, user tables across sources).

Spark shape at 100 TB:
- candidates come ONLY from equi-joins on the block keys — Catalyst
  plans an ordinary shuffled (or broadcast, if one side is small)
  hash join; pair count is sum over blocks of |a_block|·|b_block|,
  never |a|·|b|. Skewed blocks are the operator's documented failure
  mode (same as any blocked dedup): pick higher-cardinality keys or
  salt.
- scoring is `levenshtein()` — a JVM built-in inside whole-stage
  codegen, no Python anywhere.
- best match per left record is one window over the candidate set
  (partitioned by the left id — re-uses the join's hash partitioning
  when the left id is a block key; otherwise one extra shuffle of the
  CANDIDATE set, which blocking already made small).

Ties break deterministically on (distance, right id) so any engine
reproduces the same matches — the driver row value-hashes matches
against a DuckDB replica.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["record_linkage"]


def record_linkage(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_on: Sequence[Tuple[str, str]],
    compare: Sequence[Tuple[str, str]],
    max_distance: int = 2,
    best_only: bool = True,
) -> DataFrame:
    """Match ``left`` records to ``right`` records.

    - ``block_on``: (left_col, right_col) equality pairs — the ONLY
      source of candidates.
    - ``compare``: (left_col, right_col) string pairs; the score is
      the SUM of Levenshtein distances across pairs.
    - ``max_distance``: candidates scoring above this are dropped.
    - ``best_only``: keep one row per left record (min distance, ties
      to the smallest right id); ``False`` returns every candidate
      within ``max_distance``.

    Returns ``(left_id, right_id, distance)``. Left records with no
    candidate in range are absent — an outer variant is a left join
    away and keeping them here would force NULL right ids through
    every downstream equi-join.
    """
    if left_id == right_id:
        raise ValueError(
            f"left_id and right_id are both {left_id!r}; alias one side first "
            "so the output columns are unambiguous"
        )
    if not block_on:
        raise ValueError(
            "record_linkage requires blocking keys: an unblocked linkage is an "
            "all-pairs cross join, quadratic at any scale"
        )
    if not compare:
        raise ValueError("record_linkage needs at least one compare column pair")
    a = left.select(
        F.col(left_id).alias("_lid"),
        *[F.col(lc).alias(f"_lb{i}") for i, (lc, _) in enumerate(block_on)],
        *[F.col(lc).alias(f"_lc{i}") for i, (lc, _) in enumerate(compare)],
    )
    b = right.select(
        F.col(right_id).alias("_rid"),
        *[F.col(rc).alias(f"_rb{i}") for i, (_, rc) in enumerate(block_on)],
        *[F.col(rc).alias(f"_rc{i}") for i, (_, rc) in enumerate(compare)],
    )
    cond = None
    for i in range(len(block_on)):
        c = F.col(f"_lb{i}") == F.col(f"_rb{i}")
        cond = c if cond is None else cond & c
    # thresholded levenshtein (banded DP, Spark 3.5+): the unbounded
    # form fills the full O(|l|*|r|) matrix per candidate pair; with the
    # threshold it early-exits past max_distance and returns -1. Any
    # per-column distance > max_distance already exceeds the summed
    # cutoff, so dropping -1 rows is exactly the old filter.
    ds = [
        F.levenshtein(F.col(f"_lc{i}"), F.col(f"_rc{i}"), max_distance)
        for i in range(len(compare))
    ]
    in_band = None
    for d in ds:
        c = d >= 0
        in_band = c if in_band is None else in_band & c
    dist = None
    for d in ds:
        dist = d if dist is None else dist + d
    cand = (
        a.join(b, cond)
        .select("_lid", "_rid", in_band.alias("_ib"), dist.alias("distance"))
        .where(F.col("_ib") & (F.col("distance") <= max_distance))
        .drop("_ib")
    )
    if best_only:
        w = Window.partitionBy("_lid").orderBy("distance", "_rid")
        cand = cand.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    return cand.select(
        F.col("_lid").alias(left_id), F.col("_rid").alias(right_id), "distance"
    )
