"""CDC consumption operators: turn a row-level changelog into history.

``scd2_from_changelog`` builds a Type-2 slowly-changing-dimension
history from the engine's ``IncrementalChangelogScan`` output (rows
tagged ``_change_type`` insert|delete and ``_change_ordinal``): every
insert opens a version valid from its ordinal; the first delete for
the same key at a LATER ordinal closes it (a delete at the SAME
ordinal belongs to the version it replaces — Iceberg changelogs emit
an update as delete+insert within one snapshot). ``valid_to IS NULL``
marks the current version.

CoW rewrites also emit delete+insert pairs for rows merely CARRIED
through a rewritten file; ``collapse_carried=True`` (default) cancels
those no-op pairs (same key, same ordinal, identical tracked values)
so storage-level churn never fabricates versions — the history tracks
LOGICAL change only.

Spark shape (100 TB): the carried-pair cancel is one groupBy on
(key, ordinal, tracked-values); the version pairing is one window per
key over event positions — two key shuffles total, per-key state
bounded by that key's change count, no joins against the full history.
Assumes the dimension invariant (at most one live row per key at a
time), which is what makes SCD2 well-defined at all.

No reference counterpart (the reference stops at the append-only
incremental scan, table/__init__.py:2372); the changelog itself is
this engine's ``IncrementalChangelogScan``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def scd2_from_changelog(
    changes: DataFrame,
    keys: Sequence[str],
    ordinal_col: str = "_change_ordinal",
    type_col: str = "_change_type",
    collapse_carried: bool = True,
    tracked: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Type-2 history from changelog rows.

    ``keys`` identify the dimension entity; ``tracked`` are the value
    columns carried into versions (default: every non-meta column not
    in ``keys``). Returns one row per VERSION: keys + tracked +
    ``valid_from`` / ``valid_to`` (change ordinals; ``valid_to`` NULL =
    current) + ``is_current``.
    """
    keys = list(keys)
    meta_cols = {ordinal_col, type_col, "_change_snapshot_id"}
    if tracked is None:
        tracked = [c for c in changes.columns if c not in meta_cols and c not in keys]
    tracked = list(tracked)

    ev = changes.select(
        *keys,
        *tracked,
        F.col(ordinal_col).cast("long").alias("_ord"),
        (F.col(type_col) == F.lit("delete")).alias("_is_del"),
    )

    if collapse_carried:
        # cancel matched delete+insert pairs with identical tracked
        # values at the same ordinal (file-rewrite churn): per
        # (key, ordinal, values) group, min(inserts, deletes) pairs
        # annihilate; survivors re-expand from the net counts
        g = ev.groupBy(*keys, *tracked, "_ord").agg(
            F.count_if(~F.col("_is_del")).alias("_ni"),
            F.count_if(F.col("_is_del")).alias("_nd"),
        )
        net = g.select(
            *keys,
            *tracked,
            "_ord",
            (F.col("_ni") - F.least("_ni", "_nd")).alias("_ni"),
            (F.col("_nd") - F.least("_ni", "_nd")).alias("_nd"),
        ).where((F.col("_ni") > 0) | (F.col("_nd") > 0))
        # the dimension invariant keeps net counts at 0/1; explode via
        # sequence stays correct if a malformed feed ever exceeds it
        ev = net.select(
            *keys,
            *tracked,
            "_ord",
            # sequence(1, 0) yields DESCENDING [1, 0], not empty -
            # guard each side explicitly
            F.explode(
                F.concat(
                    F.expr("if(_ni > 0, transform(sequence(1, _ni), x -> false), array())"),
                    F.expr("if(_nd > 0, transform(sequence(1, _nd), x -> true), array())"),
                )
            ).alias("_is_del"),
        )

    # event position interleaves deletes before inserts at the same
    # ordinal (the delete closes the PREVIOUS version; the insert at
    # the same ordinal opens the next): delete at d -> 2d, insert at
    # o -> 2o+1, so an insert's closing delete is the first delete
    # position beyond it, i.e. strictly-later ordinals only.
    ev = ev.withColumn(
        "_pos", F.col("_ord") * 2 + F.when(F.col("_is_del"), F.lit(0)).otherwise(F.lit(1))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_pos")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    closing = F.min(F.when(F.col("_is_del"), F.col("_ord"))).over(w)
    out = (
        ev.withColumn("_valid_to", closing)
        .where(~F.col("_is_del"))
        .select(
            *keys,
            *tracked,
            F.col("_ord").alias("valid_from"),
            F.col("_valid_to").alias("valid_to"),
            F.col("_valid_to").isNull().alias("is_current"),
        )
    )
    return out
