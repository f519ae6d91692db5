"""Incremental view maintenance: refresh grouped aggregates from the
CDC change set instead of rescanning the base table.

The reference keeps running stats incrementally (aggregation-on-write
``putStats`` K:759-785, delta flush K:1161-1215) but only for its own
job counters; the same idea applied to USER aggregates is what makes a
100 TB materialized view operable — after a discovery cycle finds 0.1%
changed keys, the per-group refresh should cost O(changes), not
O(table). Sum/count/non-null-count (and anything derivable: mean,
totals) are self-maintainable: each changed key contributes
``+new - old`` to its group, and merging those deltas into the
previous aggregate state is one change-sized join. The non-null
counter (``nn``/``d_nn``) is what makes the refresh SQL-exact for
NULL values: sum over a group with zero non-null values reads NULL,
exactly as a recompute would.

Shape at scale: ``change_deltas`` is the SAME single full-outer join
the tagged diff already does (diff.compute_changes_tagged) — one
shuffle per snapshot side, unchanged keys dropped before any
aggregation — and its output is bounded by the change count, then
collapses to one row per TOUCHED group. ``refresh_aggregate`` joins
|groups| state rows with |touched groups| delta rows; AQE broadcasts
the delta side whenever the cycle was small. Nothing in the refresh
path ever rescans the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_deltas(
    curr: DataFrame,
    prev: DataFrame,
    pk_cols: list[str],
    group_cols: list[str],
    val_col: str,
) -> DataFrame:
    """Per-group ``(d_sum, d_count)`` between two keyed snapshots,
    computed change-set-sized: one full-outer join on the keys,
    unchanged keys (same group, same value, null-safe) filtered before
    aggregation. An update that MOVES a row between groups contributes
    ``-old`` to the old group and ``+new`` to the new one — exactly
    what a recompute would observe. Inserts contribute ``(+v, +1)``,
    deletes ``(-v, -1)``, in-group updates ``(new-old, 0)``."""
    c = curr.select(
        *pk_cols,
        *[F.col(g).alias(f"__cg_{g}") for g in group_cols],
        F.col(val_col).alias("__cv"), F.lit(True).alias("__in_c"))
    p = prev.select(
        *pk_cols,
        *[F.col(g).alias(f"__pg_{g}") for g in group_cols],
        F.col(val_col).alias("__pv"), F.lit(True).alias("__in_p"))
    j = c.join(p, pk_cols, "full_outer")
    unchanged = (F.col("__in_c").isNotNull() & F.col("__in_p").isNotNull()
                 & F.col("__cv").eqNullSafe(F.col("__pv")))
    for g in group_cols:
        unchanged = unchanged & F.col(f"__cg_{g}").eqNullSafe(F.col(f"__pg_{g}"))
    ch = j.filter(~unchanged)

    pos = ch.filter(F.col("__in_c").isNotNull()).select(
        *[F.col(f"__cg_{g}").alias(g) for g in group_cols],
        F.col("__cv").alias("__v"), F.lit(1).alias("__w"))
    neg = ch.filter(F.col("__in_p").isNotNull()).select(
        *[F.col(f"__pg_{g}").alias(g) for g in group_cols],
        F.col("__pv").alias("__v"), F.lit(-1).alias("__w"))
    return _signed_deltas(pos.unionByName(neg), group_cols)


def _signed_deltas(rows: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse signed (``__v``, ``__w``) contribution rows to one
    ``(d_sum, d_count, d_nn)`` row per touched group. ``d_nn`` is the
    signed count of NON-NULL value contributions — the third
    self-maintainable aggregate that lets refresh_aggregate
    distinguish "group sums to 0" from "group never saw a non-null
    value" (SQL: NULL), closing the all-NULL-group bound."""
    return (
        rows.groupBy(*group_cols)
        .agg(F.coalesce(F.sum(F.col("__w") * F.col("__v")), F.lit(0))
              .alias("d_sum"),
             F.sum("__w").alias("d_count"),
             F.coalesce(
                 F.sum(F.col("__w")
                       * F.col("__v").isNotNull().cast("int")),
                 F.lit(0)).alias("d_nn"))
    )


def deltas_from_envelope(
    env: DataFrame,
    group_cols: list[str],
    before_col: str,
    after_col: str,
    op_col: str = "op",
    before_group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group ``(d_sum, d_count)`` from a CDC envelope stream
    (diff.compute_changes_envelope rows: op + before/after images) —
    the streaming-friendly delta source: no snapshot join needed, each
    change row contributes ``+after`` (insert/update) and ``-before``
    (delete/update) to its group, so a foreachBatch consumer can
    maintain an aggregate from the change FEED alone.

    Group columns and moves: ``group_cols`` are the AFTER-image group
    values. If the grouping attribute itself can change in an update,
    the ``-before`` delta must land in the OLD group — pass the
    envelope's before-image group columns as ``before_group_cols``
    (positionally matching ``group_cols``); otherwise both deltas land
    in the after group and the old group's aggregate silently drifts
    from a recompute. With correct before-groups (or immutable group
    attributes, the default assumption) output is identical to
    change_deltas over the same change set."""
    bg = before_group_cols if before_group_cols is not None else group_cols
    if len(bg) != len(group_cols):
        raise ValueError(
            f"before_group_cols must match group_cols positionally "
            f"({len(bg)} vs {len(group_cols)})")
    pos = env.filter(F.col(op_col) != "delete").select(
        *group_cols, F.col(after_col).alias("__v"), F.lit(1).alias("__w"))
    neg = env.filter(F.col(op_col) != "insert").select(
        *[F.col(b).alias(g) for b, g in zip(bg, group_cols)],
        F.col(before_col).alias("__v"), F.lit(-1).alias("__w"))
    return _signed_deltas(pos.unionByName(neg), group_cols)


def refresh_aggregate(
    state: DataFrame,
    deltas: DataFrame,
    group_cols: list[str],
    sum_col: str = "sum_v",
    count_col: str = "n",
    nonnull_col: str = "nn",
) -> DataFrame:
    """Merge a delta frame into the previous aggregate state: one
    full-outer join on the group keys, additive merge, and groups whose
    count reaches zero disappear (exactly as a recompute would drop
    them). Output schema matches the input state, so refreshes chain
    across cycles.

    NULL exactness: when the state carries ``nonnull_col`` (a running
    count of non-null values — build it as ``F.count(val_col)`` at
    state init; change_deltas/deltas_from_envelope emit the matching
    ``d_nn``), the refreshed ``sum_col`` is NULL for any group whose
    non-null count is 0 — exactly SQL ``sum`` over an all-NULL group.
    The NULL state sum round-trips: the merge coalesces it back to 0,
    which IS the group's non-null contribution total, so refreshes
    chain without drift.

    LEGACY (sum, count) STATES — documented degraded mode, pinned by
    test_refresh_legacy_state_reads_zero_not_null: without the
    non-null counter, an all-NULL group reads 0 where SQL says NULL
    ("zero non-null values seen" is not representable in two columns).
    A state WITH ``nonnull_col`` but deltas WITHOUT ``d_nn`` raises —
    silently dropping the counter would corrupt it."""
    track_nn = nonnull_col in state.columns
    if track_nn and "d_nn" not in deltas.columns:
        raise ValueError(
            f"state carries {nonnull_col!r} but deltas have no d_nn "
            f"column — build deltas with change_deltas/"
            f"deltas_from_envelope (or add a signed non-null count)")
    d_cols = [F.col("d_sum").alias("__ds"), F.col("d_count").alias("__dn")]
    if track_nn:
        d_cols.append(F.col("d_nn").alias("__dnn"))
    d = deltas.select(*group_cols, *d_cols)
    merged = state.join(d, group_cols, "full_outer")
    new_sum = (F.coalesce(F.col(sum_col), F.lit(0))
               + F.coalesce(F.col("__ds"), F.lit(0)))
    new_n = (F.coalesce(F.col(count_col), F.lit(0))
             + F.coalesce(F.col("__dn"), F.lit(0)))
    if track_nn:
        new_nn = (F.coalesce(F.col(nonnull_col), F.lit(0))
                  + F.coalesce(F.col("__dnn"), F.lit(0)))
        return (
            merged.select(
                *group_cols,
                F.when(new_nn > 0, new_sum).alias(sum_col),
                new_n.alias(count_col),
                new_nn.alias(nonnull_col))
            .filter(F.col(count_col) > 0)
        )
    return (
        merged.select(*group_cols, new_sum.alias(sum_col), new_n.alias(count_col))
        .filter(F.col(count_col) > 0)
    )
