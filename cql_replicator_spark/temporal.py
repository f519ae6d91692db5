"""Temporal joins: as-of (point-in-time) enrichment.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive
formulations both fail at scale — a range-condition join
(``l.ts >= r.ts``) degenerates to a per-key cartesian filtered after
the fact, and a windowed ``max(r.ts) <= l.ts`` subquery scans the
right side once per distinct left timestamp. The scale-correct shape
is the UNION-MERGE: tag both inputs, union them into one keyed
timeline, sort each key's timeline once (a single window shuffle), and
forward-fill the right side's payload with ``last(ignorenulls)`` so
every left row reads the most recent right row at or before its
timestamp. Cost: ONE shuffle of |left|+|right| rows, no row
multiplication, no per-timestamp rescans — the same merge-join shape
kdb/QuestDB/DuckDB execute natively.

Skew note (100 TB): the window partitions by join key, so a single
pathological key serializes into one task. If a key's timeline exceeds
a task's memory, pre-split it by time range (salt on
``date_trunc('day', ts)``) and seed each chunk with the previous
chunk's final state — the fill is associative, so chunked fills
compose. Not implemented here because keyed timelines (user histories,
device state) are bounded in every workload the reference serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    matched_ts_col: str | None = "asof_ts",
) -> DataFrame:
    """Enrich each left row with the latest right row whose
    ``right_ts <= left_ts`` for the same key (backward as-of, inclusive
    — the ASOF JOIN default in DuckDB/kdb). Left rows with no prior
    right row keep null payload (LEFT semantics).

    payload: right columns to carry (default: everything but key+ts).
    matched_ts_col: name for the matched right timestamp column (None
    to omit). Left columns pass through unchanged.

    Ordering within a timestamp tie: the right row sorts first, so a
    left row at exactly t sees a right update at t — matching the
    inclusive ``>=`` of the native forms.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload if payload is not None else [
        c for c in right.columns if c not in {*keys, right_ts}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left: {sorted(overlap)}")

    left_cols = [c for c in left.columns if c not in keys]
    fill_cols = payload + ["__rts"]

    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).alias(c) for c in payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__rts"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c) for c in payload],
        F.col(right_ts).alias("__rts"),
    )
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = l_side.unionByName(r_side).select(
        *keys, "__ts", "__side", *left_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
    )
    # left_ts rides along inside left_cols; __ts/__side/__rts are
    # bookkeeping only
    out = [*keys, *left_cols, *payload]
    result = merged.filter(F.col("__side") == 1)
    if matched_ts_col is not None:
        result = result.withColumn(matched_ts_col, F.col("__rts"))
        out.append(matched_ts_col)
    return result.select(*out)
