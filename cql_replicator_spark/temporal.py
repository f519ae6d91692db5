"""Temporal joins: as-of (point-in-time) enrichment and bucketed
point-in-interval range joins.

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


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    on: list[str] | None = None,
    max_span_buckets: int = 4096,
) -> DataFrame:
    """Inner join each point row to every interval row whose half-open
    range ``[lo, hi)`` contains it (optionally also equi-keyed on
    ``on``), without a nested-loop plan.

    Spark turns a bare inequality join condition into a
    BroadcastNestedLoopJoin — O(|points| x |intervals|) work and an
    entire side broadcast, which is exactly what dies first at 100 TB.
    The scale-correct shape is BUCKETING: quantize the domain into
    buckets of ``bucket_width``; a point falls in exactly one bucket, an
    interval covers ``len/width + 1`` consecutive buckets (exploded via
    ``sequence``), and pairing becomes a plain equi-join on
    ``(bucket, *on)`` that Catalyst shuffles/broadcasts like any other,
    followed by the exact containment filter. Because the point's
    bucket is unique, every qualifying (point, interval) pair emerges
    exactly once — no post-join dedup.

    Tuning: pick ``bucket_width`` near the TYPICAL interval length —
    replication of the interval side is ``avg_len/width + 2`` while a
    too-narrow width multiplies the build side and a too-wide width
    degrades toward one giant bucket. Degenerate inputs (an interval
    spanning more than ``max_span_buckets`` buckets) raise at runtime
    via ``raise_error`` instead of silently exploding the join: at
    scale you want the loud failure, not the 10^6-row explode.

    Columns ``point_col``/``lo_col``/``hi_col`` must be numeric and in
    the same unit (cast timestamps with ``unix_timestamp`` first).
    Reference analogue: the reference only ever expresses equi/anti
    joins (SURVEY §2.4 notes range joins as absent) — this extends the
    join surface the Spark-native way.
    """
    keys = list(on or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"ambiguous columns, rename first: {sorted(overlap)}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    w = F.lit(bucket_width).cast("long")
    p_b = points.withColumn("__rb", F.floor(F.col(point_col) / w))
    span = (F.floor(F.col(hi_col) / w) - F.floor(F.col(lo_col) / w) + 1)
    seq = F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
    guarded = F.when(
        span > F.lit(max_span_buckets),
        F.raise_error(F.format_string(
            "range_join: interval spans %s buckets (cap " +
            str(max_span_buckets) + "); widen bucket_width", span)),
    ).otherwise(seq)
    i_b = intervals.withColumn("__rb", F.explode(guarded))
    return (
        p_b.join(i_b, on=["__rb", *keys], how="inner")
        .filter((F.col(point_col) >= F.col(lo_col))
                & (F.col(point_col) < F.col(hi_col)))
        .drop("__rb")
    )
