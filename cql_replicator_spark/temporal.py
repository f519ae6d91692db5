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
pathological key serializes into one task. ``asof_join_chunked``
implements the escape hatch: pre-split each key's timeline by time
chunk and seed each chunk with the previous chunks' final state — the
fill is associative, so chunked fills compose. Prefer plain
``asof_join`` when keyed timelines (user histories, device state) are
bounded, which they are in every workload the reference serves.
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

    NULL payload values carry AS the matched row's values: the fill
    runs over ONE struct of (rts, payload...) — non-null whenever a
    right row exists — so a NULL field in the matched row stays NULL
    in the output, exactly like DuckDB/kdb/pandas merge_asof. (A
    per-column ``last(ignorenulls)`` fill would instead pull each
    NULL field from an OLDER right row, tearing the matched row — the
    original formulation had exactly that bug.)
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload if payload is not None else [
        c for c in right.columns if c not in {*keys, right_ts}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left: {sorted(overlap)}")
    if "__rts" in payload:
        raise ValueError("payload column name '__rts' is reserved")

    left_cols = [c for c in left.columns if c not in keys]
    r_struct = F.struct(F.col(right_ts).alias("__rts"),
                        *[F.col(c) for c in payload])
    r_struct_type = right.select(r_struct.alias("__r")) \
        .schema["__r"].dataType

    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        r_struct.alias("__r"),
    )
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = l_side.unionByName(r_side).select(
        *keys, "__ts", "__side", *left_cols,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    # left_ts rides along inside left_cols; __ts/__side are bookkeeping
    # only; a left row with no prior right row has __r NULL, so every
    # projected field below is NULL — LEFT semantics
    out = [*keys, *left_cols, *payload]
    result = merged.filter(F.col("__side") == 1).select(
        *keys, *left_cols,
        *[F.col("__r").getField(c).alias(c) for c in payload],
        F.col("__r").getField("__rts").alias("__rts"))
    if matched_ts_col is not None:
        result = result.withColumn(matched_ts_col, F.col("__rts"))
        out.append(matched_ts_col)
    return result.select(*out)


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    matched_ts_col: str | None = "asof_ts",
    chunk_width: int = 86400,
) -> DataFrame:
    """``asof_join`` for PATHOLOGICAL keys: identical semantics, but no
    single task ever holds a whole key's timeline.

    Plain as-of windows by key, so one hot key (a device emitting for
    years, a tenant owning half the events) serializes its entire
    timeline into one sort task. Here the timeline splits into
    ``floor(ts / chunk_width)`` chunks and the fill runs per
    ``(key, chunk)`` — bounded state — then each chunk is seeded with
    the latest right row from PRIOR chunks. The seed lookup is itself a
    backward as-of join, but over per-(key, chunk) SUMMARY rows (one
    ``max_by`` row per chunk that saw a right row), so its window
    partitions are chunk-counts, never timeline-sized. Fills are
    associative, so seeded chunk fills compose to exactly the global
    fill.

    Timestamps must be numeric for the chunk arithmetic (cast with
    ``unix_timestamp`` first); everything else matches ``asof_join``,
    and a property test pins output equality between the two forms.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = payload if payload is not None else [
        c for c in right.columns if c not in {*keys, right_ts}]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"payload columns collide with left: {sorted(overlap)}")
    if "__rts" in payload:
        raise ValueError("payload column name '__rts' is reserved")
    if chunk_width <= 0:
        raise ValueError("chunk_width must be positive")

    W = F.lit(chunk_width).cast("long")
    left_cols = [c for c in left.columns if c not in keys]
    r_struct = F.struct(F.col(right_ts).alias("__rts"),
                        *[F.col(c) for c in payload])
    r_struct_type = right.select(r_struct.alias("__r")) \
        .schema["__r"].dataType

    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        r_struct.alias("__r"),
    )
    # within-chunk fill: the ONLY timeline-sized window, and its
    # partitions are (key, chunk) -> bounded at chunk_width of activity.
    # One struct fills atomically (matched-ROW semantics — see
    # asof_join's NULL note; per-column fills would tear the row).
    w = (Window.partitionBy(*keys, "__chunk").orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (
        l_side.unionByName(r_side)
        .withColumn("__chunk", F.floor(F.col("__ts") / W))
        .select(*keys, "__chunk", "__ts", "__side", *left_cols,
                F.last("__r", ignorenulls=True).over(w).alias("__r"))
    )
    lrows = merged.filter(F.col("__side") == 1)

    # per-(key, chunk) summary: the chunk's LATEST right row, whole
    # (one max_by struct keyed on ts — matched-row semantics means a
    # later row's NULL field shadows an older non-null, exactly as the
    # plain form's struct fill behaves)
    summ = (
        right.groupBy(*keys, F.floor(F.col(right_ts) / W).alias("__chunk"))
        .agg(F.max_by(r_struct, F.col(right_ts)).alias("__seed_r"))
    )
    # seed for chunk c = summary as-of chunk c-1 (chunk-granular as-of:
    # summary frames are chunk-counts per key, never timeline-sized)
    lchunks = (lrows.select(*keys, "__chunk").distinct()
               .withColumn("__pc", F.col("__chunk") - 1))
    seeds = asof_join(
        lchunks, summ, on=keys, left_ts="__pc", right_ts="__chunk",
        payload=["__seed_r"], matched_ts_col=None,
    ).drop("__pc")

    out = [*keys, *left_cols, *payload]
    result = (lrows.join(seeds, [*keys, "__chunk"], "left")
              .withColumn("__r", F.coalesce(F.col("__r"),
                                            F.col("__seed_r")))
              .select(*keys, *left_cols,
                      *[F.col("__r").getField(c).alias(c)
                        for c in payload],
                      F.col("__r").getField("__rts").alias("__rts")))
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


def scd2_history(
    df: DataFrame,
    key: str | list[str],
    tracked: list[str],
    ts: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change feed:
    collapse consecutive rows whose ``tracked`` attributes are
    unchanged, and emit one validity interval per surviving version —
    (key..., tracked..., valid_from, valid_to, version, is_current),
    with ``valid_to`` null on each key's current version.

    This is the dimension-building complement to the snapshot-diff CDC
    core (compute_changes, K:1366-1381): the diff says WHAT changed
    between two snapshots; SCD2 turns the accumulated change feed into
    point-in-time queryable history (join back with
    ``temporal.asof_join`` or a BETWEEN range join on the interval).

    Scale shape: both passes (change detection, interval assembly) are
    window functions over the SAME partitioning key, so the plan
    shuffles the feed exactly once; no self-join, no row
    multiplication. Ordering must be total for determinism — pass
    ``tiebreak`` columns (e.g. an event id) when timestamps can tie.
    Attribute comparison is null-safe (NULL -> value counts as a
    change, NULL -> NULL does not).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if not tracked:
        raise ValueError("scd2_history needs at least one tracked column")
    order = [ts] + (tiebreak or [])
    w = Window.partitionBy(*keys).orderBy(*order)

    first_row = F.lag(F.lit(1)).over(w).isNull()
    attr_changed = None
    for c in tracked:
        ne = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        attr_changed = ne if attr_changed is None else (attr_changed | ne)
    versions = df.withColumn("__new_version", first_row | attr_changed) \
                 .filter("__new_version").drop("__new_version")

    return versions.select(
        *keys, *tracked,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def interval_peak_concurrency(
    intervals: DataFrame,
    group_col: str,
    start_col: str = "s",
    end_col: str = "e",
    id_col: str = "event_id",
) -> DataFrame:
    """Peak concurrent half-open intervals [start, end) per group via a
    sweep line: +1/-1 boundary points, one running window sum under the
    total (t, delta, id) order — deltas ascending puts ends BEFORE
    starts at a shared instant, so touching intervals never count as
    concurrent — then one max per group. 2|n| boundary rows, one
    shuffle on the group key, no O(n^2) interval self-join.

    Returns (group_col, max_concurrent, n_intervals).
    """
    pts = (intervals.select(group_col, F.col(start_col).alias("t"),
                            F.lit(1).alias("d"), F.col(id_col))
           .unionByName(
               intervals.select(group_col, F.col(end_col).alias("t"),
                                F.lit(-1).alias("d"), F.col(id_col))))
    w = Window.partitionBy(group_col).orderBy("t", "d", id_col) \
              .rowsBetween(Window.unboundedPreceding, 0)
    run = pts.select(group_col, F.sum("d").over(w).cast("long").alias("c"))
    peaks = run.groupBy(group_col).agg(F.max("c").alias("max_concurrent"))
    counts = intervals.groupBy(group_col).agg(
        F.count("*").alias("n_intervals"))
    return peaks.join(counts, group_col)


def resample_forward_fill(
    df: DataFrame,
    key: str,
    ts: str = "ts",
    value: str = "value",
    bucket_seconds: int = 3600,
    tie_break: str | None = None,
) -> DataFrame:
    """Time-series resample to a fixed grid with forward fill — the
    hypertable/time_bucket + gap-fill operator (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``, InfluxDB ``fill(previous)``):
    one row per (key, bucket) over each key's [min, max] bucket span,
    carrying the latest observed value at or before the bucket's end.

    Shape (three bounded shuffles, nothing quadratic):
      1. bucket-collapse: groupBy (key, bucket) keeps ONE row — the
         max-(ts, tie_break) observation via a struct max (map-side
         combined, so the shuffle moves <= one row per non-empty
         bucket, not the raw events);
      2. grid: per-key min/max bucket (same aggregation pass) ->
         ``sequence()`` + explode builds the dense grid engine-side —
         never a driver loop, never a cross join against a calendar
         table;
      3. fill: left join grid <- observations on (key, bucket), then
         ``last(ignorenulls)`` over the key's bucket order — the same
         single-window forward-fill asof_join uses.

    Buckets are epoch-aligned BIGINT seconds (``bucket_start``) so the
    grid arithmetic is integer-exact in any engine. Leading buckets
    before a key's first observation don't exist by construction (the
    grid starts at the key's first bucket), so the fill never emits
    nulls. tie_break orders same-timestamp observations (defaults to
    the value column itself) — required for a deterministic answer.
    """
    b = int(bucket_seconds)
    tb = tie_break or value
    bucket = (F.unix_timestamp(F.col(ts)) / b).cast("long") * b
    # one aggregation produces the per-bucket winner; struct max makes
    # "latest observation" deterministic: (ts, tie_break) lexicographic
    obs = (df.select(F.col(key), bucket.alias("bucket_start"),
                     F.col(ts).alias("_ts"), F.col(tb).alias("_tb"),
                     F.col(value).alias("_v"))
           .groupBy(key, "bucket_start")
           .agg(F.max(F.struct("_ts", "_tb", "_v")).alias("_w"))
           .select(key, "bucket_start", F.col("_w._v").alias("_obs")))
    span = (obs.groupBy(key)
            .agg(F.min("bucket_start").alias("_lo"),
                 F.max("bucket_start").alias("_hi")))
    grid = span.select(
        key, F.explode(F.sequence("_lo", "_hi", F.lit(b))).alias("bucket_start"))
    w = (Window.partitionBy(key).orderBy("bucket_start")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(obs, [key, "bucket_start"], "left")
            .select(key, "bucket_start",
                    F.last("_obs", ignorenulls=True).over(w).alias(value)))


def merge_intervals(
    intervals: DataFrame,
    group_col: str,
    start_col: str = "s",
    end_col: str = "e",
) -> DataFrame:
    """Coalesce overlapping/touching intervals per group into maximal
    disjoint spans — the interval-union operator (session stitching,
    on-call coverage, validity-range compaction; PostgreSQL
    ``range_agg``, pandas ``merge_overlapping``). Half-open [s, e):
    touching intervals (a.e == b.s) merge, gaps start new islands.

    Classic island detection with two windows over one shuffle: an
    interval opens a new island iff its start exceeds the running max
    end of every earlier interval in its group (strictly later than
    everything seen => a gap); the island id is the running count of
    openers; one groupBy then collapses each island to (min s, max e).
    Per-group cost is the sort inside its window partition — no
    self-join, nothing quadratic, and the shuffle key is the group
    column so skew follows the data's own grouping.

    Returns (group_col, island, s, e, n_merged).
    """
    w_ord = Window.partitionBy(group_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1))
    opens = F.when(prev_max_end.isNull()
                   | (F.col(start_col) > prev_max_end), 1).otherwise(0)
    with_island = (intervals
                   .withColumn("__open", opens)
                   .withColumn("island", F.sum("__open").over(
                       w_ord.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_island.groupBy(group_col, "island")
            .agg(F.min(start_col).alias("s"),
                 F.max(end_col).alias("e"),
                 F.count("*").cast("long").alias("n_merged")))
