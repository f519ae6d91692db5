"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The reference has no streaming state at all (SURVEY §2.10 — its
"incremental" engine is a poll loop). This is the Spark-idiomatic
extension: per-key session state lives in the state store, late data is
bounded by an event-time watermark, and sessions close either inline
(a gap observed within a batch) or via EventTimeTimeout when the
watermark passes session_end + gap.

Scale design: state is one (start, end, n) triple per active key —
O(active users), not O(events); the watermark evicts state for idle
keys, so the state store can't grow unboundedly. Arrow batches carry
epoch-millis longs (no per-row Python datetime objects).
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, session_start LONG, session_end LONG, n_events LONG"
)
SESSION_STATE_SCHEMA = "start LONG, end LONG, n LONG"


def _session_func(gap_ms: int):
    """Build the per-group state function (closure over the gap)."""

    def fn(key: Tuple, pdfs, state: GroupState) -> Iterator:
        import pandas as pd

        user_id = key[0]
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed end+gap with no new events: session closes
            start, end, n = state.get
            closed.append((user_id, start, end, n))
            state.remove()
        else:
            ts_all: list[int] = []
            for pdf in pdfs:
                ts_all.extend(int(t) for t in pdf["ts_ms"])
            ts_all.sort()
            if state.exists:
                start, end, n = state.get
            else:
                start = end = -1
                n = 0
            for t in ts_all:
                if n == 0:
                    start = end = t
                    n = 1
                elif t - end <= gap_ms:
                    # out-of-order events (t < end, admitted by the
                    # watermark) must never shrink the session bounds
                    start = min(start, t)
                    end = max(end, t)
                    n += 1
                else:
                    closed.append((user_id, start, end, n))
                    start = end = t
                    n = 1
            if n > 0:
                state.update((start, end, n))
                # a late event can leave end+gap at or below the current
                # watermark; Spark rejects such timeouts, so clamp just
                # above the watermark (times out on the next batch)
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(end + gap_ms, wm + 1))

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"])

    return fn


def sessionize_stateful(
    events: DataFrame,
    gap: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionization; emits one row per CLOSED session.

    Input must be a streaming DataFrame with an event-time column.
    Sessions still open when the stream pauses stay in the state store
    and close when later batches advance the watermark past
    session_end + gap (EventTimeTimeout) — feed a sentinel event stream
    to flush everything deterministically in tests.
    """
    gap_ms = _parse_interval_ms(gap)
    df = (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("ts_ms", F.unix_millis(F.col(ts_col)))
    )
    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        _session_func(gap_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_events_stream(
    spark,
    sf_dir: str,
    gap: str = "1 hour",
    input_dir: str | None = None,
    num_batches: int = 3,
) -> DataFrame:
    """Run stateful sessionization over the events table as a real
    Structured Streaming job and return the closed sessions.

    Stages the table into ``num_batches`` time-ordered micro-batches
    (k parquet files each, written in parallel and replayed via
    maxFilesPerTrigger=k) plus two far-future sentinel batches that
    advance the watermark far enough to time out — and therefore emit —
    every real session, making the streamed result deterministically
    equal to the batch sessionization of the same data.
    """
    import tempfile
    import uuid

    from ..session import load_tables
    from .windows import (
        run_stream_to_memory, stage_microbatches, stream_events_from_dir,
    )

    events = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "ts", "user_id")
    stage = input_dir or tempfile.mkdtemp(prefix="sessionize_stream_")

    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    lo, hi = bounds["lo"], bounds["hi"]
    if lo is None:
        # empty events: no sessions exist and no watermark sentinels
        # are needed — zero rows, like the batch form, not a crash
        return spark.createDataFrame([], SESSION_OUTPUT_SCHEMA)
    span = (hi - lo) / num_batches
    cuts = [lo + span * i for i in range(1, num_batches)]
    ranges = []
    prev = None
    for c in [*cuts, None]:
        cond = F.lit(True)
        if prev is not None:
            cond = cond & (F.col("ts") >= F.lit(prev))
        if c is not None:
            cond = cond & (F.col("ts") < F.lit(c))
        ranges.append(cond)
        prev = c
    batches = [events.filter(cond) for cond in ranges]
    sentinel_base = hi
    for i, uid in enumerate((-1, -2)):
        batches.append(spark.createDataFrame(
            [(-(i + 1), sentinel_base, uid)],
            "event_id LONG, ts TIMESTAMP_NTZ, user_id LONG"
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {10 * (i + 1)} DAYS")))
    # parallel k-file staging with stamped per-batch mtimes -> in-order
    # micro-batches without a coalesce(1) single-task funnel (the 1-row
    # sentinel batches pad to k with empty schema-only files)
    k = stage_microbatches(batches, stage)

    stream = stream_events_from_dir(spark, stage, events.schema,
                                    max_files_per_trigger=k)
    sessions = sessionize_stateful(stream, gap=gap)
    qname = f"sessions_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(sessions, qname, output_mode="append")
    return spark.table(qname).filter(F.col("user_id") >= 0)


_UNITS_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _parse_interval_ms(text: str) -> int:
    amount, unit = text.strip().split()
    return int(amount) * _UNITS_MS[unit.lower()]


def dedup_events_stream(
    spark,
    sf_dir: str,
    input_dir: str | None = None,
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exactly-once dedup: ``dropDuplicates`` on the event key
    with watermark-bounded state — the in-stream form of exact dedup for
    a continuously-ingesting training pipeline.

    Stages the events table TWICE (two micro-batches of identical rows):
    the second batch's rows are all duplicates, so the streamed output
    equals the batch-distinct of the table. State is evicted past the
    watermark, which is what makes this viable over unbounded streams.
    """
    import tempfile
    import uuid

    from ..session import load_tables
    from .windows import (
        run_stream_to_memory, stage_microbatches, stream_events_from_dir,
    )

    keys = key_cols or ["event_id"]
    events = load_tables(spark, sf_dir, ["events"])["events"].select(
        "event_id", "ts", "user_id")
    stage = input_dir or tempfile.mkdtemp(prefix="dedup_stream_")
    # two identical micro-batches, each staged by k parallel tasks
    # (never a coalesce(1) funnel); batch order matters — the full
    # first copy must land before the watermark advances, or unseen
    # keys in the second batch would be dropped as late instead of
    # deduped
    k = stage_microbatches([events, events], stage)

    stream = stream_events_from_dir(spark, stage, events.schema,
                                    max_files_per_trigger=k)
    deduped = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicates([*keys, "ts"])
    )
    qname = f"dedup_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(deduped, qname, output_mode="append")
    out = spark.table(qname)
    return out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
