"""Micro-batch CDC over an event-time-sliced table.

FIXTURES.md §6: the events table stands in for a continuously-changing
source. Slicing it by ingestion time produces a deterministic sequence
of source states; replaying the slices through the CDC pipeline
exercises the loop semantics (discovery -> diff -> replicate -> ledger
rotation) without an external database.

state_at(t) = all events with ts <= t, keyed by (user_id, event_type)
with the latest event per key as the row 'version' — so consecutive
slices produce inserts (new keys) and updates (newer ts for a key),
and a tombstone event_type models deletes.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def state_at(events: DataFrame, upto: dt.datetime | str,
             key_cols: list[str] | None = None) -> DataFrame:
    """Source-table state as of an event-time cutoff: latest event per
    key, projected to (key..., ts) for snapshotting."""
    keys = key_cols or ["user_id", "event_type"]
    sliced = events.filter(F.col("ts") <= F.lit(upto).cast("timestamp_ntz"))
    w = Window.partitionBy(*keys).orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        sliced.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"))
    )


def time_slices(events: DataFrame, n: int) -> list[dt.datetime]:
    """n cutoffs evenly spaced between min(ts) and max(ts)."""
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    step = (hi - lo) / n
    return [lo + step * (i + 1) for i in range(n)]
