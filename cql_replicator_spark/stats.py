"""Sampler column statistics + row-size model.

Reimplements the reference's sizing sampler (SURVEY §2.5):
  * getColumnStats (CQLReplicator.scala K:1719-1748): per column,
    type-dispatched min/avg/max — numeric/bool over the value,
    string/binary over length(col), timestamp -> constant 8,
    date -> constant 4; all in ONE wide aggregate row.
  * addTotalColumns (K:1684-1717): row_{min,avg,max}_total = sum of the
    per-column stats, null-coalesced to 0.
  * sampler scan shape limit(100000).sample(0.2) (K:1750-1751).

One pass, one aggregate — Catalyst fuses all the min/avg/max into a
single partial+final HashAggregate, so this costs one scan regardless
of column count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SAMPLE_LIMIT = 100_000
SAMPLE_FRACTION = 0.2

_NUMERIC = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _stat_cols(field: T.StructField) -> list[Column]:
    c, name = F.col(field.name), field.name
    dt = field.dataType
    if isinstance(dt, _NUMERIC):
        base = c.cast("double")
    elif isinstance(dt, T.BooleanType):
        base = c.cast("int").cast("double")
    elif isinstance(dt, (T.StringType, T.BinaryType)):
        base = F.length(c).cast("double")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # fixed 8-byte wire size (K:1740)
        return [F.lit(8.0).alias(f"{name}_{s}") for s in ("min", "avg", "max")]
    elif isinstance(dt, T.DateType):
        # fixed 4-byte wire size (K:1742)
        return [F.lit(4.0).alias(f"{name}_{s}") for s in ("min", "avg", "max")]
    else:
        base = F.length(c.cast("string")).cast("double")
    return [
        F.min(base).alias(f"{name}_min"),
        F.avg(base).alias(f"{name}_avg"),
        F.max(base).alias(f"{name}_max"),
    ]


def column_stats(
    df: DataFrame,
    sample: bool = False,
    limit: int = SAMPLE_LIMIT,
    fraction: float = SAMPLE_FRACTION,
    seed: int = 42,
) -> DataFrame:
    """One wide row of per-column min/avg/max (K:1719-1748)."""
    if sample:
        df = df.limit(limit).sample(fraction, seed=seed)
    exprs: list[Column] = []
    for f in df.schema.fields:
        exprs.extend(_stat_cols(f))
    return df.agg(*exprs)


def add_total_columns(stats: DataFrame) -> DataFrame:
    """row_{min,avg,max}_total columns (addTotalColumns K:1684-1717)."""
    out = stats
    for suffix in ("min", "avg", "max"):
        cols = [c for c in stats.columns if c.endswith(f"_{suffix}")]
        total = reduce(
            lambda a, b: a + b,
            [F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in cols],
        )
        out = out.withColumn(f"row_{suffix}_total", total)
    return out


def estimate_partitions_for_write(
    row_avg_bytes: float, row_count: int, target_mb: int = 32
) -> int:
    """Size-estimating coalesce (estimateAndCoalesce P:698-732): given the
    sampled average row size, pick a partition count so each output file
    lands near target_mb."""
    total_mb = max(row_avg_bytes, 1.0) * max(row_count, 0) / (1024 * 1024)
    return max(1, round(total_mb / target_mb))
