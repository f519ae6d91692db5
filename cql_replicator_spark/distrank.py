"""Distributed global rank / running sums without a single-partition window.

A ``Window.orderBy(...)`` with no partition spec forces every row into ONE
partition ("WARN WindowExec: No Partition Defined ... Moving all data to a
single partition") — correct, but a serial bottleneck that grows with the
data. This module provides the standard two-pass distributed formulation:

1. ``repartitionByRange(n_ranges, *sort_exprs)`` range-partitions the frame
   by the total order, so partition *i* holds a contiguous key range and
   every key in partition *i* precedes every key in partition *i+1*.
   ``spark_partition_id()`` is stamped and the frame is ``localCheckpoint``-ed:
   the offsets collected in pass 1 must describe the EXACT partitions pass 2
   reads, so the range exchange may not be re-sampled between passes (and the
   upstream plan is computed once, not once per pass).
2. A bounded aggregate (``n_ranges`` rows — a config literal, not data)
   collects per-partition row counts and column sums; exclusive prefix
   offsets are computed driver-side and broadcast-joined back.
3. Per-partition ``row_number`` / running sums (``Window.partitionBy(_pid)``
   — a parallel window) plus the partition's prefix offset give the exact
   global rank / inclusive running sum.

The result is identical to the single-partition window form whenever
``order`` is a total order (include a unique tiebreak column!) and the
running-sum columns are integer-typed (integer addition is associative, so
per-partition-then-offset grouping equals sequential accumulation; float
running sums would differ in the last ulp from a sequential window — keep
those on exact integer scales, e.g. cents). NULLs are handled with the
window's exact semantics: null ORDER keys sort where the window sorts them
(asc = nulls first, desc = nulls last — ``repartitionByRange`` and
``Window.orderBy`` share SortOrder), and a running sum over a column WITH
nulls is NULL until the first non-null value globally, then carries the
prior sum through null rows (the per-partition offset stays NULL until a
prior partition saw a non-null, and the output coalesces local/offset
parts — see the inline notes).

Scale shape: two shuffles (range exchange + the _pid hash exchange for the
local window), one ``n_ranges``-row collect, one broadcast join. No stage
sees more than ~1/n_ranges of the data in a single task. ``n_ranges``
defaults to the session's ``spark.sql.shuffle.partitions`` so the rank
stage's parallelism scales with the cluster configuration instead of a
module literal; pass it explicitly to trade collect size against task
granularity. Used by the registered lanes that previously ranked/cumsum-ed
per-entity aggregates through a partition-less window (customer_spend_rank,
orders_pareto_8020, events_power_users_gini, text_zipf_fit,
token_budget_selection, layout_pruning_stats, documents_vocab_growth_heaps).

Fault-tolerance trade: ``localCheckpoint`` truncates lineage by pinning the
range-exchanged blocks on the executors that computed them — it is NOT
fault-tolerant. Losing an executor between the two passes fails the job
(no lineage to recompute from) instead of silently re-running the range
exchange, which could RE-SAMPLE partition bounds and desynchronize the
broadcast offsets from the partitions pass 2 reads — a wrong-answer mode.
Failing fast is the chosen side of that trade; re-run the query on
executor loss (a reliable checkpoint() directory would remove the restart
at the price of a distributed write per call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType
from pyspark.sql.window import Window

__all__ = ["global_rank_cumsum"]


def _default_n_ranges(df: DataFrame) -> int:
    """Session shuffle parallelism as the range count (min 2 so the
    form stays genuinely distributed even under a degenerate config).
    Derives from session.shuffle_parallelism — the one shared source
    for parallelism defaults (r14 advice: this and default_write_files
    had quietly diverged on the non-numeric fallback)."""
    from .session import shuffle_parallelism
    return shuffle_parallelism(df, floor=2)


def _sort_exprs(order: list[tuple[str, bool]]):
    """(col, desc?) tuples -> Column sort expressions, used identically by
    the range partitioner and the per-partition window so both see the same
    total order (asc = nulls first, desc = nulls last — Spark defaults)."""
    return [F.col(c).desc() if d else F.col(c).asc() for c, d in order]


def global_rank_cumsum(
    df: DataFrame,
    order: list[tuple[str, bool]],
    sum_cols: dict[str, str] | None = None,
    rank_col: str = "rank",
    n_ranges: int | None = None,
) -> DataFrame:
    """Add a global ``row_number`` (``rank_col``, long, 1-based) and optional
    inclusive running sums (``sum_cols``: {out_col: src_col}) over the total
    order ``order`` ([(col_name, descending?), ...]), computed distributed
    (see module docstring). ``n_ranges`` defaults to the session's
    ``spark.sql.shuffle.partitions``. Returns the input columns plus the
    new ones; row order of the result is unspecified (sort downstream)."""
    sum_cols = dict(sum_cols or {})
    if n_ranges is None:
        n_ranges = _default_n_ranges(df)
    exprs = _sort_exprs(order)
    part = (df.repartitionByRange(int(n_ranges), *exprs)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint())

    aggs = [F.count("*").cast("long").alias("_cnt")]
    for out, src in sum_cols.items():
        aggs.append(F.sum(src).alias(f"_s_{out}"))
    agg_df = part.groupBy("_pid").agg(*aggs)
    stats = sorted(agg_df.collect(), key=lambda r: r["_pid"])

    # exclusive prefix offsets, driver-side over <= n_ranges rows.
    # Offsets carry the AGGREGATE's widened type (int -> long,
    # decimal(p,s) -> decimal(p+10,s)), read off the agg frame's own
    # schema — typing them as the narrower SOURCE type overflows
    # createDataFrame once a cumulative total passes the source
    # type's range (int32 at ~2.1e9: exactly the large-corpus regime
    # this module exists for, e.g. token_budget_selection's int
    # n_tokens).
    from pyspark.sql.types import DoubleType, FloatType
    sum_fields = {f.name: f.dataType for f in agg_df.schema.fields}

    def _coerce(v, out):
        return float(v) if isinstance(sum_fields[f"_s_{out}"],
                                      (DoubleType, FloatType)) else v

    # A partition's sum is None iff it holds ZERO non-null values. The
    # offset stays None until some prior partition saw a non-null, so
    # the output can reproduce the window's null semantics exactly: a
    # running sum is NULL only until the first non-null value GLOBALLY,
    # after which null inputs carry the previous sum forward.
    rows: list[tuple] = []
    rank_off = 0
    sum_off: dict[str, int | float | None] = {out: None for out in sum_cols}
    for r in stats:
        rows.append((int(r["_pid"]), rank_off,
                     *[None if sum_off[out] is None
                       else _coerce(sum_off[out], out)
                       for out in sum_cols]))
        rank_off += r["_cnt"]
        for out in sum_cols:
            v = r[f"_s_{out}"]
            if v is not None:
                sum_off[out] = (sum_off[out] or 0) + v
    off_schema = StructType(
        [StructField("_pid", IntegerType(), False),
         StructField("_rank_off", LongType(), False)]
        + [StructField(f"_off_{out}", sum_fields[f"_s_{out}"], True)
           for out in sum_cols])
    off = F.broadcast(
        df.sparkSession.createDataFrame(rows, schema=off_schema))

    w = Window.partitionBy("_pid").orderBy(*exprs)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    out_df = part.withColumn("_lr", F.row_number().over(w))
    for out, src in sum_cols.items():
        out_df = out_df.withColumn(f"_lc_{out}", F.sum(src).over(wsum))
    out_df = (out_df.join(off, "_pid")
              .withColumn(rank_col,
                          (F.col("_lr") + F.col("_rank_off")).cast("long")))
    for out in sum_cols:
        # coalesce reproduces the window's null semantics: both parts
        # non-null -> sum; local sum still NULL (partition's leading
        # rows all-null) -> carry the offset (itself NULL when no
        # prior partition saw a non-null — matching a window running
        # sum that is NULL until the first non-null value globally);
        # offset NULL but local sum present -> the local sum alone.
        out_df = out_df.withColumn(
            out, F.coalesce(F.col(f"_lc_{out}") + F.col(f"_off_{out}"),
                            F.col(f"_lc_{out}"), F.col(f"_off_{out}")))
    drop = ["_pid", "_lr", "_rank_off"] + \
        [f"_lc_{out}" for out in sum_cols] + \
        [f"_off_{out}" for out in sum_cols]
    return out_df.drop(*drop)
