"""Bucketed tables: pre-shuffled storage for exchange-free joins.

At 100 TB the dominant cost of the fact-to-fact joins (orders x
lineitem, snapshot x snapshot) is the shuffle: every join re-hashes and
re-exchanges both sides. Bucketing spends that shuffle ONCE at write
time — rows are hash-partitioned into a fixed number of buckets by the
join key and each bucket lands in its own file set — after which every
join or aggregation on the bucket key reads co-located data and
Catalyst plans a SortMergeJoin with NO Exchange on either side. The
same property serves repeated CDC diff cycles: both snapshot
generations bucketed by PK diff without ever shuffling.

Caveats that matter at scale (encoded in the helpers):
  * both sides must have the SAME bucket count (or a divisor — Spark
    coalesces buckets when `spark.sql.bucketing.coalesceBucketsInJoin.
    enabled` is set) and the join keys must be a prefix-equal match of
    the bucket spec;
  * bucket pruning applies to equality filters on the bucket key (scan
    reads 1/N of the files);
  * too few buckets -> giant per-task files; too many -> small-file
    explosion. Size for ~128-256 MB per bucket file at the target SF.

Spark's bucketed tables live in the session catalog (saveAsTable), not
plain paths — these helpers wrap that so callers deal in names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets lets the downstream SortMergeJoin skip its
    sort as well — the join becomes a pure merge of pre-sorted,
    co-partitioned files (zero Exchange, zero Sort in the plan).

    Stale-location hardening: mode=overwrite only replaces a table the
    CATALOG knows about; a managed-table directory orphaned by a killed
    run (catalog entry gone, files on disk) makes saveAsTable raise
    LOCATION_ALREADY_EXISTS in a fresh session. Drop the catalog entry
    and remove an orphaned default-warehouse dir first."""
    import os
    import shutil

    spark = df.sparkSession
    if mode == "overwrite" and "." not in name:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        for prefix in ("file:", ""):
            if wh.startswith(prefix) and prefix:
                wh = wh[len(prefix):]
        if wh and os.path.isdir(wh):
            shutil.rmtree(os.path.join(wh, name.lower()),
                          ignore_errors=True)
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle — the bucketed-join
    contract check (used by tests and available for pipeline
    assertions)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "plan contains an Exchange; bucketed co-location was not used:\n"
            + plan)
