"""Parquet target sink — the bulk (Spark-native) replication path.

This is the path SURVEY §7.1 says to prefer: instead of per-row
``SELECT json`` hydration (K:825-852), broadcast-join the changed PK
set back to the source DataFrame and write Parquet directly
(bulkReplicateToParquet P:792-857):

  source ⋈ broadcast(changed_pks) -> optional TTL filter ->
  size-estimated coalesce -> parquet {root}/{ks}/{tbl}/{tile}/{op}/

Write sizing carries the reference's knobs: maxRecordsPerFile
10,500,000 + snappy (writeWithSizeControl K:2224-2231), 32 MB target
files via the sampled row-size model (estimateAndCoalesce P:698-732).

Scale note: the changed-PK set is small relative to the table (that's
the point of CDC), so the broadcast is the right strategy; if a delta
ever approaches table size, drop the hint and let AQE choose.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_RECORDS_PER_FILE = 10_500_000  # K:2228
DEFAULT_TARGET_FILE_MB = 32  # P:425-426


def hydrate_changes(
    source: DataFrame,
    changed_pks: DataFrame,
    pk_cols: list[str],
    broadcast_pks: bool = True,
) -> DataFrame:
    """Changed-PK set -> full source rows (P:809-816). PK columns are
    aligned by name and cast to the source's types before the join
    (the reference casts explicitly; names are enough here)."""
    keys = changed_pks.select(*pk_cols)
    for c in pk_cols:
        keys = keys.withColumn(c, F.col(c).cast(source.schema[c].dataType))
    if broadcast_pks:
        keys = F.broadcast(keys)
    return source.join(keys, pk_cols, "inner")


def write_with_size_control(
    df: DataFrame,
    path: str,
    num_partitions: int | None = None,
    max_records_per_file: int = MAX_RECORDS_PER_FILE,
    mode: str = "overwrite",
) -> None:
    """Coalesce + bounded file size + snappy (K:2224-2231)."""
    out = df.coalesce(num_partitions) if num_partitions else df
    (out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", "snappy")
        .parquet(path))


def bulk_replicate_to_parquet(
    source: DataFrame,
    changed_pks: DataFrame,
    pk_cols: list[str],
    root: str,
    keyspace: str,
    table: str,
    tile: int,
    op: str,
    batch_id: str,
    avg_row_bytes: float | None = None,
    ttl_filter: tuple[str, str, int] | None = None,
) -> str:
    """Full bulk path (P:792-857). Returns the output directory."""
    from ..stats import estimate_partitions_for_write
    from ..transform import apply_ttl_filter

    hydrated = hydrate_changes(source, changed_pks, pk_cols)
    if ttl_filter is not None:
        col, pred, val = ttl_filter
        hydrated = apply_ttl_filter(hydrated, col, pred, val)
    hydrated = hydrated.dropDuplicates(pk_cols)  # P:647's dropDuplicates

    n_parts = None
    if avg_row_bytes is not None:
        # count once, reuse for sizing; at scale the PK set count is known
        # from discovery stats so this is metadata, not a second scan
        n_parts = estimate_partitions_for_write(
            avg_row_bytes, hydrated.count(), DEFAULT_TARGET_FILE_MB)
    out_dir = os.path.join(root, keyspace, table, str(tile), op, batch_id)
    write_with_size_control(hydrated, out_dir, num_partitions=n_parts)
    return out_dir
