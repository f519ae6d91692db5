"""SparkSession factory with scale-oriented defaults.

The reference ships its Spark conf as Glue job default-args
(glue/bin/cqlreplicator:824): AQE on + coalescePartitions,
shuffle.partitions=100, task.maxFailures=64, locality.wait=0, etc.
We carry over the settings that matter for a 1000-executor cluster and
drop the Glue-specific ones. Tests run on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

# Conf shared by local tests and cluster deployment. At 100 TB the two
# knobs that matter most are AQE (runtime shuffle-partition coalescing +
# skew-join splitting) and a sane broadcast threshold so dimension tables
# never shuffle.
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE re-plan (and coalesce) stages that read cached frames:
    # the default false pins every persisted intermediate at the full
    # session shuffle width, which costs hundreds of no-op task
    # launches per stage on small cached frames (measured 1.5x on the
    # connected-components fixpoint loop). The trade-off — cached-plan
    # output partitioning may change between actions — only matters to
    # consumers that assume a stable width, which none of ours do.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Join strategy (r16, guide §3.1): allow shuffled hash join when
    # its size conditions hold instead of always sort-merging — no
    # sort on either side. Two independent, size-gated paths: the
    # planner picks SHJ only when the build side's ESTIMATE fits a
    # local hash map (canBuildLocalHashMap: size < partitions x
    # autoBroadcastJoinThreshold, and 3x smaller than the other side);
    # AQE additionally rewrites a planned sort-merge to SHJ at runtime
    # only when every post-shuffle partition is under the 128 MiB
    # threshold — a per-partition byte bound, not a local-core tune,
    # so the rewrite stays safe at any cluster width. Interleaved A/B
    # over the 22 lanes whose audited plans contain a SortMergeJoin
    # (bench_ab_shj.json, order-flipped v2 protocol): total 0.975 —
    # modest locally because AQE converts most small-SF SMJs to
    # broadcast anyway; at scale the non-broadcast join population is
    # what this targets (no sort pass on either side). 14/50 audited
    # SMJs switch to SHJ statically at sf0.01; dedup_semantic shows the
    # AQE runtime rewrite in its final plan (plans/r16/). Risk note: a
    # build partition that
    # blows past its estimate OOMs where sort-merge would spill; both
    # gates are byte-bounded, and skew-split (AQE) still applies.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
    # Parquet scan granularity: 128m splits keep 100 TB at ~800k tasks,
    # small enough per-task to never spill on 4g executors.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow for the few pandas-UDF paths (multimodal, ANN rerank).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "64",
    # The synthetic testdata has nanosecond parquet timestamps; this
    # lets Spark 4 read them (as BIGINT nanos, converted in load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "cql-replicator-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]) when
    no cluster master is configured — on a real deployment the master
    comes from spark-submit and this falls through.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(SCALE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the synthetic test tables as temp views; return dict of DFs."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    # Runtime-settable; needed when the caller's session (e.g. the
    # verify driver's) wasn't built by get_spark().
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for n in names:
        path = f"{sf_dir}/{n}.parquet"
        df = spark.read.parquet(path)
        for c in _nano_ts_columns(path):
            # nanosAsLong surfaces timestamp[ns] as BIGINT nanos; restore a
            # naive (ntz) timestamp at micro precision, truncating like
            # DuckDB/pandas do.
            df = df.withColumn(
                c,
                # integer division: float division would lose precision on
                # 19-digit nano epochs
                F.expr(f"CAST(timestamp_micros({c} DIV 1000) AS TIMESTAMP_NTZ)"),
            )
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (footer metadata only).

    A table may be a single file OR a directory dataset (partitioned /
    multi-part — the layout every real corpus uses); for a directory,
    any one part file's footer carries the physical type, so probe the
    first one found recursively. No readable footer -> no remapping."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not parts:
            return []
        path = parts[0]
    schema = pq.read_schema(path)
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def shuffle_parallelism(df, floor: int = 1, fallback: int = 64) -> int:
    """The session's shuffle parallelism (spark.sql.shuffle.partitions),
    clamped to ``floor``; ``fallback`` when the config is non-numeric
    (e.g. 'auto'). THE single source for every 'session parallelism'
    default — default_write_files and distrank._default_n_ranges both
    derive from it, so the two can never silently disagree on the
    fallback again (they did: 16 vs 64, r14 advice)."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = fallback
    return max(floor, n)


def default_write_files(df) -> int:
    """Write fan-out default: the session's shuffle parallelism (min 1).
    Used where a writer bounds its output file count via coalesce(n) —
    a literal 1 there is a data-proportional single-task write (the
    shape the plan gates ban); coalesce never widens a narrow input,
    so small frames still produce few files under this default."""
    return shuffle_parallelism(df, floor=1)
