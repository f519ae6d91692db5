"""SparkSession factory with scale-oriented defaults.

The reference ships its Spark conf as Glue job default-args
(glue/bin/cqlreplicator:824): AQE on + coalescePartitions,
shuffle.partitions=100, task.maxFailures=64, locality.wait=0, etc.
We carry over the settings that matter for a 1000-executor cluster and
drop the Glue-specific ones. Tests run on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf shared by local tests and cluster deployment. At 100 TB the two
# knobs that matter most are AQE (runtime shuffle-partition coalescing +
# skew-join splitting) and a sane broadcast threshold so dimension tables
# never shuffle.
SCALE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Parquet scan granularity: 128m splits keep 100 TB at ~800k tasks,
    # small enough per-task to never spill on 4g executors.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow for the few pandas-UDF paths (multimodal, ANN rerank).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "64",
    # The synthetic testdata was written with nanosecond parquet
    # timestamps; this lets Spark 4 read them (as timestamp_ntz).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
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
    out = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
