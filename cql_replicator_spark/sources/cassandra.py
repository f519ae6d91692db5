"""Cassandra / Keyspaces source adapter — the reference's front door.

Builds the spark-cassandra-connector read exactly as the reference's
``sourceScanStandard`` does (CQLReplicator.scala K:1772-1855): an
option map from ``ReadConfiguration`` (K:76-77), the table-or-
materialized-view choice (K:1784-1787), the PK + ``writetime(c) as ts``
selectExpr (buildWritetimeExpression K:381-384, primaryKeysWithTS
K:394), the counter-column variant with its change-detection hash
(K:1822-1830), and the point-in-time predicate (K:1789-1797).

The engine core is source-agnostic: every downstream operator consumes
the ``(pk..., ts)`` frame this module returns. The builders below are
pure (option maps and expression strings), so they unit-test without a
cluster; ``CassandraSource.scan()`` is the only call that needs the
connector jar on the classpath, and it is a straight composition of
the tested builders.

Scale notes:
  * splitSizeInMB controls scan parallelism — 64 MB splits mean a
    1 TB table fans out to ~16k connector partitions; Spark schedules
    them across executors, no driver-side paging.
  * The projection is pushed INTO the connector (selectExpr over the
    cassandraFormat relation prunes columns server-side), so a
    PK+writetime discovery scan moves keys, not rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import JsonMapping, ReadConfig

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def read_options(cfg: ReadConfig) -> dict[str, str]:
    """Connector option map (cassandraReadConfig K:1774-1783), plus the
    readsPerSec backpressure throttle when configured (R:501/558)."""
    opts = {
        "inferSchema": "true",
        "spark.cassandra.input.split.sizeInMB": str(cfg.splitSizeInMB),
        "spark.cassandra.concurrent.reads": str(cfg.concurrentReads),
        "spark.cassandra.input.consistency.level": cfg.consistencyLevel,
        "spark.cassandra.input.fetch.sizeInRows": str(cfg.fetchSizeInRows),
        "spark.cassandra.query.retry.count": str(cfg.queryRetryCount),
        "spark.cassandra.read.timeoutMS": str(cfg.readTimeoutMS),
    }
    if cfg.readsPerSec is not None:
        opts["spark.cassandra.input.readsPerSec"] = str(cfg.readsPerSec)
    return opts


def writetime_expr(columns: list[str]) -> str:
    """``writetime(c) as ts`` / greatest-of-many (K:381-384)."""
    if not columns:
        raise ValueError("writetime_expr needs at least one column")
    if len(columns) == 1:
        return f"writetime({columns[0]}) as ts"
    inner = ", ".join(f"writetime({c})" for c in columns)
    return f"greatest({inner}) as ts"


def pk_projection(
    pk_cols: list[str],
    writetime_cols: list[str] | None = None,
    extra_filter_cols: list[str] | None = None,
    counter_cols: list[str] | None = None,
) -> list[str]:
    """The discovery selectExpr: PK columns, any added non-PK filter
    columns (K:1798-1802), counter columns when the table is a counter
    table (K:1822-1826), and the writetime timestamp when the table has
    one (K:1812-1821). Counter tables can't have writetime — the
    reference treats them as ts-less (K:1822)."""
    cols = list(pk_cols)
    for c in extra_filter_cols or []:
        if c not in cols:
            cols.append(c)
    if counter_cols:
        return cols + [c for c in counter_cols if c not in cols]
    if writetime_cols:
        cols.append(writetime_expr(writetime_cols))
    return cols


@dataclass
class CassandraSource:
    """One replicated table's source scan, `(pk..., ts)`-shaped.

    ``mapping.replication`` drives everything: useMaterializedView
    picks the scan target, writetimeColumns the ts projection,
    pointInTime the ts predicate, filterExpression the arbitrary
    row filter (applied AFTER projection, K:1849-1853 — it may
    reference added non-PK filter columns).
    """

    keyspace: str
    table: str
    pk_cols: list[str]
    mapping: JsonMapping = field(default_factory=JsonMapping)
    extra_filter_cols: list[str] = field(default_factory=list)
    counter_cols: list[str] = field(default_factory=list)

    # -- pure builders (unit-testable without a cluster) -------------------
    @property
    def scan_table(self) -> str:
        mv = self.mapping.replication.useMaterializedView
        return mv if mv else self.table

    def reader_options(self) -> dict[str, str]:
        return read_options(self.mapping.read)

    def select_exprs(self) -> list[str]:
        return pk_projection(
            self.pk_cols,
            writetime_cols=self.mapping.replication.writetimeColumns,
            extra_filter_cols=self.extra_filter_cols,
            counter_cols=self.counter_cols,
        )

    def reader(self, spark: SparkSession):
        """DataFrameReader wired for the connector (K:1803-1806)."""
        return (
            spark.read.format(CASSANDRA_FORMAT)
            .options(**self.reader_options())
            .option("keyspace", self.keyspace)
            .option("table", self.scan_table)
        )

    # -- frame shaping (works on ANY loaded DataFrame, so the identical
    # -- code path is exercised in tests against parquet fixtures) ---------
    def project(self, df: DataFrame) -> DataFrame:
        """Apply the discovery projection + predicates to a loaded frame.

        The three-way ts dispatch of K:1808-1830: no writetime -> ts=0;
        writetime without point-in-time -> as-is; with point-in-time ->
        ts IS NOT NULL AND ts <op> pit. Counter tables get ts=0 plus
        the xxhash64 change-detection column (K:1826-1829)."""
        rep = self.mapping.replication
        exprs = self.select_exprs()
        if rep.writetimeColumns and not self.counter_cols and "ts" in df.columns:
            # test/fixture seam: a parquet snapshot of a Cassandra scan
            # already carries the materialized writetime column, where
            # the connector relation would evaluate writetime() itself
            exprs = ["ts" if e.endswith(" as ts") else e for e in exprs]
        out = df.selectExpr(*exprs)
        if self.counter_cols:
            out = (
                out.withColumn("ts", F.lit(0).cast("long"))
                .withColumn("counter_hash",
                            F.xxhash64(*[F.col(c) for c in self.counter_cols]))
            )
        elif not rep.writetimeColumns:
            out = out.withColumn("ts", F.lit(0).cast("long"))
        elif rep.pointInTime.enabled and rep.pointInTime.timestamp > 0:
            pit = F.lit(rep.pointInTime.timestamp)
            op = rep.pointInTime.predicateOp
            pred = {
                "greaterThan": F.col("ts") > pit,
                "lessThan": F.col("ts") < pit,
                "lessThanOrEqual": F.col("ts") <= pit,
                "equal": F.col("ts") == pit,
            }.get(op)
            if pred is None:
                raise ValueError(f"unknown pointInTime predicateOp {op!r}")
            out = out.filter(F.col("ts").isNotNull() & pred)
        if rep.filterExpression:
            out = out.filter(rep.filterExpression)
        return out

    def scan(self, spark: SparkSession) -> DataFrame:
        """The full connector scan -> (pk..., ts) frame. Needs the
        spark-cassandra-connector jar; everything it composes is
        covered by tests on the builders + project()."""
        return self.project(self.reader(spark).load())
