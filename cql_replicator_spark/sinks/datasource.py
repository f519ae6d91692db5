"""`df.write.format("cql")` — the CQL sink as a native Spark data source.

Spark 4's Python Data Source API lets the engine's batched statement
path mount as a first-class V2 sink: register once
(``spark.dataSource.register(CqlDataSource)``) and any DataFrame —
batch or streaming — writes through the same
statement-builder + FlushingBatch machinery as the foreachPartition
path (`sinks/cql_sink.py`), but with Spark-managed task retry,
per-task commit messages, and driver-side commit aggregation instead
of hand-rolled accumulators. This supersedes the reference's row-path
writer loop (persistToTarget K:861-1067) with the engine-idiomatic
formulation; statement text is identical.

Transport: production injects a cassandra-driver session by
subclassing ``statement_executor``; offline (tests, this sandbox) the
``path`` option logs statements to one file per task — the same
file-backed fake every sink test uses. Options:

    target      ks.table (required)
    path        statement log dir (offline transport, required here)
    op          insert | delete            (default insert)
    pk_types    JSON map column -> CQL type for the delete path, e.g.
                '{"id": "uuid", "day": "date"}' — without it types are
                inferred from Python runtime types (exact only for
                bool/int/str)
    ts_col      writetime column -> USING TIMESTAMP
    ttl_col     TTL column -> USING TTL
    if_not_exists  "true" -> INSERT ... IF NOT EXISTS (idempotent replay)
    maxStatementsPerBatch / maxBatchBytes / maxRetries   (WriteConfig)

Scale note: each Spark task drains its partition through one
FlushingBatch (size- and byte-bounded batches, exponential-backoff
retry), so write parallelism == partition count and a straggling
target throttles exactly one task at a time — identical behavior to
the reference's per-partition FlushingSet (K:210-304).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource, DataSourceStreamWriter, DataSourceWriter, WriterCommitMessage,
)

from ..config import WriteConfig


@dataclass
class CqlCommitMessage(WriterCommitMessage):
    items_ok: int = 0
    items_failed: int = 0


def statement_executor(options: dict):
    """Build the per-task statement executor from writer options.
    Offline transport: append statements to a unique file under
    ``path``. Swap this single function for a cassandra-driver
    session.execute loop in production."""
    out_dir = options.get("path")
    if not out_dir:
        raise ValueError("cql sink: 'path' option (statement log dir) required")
    os.makedirs(out_dir, exist_ok=True)

    def execute(statements: list[str]) -> None:
        fname = os.path.join(out_dir, f"task-{uuid.uuid4().hex}.log")
        with open(fname, "a") as f:
            f.write("\n".join(statements) + "\n")

    return execute


def _infer_cql_type(v) -> str:
    """Fallback CQL type from the Python runtime value when no
    ``pk_types`` option is given. bool must precede int (bool is an int
    subclass); floats/decimals map to double/decimal so they render
    unquoted; everything else falls back to text."""
    import datetime
    import decimal
    import uuid as _uuid

    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, _uuid.UUID):
        return "uuid"
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "blob"
    return "text"


def _write_partition(iterator, options: dict, schema_names: list[str]):
    """Shared batch/stream task body: rows -> statements -> FlushingBatch."""
    import json as _json

    from ..sinks.cql_sink import delete_statement, insert_json_statement
    from .batching import FlushingBatch

    target = options["target"]
    pk_types = _json.loads(options.get("pk_types", "{}"))
    op = options.get("op", "insert")
    ts_col = options.get("ts_col")
    ttl_col = options.get("ttl_col")
    ine = options.get("if_not_exists", "false").lower() == "true"
    cfg = WriteConfig(
        maxStatementsPerBatch=int(options.get("maxstatementsperbatch", 29)),
        maxBatchBytes=int(options.get("maxbatchbytes", 1024 * 1024)),
        maxRetries=int(options.get("maxretries", 64)),
    )
    data_cols = [c for c in schema_names if c not in (ts_col, ttl_col)]
    execute = statement_executor(options)
    with FlushingBatch(execute, cfg) as batch:
        for row in iterator:
            d = row.asDict(recursive=True)
            if op == "delete":
                batch.add(delete_statement(
                    target,
                    {c: (d[c], pk_types.get(c) or _infer_cql_type(d[c]))
                     for c in data_cols}))
            else:
                ts = d.pop(ts_col) if ts_col else None
                ttl = d.pop(ttl_col) if ttl_col else None
                doc = {k: d[k] for k in data_cols}
                batch.add(insert_json_statement(target, doc, ts, ttl, ine))
    return CqlCommitMessage(items_ok=batch.stats.items_ok,
                            items_failed=batch.stats.items_failed)


class CqlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema):
        self.options = options
        self.schema_names = [f.name for f in schema.fields]

    def write(self, iterator):
        return _write_partition(iterator, self.options, self.schema_names)

    def commit(self, messages):
        total = sum(m.items_ok for m in messages if m is not None)
        stats_path = self.options.get("stats_path")
        if stats_path:
            import json
            os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
            with open(stats_path, "w") as f:
                json.dump({"items_ok": total,
                           "items_failed": sum(m.items_failed for m in messages
                                               if m is not None)}, f)

    def abort(self, messages):
        pass  # statement log files from failed attempts are inert


class CqlStreamWriter(DataSourceStreamWriter):
    """The same sink for writeStream — per-epoch commit files give the
    exactly-once bookkeeping hook a real deployment pairs with
    idempotent INSERT ... IF NOT EXISTS statements."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.schema_names = [f.name for f in schema.fields]

    def write(self, iterator):
        return _write_partition(iterator, self.options, self.schema_names)

    def commit(self, messages, batchId):
        commits_dir = self.options.get("commits_path")
        if commits_dir:
            import json
            os.makedirs(commits_dir, exist_ok=True)
            total = sum(m.items_ok for m in messages if m is not None)
            with open(os.path.join(commits_dir, f"epoch-{batchId}.json"), "w") as f:
                json.dump({"batch_id": batchId, "items_ok": total}, f)

    def abort(self, messages, batchId):
        pass


class CqlDataSource(DataSource):
    """Register with ``spark.dataSource.register(CqlDataSource)``; then
    ``df.write.format("cql").option("target", "ks.t").option("path", dir)
    .mode("append").save()`` or the writeStream equivalent."""

    @classmethod
    def name(cls) -> str:
        return "cql"

    def schema(self) -> str:
        raise NotImplementedError("cql data source is write-only")

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("cql sink is append-only (CQL has no truncate-on-write)")
        return CqlWriter(dict(self.options), schema)

    def streamWriter(self, schema, overwrite: bool):
        return CqlStreamWriter(dict(self.options), schema)
