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
    DataSource, DataSourceReader, DataSourceStreamReader,
    DataSourceStreamWriter, DataSourceWriter, InputPartition,
    WriterCommitMessage,
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
        # Publish atomically: the streaming reader's latestOffset()
        # globs *.log and, because offsets are file names, never
        # re-reads a file it has already planned — a *.log that
        # becomes visible before its content is complete would be
        # read partial and silently dropped. Writing to a dotted
        # .tmp name (excluded from the glob) and os.replace-ing into
        # place makes every *.log fully-written by construction.
        base = f"task-{uuid.uuid4().hex}.log"
        tmp = os.path.join(out_dir, f".{base}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(statements) + "\n")
        os.replace(tmp, os.path.join(out_dir, base))

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
            tmp = f"{stats_path}.{os.getpid()}.tmp"  # atomic publish
            with open(tmp, "w") as f:
                json.dump({"items_ok": total,
                           "items_failed": sum(m.items_failed for m in messages
                                               if m is not None)}, f)
            os.replace(tmp, stats_path)

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
            path = os.path.join(commits_dir, f"epoch-{batchId}.json")
            tmp = f"{path}.{os.getpid()}.tmp"  # atomic publish: epoch
            with open(tmp, "w") as f:          # files are the external
                json.dump({"batch_id": batchId,  # bookkeeping hook
                           "items_ok": total}, f)
            os.replace(tmp, path)

    def abort(self, messages, batchId):
        pass


_INSERT_JSON_RE = None


def _insert_json_re():
    global _INSERT_JSON_RE
    if _INSERT_JSON_RE is None:
        import re
        _INSERT_JSON_RE = re.compile(
            r"^INSERT INTO \S+ JSON '(.*)'"
            r"((?: IF NOT EXISTS)?(?: USING [^']*)?)$")
    return _INSERT_JSON_RE


def _parse_insert_statement(line: str):
    """INSERT ... JSON statement -> (doc dict, writetime, ttl) or None
    for non-insert lines (deletes, blanks). The payload's CQL ''
    escaping unescapes back to '."""
    import json as _json
    import re

    m = _insert_json_re().match(line.strip())
    if not m:
        return None
    try:
        doc = _json.loads(m.group(1).replace("''", "'"))
    except ValueError:
        return None
    suffix = m.group(2) or ""
    ts = re.search(r"TIMESTAMP (\d+)", suffix)
    ttl = re.search(r"TTL (\d+)", suffix)
    return (doc, int(ts.group(1)) if ts else None,
            int(ttl.group(1)) if ttl else None)


class _LogFilePartition(InputPartition):
    def __init__(self, path: str | None):
        self.path = path


class CqlStatementLogReader(DataSourceReader):
    """``spark.read.format("cql")`` — replay a statement log into a
    DataFrame. Each sink task wrote one ``task-*.log`` file, so one
    InputPartition per file preserves the original write parallelism
    as scan parallelism (at 100 TB the log dir is an object-store
    prefix and this is the natural split unit). INSERT ... JSON
    payloads become rows; delete statements are skipped (replay of
    the insert image — the DLQ/repair semantics). ``ts_col`` /
    ``ttl_col`` options surface USING TIMESTAMP/TTL as columns, the
    inverse of the writer's projection."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.ts_col = options.get("ts_col")
        self.ttl_col = options.get("ttl_col")
        self.fields = [(f.name, f.dataType.simpleString())
                       for f in schema.fields]

    def partitions(self):
        import glob

        path = self.options.get("path")
        if not path:
            raise ValueError("cql source: 'path' option required")
        files = sorted(glob.glob(os.path.join(path, "*.log")))
        return [_LogFilePartition(p) for p in files] \
            or [_LogFilePartition(None)]

    def read(self, partition):
        yield from _read_log_file(partition.path, self.fields,
                                  self.ts_col, self.ttl_col)


def _read_log_file(path, fields, ts_col, ttl_col):
    """Replay one task log file as row tuples (shared by the batch and
    streaming readers)."""
    if path is None:
        return
    coerce = {"bigint": int, "int": int, "smallint": int,
              "tinyint": int, "double": float, "float": float,
              "boolean": bool, "string": str}
    with open(path) as f:
        for line in f:
            parsed = _parse_insert_statement(line)
            if parsed is None:
                continue
            doc, ts, ttl = parsed
            row = []
            for name, typ in fields:
                if name == ts_col:
                    v = ts
                elif name == ttl_col:
                    v = ttl
                else:
                    v = doc.get(name)
                if v is not None and typ in coerce:
                    v = coerce[typ](v)
                row.append(v)
            yield tuple(row)


class CqlStatementLogStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("cql")`` — the statement log as a
    STREAMING source: the sink's append-only task files become a CDC
    feed. Offsets are the sorted set of fully-written log files —
    an invariant the sink ENFORCES by writing each task file to a
    dotted .tmp name and os.replace-ing it into its *.log name only
    when complete (a file planned between open and close would
    otherwise be read partial and, offsets being file names, never
    re-read) — so a micro-batch is exactly the files that appeared
    since the last batch (one InputPartition each — write parallelism becomes batch
    scan parallelism), replays are idempotent across restarts from
    the checkpointed offset, and commit() is a no-op because log
    files are immutable once written. This is the engine's
    incremental-replication loop (K:2338-2379 cooldown polling)
    re-expressed as a first-class Structured Streaming source:
    downstream gets watermarks, stateful ops, exactly-once sinks for
    free. Scale note: the offset JSON carries file names; a 100 TB
    deployment compacts it into a manifest log exactly like Spark's
    own FileStreamSourceLog — the contract here (files are the unit
    of progress) is unchanged by that swap."""

    def __init__(self, options: dict, schema):
        self.options = options
        self.path = options.get("path")
        if not self.path:
            raise ValueError("cql stream source: 'path' option required")
        self.ts_col = options.get("ts_col")
        self.ttl_col = options.get("ttl_col")
        self.fields = [(f.name, f.dataType.simpleString())
                       for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        import glob

        return {"files": sorted(
            glob.glob(os.path.join(self.path, "*.log")))}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        new = [p for p in end.get("files", []) if p not in seen]
        return [_LogFilePartition(p) for p in new] \
            or [_LogFilePartition(None)]

    def read(self, partition):
        yield from _read_log_file(partition.path, self.fields,
                                  self.ts_col, self.ttl_col)

    def commit(self, end: dict) -> None:
        pass


class CqlDataSource(DataSource):
    """Register with ``spark.dataSource.register(CqlDataSource)``; then
    ``df.write.format("cql").option("target", "ks.t").option("path", dir)
    .mode("append").save()`` or the writeStream equivalent — and read
    the statement log back with ``spark.read.format("cql")
    .schema(ddl).option("path", dir).load()`` (schema inference from
    the first logged row when no schema is given)."""

    @classmethod
    def name(cls) -> str:
        return "cql"

    def schema(self) -> str:
        """Inferred default schema: JSON runtime types of the first
        logged insert (int -> bigint, float -> double, bool ->
        boolean, else string), plus ts_col/ttl_col as bigint when
        those options are set. Pass an explicit .schema(...) in
        production — inference reads one row and cannot see types
        JSON erases (uuid/date render as strings)."""
        import glob
        import json as _json

        path = self.options.get("path")
        if not path:
            raise ValueError("cql source: 'path' option required")
        for fname in sorted(glob.glob(os.path.join(path, "*.log"))):
            with open(fname) as f:
                for line in f:
                    parsed = _parse_insert_statement(line)
                    if parsed is None:
                        continue
                    doc, _ts, _ttl = parsed
                    ddl = {bool: "boolean", int: "bigint",
                           float: "double"}
                    parts = [
                        f"{k} {ddl.get(type(v), 'string')}"
                        for k, v in doc.items()]
                    if self.options.get("ts_col"):
                        parts.append(f"{self.options['ts_col']} bigint")
                    if self.options.get("ttl_col"):
                        parts.append(f"{self.options['ttl_col']} bigint")
                    return ", ".join(parts)
        raise ValueError(
            f"cql source: no insert statements under {path} to infer a "
            f"schema from; pass .schema(...) explicitly")

    def reader(self, schema):
        return CqlStatementLogReader(dict(self.options), schema)

    def streamReader(self, schema):
        return CqlStatementLogStreamReader(dict(self.options), schema)

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise ValueError("cql sink is append-only (CQL has no truncate-on-write)")
        return CqlWriter(dict(self.options), schema)

    def streamWriter(self, schema, overwrite: bool):
        return CqlStreamWriter(dict(self.options), schema)
