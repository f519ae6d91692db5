"""OpenSearch target sink: bulk-API document writer + key deletes.

Reimplements the reference's OpenSearch path Spark-first:
  * jsonToOSS (O:702-745): change-set rows written as documents to an
    index, `pushdown=true`. In production the DataFrame path is
    `df.write.format("org.opensearch.spark.sql")` — the connector jar
    isn't in this container, so the writer here is the
    foreachPartition/bulk-HTTP formulation with an injected transport
    (tests use a fake; production plugs `urllib.request` or
    opensearch-py).
  * per-key DELETE (O:296-316, O:635-645 do it over the opensearch
    sql-jdbc driver): expressed as bulk `delete` actions on the
    composite `_id`, which is the scalable form — one bulk request per
    batch instead of one JDBC statement per key.

Document ids are the composite primary key joined with ':' so replays
are idempotent (index overwrites, delete is a no-op on a missing doc) —
the same at-least-once contract as the CQL `IF NOT EXISTS` replay path.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from ..config import WriteConfig
from ..planaudit import guard_sink_input
from .batching import FlushingBatch

ID_SEPARATOR = ":"


def doc_id(row: dict, pk_cols: list[str]) -> str:
    """Composite document _id from the primary-key columns.

    Parts are percent-encoded (same deliberate deviation as the
    tiling/large-object/DynamoDB key fixes): a raw join collides
    distinct key tuples — ('a:b','c') and ('a','b:c') share one _id,
    so the second index overwrites the first document and a delete for
    either kills both. Plain ids stay byte-identical to the reference
    layout; index and delete both route through here, so replays stay
    idempotent per actual row.

    ID-SCHEME BREAK (r12): key values containing ':', '/', '%', etc.
    now produce a DIFFERENT _id than the pre-r12 raw-join scheme.
    Against an index populated before the change, replayed deletes and
    updates for such keys recompute the new _id and silently miss the
    documents written under the old ids. Fine for a pre-release
    framework; an upgraded deployment must reindex (full re-replication
    of affected tables) or run a one-off migration that re-keys
    documents whose _id decodes differently under percent-encoding.
    The same note applies to the DynamoDB composite key and the
    large-object offload key, which switched schemes in the same
    round."""
    from urllib.parse import quote

    return ID_SEPARATOR.join(quote(str(row[c]), safe="") for c in pk_cols)


def bulk_index_action(index: str, row: dict, pk_cols: list[str]) -> str:
    """One NDJSON `index` action pair (action line + source line)."""
    action = {"index": {"_index": index, "_id": doc_id(row, pk_cols)}}
    return json.dumps(action) + "\n" + json.dumps(row, default=str)

def bulk_delete_action(index: str, row: dict, pk_cols: list[str]) -> str:
    """One NDJSON `delete` action line."""
    return json.dumps({"delete": {"_index": index, "_id": doc_id(row, pk_cols)}})


class OpenSearchBulkWriter:
    """Size/count-bounded _bulk writer with retry + DLQ via FlushingBatch.

    ``transport`` is `(ndjson_payload: str) -> dict` returning the
    parsed _bulk response; items the service flags as errored are
    retried as a sub-batch, mirroring the DynamoDB unprocessed-item
    loop (D:424-441).
    """

    def __init__(self, transport: Callable[[str], dict], index: str,
                 pk_cols: list[str], config: WriteConfig | None = None,
                 on_dead_letter: Callable[[object, Exception], None] | None = None):
        cfg = config or WriteConfig()
        self.transport = transport
        self.index = index
        self.pk_cols = pk_cols
        self.batch = FlushingBatch(self._execute, cfg, on_dead_letter=on_dead_letter)

    def index_row(self, row: dict) -> None:
        self.batch.add(bulk_index_action(self.index, row, self.pk_cols))

    def delete_row(self, row: dict) -> None:
        self.batch.add(bulk_delete_action(self.index, row, self.pk_cols))

    def _execute(self, actions: list[str]) -> None:
        payload = "\n".join(actions) + "\n"
        resp = self.transport(payload)
        if not resp.get("errors"):
            return
        failed = [i for i, item in enumerate(resp.get("items", []))
                  if next(iter(item.values())).get("status", 200) >= 300]
        if failed:
            raise RuntimeError(f"{len(failed)} bulk actions failed")

    def close(self) -> None:
        self.batch.close()


def write_changes_to_opensearch(changes, pk_cols: list[str], index: str,
                                transport_factory: Callable[[], Callable[[str], dict]],
                                config: WriteConfig | None = None) -> None:
    """Change-set -> OpenSearch: inserts/updates indexed, deletes deleted.

    One writer per partition, transport lazily built on the executor
    (the reference's per-partition client pattern, O:590-658).
    """
    def _send(df, op: str):
        def run(rows):
            w = OpenSearchBulkWriter(transport_factory(), index, pk_cols, config)
            for r in rows:
                d = r.asDict(recursive=True)
                (w.delete_row if op == "delete" else w.index_row)(d)
            w.close()
        # RDD-action sink: no SQL execution for the audit to see —
        # gate a funneled input statically (planaudit docstring).
        guard_sink_input(df, f"write_changes_to_opensearch[{op}]")
        df.rdd.foreachPartition(run)

    _send(changes.inserts, "index")
    _send(changes.updates, "index")
    _send(changes.deletes, "delete")
