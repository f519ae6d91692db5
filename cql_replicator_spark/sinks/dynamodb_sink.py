"""DynamoDB target sink: type mapping + batch writer.

Pure-function reimplementation of the reference's DynamoDB path:
  * mapCassandraTypeToDDB (D:751-775): classify CQL types into
    string/numeric/binary/boolean/arrayofnumerical/arrayofstrings/map
    buckets.
  * createAttributeValue (D:1638-1742): build S/N/B/BOOL/NS/SS/M
    AttributeValue dicts (boto3 wire shape).
  * composite partition/sort keys joined with a separator
    (D:1767-1818).
  * BatchWriteItem loop with unprocessed-item retry + DLQ fallback
    (FlushingSet D:355-458, executePut D:2071-2105); conditional
    single PutItem (attribute_not_exists) for read-before-write; the
    reference notes multiple counters are unsupported (D:1927-1928).

The client is injected (boto3 in production, fake in tests); no AWS
dependency here.
"""

from __future__ import annotations

import base64
from collections.abc import Callable

from ..config import WriteConfig
from .batching import FlushingBatch

KEY_SEPARATOR = ":"  # composite-key join (D:1767-1818)

_NUMERIC_CQL = {"int", "bigint", "smallint", "tinyint", "float", "double",
                "decimal", "varint", "counter", "time"}
_STRING_CQL = {"text", "varchar", "ascii", "uuid", "timeuuid", "inet",
               "date", "timestamp"}


def map_cassandra_type_to_ddb(cql_type: str) -> str:
    """Type-bucket classifier (D:751-775)."""
    t = cql_type.strip().lower()
    if t in _NUMERIC_CQL:
        return "numeric"
    if t in _STRING_CQL:
        return "string"
    if t == "boolean":
        return "boolean"
    if t == "blob":
        return "binary"
    if t.startswith(("list<", "set<", "frozen<list<", "frozen<set<")):
        inner = t.split("<", 1)[1].rstrip(">")
        return "arrayofnumerical" if inner in _NUMERIC_CQL else "arrayofstrings"
    if t.startswith(("map<", "frozen<map<")):
        return "map"
    return "string"


def create_attribute_value(value, cql_type: str) -> dict:
    """One cell -> boto3 AttributeValue (createAttributeValue D:1638-1742)."""
    if value is None:
        return {"NULL": True}
    bucket = map_cassandra_type_to_ddb(cql_type)
    if bucket == "numeric":
        return {"N": str(value)}
    if bucket == "string":
        return {"S": str(value)}
    if bucket == "boolean":
        return {"BOOL": bool(value)}
    if bucket == "binary":
        b = value if isinstance(value, (bytes, bytearray)) else str(value).encode()
        return {"B": base64.b64encode(bytes(b)).decode()}
    if bucket == "arrayofnumerical":
        return {"NS": [str(v) for v in value]}
    if bucket == "arrayofstrings":
        return {"SS": [str(v) for v in value]}
    if bucket == "map":
        inner_t = cql_type.split(",", 1)[1].rstrip(">").strip()
        return {"M": {str(k): create_attribute_value(v, inner_t)
                      for k, v in value.items()}}
    return {"S": str(value)}


def composite_key(values: list, separator: str = KEY_SEPARATOR) -> str:
    """Deviation (deliberate), same class as the tiling/large-object
    concat fixes: the reference's raw separator join (D:1767-1818)
    collides distinct key tuples — ("a:b","c") and ("a","b:c") map to
    ONE DynamoDB key, so the second row silently overwrites the first.
    Percent-encoding each part (separator included) keeps plain keys
    byte-identical to the reference layout while making the mapping
    injective."""
    from urllib.parse import quote

    return separator.join(
        quote(str(v), safe="") for v in values)


def row_to_item(row: dict, schema: dict[str, str]) -> dict:
    """A row dict + {col: cql_type} schema -> DynamoDB item."""
    return {c: create_attribute_value(v, schema.get(c, "text"))
            for c, v in row.items()}


class DynamoBatchWriter:
    """BatchWriteItem with unprocessed-item retry (D:355-458).

    ``client`` needs one method: batch_write_item(RequestItems=...) ->
    {"UnprocessedItems": {...}} — boto3's shape. Default batch limit is
    the service's 24 (D:84).
    """

    def __init__(self, client, table: str, config: WriteConfig | None = None,
                 on_dead_letter: Callable[[object, Exception], None] | None = None,
                 sleep: Callable[[float], None] | None = None):
        import time as _time

        cfg = config or WriteConfig(maxStatementsPerBatch=24)
        self.client = client
        self.table = table
        self.sleep = sleep if sleep is not None else _time.sleep
        self.batch = FlushingBatch(self._execute, cfg, on_dead_letter=on_dead_letter)

    def put(self, item: dict) -> None:
        self.batch.add({"PutRequest": {"Item": item}})

    def delete(self, key: dict) -> None:
        self.batch.add({"DeleteRequest": {"Key": key}})

    def _execute(self, requests: list) -> None:
        pending = list(requests)
        # Service-level partial failure: retry only UnprocessedItems
        # (D:424-441); FlushingBatch adds backoff on raised errors.
        # UnprocessedItems means the table is THROTTLED — the service
        # contract (and boto3 guidance) is to back off before resending,
        # so the retries sleep doubling from 50 ms; a tight loop just
        # re-hammers the table that is already shedding load and burns
        # the 8 attempts in milliseconds.
        backoff = 0.05
        for attempt in range(8):
            resp = self.client.batch_write_item(RequestItems={self.table: pending})
            pending = resp.get("UnprocessedItems", {}).get(self.table, [])
            if not pending:
                return
            if attempt + 1 < 8:
                self.sleep(backoff)
                backoff = min(backoff * 2, 6.4)
        raise RuntimeError(f"{len(pending)} items unprocessed after retries")

    def close(self) -> None:
        self.batch.close()
