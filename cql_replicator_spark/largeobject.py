"""Large-object offload: move oversized column values to an object
store, replacing them with a reference (xref).

Mirrors offloadToS3 (CQLReplicator.scala K:682-725; multi-column +
optional compression D:1473-1515; delete-on-delete D:1460-1471):

  * value -> (optional compress) -> base64 -> put at
    ``{prefix}/{timeuuid}`` (enableRefByTimeUUID) or
    ``{prefix}/key={pk1:pk2:...}/payload`` (keyed layout,
    docs/keyspaces/README.MD:276-277)
  * row's column replaced by the xref string
  * deletes remove the stored object when the row is deleted

The object store is injected as put/get/delete callables (boto3 S3 in
production, a local-dir store in tests). Row-level functions are pure
so they can run inside foreachPartition / mapInPandas.
"""

from __future__ import annotations

import base64
import os
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from . import codec as _codec
from .config import LargeObjects


@dataclass
class ObjectStore:
    put: Callable[[str, bytes], None]
    get: Callable[[str], bytes]
    delete: Callable[[str], None]


def local_dir_store(root: str) -> ObjectStore:
    def put(key: str, data: bytes) -> None:
        # tmp + atomic rename: a writer crashing mid-put must never
        # leave a torn object that get() silently returns truncated —
        # the xref column may already reference the key (the S3
        # production store gives the same all-or-nothing PUT semantics)
        path = os.path.join(root, key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def get(key: str) -> bytes:
        with open(os.path.join(root, key), "rb") as f:
            return f.read()

    def delete(key: str) -> None:
        try:
            os.remove(os.path.join(root, key))
        except FileNotFoundError:
            pass

    return ObjectStore(put=put, get=get, delete=delete)


def offload_key(cfg: LargeObjects, pk_values: list) -> str:
    if cfg.enableRefByTimeUUID:
        return f"{cfg.prefix}/{uuid.uuid1()}"  # timeUUID ref (K:689-700)
    # Deviation (deliberate), same class as the tiling concat fix: the
    # reference's raw ':'.join layout (docs/keyspaces/README.MD:276-277)
    # makes ("a:b","c") and ("a","b:c") collide on ONE object key — the
    # second offload silently overwrites the first row's payload — and
    # a pk containing '/' or '..' walks outside the store root on a
    # filesystem-backed store. Percent-encoding each value (':'/'/'
    # included) keeps the layout shape and readability for plain keys
    # while making the mapping injective and path-safe.
    from urllib.parse import quote

    joined = ":".join(quote(str(v), safe="") for v in pk_values)
    return f"{cfg.prefix}/key={joined}/payload"


def offload_column(
    row: dict, column: str, cfg: LargeObjects, store: ObjectStore, pk_values: list,
) -> dict:
    """Offload one column value; returns the row with the xref swapped in."""
    val = row.get(column)
    if val is None:
        return row
    data = val if isinstance(val, (bytes, bytearray)) else str(val).encode()
    if cfg.compressionEnabled:
        data = _codec.compress(bytes(data))
    payload = base64.b64encode(bytes(data))
    key = offload_key(cfg, pk_values)
    store.put(key, payload)
    out = dict(row)
    out[column] = key  # xref replaces the value (K:706-720)
    return out


def restore_column(row: dict, column: str, cfg: LargeObjects, store: ObjectStore) -> dict:
    key = row.get(column)
    if not key:
        return row
    data = base64.b64decode(store.get(key))
    if cfg.compressionEnabled:
        data = _codec.decompress(data)
    out = dict(row)
    out[column] = data
    return out


def delete_offloaded(row: dict, column: str, store: ObjectStore) -> None:
    """Delete the stored object when its row is deleted (D:1460-1471)."""
    key = row.get(column)
    if key:
        store.delete(key)
