"""Ledger — the per-tile replication state machine.

The reference coordinates discovery and replication through a ledger
table (Keyspaces ``migration.ledger`` DDL at glue/bin/cqlreplicator
C:1027-1038; DynamoDB flavor D:843-1061) with one row per
(ks, tbl, tile, ver ∈ {curr, prev}):

    offload_status  -- discovery wrote the snapshot ("SUCCESS" | "")
    location        -- snapshot id
    load_status     -- replication consumed it ("SUCCESS" | "")
    dt_offload / dt_load timestamps

Invariants reimplemented exactly (these are the exactly-once gate):
  * Discovery rotation (updateLedger K:1391-1417): writing a new curr
    moves old curr -> prev PRESERVING its load_status.
  * Discovery skip rule (K:2263-2271): if curr exists with
    load_status != SUCCESS, discovery must NOT overwrite it (the
    unconsumed snapshot would be lost).
  * Replication consume rule (K:1584-1676): a tile is consumable iff
    curr.offload_status == SUCCESS and curr.load_status != SUCCESS.
    With no successfully-loaded prev -> historical (full) load; with a
    loaded prev -> delta load between prev.location and curr.location.
  * markReplicationComplete (K:1464-1476) sets curr.load_status=SUCCESS.

Backend: a single JSON file with atomic tmp+rename writes and a process
lock — ledger rows number tiles×2 (≤2048 by the reference's guardrails)
so driver-side state is appropriate; swap the backend for a DynamoDB or
JDBC table in production without touching callers.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict, dataclass, field

SUCCESS = "SUCCESS"
EMPTY = ""


@dataclass
class LedgerRow:
    ks: str
    tbl: str
    tile: int
    ver: str  # "curr" | "prev"
    offload_status: str = EMPTY
    dt_offload: float = 0.0
    location: str = EMPTY  # snapshot id (stringified)
    load_status: str = EMPTY
    dt_load: float = 0.0


class Ledger:
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        self._rows: dict[tuple, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                for r in json.load(f):
                    self._rows[(r["ks"], r["tbl"], r["tile"], r["ver"])] = r

    def _flush(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(list(self._rows.values()), f, indent=1)
        os.replace(tmp, self.path)

    def get(self, ks: str, tbl: str, tile: int, ver: str) -> LedgerRow | None:
        r = self._rows.get((ks, tbl, tile, ver))
        return LedgerRow(**r) if r else None

    # -- discovery side ---------------------------------------------------
    def can_discover(self, ks: str, tbl: str, tile: int) -> bool:
        """K:2263-2271 — skip if an unconsumed curr snapshot exists."""
        curr = self.get(ks, tbl, tile, "curr")
        if curr is None or curr.offload_status != SUCCESS:
            return True
        return curr.load_status == SUCCESS

    def record_discovery(self, ks: str, tbl: str, tile: int, snapshot_id: int) -> None:
        """Rotate curr->prev (preserving load_status) and write new curr.

        updateLedger semantics (K:1391-1417). Raises if the gate of
        can_discover() is violated — callers must check first, the
        raise protects the invariant under races.
        """
        with self._lock:
            if not self.can_discover(ks, tbl, tile):
                raise RuntimeError(
                    f"tile {tile}: unconsumed snapshot present; discovery must not rotate"
                )
            curr = self.get(ks, tbl, tile, "curr")
            if curr is not None and curr.offload_status == SUCCESS:
                prev = LedgerRow(**{**asdict(curr), "ver": "prev"})
                self._rows[(ks, tbl, tile, "prev")] = asdict(prev)
            now = time.time()
            self._rows[(ks, tbl, tile, "curr")] = asdict(
                LedgerRow(
                    ks=ks, tbl=tbl, tile=tile, ver="curr",
                    offload_status=SUCCESS, dt_offload=now,
                    location=str(snapshot_id), load_status=EMPTY, dt_load=0.0,
                )
            )
            self._flush()

    # -- replication side --------------------------------------------------
    def replication_plan(self, ks: str, tbl: str, tile: int) -> dict | None:
        """What replication should do for this tile right now.

        Returns None (nothing to do), {"mode": "historical", "curr": id},
        or {"mode": "delta", "curr": id, "prev": id} — the three-way
        dispatch of dataReplicationProcess (K:1564-1681).
        """
        curr = self.get(ks, tbl, tile, "curr")
        if curr is None or curr.offload_status != SUCCESS or curr.load_status == SUCCESS:
            return None
        prev = self.get(ks, tbl, tile, "prev")
        if prev is None or prev.load_status != SUCCESS:
            return {"mode": "historical", "curr": int(curr.location)}
        return {"mode": "delta", "curr": int(curr.location), "prev": int(prev.location)}

    def mark_replication_complete(self, ks: str, tbl: str, tile: int) -> None:
        """markReplicationComplete (K:1464-1476)."""
        with self._lock:
            key = (ks, tbl, tile, "curr")
            if key not in self._rows:
                raise RuntimeError(f"tile {tile}: no curr ledger row to complete")
            self._rows[key]["load_status"] = SUCCESS
            self._rows[key]["dt_load"] = time.time()
            self._flush()

    def rows(self) -> list[LedgerRow]:
        return [LedgerRow(**r) for r in self._rows.values()]
