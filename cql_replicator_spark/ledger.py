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

Backend: a single JSON file with atomic tmp+rename writes, guarded by a
REAL cross-process lock (fcntl.flock on a sidecar .lock file; O_EXCL
spin fallback where flock is unavailable). The reference's normal
topology runs discovery and replication as SEPARATE concurrent jobs
against one ledger (a Keyspaces/DynamoDB table with per-row updates),
so the file backend must survive the same concurrency: every mutation
re-reads the file under the exclusive lock before checking its gate and
flushing, and every read reloads first — otherwise two processes'
whole-file writes are last-write-wins and a rotation or a
load_status=SUCCESS silently vanishes, which is exactly the lost-update
the exactly-once gates exist to prevent. Contract: any number of
discovery/replication processes, ONE replication consumer per tile
(the reference's per-tile single-consumer loop, K:1584-1676). Ledger
rows number tiles×2 (≤2048 by the reference's guardrails) so reloading
the whole file per operation is trivially cheap; swap the backend for
a DynamoDB or JDBC table in production without touching callers.

Consume-effect contract (the journal-before-mark residual, pinned):
a consumer's external effect (the data write — replication_plan ->
load -> mark_replication_complete) and the ledger mark cannot be one
atomic step without a transactional sink, and no lock-free scheme
makes them one. The ledger therefore guarantees exactly-once MARKS and
at-least-once EFFECTS, with the redo bounded at exactly the single
in-flight snapshot whose effect landed but whose mark did not — a
recovering consumer re-plans that one snapshot and re-runs its effect;
it can never re-run an already-marked one (replication_plan returns
None) and never skip one (the unmarked curr stays consumable). The
redo carries the identical (ks, tbl, tile, curr-location) key, so an
idempotent sink keyed by it — every sink in this repo that replays
(DLQ, parquet overwrite-by-snapshot, CQL upsert) — dedups the pair to
effectively-once. Pinned deterministically by
tests/test_ledger_race.py::test_journal_before_mark_residual_bounded
and at random kill instants by the SIGKILL chaos suite's invariant 3.
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time
from dataclasses import asdict, dataclass, field

try:
    import fcntl
except ImportError:  # non-POSIX: O_EXCL spin fallback below
    fcntl = None

# An O_EXCL fallback lock older than this is a crashed holder and is
# broken; flock needs no such gate (the kernel releases it on death).
_LOCK_STALE_SECS = 60.0

SUCCESS = "SUCCESS"
EMPTY = ""


@contextlib.contextmanager
def file_mutex(lock_path: str):
    """Cross-process exclusive lock for read-modify-write mutations —
    flock where available (self-releasing on process death); O_EXCL
    create with a staleness break elsewhere. Module-level so other
    file-backed stores (SnapshotStore's manifest) reuse the exact
    battle-tested implementation the ledger's chaos suites pin, rather
    than growing subtly-divergent copies."""
    os.makedirs(os.path.dirname(lock_path) or ".", exist_ok=True)
    # CQL_LEDGER_FORCE_FALLBACK_LOCK exists so the non-POSIX branch
    # is exercisable (unit + cross-process race tests) on POSIX CI.
    if fcntl is not None and not os.environ.get(
            "CQL_LEDGER_FORCE_FALLBACK_LOCK"):
        fd = os.open(lock_path, os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)
        return
    while True:  # pragma: no cover — non-POSIX fallback
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            try:
                stale = (time.time() - os.stat(lock_path).st_mtime
                         > _LOCK_STALE_SECS)
            except OSError:
                continue
            if stale:
                # Break the crashed holder's lock by RENAME, not
                # unlink: two waiters can both decide "stale", but
                # only one rename of the same source succeeds, so
                # the loser can never remove the lock a winner (or
                # a fresh acquirer) just created — the unlink-based
                # break had exactly that TOCTOU (A stats stale, B
                # unlinks+recreates, A's unlink removes B's fresh
                # lock, two holders inside the critical section).
                breaker = f"{lock_path}.break.{os.getpid()}.{time.monotonic_ns()}"
                try:
                    os.rename(lock_path, breaker)
                except OSError:
                    time.sleep(0.01)
                    continue
                try:
                    os.unlink(breaker)
                except OSError:
                    pass
                continue
            time.sleep(0.01)
    try:
        yield
    finally:
        try:
            os.unlink(lock_path)
        except FileNotFoundError:
            pass


class DiscoveryRaceLost(RuntimeError):
    """record_discovery's under-lock gate failed: a rival discoverer
    rotated the tile between the caller's can_discover() check and its
    record. A benign, contract-legal outcome callers may skip — typed
    so they don't have to catch bare RuntimeError (which would also
    swallow unrelated ledger failures)."""


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
        self._reload()

    def _read_rows(self) -> dict[tuple, dict]:
        """One complete on-disk snapshot — the file is only ever
        published whole via os.replace, so a read at any moment sees a
        complete state (possibly one write stale, which the gates
        tolerate)."""
        rows: dict[tuple, dict] = {}
        try:
            with open(self.path) as f:
                for r in json.load(f):
                    rows[(r["ks"], r["tbl"], r["tile"], r["ver"])] = r
        except FileNotFoundError:
            pass
        return rows

    def _reload(self) -> None:
        """Refresh the SHARED in-memory rows from disk. Call ONLY while
        holding self._lock: reader methods must use _read_rows() on a
        local snapshot instead. An unlocked reader that reassigns
        self._rows while a locked writer sits between its mutation and
        its _flush() swaps in the pre-mutation disk state, and the
        flush then serializes THAT — silently dropping the write. The
        cdc_ledger_cycle stress caught exactly this: a tile's
        replication mark vanished whenever another tile's thread ran
        replication_plan()'s reload inside the mark's critical section
        (threaded tile fan-out, the reference's normal topology)."""
        self._rows = self._read_rows()

    @contextlib.contextmanager
    def _file_lock(self):
        with file_mutex(self.path + ".lock"):
            yield

    def _flush(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(list(self._rows.values()), f, indent=1)
        os.replace(tmp, self.path)

    @staticmethod
    def _get_from(rows: dict[tuple, dict], ks: str, tbl: str, tile: int,
                  ver: str) -> LedgerRow | None:
        r = rows.get((ks, tbl, tile, ver))
        return LedgerRow(**r) if r else None

    def get(self, ks: str, tbl: str, tile: int, ver: str) -> LedgerRow | None:
        # local snapshot, never self._rows: see _reload()
        return self._get_from(self._read_rows(), ks, tbl, tile, ver)

    def _get_loaded(self, ks: str, tbl: str, tile: int,
                    ver: str) -> LedgerRow | None:
        return self._get_from(self._rows, ks, tbl, tile, ver)

    # -- discovery side ---------------------------------------------------
    def can_discover(self, ks: str, tbl: str, tile: int) -> bool:
        """K:2263-2271 — skip if an unconsumed curr snapshot exists."""
        return self._can_discover_from(self._read_rows(), ks, tbl, tile)

    def _can_discover_from(self, rows: dict[tuple, dict], ks: str,
                           tbl: str, tile: int) -> bool:
        curr = self._get_from(rows, ks, tbl, tile, "curr")
        if curr is None or curr.offload_status != SUCCESS:
            return True
        return curr.load_status == SUCCESS

    def _can_discover_loaded(self, ks: str, tbl: str, tile: int) -> bool:
        return self._can_discover_from(self._rows, ks, tbl, tile)

    def record_discovery(self, ks: str, tbl: str, tile: int, snapshot_id: int) -> None:
        """Rotate curr->prev (preserving load_status) and write new curr.

        updateLedger semantics (K:1391-1417). Raises if the gate of
        can_discover() is violated — callers must check first, the
        raise protects the invariant under races.
        """
        with self._lock, self._file_lock():
            # re-read under the exclusive lock: the gate must see other
            # PROCESSES' state (a replicator's load_status, another
            # discoverer's rotation), not this object's stale snapshot
            self._reload()
            if not self._can_discover_loaded(ks, tbl, tile):
                raise DiscoveryRaceLost(
                    f"tile {tile}: unconsumed snapshot present; discovery must not rotate"
                )
            curr = self._get_loaded(ks, tbl, tile, "curr")
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
        rows = self._read_rows()  # local snapshot, never self._rows
        curr = self._get_from(rows, ks, tbl, tile, "curr")
        if curr is None or curr.offload_status != SUCCESS or curr.load_status == SUCCESS:
            return None
        prev = self._get_from(rows, ks, tbl, tile, "prev")
        if prev is None or prev.load_status != SUCCESS:
            return {"mode": "historical", "curr": int(curr.location)}
        return {"mode": "delta", "curr": int(curr.location), "prev": int(prev.location)}

    def mark_replication_complete(self, ks: str, tbl: str, tile: int) -> None:
        """markReplicationComplete (K:1464-1476)."""
        with self._lock, self._file_lock():
            self._reload()  # merge other processes' rows, not clobber them
            key = (ks, tbl, tile, "curr")
            if key not in self._rows:
                raise RuntimeError(f"tile {tile}: no curr ledger row to complete")
            self._rows[key]["load_status"] = SUCCESS
            self._rows[key]["dt_load"] = time.time()
            self._flush()

    def rows(self) -> list[LedgerRow]:
        # local snapshot, never self._rows: see _reload()
        return [LedgerRow(**r) for r in self._read_rows().values()]
