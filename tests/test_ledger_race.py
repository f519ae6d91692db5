"""Multi-PROCESS exactly-once test for the Ledger state machine.

The reference coordinates discovery and replication as separate
concurrent jobs against one ledger table (K:1391-1476, K:2263-2271);
the file-backed Ledger must survive the same topology. Before the r9
fix it could not: mutations were guarded only by a threading.Lock and
flushed the whole file from a per-process in-memory snapshot, so a
discovery rotation and a replicator's load_status=SUCCESS raced
last-write-wins — a lost SUCCESS re-replicates a consumed snapshot
(duplicate delivery), a lost rotation drops a discovered snapshot.

This suite runs a real discovery process and a real replication process
(plus a two-tile variant with interleaved work) against one ledger file
and asserts the exactly-once ledger contract:

1. every discovered snapshot is consumed exactly once, in order;
2. the first consumption of a tile is mode=historical, all later ones
   mode=delta (prev successfully loaded — the K:1584-1676 dispatch);
3. the final ledger state is consistent (curr consumed, prev=SUCCESS).
"""

import json
import os
import subprocess
import sys
import time

from cql_replicator_spark.ledger import SUCCESS, Ledger

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "ledger_race_worker.py")


def _run(tmp_path, tiles, snapshots, env_extra=None):
    ledger_path = str(tmp_path / "ledger.json")
    start = time.time() + 1.0
    procs, outs = [], []
    env = dict(os.environ, **(env_extra or {}))
    for role in ("discover", "replicate"):
        out = str(tmp_path / f"{role}.json")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--ledger", ledger_path,
             "--role", role, "--tiles", str(tiles),
             "--snapshots", str(snapshots), "--out", out,
             "--start", str(start)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        outs.append(out)
    results = {}
    for p, out in zip(procs, outs):
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()
        with open(out) as f:
            r = json.load(f)
            results[r["role"]] = r
    return ledger_path, results


def _assert_exactly_once(ledger_path, results, tiles, snapshots):
    produced = [tuple(p) for p in results["discover"]["produced"]]
    consumed = results["replicate"]["consumed"]
    # 1. exactly-once, in order, per tile
    for t in range(tiles):
        want = [(t, sid) for sid in range(1, snapshots + 1)]
        got = [(tt, sid) for tt, sid, _ in consumed if tt == t]
        assert [p for p in produced if p[0] == t] == want
        assert got == want, f"tile {t}: consumed {got}, want {want}"
    # 2. historical first, delta after (prev load_status carried over)
    for t in range(tiles):
        modes = [m for tt, _, m in consumed if tt == t]
        assert modes[0] == "historical", modes
        assert all(m == "delta" for m in modes[1:]), modes
    # 3. final ledger state consistent
    led = Ledger(ledger_path)
    for t in range(tiles):
        curr = led.get("ks", "tb", t, "curr")
        assert curr.location == str(snapshots)
        assert curr.load_status == SUCCESS
        prev = led.get("ks", "tb", t, "prev")
        assert prev is not None and prev.load_status == SUCCESS


def test_discovery_and_replication_processes_exactly_once(tmp_path):
    tiles, snapshots = 1, 8
    ledger_path, results = _run(tmp_path, tiles, snapshots)
    _assert_exactly_once(ledger_path, results, tiles, snapshots)


def test_two_tiles_interleaved_exactly_once(tmp_path):
    tiles, snapshots = 2, 6
    ledger_path, results = _run(tmp_path, tiles, snapshots)
    _assert_exactly_once(ledger_path, results, tiles, snapshots)
    # sanity: the roles actually contended (discovery hit the gate at
    # least once while waiting on the consumer)
    assert results["discover"]["gate_blocks"] > 0


def test_fallback_lock_exactly_once_across_processes(tmp_path):
    """The same two-process exactly-once topology, forced onto the
    non-POSIX O_EXCL fallback lock (no flock): the fallback must give
    the same mutual exclusion, or platforms without fcntl silently get
    lost-update ledger corruption."""
    tiles, snapshots = 2, 6
    ledger_path, results = _run(
        tmp_path, tiles, snapshots,
        env_extra={"CQL_LEDGER_FORCE_FALLBACK_LOCK": "1"})
    _assert_exactly_once(ledger_path, results, tiles, snapshots)


def test_fallback_lock_stale_break_single_winner(tmp_path, monkeypatch):
    """Rename-based stale-lock break: a crashed holder's lock is broken
    by exactly one waiter (os.rename of one source succeeds once), and
    contenders never overlap in the critical section. The prior
    unlink-based break had a TOCTOU: two waiters both decide 'stale',
    waiter B unlinks+recreates (holding a fresh lock), waiter A's
    already-decided unlink then removes B's FRESH lock — two processes
    inside the section, the exact lost-update the lock prevents."""
    import glob
    import threading

    from cql_replicator_spark import ledger as L

    monkeypatch.setenv("CQL_LEDGER_FORCE_FALLBACK_LOCK", "1")
    led = L.Ledger(str(tmp_path / "ledger.json"))
    lock_path = led.path + ".lock"
    # plant a crashed holder's lock, aged past the staleness threshold
    open(lock_path, "w").close()
    old = time.time() - 10 * 60
    os.utime(lock_path, (old, old))

    inside, max_inside = 0, 0
    gate = threading.Lock()

    def worker():
        nonlocal inside, max_inside
        with led._file_lock():
            with gate:
                inside += 1
                max_inside = max(max_inside, inside)
            time.sleep(0.02)
            with gate:
                inside -= 1

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "fallback lock deadlocked"
    assert max_inside == 1, f"{max_inside} holders inside the section"
    # break artifacts cleaned up; no lock left behind
    assert glob.glob(lock_path + ".break.*") == []
    assert not os.path.exists(lock_path)


def test_reader_methods_never_reassign_shared_rows(tmp_path):
    """The r10 lost-mark race, pinned mechanically: unlocked reader
    methods (get / can_discover / replication_plan / rows) must read a
    LOCAL disk snapshot, never reassign self._rows — a reader reload
    landing between a locked writer's mutation and its _flush() swaps
    in the pre-mutation state and the flush serializes that, silently
    dropping the write (a replication mark vanished under the
    cdc_ledger_cycle thread fan-out)."""
    led = Ledger(str(tmp_path / "ledger.json"))
    led.record_discovery("ks", "tb", 0, snapshot_id=1)
    shared = led._rows
    led.get("ks", "tb", 0, "curr")
    led.can_discover("ks", "tb", 0)
    led.replication_plan("ks", "tb", 0)
    led.rows()
    assert led._rows is shared, \
        "a reader method reassigned the shared row dict"


def test_threaded_marks_survive_concurrent_plan_reads(tmp_path):
    """Thread-fan-out version of the same race: writer threads mark
    tiles complete while reader threads hammer replication_plan and
    can_discover on OTHER tiles. Every mark must survive to the file —
    before the local-snapshot fix this dropped marks within a few
    iterations under load."""
    import threading

    for trial in range(30):
        led = Ledger(str(tmp_path / f"l{trial}.json"))
        tiles = range(4)
        for t in tiles:
            led.record_discovery("ks", "tb", t, snapshot_id=1)
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                for t in tiles:
                    led.replication_plan("ks", "tb", t)
                    led.can_discover("ks", "tb", t)

        readers = [threading.Thread(target=reader) for _ in range(3)]
        for r in readers:
            r.start()
        try:
            markers = [threading.Thread(
                target=led.mark_replication_complete, args=("ks", "tb", t))
                for t in tiles]
            for m in markers:
                m.start()
            for m in markers:
                m.join(timeout=30)
        finally:
            stop.set()
            for r in readers:
                r.join(timeout=10)
        final = {r.tile: r.load_status for r in led.rows() if r.ver == "curr"}
        assert final == {t: SUCCESS for t in tiles}, (trial, final)
