"""Empirical multi-PROCESS race test for the dlog commit protocol.

The unit tests in test_dlog.py pin the single-process semantics with
monkeypatched os.link; this suite validates the actual cross-process
guarantee the module docstring makes — "two racing writers cannot both
win a version" — by running real OS processes that hammer
dlog._publish_commit concurrently on one table, on three filesystem
regimes:

* link      — every writer has os.link (the hard-link put-if-absent)
* linkless  — every writer falls back to O_EXCL claim + atomic rename
              (the r8 advisor race: a fresh empty claim must NOT be
              reclaimed by a rival)
* mixed     — half the writers linkless, half link-capable, sharing
              the directory (NFS client mix on one export)

Asserted invariants, per regime:
1. every version 0..K-1 committed exactly once, K = total wins;
2. win sets are disjoint and each version file's commitInfo.writer
   matches the process that claims the win (no silent double-win —
   the exact failure mode of the pre-fix unconditional reclaim);
3. every commit file is complete JSON-lines (atomic publish: readers
   never see a prefix);
4. log replay yields exactly the last winner's part file, content
   intact;
5. losers leaked no part files (cleanup-on-loss held under contention).
"""

import json
import os
import subprocess
import sys
import time

import pytest

from cql_replicator_spark import dlog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "dlog_race_worker.py")

N_WORKERS = 4
COMMITS_EACH = 6


def _run_race(tmp_path, linkless_flags):
    table = str(tmp_path / "race_table")
    os.makedirs(table)
    start = time.time() + 1.5  # barrier: everyone spins until here
    procs, outs = [], []
    for i, linkless in enumerate(linkless_flags):
        out = str(tmp_path / f"w{i}.json")
        cmd = [sys.executable, WORKER, "--table", table,
               "--writer", f"w{i}", "--commits", str(COMMITS_EACH),
               "--out", out, "--start", str(start)]
        if linkless:
            cmd.append("--linkless")
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE))
        outs.append(out)
    results = []
    for p, out in zip(procs, outs):
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()
        with open(out) as f:
            results.append(json.load(f))
    return table, results


def _assert_invariants(table, results):
    k_expected = N_WORKERS * COMMITS_EACH
    all_wins = [v for r in results for v in r["wins"]]
    # 1. every version exactly once, contiguous from 0
    assert sorted(all_wins) == list(range(k_expected)), (
        f"versions not contiguous/unique: {sorted(all_wins)}")
    # and the on-disk log agrees
    tbl = dlog.DeltaLogTable(table)
    assert tbl.versions() == list(range(k_expected))

    # 2. each version file's writer matches the claimed winner
    claimed = {v: r["writer"] for r in results for v in r["wins"]}
    live_last = None
    for v in range(k_expected):
        actions = tbl._read_commit(v)
        # 3. complete JSON-lines with exactly one commitInfo
        infos = [a["commitInfo"] for a in actions if "commitInfo" in a]
        assert len(infos) == 1, f"v{v}: malformed commit {actions}"
        assert infos[0]["writer"] == claimed[v], (
            f"v{v}: on-disk writer {infos[0]['writer']} but "
            f"{claimed[v]} claims the win — double-win race!")
        adds = [a["add"]["path"] for a in actions if "add" in a]
        assert len(adds) == 1
        live_last = (v, adds[0], infos[0]["writer"])

    # 4. replay: the live set is exactly the last commit's part file,
    #    and its bytes are the winning writer's marker
    live, _ = tbl._replay(k_expected - 1)
    assert set(live) == {live_last[1]}
    with open(os.path.join(table, live_last[1])) as f:
        assert f.read() == live_last[2]

    # 5. no leaked loser part files: exactly one parquet per version
    parquet = [n for n in os.listdir(table) if n.endswith(".parquet")]
    assert len(parquet) == k_expected, (
        f"{len(parquet)} part files for {k_expected} commits — "
        f"losers leaked files")

    # sanity: the race actually happened (some conflicts were hit);
    # a scheduler fluke could serialize everything, so warn-don't-fail
    total_conflicts = sum(r["conflicts"] for r in results)
    if total_conflicts == 0:
        pytest.skip("no contention observed — rerun (scheduler fluke)")


def test_race_link_path(tmp_path):
    table, results = _run_race(tmp_path, [False] * N_WORKERS)
    _assert_invariants(table, results)


def test_race_linkless_fallback(tmp_path):
    table, results = _run_race(tmp_path, [True] * N_WORKERS)
    _assert_invariants(table, results)


def test_race_mixed_capabilities(tmp_path):
    flags = [i % 2 == 0 for i in range(N_WORKERS)]
    table, results = _run_race(tmp_path, flags)
    _assert_invariants(table, results)


def test_vacuum_racing_committers_never_corrupts(tmp_path):
    """A janitor process loops vacuum(retain=1) while committers race.
    The orphan staleness gate (fresh unreferenced parquet = possibly an
    in-flight commit) must keep every winning version's data file
    alive: after the dust settles, the retained version replays with
    its part file present and the winner's content intact. Without the
    gate this flakes immediately — vacuum sees a mover's file before
    its log publish and deletes it."""
    table = str(tmp_path / "race_table")
    os.makedirs(table)
    start = time.time() + 1.5
    procs, outs = [], []
    for i in range(3):  # 3 committers
        out = str(tmp_path / f"w{i}.json")
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--table", table, "--writer", f"w{i}",
             "--commits", str(COMMITS_EACH), "--out", out,
             "--start", str(start)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
        outs.append(out)
    vout = str(tmp_path / "janitor.json")
    procs.append(subprocess.Popen(
        [sys.executable, WORKER, "--table", table, "--writer", "janitor",
         "--commits", "0", "--out", vout, "--start", str(start),
         "--vacuum-until", str(start + 4.0)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs.append(vout)
    results = []
    for p, out in zip(procs, outs):
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()
        with open(out) as f:
            results.append(json.load(f))

    committers = [r for r in results if "wins" in r]
    k = sum(len(r["wins"]) for r in committers)
    assert k == 3 * COMMITS_EACH
    tbl = dlog.DeltaLogTable(table)
    assert tbl.versions() == list(range(k))
    # the latest version must read back intact: its add-file exists and
    # carries the winning writer's marker (vacuum never ate a winner)
    live, _ = tbl._replay(k - 1)
    assert len(live) == 1
    rel = next(iter(live))
    path = os.path.join(table, rel)
    assert os.path.exists(path), "vacuum deleted the live version's file"
    winner = {v: r["writer"] for r in committers for v in r["wins"]}[k - 1]
    with open(path) as f:
        assert f.read() == winner
    # every retained-window version must also be readable (retain=1 ->
    # only the newest is guaranteed; older ones may be legally vacuumed)
    # and no commit file may reference a file vacuum deleted while that
    # version was newest — spot-checked implicitly by the read above.
