"""Subprocess worker for the dlog multi-process race test
(tests/test_dlog_race.py). Hammers dlog._publish_commit — the
put-if-absent commit point — from a real separate process, so the
optimistic-concurrency guarantee ("two racing writers cannot both win
a version") is validated empirically across OS processes, not just by
monkeypatched single-process unit tests. Run with --linkless to force
the O_EXCL-claim + atomic-rename fallback path (the r8 advisor race).
"""

import argparse
import json
import os
import sys
import time
import uuid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--writer", required=True)
    ap.add_argument("--commits", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--linkless", action="store_true")
    ap.add_argument("--start", type=float, required=True)
    ap.add_argument("--vacuum-until", type=float, default=0.0,
                    help="instead of committing, loop vacuum(1) until "
                         "this epoch time (a concurrent janitor)")
    a = ap.parse_args()

    if a.linkless:
        # simulate a filesystem without hard links BEFORE dlog binds os
        def _no_link(src, dst, **kw):
            raise PermissionError("hard links disabled for this worker")
        os.link = _no_link

    sys.path.insert(0, os.getcwd())
    from cql_replicator_spark import dlog

    # spin-barrier so all workers start colliding at the same instant
    while time.time() < a.start:
        pass

    tbl = dlog.DeltaLogTable(a.table)

    if a.vacuum_until:
        # janitor mode: hammer vacuum while committers race. The orphan
        # staleness gate must keep every in-flight commit's part files
        # alive; vacuumed counts are reported for the test's sanity check.
        n_vacuumed = 0
        while time.time() < a.vacuum_until:
            try:
                n_vacuumed += len(tbl.vacuum(retain_versions=1))
            except OSError:
                pass
        with open(a.out, "w") as f:
            json.dump({"writer": a.writer, "vacuumed": n_vacuumed}, f)
        return

    wins: list[int] = []
    conflicts = 0
    while len(wins) < a.commits:
        prev = tbl.latest_version()
        version = 0 if prev is None else prev + 1
        # one synthetic immutable part file, moved into the table root
        # first — exactly commit_overwrite's staging->root ordering
        rel = f"part-{version:05d}-{uuid.uuid4().hex[:12]}.snappy.parquet"
        with open(os.path.join(a.table, rel), "w") as f:
            f.write(a.writer)
        adds = [{"add": {"path": rel, "partitionValues": {},
                         "size": len(a.writer), "modificationTime": 0,
                         "dataChange": True}}]
        actions: list[dict] = [{"commitInfo": {
            "timestamp": 0, "operation": "WRITE",
            "operationParameters": {"mode": "Overwrite"},
            "writer": a.writer}}]
        if version == 0:
            actions.append({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}})
            actions.append({"metaData": {
                "id": "race-table", "format": {"provider": "parquet",
                                               "options": {}},
                "schemaString": "{}", "partitionColumns": [],
                "configuration": {}, "createdTime": 0}})
        else:
            live, _ = tbl._replay(prev)
            actions.extend({"remove": {"path": r, "deletionTimestamp": 0,
                                       "dataChange": True}}
                           for r in sorted(live))
        actions.extend(adds)
        try:
            dlog._publish_commit(a.table, version, actions, adds)
            wins.append(version)
        except dlog.ConcurrentCommitError:
            conflicts += 1  # lost; recompute latest and retry

    with open(a.out, "w") as f:
        json.dump({"writer": a.writer, "wins": wins,
                   "conflicts": conflicts, "linkless": a.linkless}, f)


if __name__ == "__main__":
    main()
