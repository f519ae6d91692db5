"""Subprocess worker for the ledger multi-process race test
(tests/test_ledger_race.py). The reference's normal topology runs
discovery and replication as SEPARATE concurrent jobs against one
ledger; this worker plays one role against a shared JSON-file ledger so
the exactly-once gates are validated across real OS processes."""

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--role", choices=["discover", "replicate"], required=True)
    ap.add_argument("--tiles", type=int, required=True)
    ap.add_argument("--snapshots", type=int, required=True,
                    help="snapshots per tile to produce/consume")
    ap.add_argument("--out", required=True)
    ap.add_argument("--start", type=float, required=True)
    a = ap.parse_args()

    sys.path.insert(0, os.getcwd())
    from cql_replicator_spark.ledger import Ledger

    while time.time() < a.start:
        pass

    led = Ledger(a.ledger)
    deadline = time.time() + 60
    if a.role == "discover":
        # produce `snapshots` rotations per tile, respecting the gate
        next_id = {t: 1 for t in range(a.tiles)}
        produced = []
        gate_blocks = 0
        while any(next_id[t] <= a.snapshots for t in next_id):
            if time.time() > deadline:
                raise SystemExit("discover: timed out waiting for consumer")
            for t in range(a.tiles):
                if next_id[t] > a.snapshots:
                    continue
                if led.can_discover("ks", "tb", t):
                    try:
                        led.record_discovery("ks", "tb", t,
                                             snapshot_id=next_id[t])
                        produced.append((t, next_id[t]))
                        next_id[t] += 1
                    except RuntimeError:
                        gate_blocks += 1  # lost the gate race: retry
                else:
                    gate_blocks += 1
        result = {"role": "discover", "produced": produced,
                  "gate_blocks": gate_blocks}
    else:
        # consume until `snapshots` per tile have been marked complete
        consumed = []
        seen = {t: 0 for t in range(a.tiles)}
        while any(seen[t] < a.snapshots for t in seen):
            if time.time() > deadline:
                raise SystemExit(f"replicate: timed out at {seen}")
            for t in range(a.tiles):
                if seen[t] >= a.snapshots:
                    continue
                plan = led.replication_plan("ks", "tb", t)
                if plan is None:
                    continue
                # (real replication work would happen here)
                led.mark_replication_complete("ks", "tb", t)
                consumed.append((t, plan["curr"], plan["mode"]))
                seen[t] += 1
        result = {"role": "replicate", "consumed": consumed}

    with open(a.out, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
