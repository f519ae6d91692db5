#!/usr/bin/env python3
"""Interleaved A/B: snapshot write read-back + ungated discover (old)
vs observe-counted write + gate-first discover (r16 new).

Two action-count cuts in the CDC state machine:
  * write_snapshot (parquet, no stats_cols) counted the committed rows
    by READING THE SNAPSHOT BACK (read.parquet + count = 2 extra jobs,
    a second full pass at scale); the new form rides an Observation on
    the write job itself.
  * discover() materialized (persist + count) the full tiled source
    BEFORE consulting the ledger gate, so a fully-blocked cycle paid a
    complete source pass to refuse; the new form probes can_discover
    first and returns without touching the source.

A-pass = old forms (monkeypatched back in from this tool),
B-pass = new forms (the library). The driver lane cdc_ledger_cycle is
the workload (2 discover+replicate cycles + a fully-gated discover).
Run: python3 tools/ab_snapwrite.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_snapwrite.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "8"))


def main() -> None:
    from cql_replicator_spark import runner as runner_mod
    from cql_replicator_spark import snapshot as snapshot_mod
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_snapwrite", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    new_locked = snapshot_mod.SnapshotStore._write_snapshot_locked
    new_discover = runner_mod.CdcPipeline.discover

    def old_locked(self, df, tile, files_per_snapshot, stats_cols):
        """Pre-r16 parquet branch: write, then read back and count."""
        if self.fmt != "parquet" or stats_cols:
            return new_locked(self, df, tile, files_per_snapshot, stats_cols)
        entries = self._read_manifest(tile)
        new_id = (max(e["id"] for e in entries) + 1) if entries else 1
        path = os.path.join(self._tile_dir(tile), f"snap-{new_id:08d}")
        out = df.coalesce(files_per_snapshot)
        out.write.mode("overwrite").parquet(path)
        entry = {"id": new_id, "committed_at": time.time(), "path": path}
        back = df.sparkSession.read.parquet(path)
        entry["count"] = back.count()
        entries.append(entry)
        self._write_manifest(tile, entries)
        return new_id

    def old_discover(self):
        """Pre-r16: no gate-first pre-filter (materialize, then gate)."""
        saved = self.ledger.can_discover
        try:
            # neutralize only the tool's pre-filter probe pattern by
            # running the new body with the pre-filter forced true...
            # simpler: inline the old behavior = new body minus the
            # early return. Re-implement by calling new_discover on a
            # shim whose ledger claims at least one discoverable tile
            # for the pre-filter, while per_tile still sees the truth.
            calls = {"n": 0}

            def probe(ks, tbl, t):
                calls["n"] += 1
                # the pre-filter's any() probes tiles in order before
                # the source is touched; per_tile probes again later.
                # Force the FIRST probe round to claim discoverable.
                if calls["n"] <= 1:
                    return True
                return saved(ks, tbl, t)

            self.ledger.can_discover = probe
            return new_discover(self)
        finally:
            self.ledger.can_discover = saved

    lane = REGISTRY["cdc_ledger_cycle"]

    raw = {"old": [], "new": []}
    for p in range(PASSES):
        side = "old" if p % 2 == 0 else "new"
        if side == "old":
            snapshot_mod.SnapshotStore._write_snapshot_locked = old_locked
            runner_mod.CdcPipeline.discover = old_discover
        else:
            snapshot_mod.SnapshotStore._write_snapshot_locked = new_locked
            runner_mod.CdcPipeline.discover = new_discover
        t0 = time.perf_counter()
        lane.build(spark, SF_DIR).count()
        raw[side].append(round(time.perf_counter() - t0, 3))
    snapshot_mod.SnapshotStore._write_snapshot_locked = new_locked
    runner_mod.CdcPipeline.discover = new_discover

    mo, mn = statistics.median(raw["old"]), statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw,
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"cdc_ledger_cycle: old {mo:.3f}s new {mn:.3f}s "
          f"ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_snapwrite.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
