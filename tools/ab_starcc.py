#!/usr/bin/env python3
"""Interleaved A/B: lazy vs eager in-loop localCheckpoint in the CC
fixpoints (r17, settles the r16 driver/builder conflict — VERDICT #2).

r16 made the connected-components rounds' localCheckpoint lazy
(eager=False: the round's delta-count action materializes the
checkpoint, saving one job per round). The builder's A/B read flat
(1.012) while the driver's raw numbers put the three CC lanes in the
beyond-drift regression set; the verdict asked for one clean
interleaved A/B — revert if >= 1.0.

Side "eager" monkeypatches DataFrame.localCheckpoint (a driver-side
call) to force eager=True everywhere, reproducing the pre-r16 loop
behavior; side "lazy" is the library. Result equality asserted.

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_starcc.py      Writes bench_ab_starcc.json.
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
PASSES = int(os.environ.get("AB_PASSES", "6"))

LANES = ["dedup_clusters_star", "dedup_clusters", "dedup_cluster_keepers"]


def main() -> None:
    from pyspark.sql import DataFrame

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_starcc", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    orig_lc = DataFrame.localCheckpoint

    def eager_lc(self, eager=True):
        return orig_lc(self, eager=True)

    def set_side(side: str) -> None:
        DataFrame.localCheckpoint = eager_lc if side == "eager" else orig_lc

    set_side("eager")
    a = sorted(map(tuple,
                   REGISTRY["dedup_clusters_star"].build(spark, SF_DIR)
                   .collect()))
    set_side("lazy")
    b = sorted(map(tuple,
                   REGISTRY["dedup_clusters_star"].build(spark, SF_DIR)
                   .collect()))
    assert a == b, "checkpoint mode changed the rows!"

    def run_side(side: str, sink) -> None:
        set_side(side)
        for name in LANES:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            if sink is not None:
                sink[name][side].append(dt)

    raw = {n: {"eager": [], "lazy": []} for n in LANES}
    run_side("eager", None)
    run_side("lazy", None)
    for p in range(PASSES):
        order = ("eager", "lazy") if p % 2 == 0 else ("lazy", "eager")
        for side in order:
            run_side(side, raw)
    set_side("lazy")

    out = {"passes": PASSES, "sf_dir": SF_DIR, "lanes": LANES,
           "protocol": "v2: equivalence asserted, 1 discarded warmup "
                       "per side, per-pass order flip",
           "raw": raw, "medians": {}}
    tot_a = tot_b = 0.0
    for name in LANES:
        ma = statistics.median(raw[name]["eager"])
        mb = statistics.median(raw[name]["lazy"])
        tot_a += ma
        tot_b += mb
        out["medians"][name] = {
            "eager": round(ma, 3), "lazy": round(mb, 3),
            "ratio_lazy_over_eager": round(mb / ma, 3)}
        print(f"{name}: eager {ma:.3f}s lazy {mb:.3f}s "
              f"ratio {mb / ma:.3f}")
    out["total"] = {"eager": round(tot_a, 3), "lazy": round(tot_b, 3),
                    "ratio": round(tot_b / tot_a, 3)}
    print(f"TOTAL ratio {tot_b / tot_a:.3f}")
    (ROOT / "bench_ab_starcc.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
