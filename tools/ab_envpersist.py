#!/usr/bin/env python3
"""Interleaved A/B: persisted vs recomputed CDC envelope across the two
staged micro-batch writes in ivm_stream_refresh (r17).

profile_streaming.json showed staging as the lane's largest phase: the
envelope is a full-outer snapshot join and each staged batch write
re-executed it. The r17 change persists the envelope across the two
writes. Side A monkeypatches DataFrame.persist to identity (the lane's
only persist — reproduces the old recompute-per-write behavior);
side B is the library. Row equality asserted.

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_envpersist.py  Writes bench_ab_envpersist.json.
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
LANE = "ivm_stream_refresh"


def main() -> None:
    from pyspark.sql import DataFrame

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_envpersist", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    orig_persist = DataFrame.persist
    orig_unpersist = DataFrame.unpersist

    def set_side(side: str) -> None:
        if side == "recompute":
            DataFrame.persist = lambda self, *a, **k: self
            DataFrame.unpersist = lambda self, *a, **k: self
        else:
            DataFrame.persist = orig_persist
            DataFrame.unpersist = orig_unpersist

    set_side("recompute")
    a = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    set_side("persist")
    b = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    assert a == b, "env persist changed the rows!"

    raw = {"recompute": [], "persist": []}

    def run(side):
        set_side(side)
        t0 = time.perf_counter()
        REGISTRY[LANE].build(spark, SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    run("recompute")
    run("persist")
    for p in range(PASSES):
        order = (("recompute", "persist") if p % 2 == 0
                 else ("persist", "recompute"))
        for side in order:
            raw[side].append(run(side))
    set_side("persist")

    mr = statistics.median(raw["recompute"])
    mp = statistics.median(raw["persist"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "lane": LANE, "raw": raw,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "medians": {"recompute": round(mr, 3), "persist": round(mp, 3),
                       "ratio_persist_over_recompute": round(mp / mr, 3)}}
    print(f"{LANE}: recompute {mr:.3f}s persist {mp:.3f}s "
          f"ratio {mp / mr:.3f}")
    (ROOT / "bench_ab_envpersist.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
