#!/usr/bin/env python3
"""Interleaved A/B: coalesce(1) micro-batch staging vs
stage_microbatches (repartition(k) + pad + mtime stamping).

The r14 fix replaced the six streaming lanes' coalesce(1) staging
writes (data-proportional single-task funnels, invisible to the
returned-plan gates) with k-task parallel staging. Per the round-4
house rule, the kept form carries an interleaved A/B of what the
change costs/saves TODAY at sf0.1: both forms stage the same two
events-table halves into fresh directories, alternating A/B inside one
session, N passes each. The keep argument is the scale shape — a
single task writing half the events table grows linearly with the
data while the parallel form splits it k ways and the pad/stamp
overhead is O(k) constant — this artifact records the sf0.1 number
honestly either way.

Run: python3 tools/ab_staging.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_staging.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "6"))  # per form


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.session import get_spark, load_tables
    from cql_replicator_spark.streaming.windows import stage_microbatches

    spark = get_spark("ab_staging", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    events = load_tables(spark, SF_DIR, ["events"])["events"].select(
        "event_id", "user_id", "event_type")
    conds = (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1)
    halves = [events.filter(c) for c in conds]
    events.count()  # warm the scan

    def run_a(stage: str) -> None:  # the r13 form
        for h in halves:
            h.coalesce(1).write.mode("append").parquet(stage)

    def run_b(stage: str) -> None:  # the r14 form
        stage_microbatches(halves, stage, files_per_batch=8)

    times: dict[str, list[float]] = {"coalesce1": [], "staged_k8": []}
    root = tempfile.mkdtemp(prefix="ab_staging_")
    i = 0
    for p in range(PASSES):
        for label, fn in (("coalesce1", run_a), ("staged_k8", run_b)):
            d = os.path.join(root, f"{label}_{i}")
            i += 1
            t0 = time.monotonic()
            fn(d)
            times[label].append(round(time.monotonic() - t0, 3))
        print(f"pass {p}: " + " ".join(
            f"{k}={v[-1]}" for k, v in times.items()))
    shutil.rmtree(root, ignore_errors=True)

    out = {"sf_dir": SF_DIR, "passes": PASSES}
    for k, v in times.items():
        out[k] = {"per_pass": v, "median": round(statistics.median(v), 3)}
    out["ratio_staged_over_coalesce1"] = round(
        out["staged_k8"]["median"] / out["coalesce1"]["median"], 3)
    (ROOT / "bench_ab_staging.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
