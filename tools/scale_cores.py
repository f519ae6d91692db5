#!/usr/bin/env python3
"""Core-count scaling smoke (r17, VERDICT #6): the sf0.1 c8/c32 bench
block was structurally blind — every ratio ~1 because most lanes are
fixed-overhead-bound AND (pre-r17) the multimodal codec pipelines ran
as a single task at any core count. This tool measures a hand-picked
compute-heavy lane set at two core counts in SEPARATE processes (the
master is fixed at session start), best-of-2 per lane, and reports
low/high wall ratios. A ratio well above 1 at 4x cores = the lane's
compute actually parallelizes; ~1 = documented overhead floor.

Run: python3 tools/scale_cores.py [low] [high]   (default 8 32)
Writes scale_cores.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

LANES = [
    # r17 fan-out codec lanes: per-row Python cost, should now scale
    "multimodal_jpeg_pixel_decode",
    "multimodal_progressive_jpeg_decode",
    "multimodal_mjpeg_frame_sample",
    "multimodal_flac_audio_decode",
    "multimodal_y4m_pixel_decode",
    # heavy JVM lanes for contrast (shuffle/agg bound at sf0.1)
    "text_sparse_cosine_pairs",
    "doc_winnowing_pairs",
    "dedup_minhash_accuracy",
    "dedup_semantic",
    "graph_pagerank_suppliers",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from cql_replicator_spark.queries import REGISTRY, queries
from cql_replicator_spark.session import get_spark, load_tables
queries()
spark = get_spark("scale_cores", extra_conf={{
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ["SPARK_GRAFT_CPUS"]}})
load_tables(spark, {sf!r})
out = {{}}
for name in {lanes!r}:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, {sf!r}).count()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 3)
print("SCALE_JSON:" + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR)
    p = subprocess.run([sys.executable, "-c",
                        CHILD.format(root=str(ROOT), sf=SF_DIR,
                                     lanes=LANES)],
                       env=env, capture_output=True, text=True,
                       timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("SCALE_JSON:"):
            return json.loads(line[len("SCALE_JSON:"):])
    raise RuntimeError(f"child at {cpus} cores produced no result:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # interleave: low, high, low, high — per-lane min of 2 child runs
    # per side so slow host drift cannot masquerade as a scaling ratio
    runs = {low: [], high: []}
    for cpus in (low, high, low, high):
        runs[cpus].append(run_at(cpus))
    out = {"sf_dir": SF_DIR, "cpus_low": low, "cpus_high": high,
           "per_lane": {}}
    for name in LANES:
        lo = min(r[name] for r in runs[low])
        hi = min(r[name] for r in runs[high])
        out["per_lane"][name] = {
            f"c{low}": lo, f"c{high}": hi,
            "ratio_low_over_high": round(lo / hi, 3)}
        print(f"{name}: c{low} {lo:.3f}s c{high} {hi:.3f}s "
              f"ratio {lo / hi:.3f}")
    (ROOT / "scale_cores.json").write_text(
        json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
