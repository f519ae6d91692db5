#!/usr/bin/env python3
"""Cold-session A/B: chained synth→decode mapInPandas at width
defaultParallelism (the first-r17-session shape) vs fused single
mapInPandas at width min(defaultParallelism, 8) (r17 session 2), over
the five heavy Python-codec lanes.

WHY COLD SESSIONS: Spark's PythonWorkerFactory hard-kills Python
workers idle >1 minute (IDLE_WORKER_TIMEOUT_NS, not configurable), so
in the driver's bench — where consecutive uses of a heavy-codec worker
pool are ~10 minutes apart — the pool is ALWAYS cold and the lane pays
the worker spawn storm every rep. A warm in-process A/B (the v2
protocol) cannot see this cost and is exactly how the width-32 chained
shape was mis-measured as a win in the first r17 session (its A/B read
0.24–0.48 warm while the full-bench readings were 16–52 s). Each pass
here is a fresh spark-session subprocess running the five lanes once,
in bench order — the regime the reaper forces.

Sides are interleaved pass-by-pass with order flipped per pass. Row
equality of old vs new shape asserted once up front (sorted collect,
sf0.1). Writes bench_ab_codecfuse.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "4"))

LANES = ["multimodal_jpeg_pixel_decode", "multimodal_mjpeg_frame_sample",
         "multimodal_progressive_jpeg_decode",
         "multimodal_flac_audio_decode", "multimodal_y4m_pixel_decode"]

CHILD = r'''
import json, os, sys, time
sys.path.insert(0, %(root)r)
side = sys.argv[1]
from pyspark.sql import functions as F
from cql_replicator_spark.queries import REGISTRY, queries
from cql_replicator_spark.session import get_spark, load_tables
from cql_replicator_spark.analytics import multimodal as MM
queries()
spark = get_spark("ab_codecfuse", extra_conf={
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32")})
SF = %(sf)r
docs = load_tables(spark, SF, ["documents"])["documents"]

def chain32(name, serial=False):
    # serial=False: the first-r17-session shape (chained maps, width
    # defaultParallelism). serial=True: the r16 shape (chained maps,
    # no fan-out at all).
    if serial:
        spread = lambda df: df
    else:
        spread = lambda df: df.repartition(spark.sparkContext.defaultParallelism)
    orig = MM._spread_small_scan
    MM._spread_small_scan = spread
    try:
        if name == "multimodal_jpeg_pixel_decode":
            return MM.image_pixel_stats(MM.synthesize_jpeg_table(docs))
        if name == "multimodal_progressive_jpeg_decode":
            return MM.image_pixel_stats(
                MM.synthesize_progressive_jpeg_table(docs))
        if name == "multimodal_flac_audio_decode":
            return MM.audio_sample_stats(MM.synthesize_flac_table(docs))
        if name == "multimodal_mjpeg_frame_sample":
            return MM.video_frame_stats(
                MM.synthesize_mjpeg_avi_table(docs), every_ms=100)
        if name == "multimodal_y4m_pixel_decode":
            return MM.y4m_frame_stats(MM.synthesize_y4m_table(docs))
    finally:
        MM._spread_small_scan = orig
    raise KeyError(name)

lanes = %(lanes)r
if side == "check":
    for name in lanes:
        a = sorted(map(tuple, chain32(name).collect()))
        b = sorted(map(tuple, REGISTRY[name].build(spark, SF).collect()))
        assert a == b, f"fused shape changed rows in {name}"
    print(json.dumps({"equal": True}))
else:
    out = {}
    for name in lanes:
        t0 = time.perf_counter()
        if side == "chain32":
            chain32(name).count()
        elif side == "serial16":
            chain32(name, serial=True).count()
        else:
            REGISTRY[name].build(spark, SF).count()
        out[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))
'''


def run_child(side: str) -> dict:
    script = CHILD % {"root": str(ROOT), "sf": SF_DIR,
                      "lanes": LANES}
    r = subprocess.run([sys.executable, "-c", script, side],
                       capture_output=True, text=True, cwd=str(ROOT))
    if r.returncode != 0:
        raise RuntimeError(f"{side} child failed:\n{r.stderr[-2000:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    print("equality check (one session, both shapes)...", flush=True)
    run_child("check")
    raw = {"chain32": [], "fused8": [], "serial16": []}
    for p in range(PASSES):
        order = (("chain32", "fused8", "serial16") if p % 2 == 0
                 else ("serial16", "fused8", "chain32"))
        for side in order:
            raw[side].append(run_child(side))
            print(f"pass {p} {side}: {raw[side][-1]}", flush=True)
    med = {}
    for side in raw:
        med[side] = {ln: round(statistics.median(
            [r[ln] for r in raw[side]]), 3) for ln in LANES}
        med[side]["TOTAL"] = round(sum(med[side][ln] for ln in LANES), 3)
    ratio = {ln: round(med["fused8"][ln] / med["chain32"][ln], 3)
             for ln in LANES}
    ratio["TOTAL"] = round(med["fused8"]["TOTAL"] / med["chain32"]["TOTAL"], 3)
    ratio_serial = {ln: round(med["fused8"][ln] / med["serial16"][ln], 3)
                    for ln in LANES}
    ratio_serial["TOTAL"] = round(
        med["fused8"]["TOTAL"] / med["serial16"]["TOTAL"], 3)
    out = {"passes": PASSES, "sf_dir": SF_DIR,
           "protocol": "cold-session per pass (fresh subprocess/session; "
                       "the worker-reaper regime the driver bench runs "
                       "in), order flipped per pass, row equality "
                       "asserted up front",
           "raw": raw, "medians": med, "ratio_fused_over_chain": ratio,
           "ratio_fused_over_serial16": ratio_serial}
    print(json.dumps({"medians": med, "ratio": ratio,
                      "ratio_vs_serial16": ratio_serial}, indent=1))
    (ROOT / "bench_ab_codecfuse.json").write_text(
        json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
