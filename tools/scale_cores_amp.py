#!/usr/bin/env python3
"""Amplified core-count scaling smoke (r17, VERDICT #6).

scale_cores.json showed the sf0.1 LANE instrument is structurally
blind: every lane — including the fanned-out codec lanes — is
fixed-overhead-bound at ~100 MB, so 8 cores beat 32 (fewer tasks,
same tiny compute). To make scaling measurable without an sf1 dataset
(none exists in this sandbox), this tool amplifies the documents
table 20x (100k docs, the scale_smoke.json recipe) and times four
compute-heavy OPERATOR pipelines at two core counts in separate
processes. The amplified frame is explicitly repartitioned to the
session parallelism inside the harness (the instrument must hand the
operator a parallel input; a derived explode otherwise inherits the
single-file scan's one partition).

Expect ratio(low/high) -> cores_high/cores_low for compute-bound ops;
~1 = that op's cost at this size is still scheduling overhead.

Run: python3 tools/scale_cores_amp.py [low] [high] [amplify]
Writes scale_cores_amp.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from cql_replicator_spark.analytics import dedup as D
from cql_replicator_spark.analytics import multimodal as MM
from cql_replicator_spark.analytics import text as TX
from cql_replicator_spark.session import get_spark, load_tables

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = get_spark("scale_cores_amp", extra_conf={{
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": str(cpus),
    "spark.driver.memory": "8g"}})
docs = load_tables(spark, {sf!r}, ["documents"])["documents"]
n = {amp}
reps = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("rep")
amp = (docs.select("doc_id", "text", reps)
       .select((F.col("doc_id") + F.col("rep") * 10_000_000)
               .alias("doc_id"),
               F.concat_ws(" ", F.col("text"),
                           F.concat(F.lit("salt"),
                                    F.col("rep").cast("string")))
               .alias("text"))
       .repartition(cpus * 2)
       .localCheckpoint(eager=True))   # materialize once; time the op only

ops = {{
    "jpeg_encode_decode": lambda d: MM.image_pixel_stats(
        MM.synthesize_jpeg_table(d)),
    "progressive_jpeg_encode_decode": lambda d: MM.image_pixel_stats(
        MM.synthesize_progressive_jpeg_table(d)),
    "flac_encode_decode": lambda d: MM.audio_sample_stats(
        MM.synthesize_flac_table(d)),
    "winnowing_pairs": lambda d: TX.winnowing_pairs(
        d, k=3, w=4, min_shared=5, max_df=25),
    "sparse_cosine_pairs": lambda d: TX.sparse_cosine_pairs(
        d, df_cutoff=20, min_sim=0.3,
        terms=D.shingles(d).withColumnRenamed("gram", "tok")),
}}
out = {{}}
for name, fn in ops.items():
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(amp).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    out[name] = round(best, 3)
print("SCALE_JSON:" + json.dumps(out))
spark.stop()
"""


def run_at(cpus: int, amp: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=SF_DIR)
    p = subprocess.run(
        [sys.executable, "-c",
         CHILD.format(root=str(ROOT), sf=SF_DIR, amp=amp)],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("SCALE_JSON:"):
            return json.loads(line[len("SCALE_JSON:"):])
    raise RuntimeError(f"child at {cpus} cores produced no result:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    amp = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    runs = {low: [], high: []}
    for cpus in (low, high, low, high):
        runs[cpus].append(run_at(cpus, amp))
    names = list(runs[low][0])
    out = {"sf_dir": SF_DIR, "amplify": amp,
           "cpus_low": low, "cpus_high": high, "per_op": {}}
    for name in names:
        lo = min(r[name] for r in runs[low])
        hi = min(r[name] for r in runs[high])
        out["per_op"][name] = {
            f"c{low}": lo, f"c{high}": hi,
            "speedup_low_to_high": round(lo / hi, 3)}
        print(f"{name}: c{low} {lo:.3f}s c{high} {hi:.3f}s "
              f"speedup {lo / hi:.3f}")
    (ROOT / "scale_cores_amp.json").write_text(
        json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
