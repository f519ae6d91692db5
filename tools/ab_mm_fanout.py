#!/usr/bin/env python3
"""Interleaved A/B: multimodal small-scan fan-out on vs off (r17).

_spread_small_scan round-robin repartitions a sub-split input to
defaultParallelism before the synthesize->decode codec mapInPandas
chain (guide §4.2/§6.1): without it the sf0.1 documents table (one
584 KB file) plans ONE scan task and the whole Python codec pipeline
runs serially on one core. The helper runs at plan-build time in the
DRIVER, so side A simply monkeypatches it to identity — both sides
run the same (new, vectorized) codec; this isolates the fan-out.

Protocol (v2, drift-robust): one discarded warm-up pass per side,
then per-pass order flip so slow host drift cancels pairwise.
Row-set equivalence asserted (sorted collect) on two lanes first.

Run: python3 tools/ab_mm_fanout.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_mm_fanout.json.
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

LANES = [
    "multimodal_jpeg_pixel_decode",
    "multimodal_progressive_jpeg_decode",
    "multimodal_mjpeg_frame_sample",
    "multimodal_flac_audio_decode",
    "multimodal_gif_pixel_decode",
    "multimodal_y4m_pixel_decode",
    "multimodal_adpcm_audio_decode",
    "multimodal_wav_pcm_decode",
    "multimodal_image_headers",
]


def main() -> None:
    from cql_replicator_spark.analytics import multimodal as MM
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_mm_fanout", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    spread = MM._spread_small_scan

    def set_side(side: str) -> None:
        MM._spread_small_scan = spread if side == "fanout" else (lambda df: df)

    # row-set equivalence: fan-out must not change any lane's rows
    for name in ("multimodal_jpeg_pixel_decode",
                 "multimodal_mjpeg_frame_sample"):
        set_side("serial")
        a = sorted(map(tuple, REGISTRY[name].build(spark, SF_DIR).collect()))
        set_side("fanout")
        b = sorted(map(tuple, REGISTRY[name].build(spark, SF_DIR).collect()))
        assert a == b, f"{name}: fan-out changed the row set!"

    def run_side(side: str, sink) -> None:
        set_side(side)
        for name in LANES:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            if sink is not None:
                sink[name][side].append(dt)

    raw = {n: {"serial": [], "fanout": []} for n in LANES}
    run_side("serial", None)   # discarded warm-up, both sides
    run_side("fanout", None)
    for p in range(PASSES):
        order = ("serial", "fanout") if p % 2 == 0 else ("fanout", "serial")
        for side in order:
            run_side(side, raw)
    MM._spread_small_scan = spread

    out = {"passes": PASSES, "sf_dir": SF_DIR, "lanes": LANES,
           "protocol": "v2: 1 discarded warmup pass per side, per-pass "
                       "order flip; equivalence asserted on 2 lanes",
           "raw": raw, "medians": {}}
    tot_a = tot_b = 0.0
    for name in LANES:
        ma = statistics.median(raw[name]["serial"])
        mb = statistics.median(raw[name]["fanout"])
        tot_a += ma
        tot_b += mb
        out["medians"][name] = {
            "serial": round(ma, 3), "fanout": round(mb, 3),
            "ratio_fanout_over_serial": round(mb / ma, 3)}
        print(f"{name}: serial {ma:.3f}s fanout {mb:.3f}s "
              f"ratio {mb / ma:.3f}")
    out["total"] = {"serial": round(tot_a, 3), "fanout": round(tot_b, 3),
                    "ratio": round(tot_b / tot_a, 3)}
    print(f"TOTAL: serial {tot_a:.3f}s fanout {tot_b:.3f}s "
          f"ratio {tot_b / tot_a:.3f}")
    (ROOT / "bench_ab_mm_fanout.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
