#!/usr/bin/env python3
"""Interleaved A/B: sort-merge default vs shuffled-hash-join-friendly
join planning (r16, guide §3.1 / §9).

Two session knobs the optimization guide's baseline recommends that
SCALE_CONF does not set:
  * spark.sql.join.preferSortMergeJoin=false — lets the planner pick a
    shuffled hash join (no sort on either side) when its size
    conditions hold;
  * spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m —
    lets AQE rewrite a planned sort-merge to shuffled-hash at runtime
    when every post-shuffle partition is under the threshold.

Because session conf cannot toggle per-pass inside one session
reliably for cached plans, each pass clears the relation cache and
sets the conf before building; both knobs are runtime-settable. The
workload is the TPC-H join suite + the CDC join lanes — the
join-heaviest registered lanes.

Run: python3 tools/ab_shj.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_shj.json.
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
    "q3_shipping_priority", "q5_local_supplier_volume", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q18_large_volume_customers",
    "q21_waiting_suppliers", "q2_min_price_supplier", "q20_volume_suppliers",
    "cdc_apply_changes", "cdc_hydrate_inserts", "cdc_orphan_lineitems",
    "record_linkage_fuzzy", "decontaminate_splits",
]

A_CONF = {"spark.sql.join.preferSortMergeJoin": "true",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0"}
B_CONF = {"spark.sql.join.preferSortMergeJoin": "false",
          "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":
              "134217728"}


def main() -> None:
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_shj", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    raw: dict[str, dict[str, list[float]]] = {
        n: {"smj": [], "shj": []} for n in LANES}
    for p in range(PASSES):
        side = "smj" if p % 2 == 0 else "shj"
        conf = A_CONF if side == "smj" else B_CONF
        for k, v in conf.items():
            spark.conf.set(k, v)
        for name in LANES:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            raw[name][side].append(round(time.perf_counter() - t0, 3))

    out = {"passes": PASSES, "sf_dir": SF_DIR, "lanes": LANES,
           "raw": raw, "medians": {}}
    tot_a = tot_b = 0.0
    for name in LANES:
        ma = statistics.median(raw[name]["smj"])
        mb = statistics.median(raw[name]["shj"])
        tot_a += ma
        tot_b += mb
        out["medians"][name] = {
            "smj": round(ma, 3), "shj": round(mb, 3),
            "ratio_shj_over_smj": round(mb / ma, 3)}
        print(f"{name}: smj {ma:.3f}s shj {mb:.3f}s ratio {mb / ma:.3f}")
    out["total"] = {"smj": round(tot_a, 3), "shj": round(tot_b, 3),
                    "ratio": round(tot_b / tot_a, 3)}
    print(f"TOTAL: smj {tot_a:.3f}s shj {tot_b:.3f}s "
          f"ratio {tot_b / tot_a:.3f}")
    (ROOT / "bench_ab_shj.json").write_text(json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
