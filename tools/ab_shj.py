#!/usr/bin/env python3
"""Interleaved A/B: sort-merge default vs shuffled-hash-join-friendly
join planning (r16, guide §3.1 / §9).

Two session knobs the optimization guide's baseline recommends that
SCALE_CONF did not originally set:
  * spark.sql.join.preferSortMergeJoin=false — lets the planner pick a
    shuffled hash join (no sort on either side) when its size
    conditions hold;
  * spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m —
    lets AQE rewrite a planned sort-merge to shuffled-hash at runtime
    when every post-shuffle partition is under the threshold.

METHODOLOGY (v2). The first version of this tool ran the smj side on
even passes and the shj side on odd passes, every lane, 6 passes.
That confounds the comparison with host warm-up drift: pass 0 is the
coldest, so the A side carries the cold pass for EVERY lane and the
whole suite reads "B faster" uniformly — including on lanes whose
plans are IDENTICAL under both configs (at sf0.1 the TPC-H joins all
broadcast under the 64m threshold; plan_dump confirmed q5/q9 static
plans byte-identical, yet v1 reported them 0.69-0.79).  v2 fixes both
defects:
  * lanes: only those whose committed PLANS.md section showed a
    SortMergeJoin — the lanes where the knobs can change the plan;
  * protocol: one discarded warm-up pass of both sides, then per-pass
    ORDER FLIP (pass 0: A,B; pass 1: B,A; ...) so slow host drift
    cancels pairwise instead of accumulating on one side.

Because session conf cannot toggle per-pass inside one session
reliably for cached plans, each side sets the conf before building;
both knobs are runtime-settable.

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

# Lanes with a SortMergeJoin in the pre-change PLANS.md audit — the
# only lanes where preferSortMergeJoin / the AQE SHJ rewrite can alter
# the executed plan. (ivm_join_refresh: 2 static SHJ picks at sf0.1;
# dedup_semantic: runtime AQE rewrite SMJ->SHJ in the final plan.)
LANES = [
    "cdc_apply_changes", "cdc_changes", "cdc_changes_composite_pk",
    "cdc_curated_inserts", "cdc_envelope", "cdc_ingest_dedup",
    "counter_hash_changes", "dedup_minhash_accuracy", "dedup_semantic",
    "ivm_grouped_refresh", "ivm_join_refresh", "ivm_null_groups_refresh",
    "q7_volume_shipping", "q8_market_share", "q10_returned_items",
    "q20_volume_suppliers", "q21_waiting_suppliers", "reconcile_counts",
    "reconcile_rowhash_checksum", "similarity_ivfpq_recall",
    "similarity_pq_recall", "similarity_recall_at_k",
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

    def run_side(side: str, sink: dict[str, list[float]] | None) -> None:
        conf = A_CONF if side == "smj" else B_CONF
        for k, v in conf.items():
            spark.conf.set(k, v)
        for name in LANES:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            if sink is not None:
                sink[name].append(dt)

    raw: dict[str, dict[str, list[float]]] = {
        n: {"smj": [], "shj": []} for n in LANES}
    # discarded warm-up of both sides (JIT, scan caches, JVM heap)
    run_side("smj", None)
    run_side("shj", None)
    for p in range(PASSES):
        order = ("smj", "shj") if p % 2 == 0 else ("shj", "smj")
        for side in order:
            run_side(side, {n: raw[n][side] for n in LANES})

    out = {"passes": PASSES, "sf_dir": SF_DIR, "lanes": LANES,
           "protocol": "v2: SMJ-capable lanes only, 1 discarded warmup "
                       "pass per side, per-pass order flip",
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
