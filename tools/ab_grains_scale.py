#!/usr/bin/env python3
"""Scale leg for the r16 derived-grain rework: Expand-over-fact +
()-rescan (the r15 cube form) vs grouping-sets-over-pre-aggregate
(the r16 form) at 1x and AMPLIFY x orders.

bench_ab_grains.json showed the r16 form ~0.1s SLOWER at native sf0.1
(fixed stage latency). The keep decision is the data-proportional
term: the old form scans the fact table twice and pushes 3 Expand
copies of every row through the map-side aggregate, while the new
form scans once and Expands only the grouped frame. This artifact
pins the claim empirically: as rows grow, the old/new ratio must rise
past 1 (the crossover) and keep growing toward the ~2-3x envelope the
two-scan + triple-copy arithmetic predicts.

Run: python3 tools/ab_grains_scale.py  [AMPLIFY=50,200]
Writes bench_ab_grains_scale.json.
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
AMPLIFY = [int(x) for x in os.environ.get("AMPLIFY", "50,200").split(",")]
PASSES = int(os.environ.get("AB_PASSES", "5"))


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_grains_scale", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions":
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    orders = load_tables(spark, SF_DIR, ["orders"])["orders"]
    _DEC = "decimal(18,2)"

    def amplified(factor: int):
        if factor == 1:
            return orders
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        # localCheckpoint: both forms must READ amplified rows, not
        # re-run the explode per scan — otherwise the old form's
        # second scan re-pays the amplifier, overstating its cost
        return (orders.select("o_orderkey", "o_orderstatus",
                              "o_orderpriority", "o_totalprice", reps)
                .select((F.col("o_orderkey").cast("long")
                         + F.col("rep").cast("long") * 10_000_000)
                        .alias("o_orderkey"),
                        "o_orderstatus", "o_orderpriority",
                        "o_totalprice")
                .localCheckpoint(eager=True))

    def cube_old(frame):
        aggs = [F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").try_cast(_DEC)).cast("double")
                 .alias("total_spend")]
        keyed = (frame.groupingSets(
            [["o_orderstatus", "o_orderpriority"],
             ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority").agg(*aggs))
        grand = frame.agg(*aggs).select(
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("string").alias("o_orderpriority"),
            "n_orders", "total_spend")
        return keyed.unionByName(grand)

    def cube_new(frame):
        base = frame.groupBy("o_orderstatus", "o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").try_cast(_DEC)).alias("spend"))
        keyed = (base.groupingSets(
            [["o_orderstatus", "o_orderpriority"],
             ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority")
            .agg(F.sum("n").alias("n_orders"),
                 F.sum("spend").cast("double").alias("total_spend")))
        grand = (base.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_orders"),
            F.sum("spend").cast("double").alias("total_spend"))
            .select(F.lit(None).cast("string").alias("o_orderstatus"),
                    F.lit(None).cast("string").alias("o_orderpriority"),
                    "n_orders", "total_spend"))
        return keyed.unionByName(grand)

    out: dict = {"sf_dir": SF_DIR, "amplify": AMPLIFY, "passes": PASSES,
                 "legs": {}}
    for factor in (1, *AMPLIFY):
        frame = amplified(factor)
        n = frame.count()
        times: dict[str, list[float]] = {"old": [], "new": []}
        rows = {}
        for p in range(PASSES):
            forms = [("old", cube_old), ("new", cube_new)]
            for label, fn in forms if p % 2 == 0 else forms[::-1]:
                t0 = time.perf_counter()
                rows[label] = fn(frame).count()
                times[label].append(round(time.perf_counter() - t0, 3))
        med = {k: round(statistics.median(v), 3) for k, v in times.items()}
        assert rows["old"] == rows["new"], rows
        out["legs"][f"{factor}x"] = {
            "n_rows": n, "raw": times, "medians": med,
            "old_over_new": round(med["old"] / med["new"], 3)}
        print(f"{factor}x ({n} rows): old {med['old']}s new {med['new']}s "
              f"old/new {med['old'] / med['new']:.3f}", flush=True)
        if factor != 1:
            frame.unpersist()

    (ROOT / "bench_ab_grains_scale.json").write_text(json.dumps(out, indent=1))
    print("wrote bench_ab_grains_scale.json")


if __name__ == "__main__":
    main()
