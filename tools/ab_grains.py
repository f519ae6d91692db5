#!/usr/bin/env python3
"""Interleaved A/B: Expand/union-rescan grouping grains vs the r16
derived-grain forms (orders_cube / orders_rollup /
events_grouping_sets_time).

The r16 rework computes every grain from the finest-grain
pre-aggregate, so the executed plan reads the fact table once and
serves the derived grains from ReusedExchange — vs the r15 form's
Expand (2-3 copies of every fact row through the shuffle) PLUS a
second full scan for the () grain. The scale argument is structural
(pinned by test_grouping_grains_single_scan_single_fact_shuffle);
this artifact documents that the local sf0.1 cost is not WORSE —
the lanes are sub-second here, so the expectation is flat-to-better,
with the real win only visible at fact-table scale.

Run: python3 tools/ab_grains.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_grains.json.
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
PASSES = int(os.environ.get("AB_PASSES", "8"))


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_grains", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions":
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    t = load_tables(spark, SF_DIR)
    orders, events = t["orders"], t["events"]
    _DEC = "decimal(18,2)"

    # ---- r15 forms, reconstructed (Expand + union-rescan) -------------------

    def cube_old():
        aggs = [F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").try_cast(_DEC)).cast("double")
                 .alias("total_spend")]
        keyed = (orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"],
             ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority").agg(*aggs))
        grand = orders.agg(*aggs).select(
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("string").alias("o_orderpriority"),
            "n_orders", "total_spend")
        return keyed.unionByName(grand)

    def rollup_old():
        aggs = [F.count("*").alias("n_orders"),
                F.sum(F.col("o_totalprice").try_cast(_DEC)).cast("double")
                .alias("total_price")]
        keyed = (orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"]],
            "o_orderstatus", "o_orderpriority")
            .agg(*aggs,
                 F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int")
                  .alias("g_priority")))
        grand = orders.agg(*aggs).select(
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("string").alias("o_orderpriority"),
            "n_orders", "total_price",
            F.lit(1).alias("g_status"), F.lit(1).alias("g_priority"))
        return keyed.unionByName(grand)

    def gs_old():
        events.createOrReplaceTempView("__ab_events_gs")
        return spark.sql("""
            SELECT date_format(ts, 'yyyy-MM-dd') AS d, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM __ab_events_gs
            GROUP BY GROUPING SETS (
                (date_format(ts, 'yyyy-MM-dd'), event_type),
                (date_format(ts, 'yyyy-MM-dd')), (event_type))
            UNION ALL
            SELECT CAST(NULL AS STRING), CAST(NULL AS STRING),
                   CAST(count(*) AS BIGINT), round(sum(value), 2)
            FROM __ab_events_gs
        """)

    pairs = {
        "orders_cube": (cube_old,
                        lambda: REGISTRY["orders_cube"].build(spark, SF_DIR)),
        "orders_rollup": (rollup_old,
                          lambda: REGISTRY["orders_rollup"]
                          .build(spark, SF_DIR)),
        "events_grouping_sets_time": (
            gs_old,
            lambda: REGISTRY["events_grouping_sets_time"]
            .build(spark, SF_DIR)),
    }

    results: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in pairs}
    for p in range(PASSES):
        for q, (old, new) in pairs.items():
            for form, build in (("old", old), ("new", new)):
                t0 = time.time()
                n = build().count()
                results[q][form].append(round(time.time() - t0, 3))
                assert n > 0, (q, form)
        print(f"pass {p + 1}/{PASSES} done", flush=True)

    summary = {}
    for q, r in results.items():
        mo, mn = statistics.median(r["old"]), statistics.median(r["new"])
        summary[q] = {"old_median": mo, "new_median": mn,
                      "ratio_new_over_old": round(mn / mo, 3)}
        print(f"{q}: old {mo:.3f}s new {mn:.3f}s "
              f"ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_grains.json").write_text(json.dumps(
        {"sf_dir": SF_DIR, "passes": PASSES, "raw": results,
         "summary": summary}, indent=1))
    print("wrote bench_ab_grains.json")


if __name__ == "__main__":
    main()
