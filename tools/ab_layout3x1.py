#!/usr/bin/env python3
"""Interleaved A/B: 3 distrank passes vs 1 stacked pass (r16).

layout_pruning_stats ran global_rank_cumsum once per layout branch —
three range exchanges, three localCheckpoints, three offset collects,
three broadcast joins. The fused form stacks the branches with a
layout index and ranks the union once over the total order
(_layout, key, o_orderkey); per-branch rank = _r - _layout*n. Old
form inline (pre-r16), new form = the registered lane. Identical
output asserted.

Run: python3 tools/ab_layout3x1.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_layout3x1.json.
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

    from cql_replicator_spark.distrank import global_rank_cumsum
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables
    from cql_replicator_spark.tiling import hilbert_2d, zvalue_2d

    queries()
    spark = get_spark("ab_layout3x1", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    def old_layout():
        orders = spark.table("orders")
        base = orders.select(
            "o_orderkey",
            (F.col("o_custkey") % 256).alias("x"),
            (F.col("o_orderkey") % 256).alias("y"))
        keyed = (hilbert_2d(base, "x", "y", bits=8)
                 .withColumn("zval", zvalue_2d("x", "y", bits=8))
                 .localCheckpoint())
        n = keyed.count()
        q, rem = divmod(n, 64)
        branches = []
        for label, key in (("natural", "o_orderkey"), ("zorder", "zval"),
                           ("hilbert", "hval")):
            ranked = global_rank_cumsum(
                keyed.select("x", "y", key, *(
                    [] if key == "o_orderkey" else ["o_orderkey"])),
                order=[(key, False), ("o_orderkey", False)], rank_col="_r")
            head = rem * (q + 1)
            if q == 0:
                tile = F.expr("CAST(_r AS INT)")
            else:
                tile = F.expr(
                    f"CAST(CASE WHEN _r <= {head} THEN "
                    f"(_r - 1) DIV {q + 1} + 1 "
                    f"ELSE {rem} + (_r - {head} - 1) DIV {q} + 1 END AS INT)")
            tiled = ranked.select("x", "y", tile.alias("tile"))
            branches.append(
                tiled.groupBy("tile")
                .agg((F.max("x") - F.min("x")).alias("x_span"),
                     (F.max("y") - F.min("y")).alias("y_span"))
                .select(F.lit(label).alias("layout"), "x_span", "y_span"))
        spans = branches[0].unionByName(branches[1]).unionByName(branches[2])
        return (spans.groupBy("layout")
                .agg(F.round(F.avg("x_span"), 2).alias("avg_x_span"),
                     F.round(F.avg("y_span"), 2).alias("avg_y_span")))

    def new_layout():
        return REGISTRY["layout_pruning_stats"].build(spark, SF_DIR)

    # equivalence pin
    a, b = old_layout(), new_layout()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
        "forms differ!"

    raw = {"old": [], "new": []}
    for p in range(PASSES):
        side = "old" if p % 2 == 0 else "new"
        fn = old_layout if side == "old" else new_layout
        t0 = time.perf_counter()
        fn().count()
        raw[side].append(round(time.perf_counter() - t0, 3))

    mo, mn = statistics.median(raw["old"]), statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw,
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"layout_pruning_stats: old {mo:.3f}s new {mn:.3f}s "
          f"ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_layout3x1.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
