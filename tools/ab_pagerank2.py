#!/usr/bin/env python3
"""Interleaved A/B (v2 protocol): r16 pagerank loop vs r17 fused loop.

Old per-hop shape: edge stream through TWO joins (rank onto src, deg
onto src), groupBy(dst), then a THIRD join (nodes left-join summed)
to zero-fill no-in-edge nodes. New shape (graph.py r17): the two
node-sized frames join each other first (rank⋈deg), the edge stream
passes through ONE join, and the zero-fill rides the groupBy as a
|nodes|-sized union of zero rows. Integer PageRank is bit-exact, so
the two forms must agree row-for-row (asserted).

Protocol: 1 discarded warm-up pass per side, per-pass order flip
(the v1 ab_pagerank.py alternated sides with no warm-up — the r16
methodology note explains why that confounds with host warm-up).

Run: python3 tools/ab_pagerank2.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_pagerank2.json.
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


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics.graph import pagerank_scaled
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_pagerank2", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    li = spark.table("lineitem")
    fwd = li.select(F.col("l_suppkey").cast("long").alias("src"),
                    (F.col("l_partkey") + 1000000).cast("long").alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

    def old_pagerank(edges, iterations=3, scale=10**12,
                     damping_num=85, damping_den=100):
        e = edges.select(F.col("src").cast("long").alias("src"),
                         F.col("dst").cast("long").alias("dst")).persist()
        nodes = (e.select(F.col("src").alias("node"))
                 .unionByName(e.select(F.col("dst").alias("node")))
                 .distinct().persist())
        deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
        n = nodes.count()
        base = ((damping_den - damping_num) * scale // damping_den) // n
        init = scale // n
        rank = nodes.select("node", F.lit(init).cast("long").alias("r"))
        for _i in range(iterations):
            contrib = (
                e.join(rank, e.src == rank.node)
                .join(deg, "src")
                .select(F.col("dst").alias("node"),
                        F.expr("r div deg").alias("c"))
            )
            summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
            rank = (
                nodes.join(summed, "node", "left")
                .select(
                    "node",
                    (F.lit(base)
                     + F.expr(f"({damping_num} * coalesce(s, 0L)) "
                              f"div {damping_den}")).cast("long").alias("r"))
            )
        out = rank.select("node", F.col("r").alias("rank_scaled")) \
                  .localCheckpoint(eager=True)
        e.unpersist()
        nodes.unpersist()
        deg.unpersist()
        return out

    a = old_pagerank(edges)
    b = pagerank_scaled(edges)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
        "forms differ!"

    raw = {"old": [], "new": []}

    def run(side):
        fn = old_pagerank if side == "old" else pagerank_scaled
        t0 = time.perf_counter()
        fn(edges).count()
        return round(time.perf_counter() - t0, 3)

    run("old")  # discarded warm-up, both sides
    run("new")
    for p in range(PASSES):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for side in order:
            raw[side].append(run(side))

    mo, mn = statistics.median(raw["old"]), statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw,
           "protocol": "v2: equality asserted, 1 discarded warmup pass "
                       "per side, per-pass order flip",
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"pagerank: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_pagerank2.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
