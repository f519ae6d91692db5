#!/usr/bin/env python3
"""Interleaved A/B: level-by-level merkle_tree (eager leaf checkpoint +
per-level union) vs the single-aggregation tree (r17 session 2).

The old shape built each tree level as its own groupBy over the level
below and unioned them, which required an EAGER localCheckpoint of the
leaf frame (else the table scan re-ran per level) — a blocking
scan+shuffle job at query-BUILD time per side (guide §5). bit_xor/sum
are associative, so the new shape explodes each leaf into its ancestor
id at every level and folds the whole tree with ONE groupBy — fully
lazy, one tiny shuffle instead of a per-level Exchange chain.

Lane: reconcile_merkle_ranges. Row equality asserted (sorted collect,
both directions). Protocol: v2 (1 discarded warm-up per side, per-pass
order flip). Run: python3 tools/ab_merkle.py
Writes bench_ab_merkle.json.
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
LANE = "reconcile_merkle_ranges"


def _old_merkle_tree(df, pk_col, content_cols, n_leaves=16, fanout=4):
    """The pre-r17 implementation, verbatim."""
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics.dedup import md5h32

    k = n_leaves
    depth = 0
    while k > 1:
        if k % fanout:
            raise ValueError(
                f"n_leaves={n_leaves} must be a power of fanout={fanout}")
        k //= fanout
        depth += 1
    spark = df.sparkSession

    def _piece(c):
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.length(s).cast("string"), F.lit(":"), s))

    row_digest = md5h32(
        F.concat(*[_piece(c) for c in [pk_col, *content_cols]]))
    tile = md5h32(F.col(pk_col).cast("string")) % n_leaves
    sparse = (df.select(tile.alias("node_id"), row_digest.alias("digest"))
              .groupBy("node_id")
              .agg(F.expr("bit_xor(digest)").alias("digest"),
                   F.count("*").alias("n_rows")))
    leaves = (
        spark.range(n_leaves).select(
            F.col("id").cast("long").alias("node_id"))
        .join(sparse, "node_id", "left")
        .select(F.lit(0).alias("level"), "node_id",
                F.coalesce("digest", F.lit(0).cast("long")).alias("digest"),
                F.coalesce("n_rows", F.lit(0).cast("long")).alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    levels = [leaves]
    cur = leaves
    for lvl in range(1, depth + 1):
        cur = (cur.groupBy(F.expr(f"node_id div {fanout}").alias("node_id"))
               .agg(F.expr("bit_xor(digest)").alias("digest"),
                    F.sum("n_rows").cast("long").alias("n_rows"))
               .select(F.lit(lvl).alias("level"), "node_id", "digest",
                       "n_rows"))
        levels.append(cur)
    out = levels[0]
    for frame in levels[1:]:
        out = out.unionByName(frame)
    return out


def main() -> None:
    from cql_replicator_spark import reconcile
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_merkle", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    sc = spark.sparkContext

    new_tree = reconcile.merkle_tree

    def set_side(side: str) -> None:
        reconcile.merkle_tree = (
            _old_merkle_tree if side == "old" else new_tree)

    set_side("old")
    a = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    set_side("new")
    b = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    assert a == b, "single-aggregation merkle tree changed the rows!"

    raw = {"old": [], "new": []}
    jobs = {}

    def run(side):
        set_side(side)
        sc.setJobGroup(f"ab_merkle_{side}", side)
        ids0 = set(sc.statusTracker().getJobIdsForGroup(
            f"ab_merkle_{side}") or [])
        t0 = time.perf_counter()
        REGISTRY[LANE].build(spark, SF_DIR).count()
        dt = round(time.perf_counter() - t0, 3)
        ids1 = set(sc.statusTracker().getJobIdsForGroup(
            f"ab_merkle_{side}") or [])
        jobs[side] = len(ids1 - ids0)
        sc.setJobGroup("", "")
        return dt

    run("old")
    run("new")
    for p in range(PASSES):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for side in order:
            raw[side].append(run(side))
    set_side("new")

    mo = statistics.median(raw["old"])
    mn = statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "lane": LANE, "raw": raw,
           "jobs_per_run": jobs,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"{LANE}: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f} "
          f"jobs {jobs}")
    (ROOT / "bench_ab_merkle.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
