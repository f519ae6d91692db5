#!/usr/bin/env python3
"""Interleaved A/B: eager (collect+createDataFrame) vs lazy (expression)
referential_integrity in the validate_constraints lane (r17).

The eager form ran the child-scan left-join + aggregate as a blocking
driver job at BUILD time (guide §5: no collect() in query paths), then
the timed count() ran the six-check suite aggregate as a second job —
two sequential driver round-trips, and at scale the build-time job is
a full fact-table pass before the query even exists. The lazy form
expresses the single-row result over the aggregate, so one action
computes both union branches and the driver never blocks.

Side A monkeypatches validate.referential_integrity back to the eager
implementation; side B is the library. Row equality asserted (sorted
collect, both directions). Jobs per build+count recorded per side.

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_lazyri.py   Writes bench_ab_lazyri.json.
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
LANE = "validate_constraints"


def _eager_referential_integrity(child, child_col, parent, parent_col,
                                 at_least=1.0, require_rows=False):
    """The pre-r17 implementation, verbatim."""
    from pyspark.sql import functions as F

    parents = (parent.select(F.col(parent_col).alias(child_col))
               .distinct().withColumn("__hit", F.lit(1)))
    row = (child.select(child_col)
           .join(parents, child_col, "left")
           .agg(F.count(F.lit(1)).alias("__total"),
                F.count("__hit").alias("__matched"))
           .collect()[0])
    total, matched = row["__total"], row["__matched"]
    spark = child.sparkSession
    if total == 0:
        return spark.createDataFrame(
            [(f"ref_{child_col}", None, not require_rows)],
            "check STRING, metric DOUBLE, passed BOOLEAN",
        )
    frac = matched / total
    return spark.createDataFrame(
        [(f"ref_{child_col}", round(frac, 6), frac >= at_least)],
        "check STRING, metric DOUBLE, passed BOOLEAN",
    )


def main() -> None:
    from cql_replicator_spark.analytics import validate as V
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_lazyri", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    sc = spark.sparkContext

    lazy_ri = V.referential_integrity

    def set_side(side: str) -> None:
        V.referential_integrity = (
            _eager_referential_integrity if side == "eager" else lazy_ri)

    set_side("eager")
    a = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    set_side("lazy")
    b = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    assert a == b, f"lazy RI changed the rows!\n{a}\n{b}"

    raw = {"eager": [], "lazy": []}
    jobs = {}

    def run(side):
        set_side(side)
        sc.setJobGroup(f"ab_lazyri_{side}", side)
        ids0 = set(sc.statusTracker().getJobIdsForGroup(
            f"ab_lazyri_{side}") or [])
        t0 = time.perf_counter()
        REGISTRY[LANE].build(spark, SF_DIR).count()
        dt = round(time.perf_counter() - t0, 3)
        ids1 = set(sc.statusTracker().getJobIdsForGroup(
            f"ab_lazyri_{side}") or [])
        jobs[side] = len(ids1 - ids0)
        sc.setJobGroup("", "")
        return dt

    run("eager")
    run("lazy")
    for p in range(PASSES):
        order = ("eager", "lazy") if p % 2 == 0 else ("lazy", "eager")
        for side in order:
            raw[side].append(run(side))
    set_side("lazy")

    me = statistics.median(raw["eager"])
    ml = statistics.median(raw["lazy"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "lane": LANE, "raw": raw,
           "jobs_per_run": jobs,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "medians": {"eager": round(me, 3), "lazy": round(ml, 3),
                       "ratio_lazy_over_eager": round(ml / me, 3)}}
    print(f"{LANE}: eager {me:.3f}s lazy {ml:.3f}s ratio {ml / me:.3f} "
          f"jobs {jobs}")
    (ROOT / "bench_ab_lazyri.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
