#!/usr/bin/env python3
"""Interleaved A/B: Column-op vs F.expr-string construction of the
SimHash signature aggregates (r17 session 2, guide §5 driver overhead).

The old simhash_signatures built bits x (shiftright/and/mul/sub/sum/
alias) Column chains plus a bits-term when/otherwise recombine —
~200 driver py4j round-trips per call, measured ~1.0 s of pure
query-BUILD time. The new form builds each aggregate and the
recombine as one F.expr string (identical expression semantics).
Runtime plan and results unchanged — this targets the driver's
fixed per-query cost, same class as the r16/r17 single-Literal work.

Lanes: dedup_simhash_pairs, dedup_simhash. Row equality asserted.
Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_simhashexpr.py  Writes bench_ab_simhashexpr.json.
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
LANES = ["dedup_simhash_pairs", "dedup_simhash"]


def _old_simhash_signatures(df, id_col="doc_id", text_col="text", bits=32):
    """The pre-r17 implementation, verbatim."""
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics.dedup import md5h32, normalized

    hashed = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(
            F.split(normalized(text_col), " "))).alias("tok"),
    ).select(F.col(id_col), md5h32(F.col("tok")).alias("h"))
    sums = hashed.groupBy(id_col).agg(*[
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        .alias(f"s{i}")
        for i in range(bits)
    ])
    zero = F.lit(0).cast("long")
    simhash = zero
    for i in range(bits):
        simhash = simhash + F.when(
            F.col(f"s{i}") > 0, F.lit(1 << i).cast("long")).otherwise(zero)
    return sums.select(F.col(id_col), simhash.alias("simhash"))


def main() -> None:
    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_simhashexpr", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    new_sigs = D.simhash_signatures

    def set_side(side: str) -> None:
        D.simhash_signatures = (
            _old_simhash_signatures if side == "old" else new_sigs)

    for lane in LANES:
        set_side("old")
        a = sorted(map(tuple, REGISTRY[lane].build(spark, SF_DIR).collect()))
        set_side("new")
        b = sorted(map(tuple, REGISTRY[lane].build(spark, SF_DIR).collect()))
        assert a == b, f"expr-string simhash changed the rows in {lane}!"

    out = {"passes": PASSES, "sf_dir": SF_DIR,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "lanes": {}}
    for lane in LANES:
        raw = {"old": [], "new": []}

        def run(side):
            set_side(side)
            t0 = time.perf_counter()
            REGISTRY[lane].build(spark, SF_DIR).count()
            return round(time.perf_counter() - t0, 3)

        run("old")
        run("new")
        for p in range(PASSES):
            order = ("old", "new") if p % 2 == 0 else ("new", "old")
            for side in order:
                raw[side].append(run(side))
        mo = statistics.median(raw["old"])
        mn = statistics.median(raw["new"])
        out["lanes"][lane] = {
            "raw": raw,
            "medians": {"old": round(mo, 3), "new": round(mn, 3),
                        "ratio_new_over_old": round(mn / mo, 3)}}
        print(f"{lane}: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f}")
    set_side("new")
    (ROOT / "bench_ab_simhashexpr.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
