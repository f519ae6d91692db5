#!/usr/bin/env python3
"""Interleaved A/B: eager (distinct+count at build time) vs lazy
(broadcast single-row frame) corpus size in text.tf_idf (r17).

The eager form ran a full distinct+count job over the corpus at query-
build time and folded n_docs in as a literal (guide §5: no driver work
in query paths). The lazy form rides a broadcast one-row aggregate —
one plan, one action. Row equality asserted (the double math is
identical: count cast to double vs lit(float(count))).

Lanes: text_tfidf, text_keywords_topk (both call tf_idf).

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_lazytfidf.py   Writes bench_ab_lazytfidf.json.
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
LANES = ["text_tfidf", "text_keywords_topk"]


def _eager_tf_idf(df, id_col="doc_id", text_col="text", min_doc_freq=2):
    """The pre-r17 implementation, verbatim."""
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = (toks.groupBy("token")
             .agg(F.countDistinct(id_col).alias("doc_freq"))
             .filter(F.col("doc_freq") >= min_doc_freq))
    n_docs = df.select(id_col).distinct().count()
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select(
            F.col(id_col), "token", "tf", "doc_freq",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6)
            .alias("tfidf"))
    )


def main() -> None:
    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_lazytfidf", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    sc = spark.sparkContext

    lazy_tfidf = TX.tf_idf

    def set_side(side: str) -> None:
        TX.tf_idf = _eager_tf_idf if side == "eager" else lazy_tfidf

    for lane in LANES:
        set_side("eager")
        a = sorted(map(tuple, REGISTRY[lane].build(spark, SF_DIR).collect()))
        set_side("lazy")
        b = sorted(map(tuple, REGISTRY[lane].build(spark, SF_DIR).collect()))
        assert a == b, f"lazy tf_idf changed the rows in {lane}!"

    out = {"passes": PASSES, "sf_dir": SF_DIR,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "lanes": {}}
    for lane in LANES:
        raw = {"eager": [], "lazy": []}
        jobs = {}

        def run(side):
            set_side(side)
            sc.setJobGroup(f"ab_{lane}_{side}", side)
            ids0 = set(sc.statusTracker().getJobIdsForGroup(
                f"ab_{lane}_{side}") or [])
            t0 = time.perf_counter()
            REGISTRY[lane].build(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            ids1 = set(sc.statusTracker().getJobIdsForGroup(
                f"ab_{lane}_{side}") or [])
            jobs[side] = len(ids1 - ids0)
            sc.setJobGroup("", "")
            return dt

        run("eager")
        run("lazy")
        for p in range(PASSES):
            order = ("eager", "lazy") if p % 2 == 0 else ("lazy", "eager")
            for side in order:
                raw[side].append(run(side))
        me = statistics.median(raw["eager"])
        ml = statistics.median(raw["lazy"])
        out["lanes"][lane] = {
            "raw": raw, "jobs_per_run": jobs,
            "medians": {"eager": round(me, 3), "lazy": round(ml, 3),
                        "ratio_lazy_over_eager": round(ml / me, 3)}}
        print(f"{lane}: eager {me:.3f}s lazy {ml:.3f}s "
              f"ratio {ml / me:.3f} jobs {jobs}")
    set_side("lazy")
    (ROOT / "bench_ab_lazytfidf.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
