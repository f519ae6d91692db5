#!/usr/bin/env python3
"""Interleaved A/B: linear window pipeline vs norm-branch shape for
sparse_cosine_pairs (r16 probe).

The linear form pays three gram-scale exchanges after the tf
aggregation: window(tok) for df, window(id) for the norm, then a
SECOND tok exchange for the posting-list groupBy. The branch form
drops the id-window and the second tok exchange: the posting groupBy
rides the df-window's tok partitioning directly (HashPartitioning(tok)
satisfies the groupBy's clustering), and norms become a separate
map-side-combined aggregate joined onto the AGGREGATED pair frame
(pair-count-sized, far below the raw posting stream). The norm branch
re-reads the df-window subtree; ReuseExchange dedupes the tf exchange.

gram-scale exchanges: linear 3 (tok window, id window, tok groupBy)
vs branch 1 (tok window) + |docs|-sized norm agg + pair-sized joins.

Equivalence asserted row-for-row before timing.
Run: python3 tools/ab_cosineshape.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_cosineshape.json.
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
    from pyspark.sql.window import Window

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.queries_analytics import _near_fixture
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_cosineshape", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    docs = _near_fixture(spark, SF_DIR)

    def old_form():
        sh = D.shingles(docs).withColumnRenamed("gram", "tok")
        return TX.sparse_cosine_pairs(docs, df_cutoff=20, min_sim=0.3,
                                      terms=sh)

    def new_form(df_cutoff=20, min_sim=0.3):
        sh = D.shingles(docs).withColumnRenamed("gram", "tok")
        term_rows = sh.select(F.col("doc_id").alias("id"), "tok")
        tf = term_rows.groupBy("id", "tok").agg(F.count("*").alias("tf"))
        n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
        dfw = Window.partitionBy("tok")
        postings = (tf.crossJoin(F.broadcast(n_docs))
                    .withColumn("df_t", F.count("*").over(dfw))
                    .filter(F.col("df_t") <= int(df_cutoff))
                    .withColumn("w", F.col("tf").cast("double")
                                * F.log(F.col("n_docs").cast("double")
                                        / F.col("df_t").cast("double"))))
        grouped = (postings.groupBy("tok")
                   .agg(F.collect_list(F.struct("id", "w")).alias("ps"))
                   .filter(F.size("ps") > 1))
        pairs = grouped.select(F.explode(F.expr(
            "flatten(transform(ps, x -> transform("
            "filter(ps, y -> x.id < y.id), "
            "y -> struct(x.id AS id_a, y.id AS id_b, "
            "x.w * y.w AS prod))))"
        )).alias("p")).select("p.id_a", "p.id_b", "p.prod")
        dots = pairs.groupBy("id_a", "id_b").agg(F.sum("prod").alias("dot"))
        norms = postings.groupBy("id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
        nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
        return (dots.join(na, "id_a").join(nb, "id_b")
                .select("id_a", "id_b",
                        F.round(F.try_divide(
                            F.col("dot"),
                            F.col("na") * F.col("nb")), 6).alias("cosine"))
                .filter(F.col("cosine") >= float(min_sim)))

    a, b = old_form(), new_form()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
        "forms differ!"

    raw = {"old": [], "new": []}
    for p in range(PASSES):
        side = "old" if p % 2 == 0 else "new"
        f = old_form if side == "old" else new_form
        t0 = time.perf_counter()
        f().count()
        raw[side].append(round(time.perf_counter() - t0, 3))

    mo, mn = statistics.median(raw["old"]), statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw,
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"sparse_cosine shape: old {mo:.3f}s new {mn:.3f}s "
          f"ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_cosineshape.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
