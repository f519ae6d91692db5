#!/usr/bin/env python3
"""Interleaved A/B: partition-less global windows vs the r13
distributed formulations (distrank / TakeOrdered / broadcast-rank).

The r12 verdict banned the single-partition Window.orderBy() plan
shape in 7 registered lanes. The replacement formulations carry fixed
overhead at sf0.1 (a range exchange, an offsets collect, a
localCheckpoint) that the tiny frames cannot amortize, so the keep
decision needs the honest number: per the round-4 house rule, both
forms alternate in ONE session (N passes, medians per form). The keep
argument is NOT this sf0.1 ratio — it is the scale shape
(scale_smoke.json's pq_adc_rank leg shows the window form's penalty
growing with the corpus while TakeOrdered stays flat); this artifact
just records what the fix costs today.

Run: python3 tools/ab_distrank.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_distrank.json.
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
    from pyspark.sql.window import Window

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.queries import REGISTRY, _ensure_all_registered
    from cql_replicator_spark.session import get_spark, load_tables
    from cql_replicator_spark.tiling import hilbert_2d, zvalue_2d

    _ensure_all_registered()
    spark = get_spark("ab_distrank", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS",
                                                       "32"),
    })
    t = load_tables(spark, SF_DIR, ["orders", "events", "documents"])
    orders, events, docs = t["orders"], t["events"], t["documents"]

    # ---- old forms: the pre-r13 partition-less windows, verbatim ----------

    def spend_rank_old():
        spend = (orders.groupBy("o_custkey")
                 .agg(F.sum(F.col("o_totalprice").try_cast("decimal(18,2)"))
                      .cast("double").alias("total_spend")))
        w = Window.orderBy(F.desc("total_spend"))
        return (spend.withColumn("spend_rank", F.dense_rank().over(w))
                .filter(F.col("spend_rank") <= 50))

    def pareto_old():
        spend = (orders.groupBy("o_custkey")
                 .agg(F.sum("o_totalprice").alias("s")))
        w = Window.orderBy(F.desc("s"), F.asc("o_custkey"))
        ranked = (spend
                  .withColumn("r", F.row_number().over(w))
                  .withColumn("cum", F.sum("s").over(
                      w.rowsBetween(Window.unboundedPreceding, 0)))
                  .withColumn("n", F.count("*").over(Window.partitionBy()))
                  .withColumn("tot", F.sum("s").over(Window.partitionBy())))
        return (ranked.filter(F.col("cum") >= 0.8 * F.col("tot"))
                .agg(F.min("r").cast("long").alias("customers_for_80pct"),
                     F.max("n").cast("long").alias("n_customers"),
                     F.round(F.min("r").cast("double") / F.max("n"), 6)
                      .alias("pareto_fraction")))

    def gini_old():
        c = (events.groupBy("user_id")
             .agg(F.count("*").cast("double").alias("x")))
        r = c.withColumn("i", F.row_number().over(
            Window.orderBy(F.asc("x"), F.asc("user_id"))))
        return r.agg(
            F.count("*").cast("long").alias("n_users"),
            F.round((2.0 * F.sum(F.col("i") * F.col("x")))
                    / (F.count("*") * F.sum("x"))
                    - (F.count("*") + 1.0) / F.count("*"), 6).alias("gini"))

    def zipf_old():
        freq = (docs.select(F.explode(F.split(F.col("text"), " "))
                            .alias("tok"))
                .groupBy("tok").agg(F.count("*").cast("double").alias("f")))
        ranked = freq.withColumn(
            "r", F.row_number().over(
                Window.orderBy(F.desc("f"), F.asc("tok"))))
        lr, lf = F.log(F.col("r").cast("double")), F.log("f")
        return ranked.agg(
            F.count("*").cast("long").alias("vocab_size"),
            F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
            F.round(F.regr_r2(lf, lr), 6).alias("r2"))

    def budget_old():
        counted = (TX.unigram_logprob(docs)
                   .select("doc_id", F.col("avg_neg_logprob").alias("s"),
                           "n_tokens"))
        w = Window.orderBy("s", "doc_id") \
                  .rowsBetween(Window.unboundedPreceding, 0)
        return (counted
                .withColumn("cum_tokens", F.sum("n_tokens").over(w))
                .filter(F.col("cum_tokens") <= 10000)
                .select("doc_id",
                        F.col("n_tokens").cast("long").alias("n_tokens"),
                        F.col("cum_tokens").cast("long").alias("cum_tokens")))

    def heaps_old():
        first_seen = (D.shingles(docs)
                      .groupBy("gram").agg(F.min("doc_id").alias("fs")))
        cohorts = (first_seen
                   .groupBy((F.col("fs") / 50).cast("long").alias("cohort"))
                   .agg(F.count("*").cast("long").alias("new_terms")))
        w = Window.orderBy("cohort").rowsBetween(
            Window.unboundedPreceding, 0)
        return cohorts.select(
            "cohort", "new_terms",
            F.sum("new_terms").over(w).cast("long").alias("vocab_size"))

    def layout_old():
        base = orders.select(
            "o_orderkey",
            (F.col("o_custkey") % 256).alias("x"),
            (F.col("o_orderkey") % 256).alias("y"))
        keyed = hilbert_2d(base, "x", "y", bits=8) \
            .withColumn("zval", zvalue_2d("x", "y", bits=8))
        branches = []
        for label, key in (("natural", "o_orderkey"), ("zorder", "zval"),
                           ("hilbert", "hval")):
            tiled = keyed.select(
                "x", "y",
                F.ntile(64).over(Window.orderBy(key, "o_orderkey"))
                 .alias("tile"))
            branches.append(
                tiled.groupBy("tile")
                .agg((F.max("x") - F.min("x")).alias("x_span"),
                     (F.max("y") - F.min("y")).alias("y_span"))
                .select(F.lit(label).alias("layout"), "x_span", "y_span"))
        spans = branches[0].unionByName(branches[1]).unionByName(branches[2])
        return (spans.groupBy("layout")
                .agg(F.round(F.avg("x_span"), 2).alias("avg_x_span"),
                     F.round(F.avg("y_span"), 2).alias("avg_y_span")))

    # ---- new forms: the registered r13 builders ----------------------------

    def registered(name):
        return lambda: REGISTRY[name].build(spark, SF_DIR)

    forms = {
        "customer_spend_rank": {"old": spend_rank_old,
                                "new": registered("customer_spend_rank")},
        "orders_pareto_8020": {"old": pareto_old,
                               "new": registered("orders_pareto_8020")},
        "events_power_users_gini": {
            "old": gini_old, "new": registered("events_power_users_gini")},
        "text_zipf_fit": {"old": zipf_old,
                          "new": registered("text_zipf_fit")},
        "token_budget_selection": {
            "old": budget_old, "new": registered("token_budget_selection")},
        "documents_vocab_growth_heaps": {
            "old": heaps_old,
            "new": registered("documents_vocab_growth_heaps")},
        "layout_pruning_stats": {
            "old": layout_old, "new": registered("layout_pruning_stats")},
    }

    docs.select("doc_id").limit(100).count()  # warm-up
    raw: dict[str, dict[str, list[float]]] = {
        q: {"old": [], "new": []} for q in forms}
    for p in range(PASSES):
        order = ["old", "new"] if p % 2 == 0 else ["new", "old"]
        for q, fs in forms.items():
            for form in order:
                t0 = time.perf_counter()
                fs[form]().count()
                raw[q][form].append(round(time.perf_counter() - t0, 3))
    meds = {q: {f: statistics.median(v) for f, v in d.items()}
            for q, d in raw.items()}
    out = {"sf": SF_DIR, "passes": PASSES, "raw": raw, "medians": meds}
    (ROOT / "bench_ab_distrank.json").write_text(json.dumps(out, indent=1))
    for q, m in meds.items():
        ratio = m["new"] / m["old"] if m["old"] else float("nan")
        print(f"{q:28s} old={m['old']:6.2f}s new={m['new']:6.2f}s "
              f"new/old={ratio:5.2f}")


if __name__ == "__main__":
    main()
