#!/usr/bin/env python3
"""Interleaved A/B of old-vs-new operator FORMS inside one session.

Round-5 rewrote four hot operators (sparse cosine, winnowing pairs,
minhash accuracy, bigram LM) to scan-once shapes. Separate-session
timings disagreed with the full-bench run (which carries ±15-25%
per-query jitter and warm-up skew), so — per the round-4 lesson — the
keep/revert decision comes from alternating both forms in ONE session:
N passes, each pass runs every (query, form) pair, medians per form.

Run: python3 tools/ab_forms.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_forms.json.
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
    from cql_replicator_spark.queries_analytics import _near_fixture
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_forms", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    t = load_tables(spark, SF_DIR)
    docs = t["documents"]
    near = _near_fixture(spark, SF_DIR)

    # ---- old forms, reconstructed ------------------------------------------

    def cosine_old():
        sh = D.shingles(near).withColumnRenamed("gram", "tok")
        tf = sh.groupBy(F.col("doc_id").alias("id"), "tok") \
               .agg(F.count("*").alias("tf"))
        dfreq = tf.groupBy("tok").agg(F.count("*").alias("df_t"))
        n_docs = near.select(F.countDistinct("doc_id").alias("n_docs"))
        postings = (tf.join(dfreq.filter(F.col("df_t") <= 20), "tok")
                    .crossJoin(F.broadcast(n_docs))
                    .select("id", "tok",
                            (F.col("tf").cast("double")
                             * F.log(F.col("n_docs").cast("double")
                                     / F.col("df_t").cast("double"))).alias("w")))
        norms = postings.groupBy("id").agg(
            F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
        a = postings.select(F.col("id").alias("id_a"), "tok",
                            F.col("w").alias("wa"))
        b = postings.select(F.col("id").alias("id_b"), "tok",
                            F.col("w").alias("wb"))
        dots = (a.join(b, "tok").filter(F.col("id_a") < F.col("id_b"))
                .groupBy("id_a", "id_b")
                .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
        na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("na"))
        nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("nb"))
        return (dots.join(na, "id_a").join(nb, "id_b")
                .select("id_a", "id_b",
                        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                         .alias("cosine"))
                .filter(F.col("cosine") >= 0.3))

    def cosine_new():
        sh = D.shingles(near).withColumnRenamed("gram", "tok")
        return TX.sparse_cosine_pairs(near, df_cutoff=20, min_sim=0.3, terms=sh)

    def winnow_old():
        fps = TX.winnowing_fingerprints(near, k=3, w=4)
        dfreq = fps.groupBy("fp").agg(F.count("*").alias("df_t"))
        pruned = fps.join(dfreq.filter(F.col("df_t") <= 20), "fp")
        a = pruned.select(F.col("doc_id").alias("id_a"), "fp")
        b = pruned.select(F.col("doc_id").alias("id_b"), "fp")
        return (a.join(b, "fp").filter(F.col("id_a") < F.col("id_b"))
                .groupBy("id_a", "id_b")
                .agg(F.count("*").cast("long").alias("n_shared"))
                .filter(F.col("n_shared") >= 5))

    def winnow_new():
        return TX.winnowing_pairs(near, k=3, w=4, min_shared=5, max_df=20)

    def mh_acc_old():
        sigs = D.minhash_signatures(near, "doc_id", "text", 3, 16)
        pairs = D.lsh_candidate_pairs(sigs, "doc_id", 4, 4)
        sa = sigs.select(F.col("doc_id").alias("id_a"),
                         *[F.col(f"mh{j}").alias(f"a{j}") for j in range(16)])
        sb = sigs.select(F.col("doc_id").alias("id_b"),
                         *[F.col(f"mh{j}").alias(f"b{j}") for j in range(16)])
        agree = sum(F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
                    for j in range(16))
        est = (pairs.join(sa, "id_a").join(sb, "id_b")
               .select("id_a", "id_b",
                       F.round(agree / F.lit(16.0), 6).alias("est_jaccard")))
        sh = D.shingles(near, "doc_id", "text", 3)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsz"))
        xa = sh.select(F.col("doc_id").alias("id_a"), "gram")
        xb = sh.select(F.col("doc_id").alias("id_b"), "gram")
        inter = (pairs.join(xa, "id_a").join(xb, ["id_b", "gram"])
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("i")))
        na = sizes.select(F.col("doc_id").alias("id_a"), F.col("nsz").alias("na"))
        nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("nsz").alias("nb"))
        exact = (inter.join(na, "id_a").join(nb, "id_b")
                 .select("id_a", "id_b",
                         F.round(F.col("i").cast("double")
                                 / (F.col("na") + F.col("nb") - F.col("i")), 6)
                          .alias("exact_jaccard")))
        return (est.join(exact, ["id_a", "id_b"])
                .select("id_a", "id_b", "est_jaccard", "exact_jaccard",
                        F.round(F.abs(F.col("est_jaccard")
                                      - F.col("exact_jaccard")), 6)
                         .alias("abs_err")))

    def mh_acc_new():
        return D.minhash_accuracy_pairs(near, n=3, num_hashes=16, bands=4)

    def bigram_old():
        w = F.split(F.col("text"), " ")
        pairs = F.transform(F.sequence(F.lit(1), F.size(w) - 1),
                            lambda i: F.concat_ws(" ", F.element_at(w, i),
                                                  F.element_at(w, i + 1)))
        bg = (docs.filter(F.size(w) >= 2)
              .select(F.col("doc_id"), F.explode(pairs).alias("big")))
        counts = (bg.groupBy(F.substring_index("big", " ", 1).alias("w1"), "big")
                  .agg(F.count("*").alias("c2"))
                  .withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
                  .select("big", "c2", "c1"))
        scored = (bg.join(counts, "big")
                  .select(F.col("doc_id"),
                          (F.log(F.col("c2").cast("double"))
                           - F.log(F.col("c1").cast("double"))).alias("lp")))
        return (scored.groupBy("doc_id")
                .agg(F.count("*").cast("long").alias("n_bigrams"),
                     F.round(-F.avg("lp"), 6).alias("avg_neg_logprob")))

    def bigram_new():
        return TX.bigram_logprob(docs)

    forms = {
        "cosine": {"old": cosine_old, "new": cosine_new},
        "winnow": {"old": winnow_old, "new": winnow_new},
        "mh_acc": {"old": mh_acc_old, "new": mh_acc_new},
        "bigram": {"old": bigram_old, "new": bigram_new},
    }

    # warm-up
    docs.select("doc_id").limit(100).count()
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
    (ROOT / "bench_ab_forms.json").write_text(json.dumps(out, indent=1))
    for q, m in meds.items():
        ratio = m["new"] / m["old"] if m["old"] else float("nan")
        print(f"{q:8s} old={m['old']:6.2f}s new={m['new']:6.2f}s "
              f"new/old={ratio:5.2f}")


if __name__ == "__main__":
    main()
