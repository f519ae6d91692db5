#!/usr/bin/env python3
"""Interleaved A/B: candidate-doc semi-filter on the exact-Jaccard side
of dedup_minhash_accuracy (r17, guide §3.2 / VERDICT #7).

The audit's exact stage consumed the FULL corpus gram stream three
times (sizes, side a, side b) even though only docs appearing in a
candidate pair are reachable in the result. The r17 change broadcast
semi-joins the distinct pair ids below the shingling, dropping
non-candidate docs before split/explode/aggregate/shuffle. Side A
monkeypatches the old (unfiltered) function body; both sides share
the same memoized signature/pair frames, so the A/B isolates the
exact stage. Row equality asserted.

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_minhashsemi.py  Writes bench_ab_minhashsemi.json.
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
LANE = "dedup_minhash_accuracy"


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics.dedup import (
        lsh_candidate_pairs, minhash_signatures, shingles,
    )
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_minhashsemi", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    new_fn = D.minhash_accuracy_pairs

    def old_fn(df, id_col="doc_id", text_col="text", n=3, num_hashes=16,
               bands=4, max_bucket_size=None, signatures=None, pairs=None,
               shingle_frame=None):
        sigs = (signatures if signatures is not None
                else minhash_signatures(df, id_col, text_col, n, num_hashes))
        if pairs is None:
            pairs = lsh_candidate_pairs(sigs, id_col, bands,
                                        num_hashes // bands,
                                        max_bucket_size=max_bucket_size)
        sa = sigs.select(F.col(id_col).alias("id_a"),
                         *[F.col(f"mh{j}").alias(f"a{j}")
                           for j in range(num_hashes)])
        sb = sigs.select(F.col(id_col).alias("id_b"),
                         *[F.col(f"mh{j}").alias(f"b{j}")
                           for j in range(num_hashes)])
        agree = sum(F.when(F.col(f"a{j}") == F.col(f"b{j}"), 1).otherwise(0)
                    for j in range(num_hashes))
        est = (pairs.join(sa, "id_a").join(sb, "id_b")
               .select("id_a", "id_b",
                       F.round(agree / F.lit(float(num_hashes)), 6)
                        .alias("est_jaccard")))
        sh = (shingle_frame if shingle_frame is not None
              else shingles(df, id_col, text_col, n))
        sizes = sh.groupBy(id_col).agg(F.count("*").alias("nsz"))
        xa = sh.select(F.col(id_col).alias("id_a"), "gram")
        xb = sh.select(F.col(id_col).alias("id_b"), "gram")
        inter = (pairs.join(xa, "id_a").join(xb, ["id_b", "gram"])
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("i")))
        na = sizes.select(F.col(id_col).alias("id_a"),
                          F.col("nsz").alias("na"))
        nb = sizes.select(F.col(id_col).alias("id_b"),
                          F.col("nsz").alias("nb"))
        exact = (inter.join(na, "id_a").join(nb, "id_b")
                 .select("id_a", "id_b",
                         F.round(F.col("i").cast("double")
                                 / (F.col("na") + F.col("nb") - F.col("i")),
                                 6).alias("exact_jaccard")))
        return (est.join(exact, ["id_a", "id_b"])
                .select("id_a", "id_b", "est_jaccard", "exact_jaccard",
                        F.round(F.abs(F.col("est_jaccard")
                                      - F.col("exact_jaccard")), 6)
                         .alias("abs_err")))

    def set_side(side: str) -> None:
        D.minhash_accuracy_pairs = old_fn if side == "full" else new_fn

    set_side("full")
    a = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    set_side("semi")
    b = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    assert a == b, "semi-filter changed the rows!"

    raw = {"full": [], "semi": []}

    def run(side):
        set_side(side)
        t0 = time.perf_counter()
        REGISTRY[LANE].build(spark, SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    run("full")
    run("semi")
    for p in range(PASSES):
        order = ("full", "semi") if p % 2 == 0 else ("semi", "full")
        for side in order:
            raw[side].append(run(side))
    set_side("semi")

    mf, ms = statistics.median(raw["full"]), statistics.median(raw["semi"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "lane": LANE, "raw": raw,
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "medians": {"full": round(mf, 3), "semi": round(ms, 3),
                       "ratio_semi_over_full": round(ms / mf, 3)}}
    print(f"{LANE}: full {mf:.3f}s semi {ms:.3f}s ratio {ms / mf:.3f}")
    (ROOT / "bench_ab_minhashsemi.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
