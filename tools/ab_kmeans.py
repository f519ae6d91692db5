#!/usr/bin/env python3
"""Interleaved A/B of the k-means centroid-update form (round 6).

Round-6 replaced the per-round centroid collect of one row per
(cluster, dimension) with a distributed pivot to one array row per
cluster (similarity.py kmeans_quantized). The motivation is driver-row
count at the adaptive-k cap (scale), not local speed — but the bench
discipline still wants the local cost measured the honest way:
alternating both forms in ONE session, medians over N passes.

Run: python3 tools/ab_kmeans.py   (SPARK_GRAFT_SF_DIR / AB_PASSES as ab_forms.py)
Writes bench_ab_kmeans.json.
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

# module-level so the pandas_udf type-hint resolution (which looks at
# the function's __globals__) can see them
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "6"))
K = 32
ROUNDS = 2


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_kmeans", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    emb = load_tables(spark, SF_DIR)["embeddings"]

    def run(update_form: str) -> dict:
        """One full kmeans run; update_form selects the centroid-update
        implementation. Mirrors similarity.kmeans_quantized exactly so
        the ONLY difference is the update collect shape."""
        q = emb.select(
            F.col("vec_id"),
            F.expr("transform(embedding, v -> greatest(-127L, least(127L, "
                   "CAST(floor(CAST(v AS DOUBLE) * 100) AS BIGINT))))"
                   ).alias("qv")).persist()
        dim = len(q.select("qv").first()["qv"])
        seeds = q.orderBy("vec_id").limit(K).collect()
        centroids = [list(r["qv"]) for r in seeds]
        k = len(centroids)

        def assign(frame):
            from pyspark.sql.functions import pandas_udf
            C = np.asarray(centroids, dtype=np.int64)
            c2 = (C * C).sum(axis=1)

            @pandas_udf("long")
            def _nearest(qv: pd.Series) -> pd.Series:
                X = np.stack(qv.to_numpy()).astype(np.int64)
                D = -2 * (X @ C.T) + c2[None, :]
                return pd.Series(np.argmin(D, axis=1).astype(np.int64))

            return frame.withColumn("cluster_id", _nearest(F.col("qv")))

        for _ in range(ROUNDS):
            sums = (assign(q)
                    .select("cluster_id", F.posexplode("qv").alias("pos", "v"))
                    .groupBy("cluster_id", "pos")
                    .agg(F.sum("v").alias("s"), F.count("*").alias("n")))
            means = sums.select("cluster_id", "pos", F.expr("s div n").alias("c"))
            new_cents = {ci: list(vec) for ci, vec in enumerate(centroids)}
            if update_form == "rowwise_old":
                rows = means.collect()
                upd: dict[int, list[int]] = {}
                for r in rows:
                    upd.setdefault(int(r["cluster_id"]),
                                   [0] * dim)[int(r["pos"])] = int(r["c"])
            else:  # pivot_new
                rows = (means.groupBy("cluster_id")
                        .agg(F.array_sort(
                            F.collect_list(F.struct("pos", "c"))).alias("pc"))
                        .select("cluster_id", F.col("pc.c").alias("cvec"))
                        .collect())
                upd = {int(r["cluster_id"]): [int(v) for v in r["cvec"]]
                       for r in rows}
            new_cents.update(upd)
            centroids = [new_cents[ci] for ci in range(k)]
        n = assign(q).select("vec_id", "cluster_id").count()
        checksum = hash(tuple(tuple(c) for c in centroids))
        q.unpersist()
        return {"n": n, "checksum": checksum}

    forms = ["rowwise_old", "pivot_new"]
    times: dict[str, list[float]] = {f: [] for f in forms}
    checks: dict[str, set] = {f: set() for f in forms}
    for p in range(PASSES):
        order = forms if p % 2 == 0 else forms[::-1]
        for f in order:
            t0 = time.time()
            out = run(f)
            times[f].append(round(time.time() - t0, 3))
            checks[f].add(out["checksum"])
        print(f"pass {p + 1}/{PASSES}: " +
              " ".join(f"{f}={times[f][-1]}s" for f in forms))
    assert checks["rowwise_old"] == checks["pivot_new"], \
        "forms disagree on final centroids — not equivalent!"
    result = {
        "sf_dir": SF_DIR, "passes": PASSES, "k": K, "rounds": ROUNDS,
        "times": times,
        "medians": {f: statistics.median(times[f]) for f in forms},
    }
    result["ratio_new_over_old"] = round(
        result["medians"]["pivot_new"] / result["medians"]["rowwise_old"], 3)
    out_path = ROOT / "bench_ab_kmeans.json"
    out_path.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["medians"]),
          "ratio", result["ratio_new_over_old"])


if __name__ == "__main__":
    main()
