#!/usr/bin/env python3
"""Interleaved A/B: shared vs per-lane MinHash-LSH candidate stage (r11).

Five registered lanes (dedup_minhash_lsh, dedup_clusters,
dedup_clusters_star, dedup_cluster_keepers, dedup_minhash_accuracy)
consume one capped candidate pipeline. r11 memoizes the persisted
signature/pair frames across the lanes (_shared_capped_lsh); the old
form rebuilt them per lane. Decision comes from this alternating
same-session run over the REGISTERED five-lane family: each pass runs
the whole family once per form (the unit a user pipeline executes),
cache cleared before every shared pass so the memo build is paid inside
the measured window, orders alternated, medians per form.

Run: python3 tools/ab_sharedlsh.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_sharedlsh.json.
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

LANES = ["dedup_minhash_lsh", "dedup_clusters", "dedup_clusters_star",
         "dedup_cluster_keepers", "dedup_minhash_accuracy"]


def main() -> None:
    from cql_replicator_spark import queries_analytics as QA
    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.queries_analytics import _near_fixture
    from cql_replicator_spark.session import get_spark

    queries()
    spark = get_spark("ab_sharedlsh", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    from pyspark.sql import functions as F

    def clear_cache():
        # entries are variable-length tuples (sigs, pairs) or (sh,).
        # Mutations run under the memo's lock — the tool is single-
        # threaded today, but it must model the documented invariant,
        # not an unsafe shortcut the next reader copies.
        with QA._LSH_SHARED_LOCK:
            while QA._LSH_SHARED:
                for frame in QA._LSH_SHARED.pop(next(iter(QA._LSH_SHARED))):
                    frame.unpersist(blocking=True)

    def independent_lane(name):
        """The pre-r11 form of each lane: per-lane candidate rebuild."""
        near = _near_fixture(spark, SF_DIR)
        if name == "dedup_minhash_lsh":
            return D.minhash_lsh_dedup_pairs(
                near, n=3, num_hashes=16, bands=4, max_bucket_size=256)
        if name == "dedup_clusters":
            return D.connected_components(D.minhash_lsh_dedup_pairs(
                near, n=3, num_hashes=16, bands=4, max_bucket_size=256))
        if name == "dedup_clusters_star":
            return D.connected_components(
                D.minhash_lsh_dedup_pairs(near, n=3, num_hashes=16,
                                          bands=4, max_bucket_size=256),
                algorithm="star")
        if name == "dedup_cluster_keepers":
            pairs = D.minhash_lsh_dedup_pairs(
                near, n=3, num_hashes=16, bands=4, max_bucket_size=256)
            quality = near.select(
                "doc_id", F.length("text").cast("long").alias("quality"))
            return D.cluster_keepers(D.connected_components(pairs), quality)
        if name == "dedup_minhash_accuracy":
            return D.minhash_accuracy_pairs(
                near, n=3, num_hashes=16, bands=4, max_bucket_size=256)
        raise ValueError(name)

    def run_family(form) -> float:
        t0 = time.perf_counter()
        if form == "shared":
            clear_cache()  # memo build paid inside the window
            for name in LANES:
                REGISTRY[name].build(spark, SF_DIR).count()
        else:
            for name in LANES:
                independent_lane(name).count()
        return round(time.perf_counter() - t0, 3)

    # identical results — assert once, it's the premise
    clear_cache()
    for name in LANES:
        a = sorted(map(tuple, independent_lane(name).collect()))
        b = sorted(map(tuple, REGISTRY[name].build(spark, SF_DIR).collect()))
        assert a == b, f"{name}: shared and independent forms disagree"
    clear_cache()

    samples = {"independent": [], "shared": []}
    for p in range(PASSES):
        order = (["independent", "shared"] if p % 2 == 0
                 else ["shared", "independent"])
        for form in order:
            samples[form].append(run_family(form))
    clear_cache()

    med = {f: round(statistics.median(v), 3) for f, v in samples.items()}
    out = {"sf_dir": SF_DIR, "passes": PASSES, "lanes": LANES,
           "samples": samples, "medians": med,
           "shared_over_independent": round(
               med["shared"] / med["independent"], 3)}
    print(json.dumps({"medians": med,
                      "ratio": out["shared_over_independent"]}))
    (ROOT / "bench_ab_sharedlsh.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
