#!/usr/bin/env python3
"""Interleaved A/B: capped vs uncapped LSH candidate lanes (r10).

The r10 cap sweep (max_bucket_size=256 on the registered MinHash and
embedding LSH lanes) is a SCALE guard — at sf0.1 the fixtures' buckets
sit far below the cap, so the pair sets are identical and the cap must
be perf-neutral. The committed full-bench comparison is cross-session
(host drift makes its ~1.16x global median meaningless — see
BENCHNOTES_r07/r09), so the keep/ship decision for the cap comes from
this alternating same-session run: N passes, each pass times every
(query, form) pair in both orders, medians per form.

Run: python3 tools/ab_caps.py      (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_caps.json.
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

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics import similarity as S
    from cql_replicator_spark.queries_analytics import _near_fixture
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_caps", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    near = _near_fixture(spark, SF_DIR)
    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    base = emb.select("vec_id", "embedding")
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding"))

    def minhash(cap):
        return lambda: D.minhash_lsh_dedup_pairs(
            near, n=3, num_hashes=16, bands=4, max_bucket_size=cap)

    def emb_lsh(cap):
        return lambda: S.embedding_lsh_candidates(
            corpus, max_bucket_size=cap)

    cases = {
        "minhash_lsh": {"uncapped": minhash(None), "capped": minhash(256)},
        "embedding_lsh": {"uncapped": emb_lsh(None), "capped": emb_lsh(256)},
    }

    # identical pair sets at this scale — assert once, it's the premise
    for name, forms in cases.items():
        a = forms["uncapped"]().count()
        b = forms["capped"]().count()
        assert a == b, (name, a, b)

    samples: dict[str, dict[str, list[float]]] = {
        n: {f: [] for f in fs} for n, fs in cases.items()}
    for p in range(PASSES):
        order = ["uncapped", "capped"] if p % 2 == 0 else ["capped", "uncapped"]
        for name, forms in cases.items():
            for form in order:
                t0 = time.perf_counter()
                forms[form]().count()
                samples[name][form].append(
                    round(time.perf_counter() - t0, 3))

    out = {"sf_dir": SF_DIR, "passes": PASSES, "results": {}}
    for name, fs in samples.items():
        med = {f: round(statistics.median(v), 3) for f, v in fs.items()}
        out["results"][name] = {
            "samples": fs, "medians": med,
            "capped_over_uncapped": round(
                med["capped"] / med["uncapped"], 3)}
        print(name, med, "ratio",
              out["results"][name]["capped_over_uncapped"])
    (ROOT / "bench_ab_caps.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
