#!/usr/bin/env python3
"""Interleaved A/B: r16's defined-clip LSH quantization vs the r15
raw astype, measured on the SIGNATURE stage (the only code that
changed — the bucket/pair topology downstream is shared verbatim).

The r16 change (similarity.embedding_lsh_candidates): NaN -> 0 and
±_Q_DOMAIN·1e6 saturation BEFORE astype(int64) — raw astype of an
out-of-range/NaN double is undefined C behavior no oracle can mirror.
The extra work is one np.where + one np.clip per Arrow batch
(vectorized, O(n·dim) like the matmul it precedes); this artifact
pins the overhead. Evaluation is FORCED through the band keys (an
aggregate over the exploded keys), not count() — projection pruning
would skip the UDF entirely (the r15 sweep lesson).

Run: python3 tools/ab_lshclip.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_lshclip.json.
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

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402  (module-level: pandas_udf resolves
#                      the string type hints against module globals)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "8"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    import cql_replicator_spark.analytics.similarity as sim
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_lshclip", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions":
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]
    base = emb.select("vec_id", "embedding")
    corpus = base.unionByName(
        base.select((F.col("vec_id") + 1000000).alias("vec_id"),
                    "embedding"))

    planes, bands, dim = sim.RP_PLANES, 2, 64
    per_band = planes // bands
    sign_mat = np.array(
        [[sim.rp_sign(p, d, dim) for d in range(dim)]
         for p in range(planes)], dtype=np.int64)

    def make_udf(clip: bool):
        @pandas_udf("array<string>")
        def _band_keys(vecs: pd.Series) -> pd.Series:
            X = np.stack(vecs.to_numpy()).astype(np.float64)
            if clip:
                Qf = np.floor(X * 1e6)
                Qf = np.where(np.isnan(Qf), 0.0, Qf)
                cap = sim._Q_DOMAIN * 1e6
                Q = np.clip(Qf, -cap, cap).astype(np.int64)
            else:
                Q = np.floor(X * 1e6).astype(np.int64)
            bits = (Q @ sign_mat.T) > 0
            chars = np.where(bits, "1", "0")
            out = []
            for row in chars:
                s = "".join(row.tolist())
                out.append([s[b * per_band:(b + 1) * per_band]
                            for b in range(bands)])
            return pd.Series(out)
        return _band_keys

    udfs = {"old": make_udf(False), "new": make_udf(True)}
    results = {"old": [], "new": []}
    checks = {}
    for p in range(PASSES):
        for form, udf in udfs.items():
            sig = sim.well_formed(corpus, "embedding", dim).select(
                "vec_id", udf(F.col("embedding")).alias("band_keys"))
            t0 = time.time()
            # forced evaluation through the keys (count() would prune
            # the UDF away)
            row = (sig.select(F.posexplode("band_keys").alias("b", "k"))
                   .agg(F.count("*").alias("n"),
                        F.sum(F.xxhash64("k").cast("double")).alias("h"))
                   .first())
            results[form].append(round(time.time() - t0, 3))
            checks[form] = (row["n"], row["h"])
        print(f"pass {p + 1}/{PASSES}", flush=True)

    mo = statistics.median(results["old"])
    mn = statistics.median(results["new"])
    print(f"old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f} "
          f"keys old={checks['old']} new={checks['new']}")
    (ROOT / "bench_ab_lshclip.json").write_text(json.dumps(
        {"sf_dir": SF_DIR, "passes": PASSES, "raw": results,
         "key_checks": {k: list(map(float, v)) for k, v in checks.items()},
         "summary": {"old_median": mo, "new_median": mn,
                     "ratio_new_over_old": round(mn / mo, 3)}}, indent=1))
    print("wrote bench_ab_lshclip.json")


if __name__ == "__main__":
    main()
