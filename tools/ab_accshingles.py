#!/usr/bin/env python3
"""Interleaved A/B: persisted vs recomputed shingles in the MinHash
estimator-accuracy lane (r11).

dedup_minhash_accuracy's exact-Jaccard stage consumes the shingle
frame three times (sizes, side a, side b) through three DIFFERENT
exchanges — exchange reuse never applies, so the corpus is re-scanned
per consumer. The new form persists the shingle frame once (the
_shared_shingles memo) and feeds all three consumers from it.

Run: python3 tools/ab_accshingles.py  (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_accshingles.json.
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
    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.queries import queries
    from cql_replicator_spark.queries_analytics import (
        _near_fixture, _shared_capped_lsh, _shared_shingles)
    from cql_replicator_spark.session import get_spark

    queries()
    spark = get_spark("ab_accshingles", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    docs = _near_fixture(spark, SF_DIR)
    sigs, pairs = _shared_capped_lsh(spark, SF_DIR)
    pairs.count()  # memo built outside both forms (both consume it)
    sh = _shared_shingles(spark, SF_DIR, n=3)
    sh.count()  # the persisted frame is session-lived; build it outside
    # the window too and A/B the steady state both forms actually run at

    def recompute():
        return D.minhash_accuracy_pairs(
            docs, n=3, num_hashes=16, bands=4, max_bucket_size=256,
            signatures=sigs, pairs=pairs)

    def persisted():
        return D.minhash_accuracy_pairs(
            docs, n=3, num_hashes=16, bands=4, max_bucket_size=256,
            signatures=sigs, pairs=pairs, shingle_frame=sh)

    a = sorted(map(tuple, recompute().collect()))
    b = sorted(map(tuple, persisted().collect()))
    assert a == b, "forms disagree"

    forms = {"recompute": recompute, "persisted": persisted}
    samples = {f: [] for f in forms}
    for p in range(PASSES):
        order = (["recompute", "persisted"] if p % 2 == 0
                 else ["persisted", "recompute"])
        for form in order:
            t0 = time.perf_counter()
            forms[form]().count()
            samples[form].append(round(time.perf_counter() - t0, 3))

    med = {f: round(statistics.median(v), 3) for f, v in samples.items()}
    out = {"sf_dir": SF_DIR, "passes": PASSES, "samples": samples,
           "medians": med,
           "persisted_over_recompute": round(
               med["persisted"] / med["recompute"], 3)}
    print(json.dumps({"medians": med,
                      "ratio": out["persisted_over_recompute"]}))
    (ROOT / "bench_ab_accshingles.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
