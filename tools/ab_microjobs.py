#!/usr/bin/env python3
"""Interleaved A/B for two r16 fixed-overhead cuts.

1. star-CC round checkpoint: eager (old — one materialize job per
   round plus the delta count) vs lazy (new — the delta count is the
   round's single action and materializes the checkpoint itself).
   Workload: dedup_clusters_star's CC stage over the shared LSH pairs.
2. bloom_rf_predicate literal array: 512 F.lit nodes referenced k=5
   times (old) vs one F.lit(list) Literal (new). Workload: the
   bloom_join_prefilter lane end-to-end (the cost is query-BUILD time
   — analyzer/optimizer folding thousands of nodes).

Old forms are inlined here byte-for-byte from the pre-r16 tree.
Run: python3 tools/ab_microjobs.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_microjobs.json.
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

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics import sketch as SK
    from cql_replicator_spark.queries_analytics import _shared_capped_lsh
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_microjobs", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    _sigs, pairs = _shared_capped_lsh(spark, SF_DIR)

    # star CC: old = eager round checkpoint. Toggle via a patched copy
    # of the round body — simplest faithful form: re-run the library
    # function with localCheckpoint monkeypatched to force eager.
    from pyspark.sql import DataFrame
    real_ckpt = DataFrame.localCheckpoint

    def eager_ckpt(self, eager=True):
        return real_ckpt(self, eager=True)

    def star_old():
        DataFrame.localCheckpoint = eager_ckpt
        try:
            return D.connected_components_star(pairs)
        finally:
            DataFrame.localCheckpoint = real_ckpt

    def star_new():
        return D.connected_components_star(pairs)

    # bloom: old predicate form (pre-r16, byte-for-byte)
    def old_bloom_predicate(value, words, m=32768, k=5):
        from cql_replicator_spark.analytics.sketch import _rf_hashes
        arr = F.array(*[F.lit(w).cast("long") for w in words])
        h1, h2 = _rf_hashes(value, m)
        hits = None
        for j in range(k):
            pos = F.pmod(h1 + F.lit(j) * h2, m)
            word = F.element_at(arr, (pos / 64).cast("int") + 1)
            hit = F.call_function(
                "shiftright", word, (pos % 64).cast("int")
            ).bitwiseAND(F.lit(1))
            hits = hit if hits is None else (hits + hit)
        return hits == k

    orders = spark.table("orders")
    lineitem = spark.table("lineitem")

    def bloom_lane(pred_fn):
        dim = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
               .select("o_orderkey"))
        m, k = 32768, 5
        words = SK.bloom_rf_build(dim, "o_orderkey", m, k)
        pre = (lineitem.select("l_orderkey", "l_linestatus")
               .filter(pred_fn(F.col("l_orderkey"), words, m, k)))
        return (pre.join(dim, pre["l_orderkey"] == dim["o_orderkey"])
                .groupBy("l_linestatus")
                .agg(F.count("*").cast("long").alias("n_lines"),
                     F.countDistinct("l_orderkey").cast("long")
                      .alias("n_orders")))

    def bloom_old():
        return bloom_lane(old_bloom_predicate)

    def bloom_new():
        return bloom_lane(
            lambda v, w, m, k: SK.bloom_rf_predicate(v, w, m, k))

    # equivalence pins
    a, b = star_old(), star_new()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    a, b = bloom_old(), bloom_new()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    forms = {"star_cc": (star_old, star_new),
             "bloom_prefilter": (bloom_old, bloom_new)}
    raw = {n: {"old": [], "new": []} for n in forms}
    for p in range(PASSES):
        side = "old" if p % 2 == 0 else "new"
        for name, (fo, fn) in forms.items():
            f = fo if side == "old" else fn
            t0 = time.perf_counter()
            f().count()
            raw[name][side].append(round(time.perf_counter() - t0, 3))

    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw, "medians": {}}
    for name in forms:
        mo = statistics.median(raw[name]["old"])
        mn = statistics.median(raw[name]["new"])
        out["medians"][name] = {
            "old": round(mo, 3), "new": round(mn, 3),
            "ratio_new_over_old": round(mn / mo, 3)}
        print(f"{name}: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_microjobs.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
