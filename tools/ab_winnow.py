#!/usr/bin/env python3
"""Interleaved A/B: fused vs separate dedup stage in winnowing_pairs (r11).

winnowing_fingerprints ends in a (id, fp) DISTINCT; winnowing_pairs
then groupBy(fp)s the result — two exchanges of the fingerprint volume
for one logical collect. The fused form replaces distinct+collect_list
with a single groupBy(fp).agg(collect_set(id)): the dedup rides the
map-side partial aggregation of the exchange winnowing_pairs pays
anyway. Identical posting lists (set semantics), one fewer shuffle.

Run: python3 tools/ab_winnow.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_winnow.json.
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

    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_winnow", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]
    K, W, MIN_SHARED, MAX_DF = 3, 4, 5, 25  # the registered parameters

    def old_form():
        # pre-r11 winnowing_pairs: distinct fingerprints, then a second
        # exchange for the posting-list groupBy
        fps = TX._winnowing_selected(docs, "doc_id", "text", K, W).distinct()
        grouped = (fps.groupBy("fp")
                   .agg(F.collect_list("doc_id").alias("ids"))
                   .filter((F.size("ids") > 1)
                           & (F.size("ids") <= MAX_DF)))
        return (grouped.select(F.explode(F.expr(
                    "flatten(transform(ids, x -> transform("
                    "filter(ids, y -> x < y), y -> struct(x AS id_a, y AS id_b))))"
                )).alias("p"))
                .select("p.id_a", "p.id_b")
                .groupBy("id_a", "id_b")
                .agg(F.count("*").cast("long").alias("n_shared"))
                .filter(F.col("n_shared") >= MIN_SHARED))

    def new_form():
        return TX.winnowing_pairs(docs, k=K, w=W, min_shared=MIN_SHARED,
                                  max_df=MAX_DF)

    # identical results — assert once, it's the premise
    a = sorted(map(tuple, old_form().collect()))
    b = sorted(map(tuple, new_form().collect()))
    assert a == b, f"forms disagree: {len(a)} vs {len(b)} rows"

    forms = {"separate": old_form, "fused": new_form}
    samples = {f: [] for f in forms}
    for p in range(PASSES):
        order = (["separate", "fused"] if p % 2 == 0
                 else ["fused", "separate"])
        for form in order:
            t0 = time.perf_counter()
            forms[form]().count()
            samples[form].append(round(time.perf_counter() - t0, 3))

    med = {f: round(statistics.median(v), 3) for f, v in samples.items()}
    out = {"sf_dir": SF_DIR, "passes": PASSES,
           "params": {"k": K, "w": W, "min_shared": MIN_SHARED,
                      "max_df": MAX_DF},
           "samples": samples, "medians": med,
           "fused_over_separate": round(med["fused"] / med["separate"], 3)}
    print(json.dumps({"medians": med, "ratio": out["fused_over_separate"]}))
    (ROOT / "bench_ab_winnow.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
