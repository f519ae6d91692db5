#!/usr/bin/env python3
"""Interleaved A/B: per-element array literals vs one ndarray Literal (r17).

Closes the r16 attribution gap flagged in VERDICT #2/ADVICE: the ADC
table / sign matrix / bloom bitmap literal change was never
individually A/B'd, and r16's F.lit(list) form was NOT the single
ArrayData it claimed (PySpark 4.1 expands lit(list) to per-element
array(lit, ...)). r17 switches those sites to numpy ndarrays, which
do route through one Literal. Side A monkeypatches the expression
BUILDERS (driver-side plan construction — executors only see the
finished plan) back to the pre-r16 F.array(*[F.lit(x), ...]) form;
side B is the library. Results are identical by construction and
asserted on one lane.

Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_arraylit.py    Writes bench_ab_arraylit.json.
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

LANES = [
    "similarity_pq_recall",
    "similarity_ivfpq_recall",
    "bloom_join_prefilter",
    "embedding_random_projection",
]


def main() -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics import similarity as S
    from cql_replicator_spark.analytics import sketch as SK
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_arraylit", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    new_adc = S.adc_scored
    new_rp = S.random_projection_signs
    new_bloom = SK.bloom_rf_predicate

    # -- pre-r16 forms: per-element F.array(*[F.lit(x), ...]) --------------

    def old_adc_scored(query_vec, encoded, codebooks, scale=100):
        qv = np.asarray(
            [max(-127, min(127, int(np.floor(float(v) * scale))))
             for v in query_vec], dtype=np.int64)
        m = len(codebooks)
        sub = len(codebooks[0][0])
        dist = None
        for s in range(m):
            C = np.asarray(codebooks[s], dtype=np.int64)
            d = ((qv[s * sub:(s + 1) * sub][None, :] - C) ** 2).sum(axis=1)
            arr = F.array(*[F.lit(int(x)).cast("long") for x in d])
            term = F.element_at(arr, F.col(f"code_{s}") + 1)
            dist = term if dist is None else dist + term
        return encoded.withColumn("adc_dist", dist.cast("long"))

    def old_random_projection_signs(corpus, id_col="vec_id",
                                    vec_col="embedding",
                                    in_dim=64, out_dim=8, scale=100):
        from cql_replicator_spark.analytics.similarity import _jl_sign
        _B = float(1 << 31)
        q = F.transform(
            F.col(vec_col),
            lambda x: F.least(F.greatest(F.floor(x.cast("double") * scale),
                                         F.lit(-_B)), F.lit(_B)).cast("long"))
        projected = corpus.select(F.col(id_col), q.alias("_q"))
        cols = [F.col(id_col)]
        for j in range(int(out_dim)):
            signs = F.array(*[F.lit(_jl_sign(j, i)).cast("long")
                              for i in range(int(in_dim))])
            pj = F.aggregate(
                F.zip_with(F.col("_q"), signs, lambda x, s: x * s),
                F.lit(0).cast("long"), lambda acc, v: acc + v)
            cols.append(pj.alias(f"p{j}"))
        return projected.select(*cols)

    def old_bloom_rf_predicate(value, words, m=32768, k=5):
        from cql_replicator_spark.analytics.sketch import _rf_hashes
        arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
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

    def set_side(side: str) -> None:
        if side == "element":
            S.adc_scored = old_adc_scored
            S.random_projection_signs = old_random_projection_signs
            SK.bloom_rf_predicate = old_bloom_rf_predicate
        else:
            S.adc_scored = new_adc
            S.random_projection_signs = new_rp
            SK.bloom_rf_predicate = new_bloom

    # equivalence: identical rows on the ADC lane under both builders
    set_side("element")
    a = sorted(map(tuple,
                   REGISTRY["similarity_pq_recall"].build(spark, SF_DIR)
                   .collect()))
    set_side("ndarray")
    b = sorted(map(tuple,
                   REGISTRY["similarity_pq_recall"].build(spark, SF_DIR)
                   .collect()))
    assert a == b, "literal form changed the rows!"

    def run_side(side: str, sink) -> None:
        set_side(side)
        for name in LANES:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            dt = round(time.perf_counter() - t0, 3)
            if sink is not None:
                sink[name][side].append(dt)

    raw = {n: {"element": [], "ndarray": []} for n in LANES}
    run_side("element", None)
    run_side("ndarray", None)
    for p in range(PASSES):
        order = (("element", "ndarray") if p % 2 == 0
                 else ("ndarray", "element"))
        for side in order:
            run_side(side, raw)
    set_side("ndarray")

    out = {"passes": PASSES, "sf_dir": SF_DIR, "lanes": LANES,
           "protocol": "v2: equivalence asserted, 1 discarded warmup "
                       "per side, per-pass order flip",
           "raw": raw, "medians": {}}
    tot_a = tot_b = 0.0
    for name in LANES:
        ma = statistics.median(raw[name]["element"])
        mb = statistics.median(raw[name]["ndarray"])
        tot_a += ma
        tot_b += mb
        out["medians"][name] = {
            "element": round(ma, 3), "ndarray": round(mb, 3),
            "ratio_ndarray_over_element": round(mb / ma, 3)}
        print(f"{name}: element {ma:.3f}s ndarray {mb:.3f}s "
              f"ratio {mb / ma:.3f}")
    out["total"] = {"element": round(tot_a, 3), "ndarray": round(tot_b, 3),
                    "ratio": round(tot_b / tot_a, 3)}
    print(f"TOTAL ratio {tot_b / tot_a:.3f}")
    (ROOT / "bench_ab_arraylit.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
