#!/usr/bin/env python3
"""Interleaved A/B: do the r9 poison guards cost anything on clean data?

Variant A = guard-on (the shipped r9 forms): cosine() with
try_divide+nanvl, quantized_cosine_np with the domain mask + nullable
Float64 output. Variant B = guard-off (the pre-r9 forms): plain `/`
cosine, plain np division — safe here because sf0.1 is clean (the
guards exist for poison rows; this measures their overhead on the data
that doesn't need them).

Alternating passes in ONE session (house rule: perf verdicts only from
interleaved same-session A/B), medians per variant, writes
bench_ab_guards.json. Run: python3 tools/ab_guards.py
"""

# NOTE: no `from __future__ import annotations` — it stringifies the
# nested pandas_udf's type hints and breaks its eval-type inference.
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
# AB_START=off flips which variant runs the even passes: sessions speed
# up as they age, so a single ABAB order systematically handicaps the
# first variant — run both orders and combine (the r7 house discipline).
START_ON = os.environ.get("AB_START", "on") == "on"

QUERIES = [
    "dedup_embedding_cosine",        # column cosine, all-pairs top-1
    "similarity_cosine_topk",        # column cosine top-k
    "similarity_recall_at_k",        # cosine + ivf_search composite
    "dedup_embedding_lsh_verified",  # quantized_cosine_np verify lane
]


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    import __spark_entry__ as e
    import cql_replicator_spark.analytics.similarity as S
    from cql_replicator_spark.session import get_spark

    spark = get_spark("ab_guards", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    })
    qs = e.queries()

    guard_on_cosine = S.cosine
    guard_on_qcnp = S.quantized_cosine_np

    def cosine_off(a, b):
        return S.dot(a, b) / (S.norm(a) * S.norm(b))

    def qcnp_off():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
            A = np.floor(np.stack(va.to_numpy()).astype(np.float64) * 1e6).astype(np.int64)
            B = np.floor(np.stack(vb.to_numpy()).astype(np.float64) * 1e6).astype(np.int64)
            dot = (A * B).sum(axis=1).astype(np.float64)
            na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
            nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
            return pd.Series(dot / (na * nb))

        return _cos

    def set_variant(on: bool) -> None:
        S.cosine = guard_on_cosine if on else cosine_off
        S.quantized_cosine_np = guard_on_qcnp if on else qcnp_off

    # warm the session once with the guard-on forms
    for name in QUERIES:
        qs[name](spark, SF_DIR).count()

    raw: dict[str, dict[str, list[float]]] = {
        n: {"on": [], "off": []} for n in QUERIES}
    counts: dict[str, dict[str, int]] = {n: {} for n in QUERIES}
    for p in range(PASSES):
        on = (p % 2 == 0) == START_ON
        set_variant(on)
        key = "on" if on else "off"
        for name in QUERIES:
            t0 = time.perf_counter()
            c = qs[name](spark, SF_DIR).count()
            raw[name][key].append(round(time.perf_counter() - t0, 3))
            counts[name][key] = c
    set_variant(True)  # leave the module as shipped

    out = {"sf_dir": SF_DIR, "passes": PASSES, "queries": {}}
    print(f"{'query':34s} {'on-med':>8s} {'off-med':>8s} {'ratio':>6s}  rows-equal")
    for name in QUERIES:
        on_m = statistics.median(raw[name]["on"])
        off_m = statistics.median(raw[name]["off"])
        same = counts[name]["on"] == counts[name]["off"]
        out["queries"][name] = {"on": raw[name]["on"], "off": raw[name]["off"],
                                "on_median": on_m, "off_median": off_m,
                                "ratio_on_over_off": round(on_m / off_m, 3),
                                "rows_equal": same}
        print(f"{name:34s} {on_m:8.3f} {off_m:8.3f} {on_m / off_m:6.2f}  {same}")
    out_name = os.environ.get("AB_OUT", "bench_ab_guards.json")
    out["start_variant"] = "on" if START_ON else "off"
    (ROOT / out_name).write_text(json.dumps(out, indent=1))
    print(f"wrote {out_name}")


if __name__ == "__main__":
    main()
