#!/usr/bin/env python3
"""Interleaved A/B benchmark: attribute the r3->r4 +23% uniform drift.

r4's bench added 17 queries to the same JVM session as r3's 51; every
common query got uniformly slower, which smells like session-level
pressure (GC / codegen-cache growth / scheduler aging), not per-query
regressions. This harness tests exactly that inside ONE session:

    pass 1  A   common set only          (r3-shaped session load)
    pass 2  B   common + r4-extra set    (r4-shaped session load)
    pass 3  A   ...alternating...        6 passes total, 3 per form

Two readouts:
  * per-query median over A passes vs over B passes — if the extras
    CAUSE the inflation, B medians sit systematically above A;
  * per-pass totals by pass index — if times grow with session age
    regardless of form, the drift is harness aging (variance), which
    interleaving cancels out of the A-vs-B comparison.

Writes bench_ab.json (raw timings + medians) and prints a summary.
Run: python3 tools/ab_bench.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
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
PASSES = int(os.environ.get("AB_PASSES", "6"))  # alternating A/B

# the four movers the r4 verdict flagged for first-look
SUSPECTS = ["dedup_embedding_lsh_verified", "q3_shipping_priority",
            "dedup_minhash_lsh", "similarity_ann_ivf"]


def _r3_queries() -> dict[str, float]:
    """Recover r3's per-query timings from the driver artifact's stdout
    tail (the JSON line survived whole in r3's 2000-char window)."""
    import re
    raw = json.loads((ROOT / "BENCH_r03.json").read_text())["tail"]
    m = re.search(r'\{"metric".*\}', raw)
    return json.loads(m.group(0))["queries"] if m else {}


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    import bench  # the canonical HEADLINE list

    queries()
    r3 = _r3_queries()
    common = [n for n in bench.HEADLINE if n in r3 and n in REGISTRY]
    extras = [n for n in bench.HEADLINE if n not in r3 and n in REGISTRY]

    spark = get_spark(
        "ab_bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_CPUS", "32"),
        },
    )
    t = load_tables(spark, SF_DIR)
    w = t["orders"].select("o_orderkey").limit(10_000)
    w.join(w.withColumnRenamed("o_orderkey", "k"),
           w.o_orderkey == F.col("k")).groupBy().count().count()

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    raw: list[dict] = []
    for p in range(PASSES):
        form = "A" if p % 2 == 0 else "B"
        if form == "A":
            names = list(common)
        else:
            # extras interleaved evenly through the commons, so the
            # B-form pressure is distributed, not front/back-loaded
            names = []
            step = max(1, len(common) // max(1, len(extras)))
            ei = 0
            for i, n in enumerate(common):
                names.append(n)
                if i % step == step - 1 and ei < len(extras):
                    names.append(extras[ei])
                    ei += 1
            names.extend(extras[ei:])
        t0 = time.perf_counter()
        for n in names:
            raw.append({"pass": p, "form": form, "name": n,
                        "sec": run_one(n)})
        print(f"pass {p} form {form}: {len(names)} queries "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    med = {}
    for n in common:
        a = [r["sec"] for r in raw if r["name"] == n and r["form"] == "A"]
        b = [r["sec"] for r in raw if r["name"] == n and r["form"] == "B"]
        med[n] = {"a_median": statistics.median(a),
                  "b_median": statistics.median(b)}
    pass_totals = [
        {"pass": p,
         "form": "A" if p % 2 == 0 else "B",
         "common_total": round(sum(r["sec"] for r in raw
                                   if r["pass"] == p
                                   and r["name"] in common), 2)}
        for p in range(PASSES)]

    ratios = [med[n]["b_median"] / med[n]["a_median"]
              for n in common if med[n]["a_median"] > 0]
    summary = {
        "sf_dir": SF_DIR,
        "n_common": len(common),
        "n_extras": len(extras),
        "b_over_a_median_ratio": round(statistics.median(ratios), 4),
        "b_over_a_mean_ratio": round(statistics.mean(ratios), 4),
        "pass_totals": pass_totals,
        "suspects": {n: med[n] for n in SUSPECTS if n in med},
    }
    out = {"summary": summary, "medians": med, "raw": raw}
    (ROOT / "bench_ab.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
