#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named lanes to plans/<tag>/<name>_<suffix>.txt.

Evidence artifacts for optimization rounds: capture the physical plan
of each touched query BEFORE and AFTER a change so the plan diff
(Exchange count, join strategy, PushedFilters, BatchEvalPython nodes)
is committed next to the code.

Usage:
    python3 tools/plan_dump.py <suffix> <lane> [<lane> ...]
    # e.g. python3 tools/plan_dump.py before doc_winnowing_pairs

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PLAN_DUMP_TAG (default r16).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLAN_DUMP_TAG", "r16")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    out_dir = ROOT / "plans" / TAG
    out_dir.mkdir(parents=True, exist_ok=True)

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark

    queries()
    conf = {
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    }
    # PLAN_DUMP_CONF="k=v;k=v" — extra session conf, e.g. to capture a
    # 'before' plan under the pre-change join strategy.
    for kv in filter(None, os.environ.get("PLAN_DUMP_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        conf[k.strip()] = v.strip()
    spark = get_spark("plan_dump", extra_conf=conf)
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(
            f"# {name} — explain('formatted') at {SF_DIR} ({suffix})\n"
            + buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
