#!/usr/bin/env python3
"""Interleaved A/B: bucketed-table write WITHOUT vs WITH the
repartition-to-bucket-spec step (r17 session 2, guide §6).

Without it, every write task splits its rows into num_buckets bucket
files: a narrow scan writes ALL buckets from one serial task (the
sf0.1 case — the whole fact side encodes parquet on one core), and a
wide scan writes tasks x buckets small files. repartition(num_buckets,
bucket_cols) is the same pmod(murmur3) hash as the bucket spec, so
each task holds exactly one bucket: num_buckets-wide parallel write,
num_buckets files. Table contents identical — equality asserted on
the lane result; file count recorded per side.

Lane: bucketed_join_colocated.
Protocol: v2 (1 discarded warm-up per side, per-pass order flip).
Run: python3 tools/ab_bucketwrite.py  Writes bench_ab_bucketwrite.json.
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
LANE = "bucketed_join_colocated"


def _old_write_bucketed_table(df, name, bucket_cols, num_buckets,
                              sort_cols=None, mode="overwrite"):
    """The pre-r17 writer: no repartition before bucketBy."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def _table_file_count(spark, name: str) -> int:
    loc = [r.data_type for r in
           spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
           if r.col_name == "Location"][0]
    path = loc[len("file:"):] if loc.startswith("file:") else loc
    return sum(1 for f in Path(path).rglob("*.parquet"))


def main() -> None:
    from cql_replicator_spark import bucketing
    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("ab_bucketwrite", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    new_writer = bucketing.write_bucketed_table

    def set_side(side: str) -> None:
        bucketing.write_bucketed_table = (
            _old_write_bucketed_table if side == "old" else new_writer)
        # the lane imports the symbol from the module at call time via
        # `from .bucketing import write_bucketed_table` inside the
        # function body, so patching the module attribute is enough

    set_side("old")
    a = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    files_old = _table_file_count(
        spark, f"sg_bkt_lineitem_p{os.getpid()}")
    set_side("new")
    b = sorted(map(tuple, REGISTRY[LANE].build(spark, SF_DIR).collect()))
    files_new = _table_file_count(
        spark, f"sg_bkt_lineitem_p{os.getpid()}")
    assert a == b, "bucket-write repartition changed the lane rows!"

    raw = {"old": [], "new": []}

    def run(side):
        set_side(side)
        t0 = time.perf_counter()
        REGISTRY[LANE].build(spark, SF_DIR).count()
        return round(time.perf_counter() - t0, 3)

    run("old")
    run("new")
    for p in range(PASSES):
        order = ("old", "new") if p % 2 == 0 else ("new", "old")
        for side in order:
            raw[side].append(run(side))
    set_side("new")

    mo = statistics.median(raw["old"])
    mn = statistics.median(raw["new"])
    out = {"passes": PASSES, "sf_dir": SF_DIR, "lane": LANE, "raw": raw,
           "lineitem_bucket_files": {"old": files_old, "new": files_new},
           "protocol": "v2: equality asserted, 1 discarded warmup per "
                       "side, per-pass order flip",
           "medians": {"old": round(mo, 3), "new": round(mn, 3),
                       "ratio_new_over_old": round(mn / mo, 3)}}
    print(f"{LANE}: old {mo:.3f}s new {mn:.3f}s ratio {mn / mo:.3f} "
          f"lineitem files old={files_old} new={files_new}")
    (ROOT / "bench_ab_bucketwrite.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
