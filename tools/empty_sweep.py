#!/usr/bin/env python3
"""Empty-input sweep: run every registered query against ZERO-ROW
copies of the test tables and report crashes.

The degenerate sibling of the poison sweep: at 100 TB an empty input
is routine — a tile with no rows after a filter, a partition with no
new data in a discovery cycle, a just-created table. A lane that
crashes on it (driver-side ``.first()`` unpacking None, ``[0]`` on an
empty collect, division by a zero count that feeds Python, np.stack
over zero arrays) fails the whole job for a state that is not an
error. Returning an EMPTY (or empty-aggregate) frame is the correct
behavior; this sweep is the regression gate for that class.

``--rows N`` (default 0) keeps the first N rows of each table instead:
N=1 is the single-row degenerate class (stddev/variance over one
sample, regression denominators, n-1 divisors), distinct from empty.
``--rows N --clone`` builds the ALL-TIES class: row 0 replicated N
times with only the first (key) column rewritten — the
boilerplate-dominated corpus shape (tie-heavy percentiles/ranks,
one-bucket similarity joins, zero variance, single-point kmeans).

Usage:
    python3 tools/empty_sweep.py [--src SF_DIR] [--dst EMPTY_DIR]
                                 [--rows N] [query ...]

Builds DST from SRC (default /root/testdata/sf0.001 -> /tmp/empty_sf)
as schema-identical N-row parquet per table, runs all registered
queries against it, prints one line per query, exits 1 on any crash.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def build_empty_dir(src: str, dst: str, rows: int = 0,
                    clone: bool = False) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        path = os.path.join(src, t + ".parquet")
        if clone and rows > 0:
            # the ALL-TIES class: row 0 replicated `rows` times, first
            # column rewritten 0..rows-1 for key uniqueness — N keys,
            # every other value IDENTICAL. The boilerplate-dominated
            # corpus shape: tie-heavy percentile cuts and rank windows,
            # one-bucket LSH/SimHash/fingerprint joins (the caps'
            # stress case), zero-variance aggregates, single-point
            # kmeans, one giant session, complete candidate graphs.
            one = pq.read_table(path).slice(0, 1)
            table = pa.concat_tables([one] * rows)
            first = table.schema.field(0)
            ids = pa.array(range(rows), type=pa.int64()).cast(first.type)
            table = table.set_column(0, first, ids)
        elif rows > 0:
            table = pq.read_table(path).slice(0, rows)
        else:
            table = pq.read_schema(path).empty_table()
        pq.write_table(table, os.path.join(dst, t + ".parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/empty_sf")
    ap.add_argument("--rows", type=int, default=0,
                    help="rows kept per table (0 = empty)")
    ap.add_argument("--clone", action="store_true",
                    help="replicate row 0 --rows times (unique first "
                         "column, all other values identical — the "
                         "all-ties degenerate class)")
    ap.add_argument("queries", nargs="*",
                    help="subset of query names (default: all)")
    args = ap.parse_args()

    build_empty_dir(args.src, args.dst, rows=args.rows, clone=args.clone)

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark

    queries()
    spark = get_spark(extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "4",
    })

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sweeplib import check_fallbacks, forced_count

    names = args.queries or sorted(REGISTRY)
    ok = fails = 0
    failed: list[str] = []
    fallbacks: list[str] = []
    for name in names:
        try:
            # forced evaluation, NOT count(): count's projection pruning
            # green-lit four executor crashers for six rounds (sweeplib)
            n = forced_count(REGISTRY[name].build(spark, args.dst),
                             name=name, fallbacks=fallbacks)
            print(f"OK   {name}: {n}", flush=True)
            ok += 1
        except Exception as exc:
            msg = str(exc).splitlines()[0][:160] if str(exc) else repr(exc)
            print(f"FAIL {name}: {type(exc).__name__}: {msg}", flush=True)
            fails += 1
            failed.append(name)
    offending = check_fallbacks(fallbacks)
    print(f"DONE ok={ok} fail={fails} count_fallbacks={len(fallbacks)}")
    if failed:
        print("failed:", " ".join(failed))
    if offending:
        # a count() fallback is weaker evidence, not a pass — gate it
        print("non-whitelisted count() fallbacks (sweep coverage hole):",
              " ".join(offending))
    spark.stop()
    return 1 if fails or offending else 0


if __name__ == "__main__":
    sys.exit(main())
