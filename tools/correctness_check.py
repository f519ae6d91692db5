#!/usr/bin/env python3
"""Self-run the driver's correctness gate: Spark query vs DuckDB oracle.

Mirrors the driver contract: for every `queries()` entry with an
`oracle_sql()` entry, run both at a scale factor, sort columns by name,
sort rows, and compare row-count + schema + values (floats to 1e-6
relative tolerance).  Queries without an oracle get a rows-only check.

    python3 tools/correctness_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()[:23]
    from decimal import Decimal
    if isinstance(v, Decimal):
        return float(v)
    return v


def _values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if a == "NaN" or b == "NaN":
            return a == b
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        return math.isclose(fa, fb, rel_tol=1e-6, abs_tol=1e-9)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(v)) for v in row
    )


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    problems = []
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(
            f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rows: spark={len(spark_rows)} duck={len(duck_rows)}")
        return problems
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in s_order) for r in spark_rows), key=_sort_key)
    d_norm = sorted(
        (tuple(_norm(r[i]) for i in d_order) for r in duck_rows), key=_sort_key)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if not _values_equal(sr, dr):
            problems.append(f"value mismatch at sorted-row {i}:")
            problems.append(f"  spark: {sr}")
            problems.append(f"  duck:  {dr}")
            if len(problems) > 12:
                break
    return problems


def main() -> None:
    import duckdb
    import __spark_entry__ as entry
    from cql_replicator_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    json_out = next((a.split("=", 1)[1] for a in sys.argv[1:]
                     if a.startswith("--json=")), None)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    qs = entry.queries()
    oracles = entry.oracle_sql()
    # CHECK_DRIVER_MEM: the driver profile (sf0.01) fits the default
    # heap; a FULL-REGISTRY pass at sf0.1 accumulates session state
    # across 200+ lanes (shared-LSH persisted stage, checkpoint blocks,
    # collected result spikes) in local mode's single JVM — size the
    # heap for the scale being checked (e.g. CHECK_DRIVER_MEM=8g).
    import os
    spark = get_spark(extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
        "spark.driver.memory": os.environ.get("CHECK_DRIVER_MEM", "1g"),
    })
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed, passed, rows_only = [], [], []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = df.columns
        except Exception as exc:  # noqa: BLE001
            failed.append((name, [f"SPARK ERROR: {exc!r}"]))
            print(f"FAIL  {name}: spark error {exc!r}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, [f"DUCK ERROR: {exc!r}"]))
            print(f"FAIL  {name}: duck error {exc!r}")
            continue
        # release per-lane session residue: streaming lanes leave
        # uuid-named MEMORY-SINK tables (full result sets in driver
        # heap) behind after their compare — dropping them bounds the
        # session's accumulation across a full-registry pass. The ten
        # source views (TABLES) stay; persisted/memoized frames are
        # governed by their own contracts and are not touched.
        try:
            for tbl in spark.catalog.listTables():
                if tbl.isTemporary and tbl.name not in TABLES:
                    spark.catalog.dropTempView(tbl.name)
        except Exception:  # noqa: BLE001 - best-effort cleanup
            pass
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            failed.append((name, problems))
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"pass  {name}: {len(spark_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")

    print(f"\n== {len(passed)} pass, {len(rows_only)} rows-only, "
          f"{len(failed)} fail ==")
    if json_out:
        import json
        Path(json_out).write_text(json.dumps({
            "sf_dir": sf_dir,
            "pass": sorted(passed),
            "rows_only": sorted(rows_only),
            "fail": {n: p for n, p in failed},
        }, indent=1))
        print(f"wrote {json_out}")
    if failed:
        print("failed:", ", ".join(n for n, _ in failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
