#!/usr/bin/env python3
"""Poison-fixture ORACLE sweep: the full Spark-vs-DuckDB value
comparison on adversarial rows, gated by a committed per-lane
expectations table (r16; verdict items 1+2).

The crash sweeps (poison_sweep / empty_sweep) prove lanes RUN on
degenerate input; this sweep proves their VALUES still match the
oracle there — the evidence class that found 13 latent divergences in
r15 and drove the r16 oracle-hardening pass (ORACLES.md). Exit is
nonzero on ANY undecided row:

  * a lane that mismatches or errors without an entry in
    tools/poison_expectations.py, and
  * an entry whose lane no longer diverges (stale — the table is
    shrink-only, like the plan-audit whitelists).

Usage:
    python3 tools/poison_oracle_sweep.py [--src SF_DIR] [--dst DIR]
                                         [--json OUT] [lane ...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/poison_oracle_sf")
    ap.add_argument("--json", default="/tmp/poison_oracle_sweep.json")
    ap.add_argument("--unicode", action="store_true",
                    help="sweep the unicode-storm fixture (emoji/ZWJ, "
                         "astral, combining, RTL, NBSP, control chars, "
                         "CJK — the char-vs-byte divergence class) "
                         "instead of the poison fixture; gated by the "
                         "same expectations table")
    ap.add_argument("lanes", nargs="*")
    args = ap.parse_args()

    from poison_expectations import EXPECTATIONS
    from poison_sweep import build_poison_dir, build_unicode_dir

    (build_unicode_dir if args.unicode else build_poison_dir)(
        args.src, args.dst)

    # correctness_check owns the compare contract (same normalization
    # the driver uses); run it as a subprocess so one sweep run can't
    # poison the checker session, and read its JSON verdict
    cmd = [sys.executable, os.path.join(REPO, "tools", "correctness_check.py"),
           args.dst, *args.lanes, f"--json={args.json}"]
    env = dict(os.environ, CHECK_DRIVER_MEM=os.environ.get(
        "CHECK_DRIVER_MEM", "4g"))
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.DEVNULL, text=True)
    sys.stdout.write(proc.stdout[-4000:])

    import json
    with open(args.json) as f:
        res = json.load(f)
    failed = set(res["fail"])
    checked = set(res["pass"]) | set(res["rows_only"]) | failed
    expected = {k for k in EXPECTATIONS if not args.lanes or k in checked}

    undecided = sorted(failed - expected)
    stale = sorted((expected & checked) - failed)
    decided = sorted(failed & expected)

    print(f"\n== poison ORACLE sweep: {len(res['pass'])} pass, "
          f"{len(decided)} documented-divergence, "
          f"{len(undecided)} UNDECIDED, {len(stale)} STALE entries ==")
    for name in decided:
        print(f"  divergence (documented): {name} — "
              f"{EXPECTATIONS[name][1][:90]}")
    if undecided:
        print("UNDECIDED (mismatch/error without an expectations entry):")
        for name in undecided:
            print(f"  {name}: {' '.join(res['fail'][name])[:180]}")
    if stale:
        print(f"STALE expectations (lane no longer diverges — remove): "
              f"{stale}")
    return 1 if undecided or stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
