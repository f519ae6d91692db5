#!/usr/bin/env python3
"""Cumulative per-query latest-evidence ledger from CORRECTNESS_r*.json.

The driver verifies only a ~50-query window per round, so the freshest
green row for any given query may live in an old round's artifact.  This
tool recomputes, for every registered query, the most recent round that
checked it and what the result was, then emits a markdown summary (and
the full table with --full).  The judge's "no row older than rN" audits
and the builder's window planning both read off this instead of
re-deriving it by hand.

    python3 tools/correctness_ledger.py [--full] [--markdown OUT.md]

Exit status is 1 if any query's latest evidence is a failure or if a
registered query has no driver evidence at all (excluding queries newer
than every artifact, which are listed as "pending").
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_rounds(repo: Path) -> list[tuple[int, dict]]:
    rounds = []
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", f.name)
        if not m:
            continue
        try:
            rounds.append((int(m.group(1)), json.loads(f.read_text())))
        except (json.JSONDecodeError, OSError) as exc:  # pragma: no cover
            print(f"warn: skipping {f.name}: {exc}", file=sys.stderr)
    return rounds


def classify(entry: dict) -> str:
    # The driver records oracle-less (rows-only by design) queries as
    # err='no_oracle' with a real spark_rows count — that's evidence the
    # query RAN, not a failure.
    if entry.get("err") == "no_oracle" and isinstance(entry.get("spark_rows"), int):
        return "rows-only"
    if entry.get("err"):
        return "err"
    if entry.get("hash_match") is True:
        return "green"
    # rows-only queries (no oracle) have hash_match None/absent — but only
    # count them as evidence the query RAN if a real row count is present.
    # A null/missing spark_rows is NOT evidence of anything: classify it
    # as 'unknown' (surfaced, not silently green) rather than rows-only.
    if entry.get("hash_match") is None:
        if isinstance(entry.get("spark_rows"), int):
            return "rows-only"
        return "unknown"
    return "mismatch"


def build_ledger(repo: Path) -> tuple[dict[str, dict], list[str]]:
    """Return ({query: {round, status, entry}}, registered_names)."""
    import __spark_entry__ as e  # noqa: E402  (repo-root import)

    registered = sorted(e.queries())
    ledger: dict[str, dict] = {}
    for rnd, data in load_rounds(repo):
        for name, entry in data.items():
            prev = ledger.get(name)
            if prev is None or rnd >= prev["round"]:
                ledger[name] = {
                    "round": rnd,
                    "status": classify(entry),
                    "entry": entry,
                }
    return ledger, registered


def render(ledger: dict, registered: list[str], full: bool) -> str:
    rows = []
    pending, stranger = [], []
    for name in registered:
        if name in ledger:
            rows.append((name, ledger[name]["round"], ledger[name]["status"]))
        else:
            pending.append(name)
    for name in sorted(ledger):
        if name not in registered:
            stranger.append(name)

    by_status = Counter(s for _, _, s in rows)
    by_round = Counter(r for _, r, _ in rows)
    lines = ["# Correctness ledger (latest driver evidence per query)", ""]
    lines.append(
        f"Registered: {len(registered)} | with evidence: {len(rows)} "
        f"(green {by_status.get('green', 0)}, rows-only "
        f"{by_status.get('rows-only', 0)}, mismatch "
        f"{by_status.get('mismatch', 0)}, err {by_status.get('err', 0)}, "
        f"unknown {by_status.get('unknown', 0)}) | "
        f"pending (newer than every artifact): {len(pending)}"
    )
    lines.append("")
    lines.append("Evidence freshness (latest round -> query count):")
    for rnd in sorted(by_round):
        lines.append(f"- r{rnd}: {by_round[rnd]}")
    if pending:
        lines.append("")
        lines.append("Pending (registered, no driver row yet): "
                     + ", ".join(f"`{n}`" for n in pending))
    if stranger:
        lines.append("")
        lines.append("In artifacts but no longer registered: "
                     + ", ".join(f"`{n}`" for n in stranger))
    bad = [(n, r, s) for n, r, s in rows if s in ("mismatch", "err", "unknown")]
    if bad:
        lines.append("")
        lines.append("## FAILING at latest evidence")
        for n, r, s in bad:
            lines.append(f"- `{n}`: {s} at r{r}")
    if full:
        lines.append("")
        lines.append("| query | latest round | status |")
        lines.append("|---|---|---|")
        for n, r, s in sorted(rows, key=lambda t: (t[1], t[0])):
            lines.append(f"| `{n}` | r{r} | {s} |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="emit the full per-query table")
    ap.add_argument("--markdown", type=Path,
                    help="also write the report to this path")
    args = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    ledger, registered = build_ledger(repo)
    report = render(ledger, registered, args.full)
    print(report)
    if args.markdown:
        args.markdown.write_text(report)

    bad = [n for n in registered
           if n in ledger and ledger[n]["status"] in ("mismatch", "err",
                                                      "unknown")]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
