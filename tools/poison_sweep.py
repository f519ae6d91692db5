"""Poison-row sweep: run every registered query against an adversarial
copy of the test data and report crashes.

At 100 TB a corpus WILL contain failed-encoder output: NULL/empty/
wrong-dimension embeddings, NULL/empty/whitespace/unicode documents,
NULL keys and timestamps, out-of-range numerics, malformed JSON. Under
Spark 4's default ANSI mode, one such row turns a division, cast, or
np.stack into a job-killing exception. This sweep is the regression
gate for that class: it found 15 crashers in r9 (ragged np.stack in
every numpy embedding lane, Decimal(18,2) ANSI cast overflow across
TPC-H, NaN tlen in three media synthesize lanes, NaN duration in frame
sampling, NoneType.encode in the compression round-trip) — all fixed
and re-verified oracle-green on clean data.

Usage:
    python3 tools/poison_sweep.py [--src SF_DIR] [--dst POISON_DIR]

Builds DST from SRC (default /root/testdata/sf0.001 -> /tmp/poison_sf)
by appending adversarial rows to every table, runs all registered
queries against it, prints one line per query, exits 1 on any crash.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NOW = dt.datetime(2024, 1, 1)
EPOCH = dt.datetime(1970, 1, 1)
FAR = dt.datetime(2260, 1, 1)  # inside timestamp64 range


def build_poison_dir(src: str, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)

    def extend(table_name: str, rows: list[dict]) -> None:
        t = pq.read_table(os.path.join(src, table_name + ".parquet"))
        extra = pa.Table.from_pylist(rows, schema=t.schema)
        pq.write_table(pa.concat_tables([t, extra]),
                       os.path.join(dst, table_name + ".parquet"))

    extend("documents", [
        {"doc_id": 9000001, "text": "", "lang": "en", "source": "poison", "n_chars": 0},
        {"doc_id": 9000002, "text": "   ", "lang": "en", "source": "poison", "n_chars": 3},
        {"doc_id": 9000003, "text": "a", "lang": "en", "source": "poison", "n_chars": 1},
        {"doc_id": 9000004, "text": None, "lang": None, "source": "poison", "n_chars": None},
        {"doc_id": 9000005, "text": "同 じ 同 じ", "lang": "ja", "source": "poison", "n_chars": 7},
        {"doc_id": 9000006, "text": "the " * 400, "lang": "en", "source": "poison", "n_chars": 1600},
        {"doc_id": 9000007, "text": "!!! ??? ...", "lang": "", "source": None, "n_chars": 11},
    ])
    extend("embeddings", [
        {"vec_id": 9000001, "embedding": [0.0] * 64, "label": 0},    # zero norm
        {"vec_id": 9000002, "embedding": [], "label": None},         # empty
        {"vec_id": 9000003, "embedding": [1.0, 2.0], "label": 1},    # wrong dim
        {"vec_id": 9000004, "embedding": None, "label": 2},          # NULL
        {"vec_id": 9000005, "embedding": [-1e30] * 64, "label": 3},  # magnitude bomb
        {"vec_id": 9000006, "embedding": [float("nan")] + [0.0] * 63,
         "label": 4},                                                # NaN component
        {"vec_id": 9000007, "embedding": [float("inf")] + [1.0] * 63,
         "label": 5},                                                # Inf component
        {"vec_id": 9000008, "embedding": [1e300] * 64, "label": 6},  # overflow-to-inf dot
    ])
    extend("events", [
        {"event_id": 9000001, "ts": NOW, "user_id": 9000001, "event_type": "",
         "value": 0.0, "props": "{broken json"},
        {"event_id": 9000002, "ts": None, "user_id": 9000001, "event_type": None,
         "value": None, "props": None},
        {"event_id": 9000003, "ts": EPOCH, "user_id": None, "event_type": "view",
         "value": -1e30, "props": "{}"},
        {"event_id": 9000004, "ts": FAR, "user_id": 9000002, "event_type": "purchase",
         "value": 1e30, "props": "[]"},
        {"event_id": 9000005, "ts": NOW, "user_id": 9000003, "event_type": "view",
         "value": float("nan"), "props": "{}"},
    ])
    extend("orders", [
        {"o_orderkey": 9000001, "o_custkey": 9000001, "o_orderstatus": "",
         "o_totalprice": 0.0, "o_orderdate": None, "o_orderpriority": None},
        {"o_orderkey": 9000002, "o_custkey": None, "o_orderstatus": None,
         "o_totalprice": None, "o_orderdate": EPOCH, "o_orderpriority": ""},
        {"o_orderkey": 9000003, "o_custkey": 9000001, "o_orderstatus": "X",
         "o_totalprice": -1e30, "o_orderdate": FAR, "o_orderpriority": "9-POISON"},
    ])
    extend("lineitem", [
        {"l_orderkey": 9000001, "l_partkey": 9000001, "l_suppkey": 9000001,
         "l_linenumber": 1, "l_quantity": 0.0, "l_extendedprice": None,
         "l_discount": 1.0, "l_tax": None, "l_returnflag": None,
         "l_linestatus": "", "l_shipdate": None},
        {"l_orderkey": 9000002, "l_partkey": None, "l_suppkey": None,
         "l_linenumber": None, "l_quantity": -1.0, "l_extendedprice": -1e30,
         "l_discount": 0.0, "l_tax": 2.0, "l_returnflag": "Z",
         "l_linestatus": "Z", "l_shipdate": EPOCH},
    ])
    extend("customer", [
        {"c_custkey": 9000001, "c_name": None, "c_nationkey": None,
         "c_acctbal": None, "c_mktsegment": ""},
    ])
    extend("supplier", [
        {"s_suppkey": 9000001, "s_name": "", "s_nationkey": None, "s_acctbal": -0.0},
    ])
    extend("part", [
        {"p_partkey": 9000001, "p_name": "", "p_brand": None, "p_type": "",
         "p_size": None, "p_retailprice": 0.0},
    ])
    for t in ("region", "nation"):
        shutil.copy(os.path.join(src, t + ".parquet"),
                    os.path.join(dst, t + ".parquet"))


def build_unicode_dir(src: str, dst: str) -> None:
    """The unicode-storm variant (r16): documents whose text stresses
    char-vs-byte semantics — the divergence class the r16 triage found
    in CSV/XML round-trips and byte-cycled hashing. Code-point LENGTH
    agrees across Python/Spark/DuckDB (probed), so n_chars stays
    len(text); what can diverge is regex tokenization, escaping,
    substring chunking, and anything hashing BYTES. Every other table
    copies through unchanged."""
    import shutil as _sh

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    docs = [
        ("emoji zwj", "👩‍💻 writes 🧑‍🔬 tests 👨‍👩‍👧‍👦 families"),
        ("astral", "𝄞 music 𝕊𝕡𝕒𝕣𝕜 and 🂡 cards"),
        ("combining", "éclair café ñ and å"),
        ("rtl mix", "שלום world مرحبا spark עברית"),
        ("nbsp thin", "a b c d the end"),
        ("controls", "tab\there\nnewline\rreturn and \"quotes\" \\ slash"),
        ("long word", "w" * 4000),
        ("cjk dense", "数据处理引擎对比测试 中文分词 没有空格"),
        ("mixed digits", "user_42 ID-7 3.14159 0xDEAD_beef __init__"),
        ("quote storm", "'single' \"double\" `back` '''triple''' \"\""),
    ]
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    rows = [{"doc_id": 9100000 + i, "text": tx, "lang": "xx",
             "source": "unicode", "n_chars": len(tx)}
            for i, (_, tx) in enumerate(docs)]
    extra = pa.Table.from_pylist(rows, schema=t.schema)
    pq.write_table(pa.concat_tables([t, extra]),
                   os.path.join(dst, "documents.parquet"))
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        _sh.copy(os.path.join(src, name + ".parquet"),
                 os.path.join(dst, name + ".parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/poison_sf")
    ap.add_argument("--only", nargs="*", help="restrict to these queries")
    args = ap.parse_args()

    build_poison_dir(args.src, args.dst)

    import __spark_entry__ as e
    from cql_replicator_spark.session import get_spark
    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    qs = e.queries()
    names = args.only or sorted(qs)
    failures = []
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sweeplib import check_fallbacks, forced_count
    fallbacks: list[str] = []
    for name in names:
        try:
            # forced evaluation, NOT count(): count's projection pruning
            # green-lit four executor crashers for six rounds (sweeplib)
            n = forced_count(qs[name](spark, args.dst),
                             name=name, fallbacks=fallbacks)
            print(f"OK   {name}: {n}", flush=True)
        except Exception as ex:  # noqa: BLE001 — the sweep's whole point
            first = str(ex).split("\n")[0][:200]
            failures.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {first}", flush=True)
    offending = check_fallbacks(fallbacks)
    print(f"DONE ok={len(names) - len(failures)} fail={len(failures)} "
          f"count_fallbacks={len(fallbacks)}")
    if failures:
        print("failing:", ", ".join(failures))
    if offending:
        # a count() fallback is weaker evidence, not a pass — gate it
        print("non-whitelisted count() fallbacks (sweep coverage hole):",
              ", ".join(offending))
    return 1 if failures or offending else 0


if __name__ == "__main__":
    raise SystemExit(main())
