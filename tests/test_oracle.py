"""Local replica of the driver's correctness gate: run every registered
query through Spark AND its DuckDB oracle SQL, compare row count, column
names, and (order-insensitively) every value."""

import math

import duckdb
import pandas as pd
import pytest

from cql_replicator_spark.queries import REGISTRY, _ensure_all_registered

_ensure_all_registered()  # pull in every registration module

from conftest import SF_DIR

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].map(lambda v: isinstance(v, (list, tuple))
                       or hasattr(v, "tolist")).any():
            # array cells (Spark -> ndarray, DuckDB -> list) are
            # unsortable/unhashable for pandas: canonicalize to tuples
            df[c] = df[c].map(
                lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                if v is not None else None)
    return df.sort_values(
        by=list(df.columns),
        key=lambda s: s.map(repr) if s.map(
            lambda v: isinstance(v, tuple)).any() else s,
    ).reset_index(drop=True)


def _assert_frames_equal(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}")
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}")
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x != x and y != y:
                continue  # NaN/NaT are not self-equal; both-null matches
            if isinstance(x, float) and isinstance(y, float):
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r} (exact float mismatch)"
            else:
                assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"


def _assert_driver_compatible_schema(df, name: str):
    """The driver's pandas canonicalizer sorts the result frame and
    hashes cell values — ArrayType/MapType cells surface as Python
    lists/dicts that pandas can neither sort nor hash (the r5
    text_inverted_index err row). Ban them from every REGISTERED output
    schema; library functions may still return arrays, the registration
    must scalarize (array_join / to_json) before returning."""
    from pyspark.sql.types import ArrayType, MapType

    bad = [f.name for f in df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType))]
    assert not bad, (
        f"{name}: registered output columns {bad} are Array/Map-typed — "
        f"the driver canonicalizer cannot sort/hash them; scalarize "
        f"(F.array_join / F.to_json) in the registration")


def _driver_canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the driver's order-insensitive canonicalization — a
    plain pandas sort over all columns with NO tuple rescue. Any output
    shape this raises on (unhashable cells, unsortable mixes) would burn
    a driver window slot as an err row, so it must fail locally first."""
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle])
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.build(spark, SF_DIR)
    _assert_driver_compatible_schema(sdf, name)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(spec.oracle).df()
    try:
        _driver_canonicalize(spark_pdf)
        _driver_canonicalize(duck_pdf)
    except TypeError as e:  # pragma: no cover - failure path
        raise AssertionError(
            f"{name}: output not driver-canonicalizable: {e}") from e
    _assert_frames_equal(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if not s.oracle])
def test_rows_only_queries_run(spark, name):
    df = REGISTRY[name].build(spark, SF_DIR)
    _assert_driver_compatible_schema(df, name)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


def test_check_priority_order_is_valid():
    """The driver checks a bounded ~50-query window of queries() in
    iteration order. The ordering rule (touched-this-round first, then
    stalest-driver-evidence first) is COMPUTED from the committed
    CORRECTNESS_r*.json artifacts — this test pins the rule's shape so
    neither a typo in _TOUCHED_THIS_ROUND nor a regression in the
    computation can silently burn correctness slots."""
    from cql_replicator_spark import queries as Q

    reg = Q.queries()
    order = list(reg)
    assert set(reg) == set(Q.REGISTRY), "ordering must not drop entries"
    assert len(order) == len(set(order)), "duplicate names in ordering"

    touched = Q._TOUCHED_THIS_ROUND
    missing = [n for n in touched if n not in Q.REGISTRY]
    assert not missing, f"_TOUCHED_THIS_ROUND names not registered: {missing}"
    assert order[: len(touched)] == touched, \
        "touched-this-round queries must lead the driver window"

    # stalest-first beyond the touched block: no query outside the
    # 50-row driver window may have STALER evidence than one inside it
    evidence = Q._driver_evidence_rounds()
    window, rest = order[len(touched):50], order[50:]
    if window and rest:
        assert max(evidence.get(n, -1) for n in window) \
            <= min(evidence.get(n, -1) for n in rest), \
            "driver window skipped a staler query"

    # queries with NO driver evidence at all (brand-new) must be in the
    # window — they are the least-verified entries by definition. When a
    # round registers MORE than 50 brand-new queries the window cannot
    # hold them all; the invariant then weakens to "every window slot is
    # spent on a never-checked query" (the overflow carries to the next
    # round, which the evidence-based ordering fronts automatically).
    never = [n for n in Q.REGISTRY if n not in evidence]
    out = [n for n in never if n not in order[:50]]
    if len(never) <= 50:
        assert not out, \
            f"never-driver-checked queries outside the window: {out}"
        # the overflow acknowledgement is a per-round decision: once
        # the backlog fits the window again it must be reset, or a
        # future registration wave could overflow silently
        assert not getattr(Q, "_WINDOW_OVERFLOW_ACK", False), \
            "_WINDOW_OVERFLOW_ACK left True with no overflow; reset it"
    else:
        # The window arithmetic: "every registered query driver-green"
        # is reachable only if (touched + never-checked backlog + new
        # registrations) <= 50 per round. Overflowing is allowed only
        # as an acknowledged, deliberate choice (the r5 wave did it by
        # default and left a 39-query verification debt).
        assert getattr(Q, "_WINDOW_OVERFLOW_ACK", False), (
            f"{len(never)} never-checked queries exceed the 50-slot "
            f"driver window; registration outran verification. Either "
            f"freeze registration until the backlog clears, or set "
            f"_WINDOW_OVERFLOW_ACK = True in queries.py to acknowledge "
            f"the deliberate overflow.")
        wasted = [n for n in order[:50] if n not in never]
        assert not wasted, \
            f"window slots spent on evidenced queries while " \
            f"{len(out)} never-checked overflow: {wasted}"


def test_plans_audit_in_sync_and_no_cartesian():
    """PLANS.md is the committed physical-plan evidence: every
    registered query must have an audited section (forcing
    tools/explain_audit.py to be re-run when queries are added), and no
    audited plan may contain a CartesianProduct — the O(n^2) plan shape
    this engine bans (BroadcastNestedLoopJoins are reviewed case by
    case; a cartesian is always a bug)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "PLANS.md").read_text()
    sections = {m.group(1) for m in re.finditer(r"^## (\S+)", text, re.M)}
    missing = sorted(set(REGISTRY) - sections)
    assert not missing, f"queries missing from PLANS.md audit: {missing}"
    assert "CartesianProduct" not in text, "cartesian product in an audited plan"


# Queries whose audited plan carries a partition-less Window that is
# PROVABLY bounded: the windowed frame's row count is a config literal
# or a tiny fixed domain, never proportional to the data. Everything
# else with the mark fails test_no_unbounded_global_windows — the gate
# the r12 verdict prescribed after eight data-proportional
# single-partition windows survived twelve rounds of by-hand review.
_BOUNDED_GLOBAL_WINDOWS = {
    # rank over <= pool rows: orderBy().limit(pool) precedes the window
    # (text.py bpe_top_pairs_batched, pinned bounded head)
    "bpe_top_pairs_batched",
    # rank over <= 50 DISTINCT spend values post-limit(50); the
    # corpus-sized frame is never windowed (queries.py)
    "customer_spend_rank",
    # 8 config rows (divisors of 128) — a planner table, not data
    "dedup_lsh_tuning_table",
    # one row per DISTINCT event_type — a schema-sized enum domain
    "events_type_bitmap_profile",
    # one row per nation (25) — dimension-table-sized by construction
    "orders_revenue_share",
    # two rank windows, each over a limit(100) candidate list
    "retrieval_hybrid_rrf",
    # cumulative walk over <= bins histogram rows (sketch constant)
    "sketch_quantile_histogram",
}


def test_no_unbounded_global_windows():
    """A Window with no partition spec moves EVERY input row into one
    partition ("WARN WindowExec: No Partition Defined..."). — correct,
    but a serial bottleneck that grows with the data, the plan-shape
    class the r12 audit found in 8 lanes after it had survived twelve
    rounds unflagged. tools/explain_audit.py stamps a GLOBAL-WINDOW
    marker under every audited section whose full plan contains one;
    this gate fails any marked section that is not in the
    justified-bounded whitelist above, and fails STALE whitelist
    entries too (an entry whose plan no longer carries the mark must
    be removed, so the list can only shrink unless a new bounded use
    is argued in review)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "PLANS.md").read_text()
    parts = re.split(r"^## (\S+)\s*$", text, flags=re.M)
    marked = {parts[i] for i in range(1, len(parts), 2)
              if "GLOBAL-WINDOW (partition-less):" in parts[i + 1]}
    unbounded = sorted(marked - _BOUNDED_GLOBAL_WINDOWS)
    assert not unbounded, (
        f"partition-less Window over a data-proportional frame in: "
        f"{unbounded}. Fix the plan (distrank.global_rank_cumsum / "
        f"orderBy().limit(k)) or justify boundedness in "
        f"_BOUNDED_GLOBAL_WINDOWS.")
    stale = sorted(_BOUNDED_GLOBAL_WINDOWS - marked)
    assert not stale, (
        f"whitelist entries whose plans no longer carry the mark: "
        f"{stale} — remove them so the whitelist stays tight.")


# Queries whose audited plan carries an Exchange with SinglePartition
# (or numPartitions=1) output partitioning that is PROVABLY bounded:
# the exchanged frame is at most a config-literal number of rows
# (post-limit(k) window passes, enum/config domains) — never
# proportional to the data. Same contract as the window whitelist:
# stale entries fail, so the list only shrinks unless a new bounded
# use is argued in review.
_BOUNDED_SINGLE_PARTITION_EXCHANGES = {
    # All four exchanges feed the already-whitelisted bounded global
    # windows of the same lanes (the detector auto-exempts the two
    # bounded-by-construction funnels — keyless partial aggregates and
    # LocalLimit — so only genuinely windowed frames reach this list):
    # 8 config rows (divisors of 128) — a planner table, not data
    "dedup_lsh_tuning_table",
    # one row per DISTINCT event_type — a schema-sized enum domain
    "events_type_bitmap_profile",
    # one row per nation (25) — dimension-table-sized by construction
    "orders_revenue_share",
    # cumulative walk over <= bins histogram rows (sketch constant)
    "sketch_quantile_histogram",
}


def test_no_single_partition_exchanges():
    """The sibling serial-funnel shape to a partition-less Window: an
    Exchange whose output partitioning is SinglePartition funnels every
    upstream row through one task. The kept "(N) Exchange" tree line in
    PLANS.md cannot show the partitioning (it lives on the un-kept
    Arguments detail line), which is exactly how a repartition(1) or an
    un-rewritten global limit would hide from the window gate —
    tools/explain_audit.py now stamps a SINGLE-PARTITION-EXCHANGE
    marker and this gate fails any marked section that is not in the
    justified-bounded whitelist above."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "PLANS.md").read_text()
    parts = re.split(r"^## (\S+)\s*$", text, flags=re.M)
    marked = {parts[i] for i in range(1, len(parts), 2)
              if "SINGLE-PARTITION-EXCHANGE:" in parts[i + 1]}
    unbounded = sorted(marked - _BOUNDED_SINGLE_PARTITION_EXCHANGES)
    assert not unbounded, (
        f"single-partition Exchange over a data-proportional frame in: "
        f"{unbounded}. Fix the plan (distrank / orderBy().limit(k) / "
        f"a partitioned exchange) or justify boundedness in "
        f"_BOUNDED_SINGLE_PARTITION_EXCHANGES.")
    stale = sorted(_BOUNDED_SINGLE_PARTITION_EXCHANGES - marked)
    assert not stale, (
        f"whitelist entries whose plans no longer carry the mark: "
        f"{stale} — remove them so the whitelist stays tight.")


# Queries whose audited plan (returned OR any action execution)
# carries a Coalesce(1) over a PROVABLY bounded frame: at most a
# config-bounded amount of work per task, never data-proportional.
# Same shrink-only contract as the other two whitelists.
_BOUNDED_SINGLE_TASK_COALESCES = {
    # the bin-packer writes ceil(total_bytes/target_bytes) files —
    # coalesce(1) appears only because the fixture total is below ONE
    # target_bytes (1 MiB in the lane); each output task is bounded by
    # the target size by construction, and at scale the same formula
    # yields thousands of parallel writers (parquet_sink.compact_parquet)
    "compact_small_files",
}


def test_no_single_task_coalesces():
    """Third serial-funnel shape: coalesce(1) narrows the ENTIRE
    upstream stage — scan included — into one task, without an
    Exchange node, so neither sibling gate can see it. It never shows
    in a returned plan's kept lines when a lane only uses it inside a
    .write action, which is exactly where the r13 audit found six
    data-proportional staging funnels. tools/explain_audit.py now
    stamps SINGLE-TASK-COALESCE for returned plans AND (ACTION-
    prefixed) for every execution a lane triggers while building,
    captured from the SQL status store; this gate fails any marked
    section not whitelisted as bounded, and fails stale whitelist
    entries."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "PLANS.md").read_text()
    parts = re.split(r"^## (\S+)\s*$", text, flags=re.M)
    marked = {parts[i] for i in range(1, len(parts), 2)
              if "SINGLE-TASK-COALESCE:" in parts[i + 1]}
    unbounded = sorted(marked - _BOUNDED_SINGLE_TASK_COALESCES)
    assert not unbounded, (
        f"coalesce(1) over a data-proportional frame in: {unbounded}. "
        f"Write with repartition(k) (streaming staging: "
        f"stage_microbatches) or justify boundedness in "
        f"_BOUNDED_SINGLE_TASK_COALESCES.")
    stale = sorted(_BOUNDED_SINGLE_TASK_COALESCES - marked)
    assert not stale, (
        f"whitelist entries whose plans no longer carry the mark: "
        f"{stale} — remove them so the whitelist stays tight.")


def test_flagship_plan_scan_counts_pinned():
    """Structural perf regression guard: the expensive flagship queries
    earn their cost with SINGLE-PASS plan shapes (one corpus scan, df /
    norms as window aggregates over the flowing frame, bucket-grouped
    pair generation). An innocent refactor that re-derives a subtree
    per consumer multiplies corpus scans silently — at 100 TB that is
    the whole bill. Pin each section's 'Scan parquet' occurrence count
    in PLANS.md (kept fresh by the audit-sync test above; formatted
    explain prints each physical scan twice — tree line + detail
    block, so bound = 2 x physical scans)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "PLANS.md").read_text()
    parts = re.split(r"^## (\S+)\s*$", text, flags=re.M)
    scans = {parts[i]: parts[i + 1].count("Scan parquet")
             for i in range(1, len(parts), 2)}
    bounds = {
        "doc_winnowing_pairs": 2,        # 1 scan: shingle+window+pairs
        # r16 re-pin: the norm-branch shape (norms as a map-combined
        # groupBy branch instead of a full-stream id-window) prints the
        # tf/df-window subtree once per consumer in the STATIC plan (6
        # scans in text), but the EXECUTED plan serves the duplicates
        # from ReusedExchange and scans the corpus once — pinned at
        # runtime by test_sparse_cosine_norm_branch_reuses_corpus_subtree
        # (executed-plan scans <= 2) and evidenced in
        # plans/r16/text_sparse_cosine_pairs_after_executed.txt.
        "text_sparse_cosine_pairs": 12,

        # r11 re-pin: the lane returns the session-shared PERSISTED
        # pair frame (_shared_capped_lsh). Formatted explain prints the
        # InMemoryRelation's recovery lineage (sigs cached plan nested
        # inside pairs cached plan), so the TEXT shows 5 'Scan parquet'
        # occurrences — but execution reads the cache; the corpus is
        # scanned at most once, on the first lane's cache build.
        "dedup_minhash_lsh": 5,
        "doc_line_dedup": 2,             # 1: within-doc, no join
        "quality_bigram_logprob": 2,     # 1: join-free window-sum form
        "text_inverted_index": 2,        # 1: explode+agg+window
        "q1_pricing_summary": 2,         # 1: scan+agg
        "dedup_cluster_keepers": 2,      # 1: LSH+CC over checkpoints
        # r14: the returned plan reads the localCheckpoint-ed sized
        # frame (0 scans; the checkpoint action itself costs 2) — the
        # un-checkpointed form re-derived the scan->df-join->
        # collect_list subtree per consumer (8 corpus scans)
        "dedup_prefix_filter_jaccard": 0,
    }
    for name, bound in bounds.items():
        assert name in scans, f"{name} missing from PLANS.md"
        assert scans[name] <= bound, (
            f"{name}: {scans[name]} 'Scan parquet' occurrences in its "
            f"audited plan, pinned bound {bound} — a subtree is being "
            f"re-scanned; restore the single-pass form or consciously "
            f"re-pin with a docstring explaining the extra scan")


def test_correctness_ledger_tool():
    """tools/correctness_ledger.py is the committed answer to 'what is
    each query's latest driver evidence' — the judge and the window
    planner both read it. Pin its contract: every artifact entry is
    classified, rows-only (err='no_oracle' with a row count) is not a
    failure, and the exit status is red only on a real latest-evidence
    mismatch/err."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "correctness_ledger", root / "tools" / "correctness_ledger.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.classify({"err": "no_oracle", "spark_rows": 8}) == "rows-only"
    assert mod.classify({"err": "boom", "spark_rows": None}) == "err"
    assert mod.classify({"hash_match": True, "err": None}) == "green"
    assert mod.classify({"hash_match": False, "rows_match": True,
                         "err": None}) == "mismatch"
    # r8 advisor: null/missing spark_rows with no hash evidence must NOT
    # count as rows-only 'the query ran' evidence — and must not TypeError.
    assert mod.classify({"hash_match": None, "spark_rows": None,
                         "err": None}) == "unknown"
    assert mod.classify({}) == "unknown"
    assert mod.classify({"err": "no_oracle", "spark_rows": None}) == "err"

    ledger, registered = mod.build_ledger(root)
    assert set(registered) == set(REGISTRY)
    # later rounds supersede earlier evidence
    for name, rec in ledger.items():
        assert rec["round"] >= 1
    # the repo invariant this project defends: nothing red at latest
    bad = [n for n in registered
           if n in ledger and ledger[n]["status"] in ("mismatch", "err")]
    assert not bad, f"latest driver evidence red for: {bad}"
    # and the render runs
    out = mod.render(ledger, registered, full=True)
    assert "Correctness ledger" in out and "| query |" in out
