"""Distributed global rank / running-sum utility (distrank.py): the
two-pass range-partitioned formulation must be row-for-row identical to
the single-partition window it replaces — ranks, running sums, ties,
descending orders, floats, empty frames, n_ranges far above the row
count. These pins are what lets the registered lanes swap their
partition-less windows for the distributed form with oracles unchanged."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from cql_replicator_spark.distrank import global_rank_cumsum


def _reference(df, order, sum_cols, rank_col):
    exprs = [F.col(c).desc() if d else F.col(c).asc() for c, d in order]
    w = Window.orderBy(*exprs)
    out = df.withColumn(rank_col, F.row_number().over(w).cast("long"))
    for out_col, src in (sum_cols or {}).items():
        out = out.withColumn(out_col, F.sum(src).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return out


def _assert_same(df, order, sum_cols=None, rank_col="rank", n_ranges=7):
    got = sorted(
        global_rank_cumsum(df, order, sum_cols=sum_cols, rank_col=rank_col,
                           n_ranges=n_ranges).collect(),
        key=lambda r: r[rank_col])
    want = sorted(_reference(df, order, sum_cols, rank_col).collect(),
                  key=lambda r: r[rank_col])
    assert [tuple(sorted(r.asDict().items())) for r in got] == \
        [tuple(sorted(r.asDict().items())) for r in want]


def test_rank_and_cumsum_match_window_reference(spark):
    df = spark.range(500).select(
        (F.col("id") * 37 % 101).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 13 + 1).alias("v"))
    _assert_same(df, [("k", False), ("uid", False)], {"cum_v": "v"})


def test_descending_order_with_heavy_ties(spark):
    # 500 rows over 5 distinct keys: equal keys co-locate in one range
    # partition and the unique tiebreak keeps numbering deterministic
    df = spark.range(500).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("uid"),
        F.lit(2).cast("long").alias("v"))
    _assert_same(df, [("k", True), ("uid", False)], {"cum_v": "v"})


def test_double_order_key_long_sums(spark):
    df = spark.range(300).select(
        (F.col("id").cast("double") * -0.25).alias("s"),
        F.col("id").alias("uid"),
        (F.col("id") % 7).cast("long").alias("n"))
    _assert_same(df, [("s", False), ("uid", False)], {"cum_n": "n"})


def test_more_ranges_than_rows_and_rank_only(spark):
    df = spark.range(5).select(F.col("id").alias("k"))
    _assert_same(df, [("k", True)], None, rank_col="r", n_ranges=64)


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("k"),
                               F.col("id").alias("v"))
    out = global_rank_cumsum(df, [("k", False)], {"cum": "v"})
    assert out.count() == 0
    assert {"k", "v", "rank", "cum"} <= set(out.columns)


def _load_explain_audit():
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "explain_audit", root / "tools" / "explain_audit.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_has_no_partitionless_window(spark):
    """The whole point: the distrank output's physical plan must contain
    only windows WITH a partition spec (the _pid-local pass). Detection
    uses the same signature tools/explain_audit.py gates every
    registered plan with (a partition-less Window's Arguments line has
    <3 top-level bracket groups)."""
    mod = _load_explain_audit()
    df = spark.range(100).select((F.col("id") % 9).alias("k"),
                                 F.col("id").alias("uid"),
                                 F.lit(1).cast("long").alias("v"))
    out = global_rank_cumsum(df, [("k", False), ("uid", False)],
                             {"cum": "v"})
    emode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = out._jdf.queryExecution().explainString(emode)
    assert "Window" in plan, "expected the _pid-partitioned window pass"
    assert mod.global_window_args(plan) == []


def test_detector_flags_partitionless_window(spark):
    """Detector sanity in both directions: a genuinely global window IS
    flagged (guards the gate itself against a rendering change that
    would silently blind it)."""
    mod = _load_explain_audit()
    df = spark.range(10).select(F.col("id").alias("k"))
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("k")))
    emode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = bad._jdf.queryExecution().explainString(emode)
    flagged = mod.global_window_args(plan)
    assert len(flagged) == 1 and "row_number" in flagged[0]
