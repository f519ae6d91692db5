"""Declarative data-quality constraint suite (Deequ-style), compiled
to a SINGLE aggregation pass.

The reference validates replicated data with ad-hoc count/sample
reconciliation (R:660-825) and per-column stats (K:1719-1748); large
training-data pipelines need the generalized form: a set of declared
constraints (completeness, uniqueness, bounds, pattern compliance,
set membership) evaluated together. The 100 TB shape is the point:
every row-level constraint compiles to one aggregate expression, all
of them evaluated in ONE ``df.agg(...)`` over ONE scan — map-side
partial aggregation ships a handful of doubles per partition, and the
long-form (check, metric, passed) result is produced by exploding the
single aggregated row, never by re-scanning the table per check.

Referential integrity is the one constraint that genuinely needs a
second input; it is a separate helper built as a count over a
left-anti join (broadcast/AQE-decided, the semi-join-bandwidth
pattern), unioned onto the same long-form result.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declared constraint: an aggregate metric plus the closed
    interval [lo, hi] the metric must fall in to pass."""

    name: str
    metric: Column
    lo: float = -math.inf
    hi: float = math.inf


def completeness(col: str, at_least: float = 1.0) -> Check:
    """Fraction of rows with a non-null value in ``col``."""
    return Check(
        f"completeness_{col}",
        F.avg(F.col(col).isNotNull().cast("double")),
        lo=at_least,
    )


def uniqueness(col: str, at_least: float = 1.0) -> Check:
    """Distinct values / total rows for ``col`` (1.0 = key-like).
    try_divide: over an EMPTY frame the ratio is NULL (no evidence —
    metric NULL, passed NULL), matching the other aggregate checks'
    avg-over-nothing semantics instead of an ANSI DIVIDE_BY_ZERO."""
    return Check(
        f"uniqueness_{col}",
        F.try_divide(F.countDistinct(F.col(col)).cast("double"),
                     F.count(F.lit(1))),
        lo=at_least,
    )


def min_value(col: str, at_least: float) -> Check:
    return Check(f"min_{col}", F.min(F.col(col)).cast("double"), lo=at_least)


def max_value(col: str, at_most: float) -> Check:
    return Check(f"max_{col}", F.max(F.col(col)).cast("double"), hi=at_most)


def compliance(name: str, predicate: Column, at_least: float = 1.0) -> Check:
    """Fraction of rows satisfying an arbitrary boolean expression
    (null counts as non-compliant, like Deequ's compliance metric)."""
    return Check(
        f"compliance_{name}",
        F.avg(F.coalesce(predicate.cast("boolean"), F.lit(False)).cast("double")),
        lo=at_least,
    )


def pattern(col: str, regex: str, at_least: float = 1.0) -> Check:
    return compliance(f"pattern_{col}", F.col(col).rlike(regex), at_least)


def member_of(col: str, allowed: list, at_least: float = 1.0) -> Check:
    return compliance(f"set_{col}", F.col(col).isin(allowed), at_least)


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in ONE aggregation over ONE scan of ``df``.

    Returns the long-form frame (check STRING, metric DOUBLE,
    passed BOOLEAN), one row per check, metric rounded to 6 dp for
    cross-engine reproducibility. The explode runs on the single
    aggregated row, so the result costs nothing beyond the scan.
    """
    if not checks:
        raise ValueError("validate() needs at least one Check")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    aggs = [c.metric.cast("double").alias(f"_m{i}") for i, c in enumerate(checks)]
    one = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c.name).alias("check"),
            F.round(F.col(f"_m{i}"), 6).alias("metric"),
            ((F.col(f"_m{i}") >= F.lit(float(c.lo)))
             & (F.col(f"_m{i}") <= F.lit(float(c.hi)))).alias("passed"),
        )
        for i, c in enumerate(checks)
    ])
    return (
        one.select(F.explode(entries).alias("e"))
        .select("e.check", "e.metric", "e.passed")
    )


def referential_integrity(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    at_least: float = 1.0,
    require_rows: bool = False,
) -> DataFrame:
    """Fraction of child rows whose ``child_col`` exists in
    ``parent[parent_col]`` — long-form single row, schema-compatible
    with ``validate`` for unioning into one suite result.

    A ZERO-ROW child passes VACUOUSLY by default (passed=True, metric
    NULL — the avg-over-empty convention): an empty tile is routine at
    scale and must not fail a suite. But an unexpectedly empty child
    can mask upstream data loss — when emptiness itself is an error,
    set ``require_rows=True`` (empty child -> passed=False) or pair
    the suite with an explicit min-row-count check.

    Built as ONE left join + ONE aggregation counting total and matched
    rows together — the child (fact, the 100 TB side) scans once;
    Catalyst/AQE broadcasts the deduplicated parent side when small.

    Fully LAZY: the single-row long-form result is a DataFrame
    expression over the aggregate, not a collect()+createDataFrame
    round-trip — unioning it into a validate() suite yields ONE action
    computing both branches, and the driver never blocks on a child
    scan at suite-construction time (a full fact-table pass at scale).
    The zero-row-child edge rides the same expression: try_divide
    yields NULL for the metric and the CASE pins passed to the
    vacuous-pass (or require_rows) contract.
    """
    parents = (parent.select(F.col(parent_col).alias(child_col))
               .distinct().withColumn("__hit", F.lit(1)))
    frac = F.try_divide(F.col("__matched").cast("double"), F.col("__total"))
    return (child.select(child_col)
            .join(parents, child_col, "left")
            .agg(F.count(F.lit(1)).alias("__total"),
                 F.count("__hit").alias("__matched"))
            .select(
                F.lit(f"ref_{child_col}").alias("check"),
                F.round(frac, 6).alias("metric"),
                F.when(F.col("__total") == 0,
                       # zero child rows: vacuously satisfied (no row
                       # can violate the reference) unless the caller
                       # opted into require_rows (see docstring)
                       F.lit(not require_rows))
                 .otherwise(frac >= F.lit(float(at_least)))
                 .alias("passed")))


def row_violations(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    id_col: str | None = None,
) -> DataFrame:
    """Row-level rule evaluation with reasons — the quarantine half of
    a constraint suite (Deequ's row-level results / dbt's store_failures
    / DLT expectations with ``expect_or_drop``): ``validate()`` answers
    "is the dataset healthy", this answers "WHICH rows fail and WHY",
    which is what a pipeline needs to route bad rows to a DLQ table
    while the clean subset proceeds.

    ``rules`` are (name, boolean Column meaning PASS). Returns the
    input plus ``violations`` (sorted array of failed rule names; empty
    = clean) and ``quarantined`` (boolean). NULL rule results count as
    violations (a rule that cannot evaluate did not pass — same
    null-semantics as SQL CHECK constraints are *not*: CHECK lets NULL
    through, quarantine must not, because unevaluable rows are exactly
    the ones to hold).

    Pure per-row projection: every rule is a codegen predicate in one
    pass, no shuffle, no row inflation; split/aggregate afterwards as
    needed. At 100 TB this is scan-speed and the violating subset is
    usually tiny — filter pushdown on ``quarantined`` keeps the DLQ
    write proportional to the damage, not the table.
    """
    if not rules:
        raise ValueError("row_violations() needs at least one rule")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    entries = F.array_compact(F.array(*[
        F.when(~pred.eqNullSafe(F.lit(True)), F.lit(name))
        for name, pred in rules
    ]))
    out = df.withColumn("violations", F.array_sort(entries)) \
            .withColumn("quarantined", F.size("violations") > 0)
    return out


def quarantine_report(
    df: DataFrame,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """Per-rule violation totals + overall clean/quarantined row counts
    in one aggregation over one scan: explode the per-row violation
    arrays (clean rows contribute no explosion) and count per reason,
    then union the summary rows. Output (reason STRING, n BIGINT) with
    reasons '__clean__' / '__quarantined__' reserved for the totals.
    """
    flagged = row_violations(df, rules)
    per_rule = (flagged.select(F.explode("violations").alias("reason"))
                .groupBy("reason").agg(F.count("*").cast("long").alias("n")))
    # count(when(...)), not sum(when/otherwise): totals are COUNTS and
    # a count over zero rows is 0 — sum() over an empty frame is SQL
    # NULL, which NULL-poisoned both summary rows on empty input
    # (r15 empty-fixture oracle sweep)
    totals = flagged.agg(
        F.count(F.when(F.col("quarantined"), 1))
         .cast("long").alias("nq"),
        F.count(F.lit(1)).cast("long").alias("nt"))
    summary = totals.select(F.explode(F.array(
        F.struct(F.lit("__quarantined__").alias("reason"),
                 F.col("nq").alias("n")),
        F.struct(F.lit("__clean__").alias("reason"),
                 (F.col("nt") - F.col("nq")).alias("n")))).alias("e")) \
        .select("e.reason", "e.n")
    return per_rule.unionByName(summary)


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every row
    must share its quasi-identifier tuple with at least k-1 others or
    it is re-identifiable by linkage (Sweeney 2002). Returns one row
    per equivalence class: the quasi values, class size, and
    ``suppress`` = size < k — the set a release pipeline generalizes
    or drops before publishing.

    One map-side-combined groupBy on the quasi columns; the result is
    equivalence-class-sized. The audit aggregate (min class size,
    suppression rate) is derivable from this frame with a second
    trivially-small aggregation.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity() needs at least one quasi column")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").cast("long").alias("class_size"))
            .withColumn("suppress", F.col("class_size") < k))
