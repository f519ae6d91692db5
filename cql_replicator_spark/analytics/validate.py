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
    """Distinct values / total rows for ``col`` (1.0 = key-like)."""
    return Check(
        f"uniqueness_{col}",
        F.countDistinct(F.col(col)).cast("double") / F.count(F.lit(1)),
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
) -> DataFrame:
    """Fraction of child rows whose ``child_col`` exists in
    ``parent[parent_col]`` — long-form single row, schema-compatible
    with ``validate`` for unioning into one suite result.

    Built as ONE left join + ONE aggregation counting total and matched
    rows together — the child (fact, the 100 TB side) scans once;
    Catalyst/AQE broadcasts the deduplicated parent side when small.
    """
    parents = (parent.select(F.col(parent_col).alias(child_col))
               .distinct().withColumn("__hit", F.lit(1)))
    row = (child.select(child_col)
           .join(parents, child_col, "left")
           .agg(F.count(F.lit(1)).alias("__total"),
                F.count("__hit").alias("__matched"))
           .collect()[0])
    total, matched = row["__total"], row["__matched"]
    if total == 0:
        raise ValueError("referential_integrity on an empty child frame")
    frac = matched / total
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"ref_{child_col}", round(frac, 6), frac >= at_least)],
        "check STRING, metric DOUBLE, passed BOOLEAN",
    )
