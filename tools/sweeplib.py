"""Shared forced-evaluation action for the degenerate/poison sweeps.

The sweeps originally validated lanes with ``df.count()`` — but count
lets Catalyst PRUNE the output projection: an Aggregate keeps only its
grouping keys, a Project collapses entirely, so a lane whose final
expressions crash on adversarial rows still "passes" the sweep. The
r15 poison ORACLE run (which collects real values) exposed four
executor crashers the count-based sweeps had green-lit for six rounds
(ANSI overflow in random-projection quantize, two un-try'd decimal
casts, one un-try'd double->long cast).

``forced_count`` closes that hole: hashing ``to_json(struct(*))`` of
every output column inside an aggregate forces Catalyst to evaluate
the FULL row (the hash depends on every column, so nothing prunes),
while collecting only one driver-side row — no driver-memory
proportionality. ``to_json`` handles nested arrays/structs/maps/binary
uniformly; the hash is cast to double before summing so the probe
itself cannot ANSI-overflow (summing raw 64-bit hashes does). Lanes
whose output types to_json cannot serialize fall back to count() with
a warning rather than silently passing.
"""

from __future__ import annotations


def forced_count(df) -> int:
    """Row count computed through a full-evaluation action."""
    from pyspark.sql import functions as F

    try:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(F.to_json(F.struct(
                *[F.col(c) for c in df.columns]))).cast("double"))
            .alias("h"),
        ).first()
        return int(row["n"])
    except Exception as exc:
        # only the PROBE's analysis may fail here (unserializable output
        # type); execution errors from the lane itself re-raise so the
        # sweep sees them
        from pyspark.errors import AnalysisException
        if isinstance(exc, AnalysisException):
            print(f"  [sweeplib] to_json probe unsupported "
                  f"({str(exc).splitlines()[0][:80]}) — count() fallback")
            return df.count()
        raise
