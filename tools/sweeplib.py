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
itself cannot ANSI-overflow (summing raw 64-bit hashes does).

Lanes whose output types to_json cannot serialize fall back to
count() — and since r16 that fallback is a GATED event, not a silent
warning: the r15 blind spot was precisely a sweep action that looked
green while skipping evaluation, so an unnoticed fallback would
reopen it for any lane that ever grows an unserializable output
column. Sweeps pass a ``fallbacks`` list; ``check_fallbacks`` returns
the non-whitelisted hits and the sweeps FAIL on any. The whitelist is
empty today (every registered lane's output serializes) and is
shrink-only: adding to it requires a per-entry argument that count()
suffices for that lane.
"""

from __future__ import annotations

# Lanes allowed to verify via count() because their output type cannot
# be serialized by to_json. EMPTY by design — every registered lane's
# output currently to_json-serializes, so any fallback is a regression
# in sweep coverage until argued here (shrink-only, per-entry reason).
FORCED_COUNT_FALLBACK_WHITELIST: frozenset[str] = frozenset()


def forced_count(df, name: str | None = None,
                 fallbacks: list[str] | None = None) -> int:
    """Row count computed through a full-evaluation action.

    ``name``/``fallbacks``: sweep bookkeeping — when the to_json probe
    is unsupported for the frame's output type, the lane name is
    recorded so the sweep can gate on it (see module docstring).
    """
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
            if fallbacks is not None:
                fallbacks.append(name or "?")
            print(f"  [sweeplib] to_json probe unsupported "
                  f"({str(exc).splitlines()[0][:80]}) — count() fallback")
            return df.count()
        raise


def check_fallbacks(fallbacks: list[str]) -> list[str]:
    """Non-whitelisted lanes that hit the count() fallback this sweep —
    the sweep must FAIL when this is non-empty (a fallback is silently
    weaker evidence: count() green-lit four executor crashers for six
    rounds)."""
    return sorted(set(fallbacks) - FORCED_COUNT_FALLBACK_WHITELIST)
