"""Runner loop, reconciliation pipeline, streaming."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cql_replicator_spark.config import Transformation
from cql_replicator_spark.ledger import Ledger
from cql_replicator_spark.reconcile import (
    EXIT_BAD_ARGS, ReconcileError, ReconcileJob,
)
from cql_replicator_spark.runner import CdcPipeline, StatsStore, StopSentinel
from cql_replicator_spark.snapshot import SnapshotStore
from cql_replicator_spark.streaming.microbatch import state_at, time_slices
from cql_replicator_spark.streaming.windows import (
    run_stream_to_memory, stream_events_from_dir, windowed_event_counts,
)


def _make_pipeline(spark, tables, tmp_path, sink=None, mod=10):
    orders = tables["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("pk"),
        (F.col("o_orderkey") % 1000).alias("ts"))
    state = {"mod": mod}
    return CdcPipeline(
        spark=spark, keyspace="tpch", table="orders", pk_cols=["pk"],
        source=lambda: orders,
        pk_source=lambda: base.filter(F.col("pk") % state["mod"] != 0),
        store=SnapshotStore(str(tmp_path / "snaps"), "tpch", "orders"),
        ledger=Ledger(str(tmp_path / "ledger.json")),
        stats=StatsStore(str(tmp_path / "stats")),
        total_tiles=4, max_workers=2,
    ), state


def test_cdc_pipeline_full_cycle(spark, tables, tmp_path):
    captured = []
    pipe, state = _make_pipeline(spark, tables, tmp_path)
    pipe.sink = lambda changes, tile, batch_id: captured.append(
        (tile, changes.inserts.count(), changes.deletes.count(), changes.updates.count()))

    # cycle 1: historical load
    assert sorted(pipe.discover()) == [0, 1, 2, 3]
    stats1 = pipe.replicate()
    assert len(stats1) == 4
    total_loaded = sum(s.insertedPrimaryKeys for s in stats1)
    assert total_loaded == pipe.pk_source().count()

    # cycle 2: mutate source (mod 10 -> 7), expect delta
    state["mod"] = 7
    pipe.discover()
    captured.clear()
    stats2 = pipe.replicate()
    ins = sum(s.insertedPrimaryKeys for s in stats2)
    dels = sum(s.deletedPrimaryKeys for s in stats2)
    keys = [r.pk for r in tables["orders"].select(F.col("o_orderkey").alias("pk")).collect()]
    t0 = {k for k in keys if k % 10 != 0}
    t1 = {k for k in keys if k % 7 != 0}
    assert ins == len(t1 - t0) and dels == len(t0 - t1)
    assert len(captured) == 4  # sink invoked per tile

    # stats aggregated on disk
    st = pipe.stats.get("tpch", "orders", 0, "replication")
    assert st is not None and st["insertedPrimaryKeys"] > 0


def test_discovery_skips_unconsumed_tiles(spark, tables, tmp_path):
    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    assert len(pipe.discover()) == 4
    # no replication happened -> second discovery must skip all tiles
    assert pipe.discover() == []


def test_run_loop_with_stop_sentinel(spark, tables, tmp_path):
    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    stop = StopSentinel(str(tmp_path / "stopRequested"))
    assert pipe.run_loop(stop, max_cycles=2) == 2
    stop.request()
    assert pipe.run_loop(stop, max_cycles=5) == 0  # sentinel consumed before cycle 1
    assert not os.path.exists(stop.path)  # sentinel deleted


# -- reconcile ----------------------------------------------------------------

def test_reconcile_detects_divergence(spark, tables, tmp_path):
    orders = tables["orders"]
    src = orders.select(F.col("o_orderkey").alias("pk"))
    trg = src.filter(F.col("pk") % 11 != 0).unionByName(
        src.filter(F.col("pk") % 13 == 0).select((F.col("pk") + 10_000_000).alias("pk")))
    job = ReconcileJob(spark, str(tmp_path), ["pk"], total_tiles=4, sample_size=5)
    res = job.run(src, trg)
    keys = {r.pk for r in src.collect()}
    missing = {k for k in keys if k % 11 == 0}
    extra = {k + 10_000_000 for k in keys if k % 13 == 0}
    assert res.source_minus_target == len(missing)
    assert res.target_minus_source == len(extra)
    assert res.intersection_count == len(keys) - len(missing)
    assert not res.in_sync and res.status == "SUCCEEDED"
    assert len(res.samples_missing) == 5
    # report written
    with open(tmp_path / "report.json") as f:
        report = json.load(f)
    assert report["status"] == "SUCCEEDED"


def test_reconcile_in_sync_after_replication(spark, tables, tmp_path):
    """Replicate-then-reconcile -> empty diff (the self-check from SURVEY §5)."""
    orders = tables["orders"]
    src = orders.select(F.col("o_orderkey").alias("pk"))
    job = ReconcileJob(spark, str(tmp_path), ["pk"], total_tiles=2)
    res = job.run(src, src)
    assert res.in_sync and res.source_count == res.target_count


def test_reconcile_with_pk_transform(spark, tables, tmp_path):
    """Source PK hashed on the way in; target holds hashed keys (R:63-73)."""
    orders = tables["orders"]
    src = orders.select(F.col("o_orderkey").cast("string").alias("pk"))
    trg = src.select(F.md5("pk").alias("pk_h"))
    job = ReconcileJob(spark, str(tmp_path), ["pk"], total_tiles=2,
                       transforms=[Transformation(column="pk", rule="md5", alias="pk_h")])
    res = job.run(src, trg)
    assert res.in_sync


def test_reconcile_guardrails(spark, tmp_path):
    with pytest.raises(ReconcileError) as e:
        ReconcileJob(None, str(tmp_path), ["pk"], total_tiles=2000)
    assert e.value.exit_code == EXIT_BAD_ARGS


def test_reconcile_partial_report_on_failure(spark, tables, tmp_path):
    orders = tables["orders"]
    src = orders.select(F.col("o_orderkey").alias("pk"))
    trg = orders.select(F.col("o_orderkey").alias("other_name"))
    job = ReconcileJob(spark, str(tmp_path), ["pk"], total_tiles=2)
    with pytest.raises(ReconcileError):
        job.run(src, trg)
    with open(tmp_path / "report.json") as f:
        report = json.load(f)
    assert report["status"] == "FAILED" and report["phase"] == "target_scan"


# -- streaming ------------------------------------------------------------------

def test_windowed_counts_batch_equals_streaming(spark, tables, tmp_path):
    events = tables["events"]
    batch = windowed_event_counts(events).orderBy("wstart", "event_type")
    batch_rows = [(r.wstart, r.event_type, r.n_events, r.total_value)
                  for r in batch.collect()]

    # stream the same data from a parquet dir, one file per micro-batch
    stream_dir = str(tmp_path / "stream_in")
    events.repartition(4).write.parquet(stream_dir)
    stream = stream_events_from_dir(spark, stream_dir, events.schema)
    assert stream.isStreaming
    agg = windowed_event_counts(stream)
    run_stream_to_memory(agg, "win_counts", output_mode="complete")
    stream_rows = [(r.wstart, r.event_type, r.n_events, r.total_value)
                   for r in spark.table("win_counts")
                   .orderBy("wstart", "event_type").collect()]
    assert stream_rows == batch_rows


def test_microbatch_cdc_over_event_slices(spark, tables, tmp_path):
    """Replay event-time slices through the CDC pipeline: row counts per
    state must be non-decreasing inserts, ledger must rotate cleanly."""
    events = tables["events"]
    cuts = time_slices(events, 3)
    states = [state_at(events, c) for c in cuts]
    # each state is a valid snapshot input: keys unique
    for st in states:
        assert st.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0

    from cql_replicator_spark.diff import compute_changes
    cs = compute_changes(states[1], states[0], ["user_id", "event_type"])
    assert cs.deletes.count() == 0          # append-only source: no deletes
    assert cs.inserts.count() >= 0
    n_updates = cs.updates.count()
    # updates = keys whose latest-event ts moved between slices
    a = {(r.user_id, r.event_type): r.ts for r in states[0].collect()}
    b = {(r.user_id, r.event_type): r.ts for r in states[1].collect()}
    expected_updates = sum(1 for k in a if k in b and a[k] != b[k])
    assert n_updates == expected_updates


def test_session_func_late_event_never_shrinks_session():
    """An out-of-order event admitted by the watermark must not move
    session_end backwards, and the rearm timeout must stay strictly above
    the current watermark (Spark throws on timeout <= watermark)."""
    import pandas as pd

    from cql_replicator_spark.streaming.stateful import _session_func

    class FakeState:
        hasTimedOut = False

        def __init__(self, tup, watermark_ms):
            self._tup = tup
            self._wm = watermark_ms
            self.timeout = None

        @property
        def exists(self):
            return self._tup is not None

        @property
        def get(self):
            return self._tup

        def update(self, tup):
            self._tup = tup

        def setTimeoutTimestamp(self, ts):
            assert ts > self._wm, f"timeout {ts} <= watermark {self._wm}"
            self.timeout = ts

        def getCurrentWatermarkMs(self):
            return self._wm

        def remove(self):
            self._tup = None

    fn = _session_func(gap_ms=1000)
    # session (1000, 5000, 3); watermark already at 6000 == end+gap
    state = FakeState((1000, 5000, 3), watermark_ms=6000)
    out = list(fn((42,), [pd.DataFrame({"ts_ms": [4000]})], state))
    assert out == []                      # late event joins, nothing closes
    assert state.get == (1000, 5000, 4)   # end NOT shrunk, count bumped
    assert state.timeout == 6001          # clamped strictly above watermark

    # an event before session start extends start backwards
    state = FakeState((1000, 5000, 3), watermark_ms=0)
    list(fn((42,), [pd.DataFrame({"ts_ms": [600]})], state))
    assert state.get == (600, 5000, 4)
    assert state.timeout == 6000


def test_stateful_sessionization_equals_batch(spark, tmp_path):
    """applyInPandasWithState streaming sessions == batch window sessions."""
    from pyspark.sql import functions as F

    from cql_replicator_spark.queries import REGISTRY, queries as _q
    from cql_replicator_spark.streaming.stateful import sessionize_events_stream

    _q()
    sf = "/root/testdata/sf0.001"
    streamed = sessionize_events_stream(
        spark, sf, input_dir=str(tmp_path / "stage"))
    batch = REGISTRY["events_sessionize"].build(spark, sf).select(
        "user_id",
        F.unix_millis(F.col("session_start").cast("timestamp")).alias("session_start"),
        F.unix_millis(F.col("session_end").cast("timestamp")).alias("session_end"),
        "n_events")
    srows = sorted(map(tuple, streamed.collect()))
    brows = sorted(map(tuple, batch.collect()))
    assert srows == brows and len(srows) > 0
