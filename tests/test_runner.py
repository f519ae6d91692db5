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


def test_pipeline_with_default_partitions(spark, tables, tmp_path):
    """defaultPartitions formula wired through discovery: the tiled scan
    repartitions on the tile column (K:1845-1847) and the cycle still
    replicates exactly."""
    from cql_replicator_spark.config import default_partitions_for

    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    pipe.default_partitions = default_partitions_for(spark, pipe.total_tiles)
    assert pipe.default_partitions >= pipe.total_tiles
    assert sorted(pipe.discover()) == [0, 1, 2, 3]
    stats = pipe.replicate()
    assert sum(s.insertedPrimaryKeys for s in stats) == pipe.pk_source().count()


def test_discovery_skips_unconsumed_tiles(spark, tables, tmp_path):
    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    assert len(pipe.discover()) == 4
    # no replication happened -> second discovery must skip all tiles
    assert pipe.discover() == []


def test_discovery_lost_race_skips_tile_not_cycle(spark, tables, tmp_path):
    """The ledger contract allows ANY NUMBER of discovery processes; a
    rival that rotates a tile between our can_discover gate check and
    our record_discovery makes the record raise (the cross-process
    re-check protecting the unconsumed-snapshot invariant). The loser
    must treat that as 'tile taken' — skip it and rotate the rest —
    not crash the whole discovery cycle; the rival's unconsumed curr
    must survive untouched."""
    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    rival = Ledger(pipe.ledger.path)

    real_can = pipe.ledger.can_discover
    raced = []

    def can_then_rival_rotates(ks, tbl, tile):
        ok = real_can(ks, tbl, tile)
        if ok and tile == 1 and not raced:
            raced.append(tile)
            rival.record_discovery(ks, tbl, tile, snapshot_id=777)
        return ok

    pipe.ledger.can_discover = can_then_rival_rotates
    try:
        rotated = sorted(pipe.discover())  # must NOT raise
    finally:
        pipe.ledger.can_discover = real_can

    assert rotated == [0, 2, 3], rotated
    curr = pipe.ledger.get("tpch", "orders", 1, "curr")
    assert curr is not None and curr.location == "777", \
        "loser clobbered the rival's rotation"
    assert curr.load_status != "SUCCESS"
    # the lost tile replicates the RIVAL's snapshot id on the next pass
    plan = pipe.ledger.replication_plan("tpch", "orders", 1)
    assert plan == {"mode": "historical", "curr": 777}


def test_run_loop_with_stop_sentinel(spark, tables, tmp_path):
    pipe, _ = _make_pipeline(spark, tables, tmp_path)
    stop = StopSentinel(str(tmp_path / "stopRequested"))
    assert pipe.run_loop(stop, max_cycles=2) == 2
    stop.request()
    assert pipe.run_loop(stop, max_cycles=5) == 0  # sentinel consumed before cycle 1
    assert not os.path.exists(stop.path)  # sentinel deleted


def test_counter_deltas_null_safe(spark):
    """Null counters coalesce to 0: insert of a never-incremented
    counter yields delta 0 (not null -> 'c = c + None'); an update
    whose prev is null (first increment between snapshots) yields the
    full current value."""
    from cql_replicator_spark.counters import counter_deltas

    curr = spark.createDataFrame([(1, None), (2, 5), (3, 7)],
                                 "pk LONG, c LONG")
    prev = spark.createDataFrame([(2, None), (3, 3), (4, 9)],
                                 "pk LONG, c LONG")
    out = {r.pk: (r.op, r.c_delta)
           for r in counter_deltas(curr, prev, ["pk"], ["c"]).collect()}
    assert out == {1: ("insert", 0), 2: ("update", 5),
                   3: ("update", 4), 4: ("delete", None)}


def test_counter_deltas_empty_cols_raises(spark):
    from cql_replicator_spark.counters import counter_deltas

    df = spark.createDataFrame([(1, 2)], "pk LONG, c LONG")
    with pytest.raises(ValueError, match="counter_cols"):
        counter_deltas(df, df, ["pk"], [])


def test_counter_additive_update_e2e(spark, tmp_path):
    """Counter replication across two delta cycles against a fake CQL
    target: historical load seeds counters with full values, the delta
    cycle applies exact increments (c = c + (curr - prev)) and deletes;
    final target counters equal the source (K:930-935 statement shape,
    delta-correct arithmetic)."""
    import re

    from cql_replicator_spark.config import JsonMapping
    from cql_replicator_spark.counters import replicate_counter_tile
    from cql_replicator_spark.ledger import Ledger
    from cql_replicator_spark.runner import CdcPipeline, StatsStore
    from cql_replicator_spark.snapshot import SnapshotStore
    from cql_replicator_spark.sources.cassandra import CassandraSource

    def make_source(cycle):
        rows = [(pk, pk % 7, pk * 2) for pk in range(40)]
        if cycle == 2:
            rows = [(pk, h + (5 if pk % 4 == 0 else 0), c)
                    for pk, h, c in rows if pk % 10 != 0]
            rows += [(pk, pk % 7, pk * 2) for pk in range(40, 45)]
        return spark.createDataFrame(rows, "pk LONG, hits LONG, clicks LONG")

    state = {"df": make_source(1)}
    src = CassandraSource("ks", "cnt", ["pk"], mapping=JsonMapping(),
                          counter_cols=["hits", "clicks"])
    store = SnapshotStore(str(tmp_path / "snaps"), "ks", "cnt")
    ledger = Ledger(str(tmp_path / "ledger.json"))
    pipe = CdcPipeline(
        spark=spark, keyspace="ks", table="cnt", pk_cols=["pk"],
        source=lambda: state["df"],
        pk_source=lambda: src.project(state["df"]),
        store=store, ledger=ledger,
        stats=StatsStore(str(tmp_path / "stats")),
        total_tiles=2, ts_col="counter_hash", max_workers=2)

    target: dict[int, dict[str, int]] = {}
    upd_re = re.compile(r"UPDATE ks\.cnt SET (.+) WHERE pk = (\d+)")
    del_re = re.compile(r"DELETE FROM ks\.cnt WHERE pk = (\d+)")

    def run_cycle():
        stmts_dir = tmp_path / f"stmts_{len(list(tmp_path.glob('stmts_*')))}"
        stmts_dir.mkdir()

        def executor_factory():
            def execute(statements):
                import uuid as _u
                (stmts_dir / f"{_u.uuid4().hex}.log").write_text(
                    "\n".join(statements) + "\n")
            return execute

        assert sorted(pipe.discover()) == [0, 1]
        stats = [replicate_counter_tile(
            spark, store, ledger, "ks", "cnt", t, ["pk"], {"pk": "bigint"},
            ["hits", "clicks"], "ks.cnt", executor_factory) for t in (0, 1)]
        # apply this cycle's statements to the fake target
        for p in sorted(stmts_dir.glob("*.log")):
            for stmt in p.read_text().splitlines():
                if (m := upd_re.match(stmt)):
                    row = target.setdefault(int(m.group(2)),
                                            {"hits": 0, "clicks": 0})
                    for part in m.group(1).split(", "):
                        cm = re.match(r"(\w+) = \1 \+ (-?\d+)", part)
                        row[cm.group(1)] += int(cm.group(2))
                elif (m := del_re.match(stmt)):
                    target.pop(int(m.group(1)), None)
        return stats

    s1 = run_cycle()
    assert sum(s["inserts"] for s in s1) == 40 and all(
        s["updates"] == s["deletes"] == 0 for s in s1)

    state["df"] = make_source(2)
    s2 = run_cycle()
    assert sum(s["deletes"] for s in s2) == 4          # pk 0,10,20,30 (%10==0)
    assert sum(s["inserts"] for s in s2) == 5          # pk 40..44
    assert sum(s["updates"] for s in s2) == 8          # pk%4==0 minus deleted

    expected = {r.pk: {"hits": r.hits, "clicks": r.clicks}
                for r in state["df"].collect()}
    assert target == expected


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

def test_stage_microbatches_parallel_files_and_boundaries(spark, tmp_path):
    """The staging helper that replaced the coalesce(1) funnels: each
    batch must land as EXACTLY k parquet files (parallel write; small
    batches padded with empty schema-only files), per-batch mtimes
    strictly increasing, and a maxFilesPerTrigger=k replay must
    reproduce the batch boundaries file-for-file — including a 1-row
    batch whose k-1 pad files carry no rows."""
    import collections
    import glob
    import os

    from cql_replicator_spark.streaming.windows import (
        stage_microbatches, stream_events_from_dir,
    )

    df = spark.range(63).select(F.col("id"), F.lit("x").alias("s"))
    batches = [df.filter("id < 60"),
               df.filter("id >= 60 and id < 62"),   # pads 2 -> 4 files
               df.filter("id >= 62")]               # pads 1 -> 4 files
    stage = str(tmp_path / "st")
    k = stage_microbatches(batches, stage, files_per_batch=4)
    assert k == 4
    files = sorted(glob.glob(os.path.join(stage, "*.parquet")))
    assert len(files) == 12
    stamps = collections.Counter(
        round(os.path.getmtime(f), 3) for f in files)
    assert sorted(stamps.values()) == [4, 4, 4], stamps

    got = []
    stream = stream_events_from_dir(spark, stage, df.schema,
                                    max_files_per_trigger=k)
    q = (stream.writeStream
         .foreachBatch(lambda bdf, bid: got.append(
             (bid, sorted(r.id for r in bdf.collect()))))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert [ids for _, ids in sorted(got)] == [
        list(range(60)), [60, 61], [62]]


def test_stage_microbatches_contract_guards(spark, tmp_path):
    """r14 advice hardening: a pre-populated stage dir raises (its
    files would be absorbed into batch 0 and mtime-restamped, silently
    corrupting trigger boundaries) and a non-local scheme raises (the
    mtime ordering contract is POSIX-only)."""
    from cql_replicator_spark.streaming.windows import stage_microbatches

    df = spark.range(10).select(F.col("id"))
    pre = str(tmp_path / "pre")
    df.write.parquet(pre)
    with pytest.raises(ValueError, match="already holds"):
        stage_microbatches([df], pre, files_per_batch=2)

    with pytest.raises(ValueError, match="LOCAL path"):
        stage_microbatches([df], "s3a://bucket/stage", files_per_batch=2)

    with pytest.raises(ValueError, match="at least one batch"):
        stage_microbatches([], str(tmp_path / "empty"))


def test_stage_microbatches_derived_sizing(spark, tmp_path):
    """files_per_batch=None derives k from the largest batch's Catalyst
    size estimate with the compact_parquet formula: tiny batches floor
    at 8 (k=1 would re-create the single-task staging funnel), a small
    byte target scales k up with the estimate, and the session shuffle
    parallelism caps it."""
    from cql_replicator_spark.session import shuffle_parallelism
    from cql_replicator_spark.streaming.windows import (
        _derive_files_per_batch, stage_microbatches,
    )

    src = str(tmp_path / "src")
    spark.range(20000).selectExpr(
        "id", "repeat('x', 64) AS pad").write.parquet(src)
    df = spark.read.parquet(src)  # parquet scan -> real size estimate
    est = int(df._jdf.queryExecution().optimizedPlan()
              .stats().sizeInBytes())
    assert est > 0

    # tiny batch vs the 32 MB default target -> the parallel floor
    assert _derive_files_per_batch([df]) == 8

    # target sized to a fraction of the estimate -> bytes-derived k,
    # capped at session parallelism
    cap = max(8, shuffle_parallelism(df))
    want = min(max(8, -(-est // (est // 10))), cap)
    assert _derive_files_per_batch([df], target_bytes=est // 10) == want

    # and the derived default drives a real staging round end-to-end
    stage = str(tmp_path / "derived")
    k = stage_microbatches([df.filter("id < 5")], stage)
    assert k == 8
    import glob as _g
    import os as _o
    assert len(_g.glob(_o.path.join(stage, "*.parquet"))) == 8


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


def test_interval_join_stream_equals_batch_across_batches(spark, tmp_path):
    """Stream-stream interval join: a match whose two sides arrive in
    DIFFERENT micro-batches must still pair (the left row waits in the
    join buffer), and the streamed append output equals the batch form
    of the same predicate."""
    from pyspark.sql import functions as F

    from cql_replicator_spark.streaming.windows import (
        interval_join, run_stream_to_memory, stream_events_from_dir,
    )

    rows = [
        # (event_id, user_id, event_type, ts) — u1 converts in 10 min
        # but the purchase lands in micro-batch 2; u2 converts inside
        # batch 1; u3's purchase is outside the 30-min window
        (1, 1, "view",     "2024-01-01 10:00:00"),
        (2, 2, "view",     "2024-01-01 10:05:00"),
        (3, 2, "purchase", "2024-01-01 10:20:00"),
        (4, 3, "view",     "2024-01-01 10:10:00"),
        (5, 1, "purchase", "2024-01-01 10:25:00"),
        (6, 3, "purchase", "2024-01-01 11:30:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    def split(df):
        return (df.filter(F.col("event_type") == "view"),
                df.filter(F.col("event_type") == "purchase"))

    batch = {(r.l_event_id, r.r_event_id)
             for r in interval_join(*split(ev)).collect()}
    assert batch == {(1, 5), (2, 3)}

    stage = str(tmp_path / "stream_in")
    for lo, hi in ((1, 4), (5, 6)):  # batch 1: ids 1-4, batch 2: ids 5-6
        ev.filter(F.col("event_id").between(lo, hi)) \
          .coalesce(1).write.mode("append").parquet(stage)
    stream = stream_events_from_dir(spark, stage, ev.schema)
    joined = interval_join(*split(stream))
    run_stream_to_memory(joined, "conv_pairs", output_mode="append")
    streamed = {(r.l_event_id, r.r_event_id)
                for r in spark.table("conv_pairs").collect()}
    assert streamed == batch


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
