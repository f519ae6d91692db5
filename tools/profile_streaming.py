#!/usr/bin/env python3
"""Phase profile of the two streaming lanes (r17, VERDICT #4).

The r16 notes asserted "micro-batch scheduling waits dominate" for
ivm_stream_refresh and source_statementlog_stream without committing a
profile. This tool replays each lane's body with phase timers and, for
the foreachBatch lane, per-batch compute timestamps recorded INSIDE the
callback — so the artifact splits:

  * setup      — staging writes / sink writes / state bootstrap
  * stream     — query start .. awaitTermination
  * batch_comp — sum of wall time spent inside the foreachBatch body
  * sched_wait — stream - batch_comp (trigger scheduling, offset
                 tracking, checkpoint commits, source listing)
  * serve      — the final read/aggregate the lane returns

Run: python3 tools/profile_streaming.py   Writes profile_streaming.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "3"))


def profile_ivm(spark) -> dict:
    from pyspark.sql import functions as F

    from cql_replicator_spark.diff import compute_changes_envelope
    from cql_replicator_spark.ivm import deltas_from_envelope, refresh_aggregate
    from cql_replicator_spark.queries import _cdc_snapshots
    from cql_replicator_spark.queries_analytics import _stage_dir
    from cql_replicator_spark.streaming.windows import (
        foreach_batch_cdc, stage_microbatches, stream_events_from_dir,
    )

    out: dict = {}
    t = time.perf_counter
    t0s, t1s = _cdc_snapshots(spark, SF_DIR)
    grp = (F.col("pk") % 100).alias("grp")
    env = compute_changes_envelope(t1s, t0s, ["pk"]).select("*", grp)

    p0 = t()
    stage = _stage_dir("prof_ivm_stream")
    k = stage_microbatches(
        [env.filter(c) for c in (F.col("pk") % 2 == 0,
                                 F.col("pk") % 2 == 1)], stage)
    out["setup_staging"] = round(t() - p0, 3)

    p0 = t()
    state_root = _stage_dir("prof_ivm_state")
    (t0s.select("ts", grp).groupBy("grp")
     .agg(F.sum("ts").alias("sum_v"), F.count("*").cast("long").alias("n"),
          F.count("ts").cast("long").alias("nn"))
     .write.parquet(os.path.join(state_root, "v0")))
    out["setup_state_v0"] = round(t() - p0, 3)

    latest = {"v": 0}
    batch_secs: list[float] = []

    def refresh(batch_df, batch_id):
        b0 = t()
        deltas = deltas_from_envelope(
            batch_df, ["grp"], "ts_before", "ts_after")
        state = spark.read.parquet(
            os.path.join(state_root, f"v{latest['v']}"))
        new_state = refresh_aggregate(state, deltas, ["grp"])
        new_state.write.parquet(
            os.path.join(state_root, f"v{latest['v'] + 1}"))
        latest["v"] += 1
        batch_secs.append(round(t() - b0, 3))

    p0 = t()
    stream = stream_events_from_dir(spark, stage, env.schema,
                                    max_files_per_trigger=k)
    q = foreach_batch_cdc(stream, refresh, _stage_dir("prof_ivm_ckpt"))
    q.awaitTermination()
    out["stream_total"] = round(t() - p0, 3)
    out["batch_compute"] = batch_secs
    out["sched_wait"] = round(out["stream_total"] - sum(batch_secs), 3)

    p0 = t()
    spark.read.parquet(os.path.join(state_root, f"v{latest['v']}")) \
        .drop("nn").count()
    out["serve"] = round(t() - p0, 3)
    return out


def profile_stmtlog(spark) -> dict:
    import uuid as _uuid

    from pyspark.sql import functions as F

    from cql_replicator_spark.queries_analytics import (
        _roundtrip_aggregate, _stage_dir, _t,
    )
    from cql_replicator_spark.sinks.datasource import CqlDataSource

    out: dict = {}
    t = time.perf_counter
    spark.dataSource.register(CqlDataSource)
    docs = (_t(spark, SF_DIR, "documents")["documents"]
            .where(F.col("doc_id") % 17 == 0)
            .select("doc_id", "text", "lang", "n_chars"))

    p0 = t()
    stage = _stage_dir("prof_stmt_stream")
    (docs.coalesce(4).write.format("cql").option("target", "ks.documents")
     .option("path", stage).mode("append").save())
    out["setup_sink_write"] = round(t() - p0, 3)

    p0 = t()
    stream = (spark.readStream.format("cql")
              .schema("doc_id bigint, text string, lang string, "
                      "n_chars bigint")
              .option("path", stage).load())
    qname = f"prof_stmt_{_uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.format("memory").queryName(qname)
         .option("checkpointLocation", _stage_dir("prof_stmt_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    out["stream_total"] = round(t() - p0, 3)
    # per-batch durations from the query's own progress telemetry
    # (StreamingQueryProgress objects; .json is the serialized form)
    out["progress"] = [
        {"batchId": pr.get("batchId"),
         "durationMs": pr.get("durationMs"),
         "numInputRows": pr.get("numInputRows")}
        for pr in (json.loads(p.json) for p in q.recentProgress)]

    p0 = t()
    _roundtrip_aggregate(spark.table(qname)).count()
    out["serve_aggregate"] = round(t() - p0, 3)
    return out


def main() -> None:
    from cql_replicator_spark.queries import queries
    from cql_replicator_spark.session import get_spark, load_tables

    queries()
    spark = get_spark("profile_streaming", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)

    result = {"sf_dir": SF_DIR, "reps": REPS,
              "ivm_stream_refresh": [], "source_statementlog_stream": []}
    for _ in range(REPS):
        result["ivm_stream_refresh"].append(profile_ivm(spark))
        result["source_statementlog_stream"].append(profile_stmtlog(spark))
    print(json.dumps(result, indent=1))
    (ROOT / "profile_streaming.json").write_text(
        json.dumps(result, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
