#!/usr/bin/env python3
"""Scale smoke: run the heaviest dedup/text operators on a 20x-amplified
corpus (sf0.1 documents x 20 replicas ~ a "sf2" documents table) and
report per-op wall time next to the sf0.1 baseline.

The point is the SHAPE, not the absolute number: every op here is
bucketed/capped by construction (LSH bands, df cutoffs, fingerprint
max_df, per-doc projections), so runtime should scale ~linearly in the
corpus. A super-linear blow-up would mean a pair generator or join lost
its cap — the exact failure mode that kills these ops at 100 TB.

Amplification: replica k rewrites doc_id -> doc_id + k*10^7 and appends
a per-replica salt token to the text, so replicas are NEAR-duplicates
(LSH/fingerprint buckets cluster the 20 siblings — realistic duplicate
structure) but not byte-identical (exact dedup still sees distinct
fingerprints; bucket sizes stay ~20, not corpus-sized).

Run: python3 tools/scale_smoke.py   [AMPLIFY=20] [SPARK_GRAFT_SF_DIR]
Writes scale_smoke.json (one JSON line, committed per round).
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
AMPLIFY = int(os.environ.get("AMPLIFY", "20"))


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.analytics import dedup as D
    from cql_replicator_spark.analytics import multimodal as MM
    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("scale_smoke", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        # the 20x legs build multi-million-row broadcast sides (cdc
        # hydrate's insert set); the 1g driver default OOMs the
        # broadcast build when the host is under concurrent load
        "spark.driver.memory": os.environ.get("SMOKE_DRIVER_MEM", "8g"),
    })
    docs = load_tables(spark, SF_DIR, ["documents"])["documents"]

    def amplified(n: int):
        reps = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("rep")
        return (docs.select("doc_id", "text", reps)
                .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                        .alias("doc_id"),
                        F.concat_ws(" ", F.col("text"),
                                    F.concat(F.lit("salt"),
                                             F.col("rep").cast("string")))
                        .alias("text")))

    ops = {
        "exact_dedup_groups": lambda d: D.exact_dedup_groups(d),
        "minhash_lsh_pairs": lambda d: D.minhash_lsh_dedup_pairs(
            d, n=3, num_hashes=16, bands=4),
        "sparse_cosine_pairs": lambda d: TX.sparse_cosine_pairs(
            d, df_cutoff=20, min_sim=0.3,
            terms=D.shingles(d).withColumnRenamed("gram", "tok")),
        "winnowing_pairs": lambda d: TX.winnowing_pairs(
            d, k=3, w=4, min_shared=5, max_df=25),
        "bigram_logprob": lambda d: TX.bigram_logprob(d),
        "doc_line_dedup": lambda d: TX.dedup_chunks_within_doc(d),
        # the media-decode family: per-doc JPEG encode+decode is pure
        # Python inside Arrow batches — strictly per-row work, so the
        # smoke pins that it scales linearly with corpus size (no
        # hidden shuffle or driver accumulation in the batch path)
        "jpeg_encode_decode": lambda d: MM.image_pixel_stats(
            MM.synthesize_jpeg_table(d)),
        "gif_lzw_encode_decode": lambda d: MM.image_pixel_stats(
            MM.synthesize_gif_table(d)),
        "progressive_jpeg_encode_decode": lambda d: MM.image_pixel_stats(
            MM.synthesize_progressive_jpeg_table(d)),
        "flac_encode_decode": lambda d: MM.audio_sample_stats(
            MM.synthesize_flac_table(d)),
        "y4m_encode_decode": lambda d: MM.y4m_frame_stats(
            MM.synthesize_y4m_table(d)),
    }

    # CDC core (the reference's heart, K:1355-1384 + P:792-857):
    # snapshot diff (anti-joins + null-safe update detect via one
    # full-outer join) and broadcast hydration, at amplified KEY
    # counts. Replica k shifts o_orderkey by k*10^10 so the t0/t1 set
    # arithmetic (%10 drop / %7 drop / %5 ts-bump — the registered
    # cdc_changes rules) holds identically at every scale; per-key time
    # must stay ~linear and the plan must stay one shuffle join (diff)
    # + one broadcast join, zero extra exchanges (hydrate).
    from cql_replicator_spark.diff import compute_changes_tagged
    from cql_replicator_spark.sinks.parquet_sink import hydrate_changes

    _t = load_tables(spark, SF_DIR, ["orders", "customer"])
    orders, customer = _t["orders"], _t["customer"]

    def amp_snapshots(n: int):
        reps = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("rep")
        ymd = (F.year("o_orderdate") * 10000 + F.month("o_orderdate") * 100
               + F.dayofmonth("o_orderdate")).cast("long")
        base = (orders.select("o_orderkey", "o_orderdate", reps)
                .select((F.col("o_orderkey")
                         + F.col("rep") * F.lit(10_000_000_000)).alias("pk"),
                        ymd.alias("ts")))
        t0 = base.filter(F.col("pk") % 10 != 0)
        t1 = base.filter(F.col("pk") % 7 != 0).withColumn(
            "ts", F.when(F.col("pk") % 5 == 0, F.col("ts") + 1)
                   .otherwise(F.col("ts")))
        return t0, t1

    def amp_source(n: int):
        reps = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("rep")
        return (orders.select("o_orderkey", "o_custkey", "o_totalprice",
                              "o_orderstatus", reps)
                .select((F.col("o_orderkey")
                         + F.col("rep") * F.lit(10_000_000_000))
                        .alias("o_orderkey"),
                        "o_custkey", "o_totalprice", "o_orderstatus"))

    def cdc_diff(n: int):
        t0, t1 = amp_snapshots(n)
        return compute_changes_tagged(curr=t1, prev=t0, pk_cols=["pk"])

    def cdc_hydrate(n: int):
        # inserts = new keys; hydrate them against the full source via
        # the production broadcast join (P:809-816)
        ins = cdc_diff(n).filter(F.col("op") == "insert").select(
            F.col("pk").alias("o_orderkey"))
        return hydrate_changes(amp_source(n), ins, ["o_orderkey"])

    def plan_shape(df) -> dict:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        text = buf.getvalue()
        return {"n_shuffle": text.count("Exchange hashpartitioning"),
                "n_broadcast": text.count("BroadcastExchange")}

    cdc_ops = {"cdc_diff": cdc_diff, "cdc_hydrate": cdc_hydrate}

    # Embedding lanes (r9: well_formed scan filter + nanvl guards went
    # in front of these): LSH candidate generation must stay
    # bucket-bounded and the kmeans assignment map-only at 20x vectors.
    # Replica k shifts vec_id and nudges every component by k*1e-4, so
    # replicas are near-duplicates (banded signatures cluster the
    # siblings — realistic ANN/dedup structure) but not identical.
    from cql_replicator_spark.analytics import similarity as SIM

    emb = load_tables(spark, SF_DIR, ["embeddings"])["embeddings"]

    def amp_emb(n: int):
        reps = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("rep")
        return (emb.select("vec_id", "embedding", reps)
                .select((F.col("vec_id") + F.col("rep") * 10_000_000)
                        .alias("vec_id"),
                        F.transform(
                            F.col("embedding").cast("array<double>"),
                            lambda v: v + F.col("rep") * 1e-4)
                        .alias("embedding")))

    emb_ops = {
        # max_bucket_size is the 100 TB-safe configuration: without it a
        # degenerate bucket emits |b|^2 pairs in one task (the first 20x
        # run measured 409x pair growth from 20x near-dup data — correct
        # per-row, but the uncapped tail is the landmine the cap removes)
        "embedding_lsh_pairs": lambda n: SIM.embedding_lsh_candidates(
            amp_emb(n), dim=64, bands=2, max_bucket_size=200),
        "kmeans_assign": lambda n: SIM.kmeans_quantized(
            amp_emb(n), k=16, rounds=1, train_sample=4096),
    }

    # Rank-strategy leg (r12 verdict item 5): byte-identical ADC scores
    # (adc_scored, projected to a NARROW checkpointed frame), the
    # partition-less-window formulations the r13 rework removed vs
    # their distributed replacements, interleaved. Two sub-legs:
    #
    # - topk: pre-r13 global row_number + filter(rank<=k) vs the r13
    #   orderBy().limit(k). (Spark 4 does NOT plan WindowGroupLimit
    #   for this shape here — verified in the executed plan — so the
    #   window form really funnels every row into one partition.)
    # - cumsum: a global running sum (the shape of the five reworked
    #   rank/cumsum lanes — no rank filter, so nothing bounds the
    #   windowed frame) vs distrank.global_rank_cumsum.
    #
    # The class claim is about GROWTH, not the 1x ratio: the window
    # forms' cost is a single-partition sort+scan of the full frame —
    # serial on one core — so its time-ratio across 1x -> 20x must be
    # SUPER-linear (>20), while the distributed forms stay ~linear or
    # below (parallel passes). At sf0.1-native sizes both forms are
    # scheduler-bound, hence the leg's own amplifier.
    def pq_rank_leg(factor: int) -> dict:
        import statistics

        from pyspark.sql.window import Window

        from cql_replicator_spark.distrank import global_rank_cumsum
        books = SIM.pq_train(emb, m=2, k=4, rounds=0, train_sample=64)
        qrow = emb.filter(F.col("vec_id") == 3).first()
        # The sf0.1 embeddings table is tiny (~2k vectors); this leg's
        # claim is about the RANK stage, so it gets its own amplifier
        # (sequence+explode — literals would bloat the plan) sized so
        # the ranked frame reaches the tens of millions of rows where
        # a single-partition pass over even a NARROW frame (vec_id +
        # adc_dist) is visibly serial: 750x at the 1x leg (~1.5M
        # rows), 15000x at the 20x leg (~30M rows).
        boost = factor * 750
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(boost - 1))).alias("rep")
        # rep * 10M tops out at ~15e9 for the 20x leg — past int32, so
        # the id arithmetic must be long or ANSI mode kills the leg
        big = (emb.select("vec_id", "embedding", reps)
               .select((F.col("vec_id").cast("long")
                        + F.col("rep").cast("long") * F.lit(10_000_000))
                       .alias("vec_id"),
                       F.transform(
                           F.col("embedding").cast("array<double>"),
                           lambda v: v + F.col("rep") * 1e-4)
                       .alias("embedding")))
        enc = SIM.pq_encode(big, books).localCheckpoint()
        scored = (SIM.adc_scored(list(qrow.embedding), enc, books)
                  .select("vec_id", "adc_dist").localCheckpoint())
        n_enc = scored.count()
        enc.unpersist()  # only the narrow scored frame stays resident

        w = Window.orderBy(F.asc("adc_dist"), F.asc("vec_id"))

        def topk_window():
            return (scored.withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= 5))

        def topk_takeordered():
            return scored.orderBy(
                F.asc("adc_dist"), F.asc("vec_id")).limit(5)

        def cumsum_window():
            return (scored.withColumn("cum", F.sum("adc_dist").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
                .filter(F.col("cum") < 0))  # selective: times the
            # window, not a 30M-row count materialization

        def cumsum_distrank():
            return global_rank_cumsum(
                scored, [("adc_dist", False), ("vec_id", False)],
                sum_cols={"cum": "adc_dist"}).filter(F.col("cum") < 0)

        out: dict = {"n_rows": n_enc}
        for sub, forms, passes in (
                ("topk", {"window": topk_window,
                          "takeordered": topk_takeordered}, 3),
                ("cumsum", {"window": cumsum_window,
                            "distrank": cumsum_distrank}, 2)):
            times: dict[str, list[float]] = {f: [] for f in forms}
            for p in range(passes):
                order = list(forms) if p % 2 == 0 else list(forms)[::-1]
                for name in order:
                    t0 = time.perf_counter()
                    forms[name]().count()
                    times[name].append(
                        round(time.perf_counter() - t0, 3))
            med = {f: statistics.median(v) for f, v in times.items()}
            fixed = [f for f in forms if f != "window"][0]
            out[sub] = {"raw": times, "medians": med,
                        "window_over_fixed": round(
                            med["window"] / med[fixed], 3)
                        if med[fixed] else None}
        scored.unpersist()
        return out

    # Iterative-algorithm leg: connected components over the capped LSH
    # pair graph. The scale claim is that ROUNDS track graph DIAMETER
    # (near-dup components are small and dense), not corpus size — at
    # 20x data the round count must stay flat while per-round time
    # scales ~linearly in edges.
    def cc_leg(factor: int) -> dict:
        pairs = D.minhash_lsh_dedup_pairs(
            amplified(factor), n=3, num_hashes=16, bands=4,
            max_bucket_size=256)
        st: dict = {}
        t0 = time.perf_counter()
        out = D.connected_components(pairs, stats=st)
        n = out.count()
        sec = round(time.perf_counter() - t0, 2)
        out.unpersist()
        spark.catalog.clearCache()
        return {"sec": sec, "rows_out": n, "rounds": st["rounds"],
                "round_secs": st["round_secs"], "n_edges": st["n_edges"]}

    # Shared-LSH cold-family leg (r11 verdict item 6): the five
    # registered LSH lanes share one persisted signature+pairs stage
    # (_shared_capped_lsh). The keep decision rests on the structural
    # argument — exchange reuse never spans jobs, so the independent
    # form re-shingles the corpus once per lane, and at 100 TB the
    # corpus passes ARE the bill. This leg is that claim's direct
    # evidence: time the whole five-lane family COLD (build paid inside
    # the window), shared vs independent, at 1x and 20x — the gap must
    # WIDEN with corpus size because the shared form's extra passes are
    # over row-per-doc signature/pair frames while the independent
    # form's are over the corpus itself. Parquet read warmed before
    # both forms so the comparison measures compute, not IO order.
    from pyspark import StorageLevel

    def sharedlsh_family_leg(frame) -> dict:
        quality = frame.select(
            "doc_id", F.length("text").cast("long").alias("quality"))

        def run_family_independent() -> float:
            t0 = time.perf_counter()
            D.minhash_lsh_dedup_pairs(
                frame, n=3, num_hashes=16, bands=4,
                max_bucket_size=256).count()
            for algo in (None, "star"):
                D.connected_components(
                    D.minhash_lsh_dedup_pairs(
                        frame, n=3, num_hashes=16, bands=4,
                        max_bucket_size=256),
                    **({"algorithm": algo} if algo else {})).count()
            D.cluster_keepers(
                D.connected_components(D.minhash_lsh_dedup_pairs(
                    frame, n=3, num_hashes=16, bands=4,
                    max_bucket_size=256)), quality).count()
            D.minhash_accuracy_pairs(
                frame, n=3, num_hashes=16, bands=4,
                max_bucket_size=256).count()
            return round(time.perf_counter() - t0, 2)

        def run_family_shared() -> float:
            t0 = time.perf_counter()
            sigs = D.minhash_signatures(frame, n=3, num_hashes=16) \
                .persist(StorageLevel.MEMORY_AND_DISK)
            pairs = D.lsh_candidate_pairs(
                sigs, bands=4, rows_per_band=4, max_bucket_size=256) \
                .persist(StorageLevel.MEMORY_AND_DISK)
            try:
                pairs.count()
                D.connected_components(pairs).count()
                D.connected_components(pairs, algorithm="star").count()
                D.cluster_keepers(
                    D.connected_components(pairs), quality).count()
                D.minhash_accuracy_pairs(
                    frame, n=3, num_hashes=16, bands=4,
                    max_bucket_size=256, signatures=sigs,
                    pairs=pairs).count()
            finally:
                sec = round(time.perf_counter() - t0, 2)
                pairs.unpersist(blocking=True)
                sigs.unpersist(blocking=True)
            return sec

        frame.count()  # warm the scan for both forms
        spark.catalog.clearCache()
        independent = run_family_independent()
        spark.catalog.clearCache()
        shared = run_family_shared()
        spark.catalog.clearCache()
        return {"independent_sec": independent, "shared_sec": shared,
                "independent_over_shared": round(
                    independent / shared, 3) if shared else None}

    # Skew leg: one hot key owning ~20% of all rows, joined against a
    # non-broadcastable dim, salted vs unsalted, with AQE's skew-join
    # splitter OFF so the measurement isolates the salt itself (the
    # salt is the tool for the joins AQE can't split: non-sort-merge
    # shapes, streaming micro-batches, pre-AQE clusters). Reducer-side
    # balance is measured as the max share of join-output rows landing
    # in one shuffle partition — the direct proxy for the straggler
    # task that defines wall-clock at 1000 executors.
    from cql_replicator_spark.skew import salted_join

    def skew_leg() -> dict:
        saved = {k: spark.conf.get(k) for k in
                 ("spark.sql.adaptive.enabled",
                  "spark.sql.autoBroadcastJoinThreshold")}
        # AQE fully off for the measurement: its partition COALESCING
        # merges the small shuffle into one partition (share=1.0 for
        # both forms — no signal) and its skew splitter is the very
        # mechanism the salt substitutes for
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            hot = orders.select(
                F.when(F.col("o_orderkey") % 5 == 0, F.lit(42))
                 .otherwise(F.col("o_custkey")).alias("o_custkey"),
                "o_orderkey", "o_totalprice")
            dim = (hot.select("o_custkey").distinct()
                   .withColumn("segment",
                               (F.col("o_custkey") % 10).cast("string")))
            out = {}
            for form, joined in (
                ("unsalted", hot.join(dim, ["o_custkey"])),
                ("salted", salted_join(hot, dim, ["o_custkey"],
                                       num_salts=8)),
            ):
                t0 = time.perf_counter()
                parts = (joined.groupBy(F.spark_partition_id().alias("pid"))
                         .count().collect())
                sec = round(time.perf_counter() - t0, 2)
                total = sum(r["count"] for r in parts)
                mx = max(r["count"] for r in parts)
                out[form] = {"sec": sec, "rows": total,
                             "max_partition_share": round(mx / total, 4),
                             "n_partitions_nonempty": len(parts)}
            return out
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    # Companion leg with AQE ON (r10 verdict item 6): documents WHEN the
    # salt is needed at all. AQE's skew-join splitter covers the
    # sort-merge read side — but only there: write-side repartitions,
    # foreachPartition sinks, streaming micro-batches, and pre-AQE
    # clusters still need the salt. Three preconditions this leg had to
    # meet before the splitter engaged AT ALL — each one operational
    # guidance in its own right (bisected empirically, r11):
    #   1. BYTES: skew is decided from map-output sizes; a fixture-
    #      scale hot partition is invisible (the rule ran and found "0
    #      skewed partitions" at base sf0.1 even with threshold=1k,
    #      factor=1). The leg runs the 20x-amplified frame and lowers
    #      the 256m default threshold so the smoke shows the mechanism
    #      without 100 GB.
    #   2. MAP BOUNDARIES: a skewed partition is split into chunks
    #      ALONG MAP-OUTPUT BOUNDARIES — a single-mapper stage (one
    #      file / one parquet row group / one upstream task, exactly
    #      what sf0.1 orders is) cannot be split no matter how skewed.
    #      The upstream .repartition(32) gives the exchange real
    #      mappers, as any real multi-task pipeline stage would.
    #   3. NO REUSED EXCHANGE: a dim carved out of the fact frame
    #      shares the fact's exchange and the rule leaves reused
    #      stages alone — the dim side here is customer-derived
    #      (independent subtree).
    # aqe_skew_split records whether the splitter actually engaged
    # ("skewed" in the materialized adaptive plan).
    def skew_leg_aqe() -> dict:
        keys = ("spark.sql.adaptive.enabled",
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        saved = {k: spark.conf.get(k, None) for k in keys}
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        # broadcast off: with an auto-broadcast dim there is no shuffle
        # join and no skew problem at all (itself the first-line fix —
        # but the leg measures the non-broadcastable case)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                       "512k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                       "2")
        try:
            reps = F.explode(
                F.array(*[F.lit(k) for k in range(AMPLIFY)])).alias("rep")
            hot = (orders.repartition(32)
                   .select("o_orderkey", "o_custkey",
                           "o_totalprice", reps)
                   .select(
                       F.when(F.col("o_orderkey") % 5 == 0, F.lit(42))
                        .otherwise(F.col("o_custkey")).alias("o_custkey"),
                       (F.col("o_orderkey") + F.col("rep") * 10_000_000)
                       .alias("o_orderkey"),
                       "o_totalprice"))
            dim = customer.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"))
            out = {}
            for form, joined in (
                ("unsalted", hot.join(dim, ["o_custkey"])),
                ("salted", salted_join(hot, dim, ["o_custkey"],
                                       num_salts=8)),
            ):
                ep = joined._jdf.queryExecution().executedPlan()
                t0 = time.perf_counter()
                n = ep.execute().count()  # materializes THIS plan tree
                sec = round(time.perf_counter() - t0, 2)
                out[form] = {"sec": sec, "rows": n,
                             "aqe_skew_split": "skewed" in ep.toString()}
            return out
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    # Staging leg (r14 item 1): the six streaming lanes' micro-batch
    # staging moved from coalesce(1).write (one task writes the whole
    # batch) to stage_microbatches' coalesce(k) + pad + mtime stamp —
    # coalesce, not repartition: the first smoke run measured the
    # repartition form SLOWER than the serial one at 20x (full shuffle
    # + round-robin determinism sort of every staged byte), which is
    # what bought the narrow-merge rewrite. The sf0.1 A/B
    # (bench_ab_staging.json) records parity at tiny scale; THIS leg
    # records the growth shape the fix buys: the serial form reads and
    # writes every batch byte on ONE core, the coalesce(k) form splits
    # the same work across k writers with no shuffle, so
    # coalesce1_over_staged must WIDEN toward ~k as the staged frame
    # grows. The staged frame carries MANY upstream partitions (as any
    # real multi-split source scan does — coalesce parallelism is
    # min(k, upstream splits); a 1-split fixture scan would serialize
    # BOTH forms and show nothing).
    def staging_leg(factor: int) -> dict:
        import shutil
        import statistics
        import tempfile

        from cql_replicator_spark.streaming.windows import stage_microbatches

        ev = load_tables(spark, SF_DIR, ["events"])["events"].select(
            "event_id", "user_id", "event_type")
        # own amplifier (pq_rank_leg pattern): a staged parquet write
        # is IO-light, so the serial form's per-task encode cost only
        # becomes visible in the millions of rows — 5x at the 1x leg
        # (~500k rows), 100x at the 20x leg (~10M rows)
        boost = factor * 5
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(boost - 1))).alias("rep")
        big = (ev.select("event_id", "user_id", "event_type", reps)
               .select((F.col("event_id")
                        + F.col("rep").cast("long") * 100_000_000)
                       .alias("event_id"), "user_id", "event_type")
               .repartition(64)  # model a real many-split source
               .localCheckpoint())  # stage once; time WRITES, not lineage
        halves = [big.filter(F.col("event_id") % 2 == 0),
                  big.filter(F.col("event_id") % 2 == 1)]
        n_rows = big.count()

        def run_coalesce1(d: str) -> None:
            for h in halves:
                h.coalesce(1).write.mode("append").parquet(d)

        def run_staged(d: str) -> None:
            stage_microbatches(halves, d, files_per_batch=8)

        root = tempfile.mkdtemp(prefix="smoke_staging_")
        times: dict[str, list[float]] = {"coalesce1": [], "staged_k8": []}
        try:
            i = 0
            for p in range(3):
                forms = [("coalesce1", run_coalesce1),
                         ("staged_k8", run_staged)]
                for label, fn in forms if p % 2 == 0 else forms[::-1]:
                    d = os.path.join(root, f"{label}_{i}")
                    i += 1
                    t0 = time.perf_counter()
                    fn(d)
                    times[label].append(
                        round(time.perf_counter() - t0, 3))
        finally:
            shutil.rmtree(root, ignore_errors=True)
            big.unpersist()
        med = {k: round(statistics.median(v), 3)
               for k, v in times.items()}
        return {"n_rows": n_rows, "raw": times, "medians": med,
                "coalesce1_over_staged": round(
                    med["coalesce1"] / med["staged_k8"], 3)
                if med["staged_k8"] else None}

    # PPJoin prefix-filter growth (the r14 narrow-layout rewrite): the
    # win of prefix filtering is CANDIDATE count — brute force joins on
    # every shared token (stopword-df-driven, ~quadratic in df), the
    # prefix form only on each doc's rarest |A|-ceil(t|A|)+1 tokens.
    # Both candidate counts are computed EXACTLY from token document
    # frequencies (sum of C(df,2) per join token — the pre-dedup
    # candidate-row count of the respective self-join) so the brute
    # side never has to materialize its own explosion at 20x.
    #
    # This leg uses its OWN amplifier, NOT the near-dup one: suffixing
    # every token with the replica id gives replicas DISJOINT token
    # spaces — corpus growth as NEW content, the realistic 100 TB
    # shape. (Under the near-dup amplifier the TRUE pair count itself
    # is quadratic in replicas — 20 siblings per cluster pair up — so
    # no candidate generator could beat its own output and the first
    # version of this leg ran for 30+ min generating ~1.5e9 verified
    # pairs. The dup-structure case is already value-verified: the
    # lane hash-matched brute force at 3.7M pairs, r14.) With new
    # content, candidates and true pairs must both grow ~LINEARLY in
    # replicas (sub-quadratic in docs: the docs^2 envelope is
    # factor^2); the prune ratio vs brute must hold. The base is a
    # 500-doc deterministic subset so the 20x leg stays minutes, not
    # hours.
    def ppjoin_leg(factor: int) -> dict:
        tn, td = 1, 2  # the registered lane's threshold (J >= 1/2)
        reps = F.explode(
            F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        frame = (docs.filter(F.col("doc_id") % 10 == 0)
                 .select("doc_id", "text", reps)
                 .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                         .alias("doc_id"),
                         F.expr("array_join(transform("
                                "split(lower(text), ' '), "
                                "t -> concat(t, '_', rep)), ' ')")
                         .alias("text")))
        toks = frame.select(
            "doc_id",
            F.explode(F.array_distinct(
                F.split(D.normalized("text"), " "))).alias("tok"))
        gdf = toks.groupBy("tok").agg(F.count("*").alias("df"))
        brute_cand = (gdf.agg(F.sum(
            F.expr("CAST(df AS BIGINT) * (df - 1) div 2")).alias("c"))
            .first()["c"]) or 0
        ordered = (toks.join(gdf, "tok")
                   .groupBy("doc_id")
                   .agg(F.sort_array(
                       F.collect_list(F.struct("df", "tok"))).alias("ord")))
        plen = (F.size("ord")
                - F.expr(f"({tn} * size(ord) + {td - 1}) div {td}") + 1)
        pref = ordered.select(
            "doc_id",
            F.explode(F.slice(F.expr("transform(ord, s -> s.tok)"),
                              F.lit(1), plen)).alias("ptok"))
        prefix_cand = (pref.groupBy("ptok")
                       .agg(F.count("*").alias("pdf"))
                       .agg(F.sum(F.expr(
                           "CAST(pdf AS BIGINT) * (pdf - 1) div 2"))
                           .alias("c")).first()["c"]) or 0
        t0 = time.perf_counter()
        n_pairs = D.prefix_filter_jaccard_pairs(
            frame, threshold_num=tn, threshold_den=td).count()
        sec = round(time.perf_counter() - t0, 2)
        return {"n_docs": frame.count(),
                "brute_candidates": int(brute_cand),
                "prefix_candidates": int(prefix_cand),
                "prune_ratio": round(brute_cand / prefix_cand, 1)
                if prefix_cand else None,
                "verified_pairs": n_pairs,
                "cand_per_true_pair": round(prefix_cand / n_pairs, 1)
                if n_pairs else None,
                "narrow_pipeline_sec": sec}

    docs.select("doc_id").limit(100).count()  # warm
    result: dict[str, dict] = {}
    for scale, factor in (("base_1x", 1), (f"amp_{AMPLIFY}x", AMPLIFY)):
        frame = amplified(factor)
        n = frame.count()
        row = {}
        for name, build in ops.items():
            t0 = time.perf_counter()
            cnt = build(frame).count()
            row[name] = {"sec": round(time.perf_counter() - t0, 2),
                         "rows_out": cnt}
        for name, build in cdc_ops.items():
            df = build(factor)
            t0 = time.perf_counter()
            cnt = df.count()
            row[name] = {"sec": round(time.perf_counter() - t0, 2),
                         "rows_out": cnt, **plan_shape(df)}
        for name, build in emb_ops.items():
            t0 = time.perf_counter()
            cnt = build(factor).count()
            row[name] = {"sec": round(time.perf_counter() - t0, 2),
                         "rows_out": cnt}
        row["connected_components"] = cc_leg(factor)
        result[scale] = {"n_docs": n, "n_keys": orders.count() * factor,
                         "ops": row,
                         "pq_adc_rank": pq_rank_leg(factor),
                         "sharedlsh_cold_family": sharedlsh_family_leg(frame),
                         "microbatch_staging": staging_leg(factor),
                         "ppjoin_prefix_filter": ppjoin_leg(factor)}

    skew = skew_leg()
    skew_aqe = skew_leg_aqe()
    base, amp = result["base_1x"], result[f"amp_{AMPLIFY}x"]
    for name in list(ops) + list(cdc_ops) + list(emb_ops) + \
            ["connected_components"]:
        b, a = base["ops"][name]["sec"], amp["ops"][name]["sec"]
        ratio = a / b if b else float("nan")
        print(f"{name:22s} 1x={b:7.2f}s {AMPLIFY}x={a:8.2f}s "
              f"time-ratio={ratio:6.1f} (linear would be ~{AMPLIFY})")
    print(f"connected_components rounds: "
          f"1x={base['ops']['connected_components']['rounds']} "
          f"{AMPLIFY}x={amp['ops']['connected_components']['rounds']} "
          f"(diameter-driven: flat is the pass)")
    pq_b, pq_a = base["pq_adc_rank"], amp["pq_adc_rank"]
    n_ratio = pq_a["n_rows"] / pq_b["n_rows"]
    for sub in ("topk", "cumsum"):
        mb, ma = pq_b[sub]["medians"], pq_a[sub]["medians"]
        growth = {f: round(ma[f] / mb[f], 1) for f in mb if mb[f]}
        print(f"pq_adc_rank/{sub}: window_over_fixed "
              f"1x={pq_b[sub]['window_over_fixed']} "
              f"{AMPLIFY}x={pq_a[sub]['window_over_fixed']}; "
              f"time-growth at {n_ratio:.0f}x rows: {growth} "
              f"(the single-partition window form must grow "
              f"SUPER-linearly — serial sort+scan; the distributed "
              f"form ~linear or below)")
    sl_b = base["sharedlsh_cold_family"]
    sl_a = amp["sharedlsh_cold_family"]
    print(f"sharedlsh_cold_family independent/shared: "
          f"1x={sl_b['independent_over_shared']} "
          f"{AMPLIFY}x={sl_a['independent_over_shared']} "
          f"(gap must WIDEN with corpus size: the independent form's "
          f"extra passes are corpus-sized, the shared form's are "
          f"row-per-doc)")
    st_b = base["microbatch_staging"]
    st_a = amp["microbatch_staging"]
    print(f"microbatch_staging coalesce1/staged_k8: "
          f"1x={st_b['coalesce1_over_staged']} "
          f"{AMPLIFY}x={st_a['coalesce1_over_staged']} "
          f"(the serial form's single-task write is linear in batch "
          f"bytes; the ratio must WIDEN toward k as the batch grows)")
    pp_b, pp_a = base["ppjoin_prefix_filter"], amp["ppjoin_prefix_filter"]
    pc_growth = (pp_a["prefix_candidates"] / pp_b["prefix_candidates"]
                 if pp_b["prefix_candidates"] else float("nan"))
    print(f"ppjoin_prefix_filter (disjoint-content growth): "
          f"prefix-candidate growth at {AMPLIFY}x docs = "
          f"{pc_growth:.1f}x (linear = {AMPLIFY}, docs^2 envelope = "
          f"{AMPLIFY**2} — sub-quadratic is the pass); prune_ratio "
          f"1x={pp_b['prune_ratio']} {AMPLIFY}x={pp_a['prune_ratio']} "
          f"(must hold); narrow pipeline "
          f"1x={pp_b['narrow_pipeline_sec']}s "
          f"{AMPLIFY}x={pp_a['narrow_pipeline_sec']}s "
          f"for {pp_b['verified_pairs']} -> {pp_a['verified_pairs']} "
          f"pairs")
    print(f"skew_salted_join max-partition-share: "
          f"unsalted={skew['unsalted']['max_partition_share']} "
          f"salted={skew['salted']['max_partition_share']} "
          f"(salt must flatten the hot key's ~0.2 share)")
    print(f"skew_salted_join AQE-on: "
          f"unsalted={skew_aqe['unsalted']['sec']}s "
          f"(skew_split={skew_aqe['unsalted']['aqe_skew_split']}) "
          f"salted={skew_aqe['salted']['sec']}s — AQE covers the "
          f"read-side sort-merge; salt remains for write-side/"
          f"foreachPartition/streaming paths AQE can't touch")
    (ROOT / "scale_smoke.json").write_text(json.dumps(
        {"sf_dir": SF_DIR, "amplify": AMPLIFY, "results": result,
         "skew_salted_join": skew, "skew_salted_join_aqe": skew_aqe}))


if __name__ == "__main__":
    main()
