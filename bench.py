#!/usr/bin/env python3
"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a cheap count() action (results are not
collected to the driver; the engine's job is the plan, not the fetch).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver records a bounded stdout TAIL (observed 2000 chars) and
# parses its LAST line as JSON; anything longer arrives head-truncated
# and unparseable (BENCH_r08/r09 both did).
TAIL_BUDGET = 1800


def tail_line(result: dict) -> str:
    """The final stdout line: a compact JSON that provably fits the
    driver's tail window — total + as many per-query timings as fit,
    most expensive first (the rows with plan-audit signal), plus a
    pointer to the committed full artifact."""
    timings = result["queries"]
    cal = result.get("calibration", {})
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "n_queries": len(timings),
        # HEADLINE normalizer: population median (per-query ratio vs
        # the pinned reference over all common queries). The 5-query
        # probe reads ~0.84x of it (quiet-instant bias, BENCHNOTES_r11
        # §1) and is kept as the secondary/diagnostic signal.
        "population_drift_factor": cal.get("population_drift_factor"),
        "population_normalized_total":
            cal.get("population_normalized_total"),
        "probe_drift_factor": cal.get("drift_factor"),
        "probe_normalized_total": cal.get("drift_normalized_total"),
        "full": "bench_result.json",
        "queries": {},
    }
    for name in sorted(timings, key=lambda n: -timings[n]):
        line["queries"][name] = timings[name]
        if len(json.dumps(line, separators=(",", ":"))) > TAIL_BUDGET:
            del line["queries"][name]
            break
    return json.dumps(line, separators=(",", ":"))

# Drift calibrators (r10 verdict): run-level totals on this host drift
# 15-30% between rounds with the machine idle (host-capacity variance
# invisible from inside the sandbox — see BENCHNOTES_r07/r10), so raw
# cross-round totals measure the host, not the code.
#
# HEADLINE normalizer (r11 verdict): population_drift_factor — the
# median per-query ratio of THIS run's best-of-2 times to the pinned
# r10 reference over all common queries (bench_ref_r10.json, the full
# per-query map of the r10 driver window @ f8ef856). It normalizes by
# the same population it corrects, so the probe's measured ~0.84x
# quiet-instant bias (five queries timed back-to-back in quiet
# instants read peak host capacity, the population runs under window
# churn — BENCHNOTES_r11 §1) cancels out. Queries whose implementation
# changed in a round bias its median only as ~1/170th of the
# population each — the median is robust to any realistic per-round
# touched set.
#
# DIAGNOSTIC probe: five FROZEN queries spanning the engine (scan+agg,
# 3-way join, anti-join diff, text, vector math) run interleaved at
# window start/middle/end; the median of their ratio-to-reference is
# "drift_factor". Kept because it is immune to code changes by
# construction (the five are frozen), at the cost of the instrument
# bias above. Both normalizers are only meaningful when this run is
# also sf0.1, else they are null.
CALIBRATION_REF = {
    "q1_pricing_summary": 0.533,
    "q18_large_volume_customers": 1.607,
    "cdc_changes": 0.752,
    "text_metrics": 0.199,
    "similarity_cosine_topk": 0.804,
}
CALIBRATION_REF_SF = 0.1
CALIBRATION_REF_ROUND = 10


# Headline set: CDC core + analytic joins/aggs. Keep in sync with
# cql_replicator_spark/queries.py REGISTRY (subset chosen for signal).
HEADLINE = [
    "cdc_changes",
    "cdc_hydrate_inserts",
    "cdc_union_distinct",
    "cdc_ledger_cycle",
    "reconcile_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q2_min_price_supplier",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q19_disjunctive_revenue",
    "q11_important_parts",
    "q21_waiting_suppliers",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_lines",
    "q14_promo_revenue",
    "q20_volume_suppliers",
    "q22_prospects",
    "orders_cube",
    "skew_salted_join",
    "tile_histogram_xxhash64",
    "column_stats_orders",
    "events_windowed_agg",
    "events_sessionize",
    "events_asof_enrich",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "dedup_clusters_star",
    "dedup_embedding_lsh",
    "dedup_embedding_lsh_verified",
    "similarity_cosine_topk",
    "similarity_ann_ivf",
    "text_metrics",
    "text_language_id",
    "text_term_stats",
    "text_tfidf",
    "curate_documents",
    "stratified_sample_by_split",
    "multimodal_frames",
    "doc_chunking",
    "embedding_quantize",
    "events_lead_lag",
    "orders_moving_avg",
    "sketch_hll_registers",
    "sketch_cms_frequency",
    "decontaminate_splits",
    "sequence_packing",
    "quality_repetition",
    "pii_redaction",
    "chunk_dedup_boilerplate",
    "mixture_weights_lang",
    "quality_unigram_logprob",
    "token_length_histogram",
    "sketch_quantile_histogram",
    "events_funnel",
    "orders_retention_cohorts",
    "zorder_layout_key",
    "bloom_join_prefilter",
    "embedding_kmeans_clusters",
    "dedup_semantic",
    "cdc_apply_changes",
    "cdc_curated_inserts",
    "cdc_stats_drift",
    "events_session_window_native",
    "multimodal_image_headers",
    "multimodal_audio_headers",
    "multimodal_video_headers",
    "lineitem_range_join_windows",
    "weighted_sample_docs",
    "source_orc_roundtrip",
    "compact_small_files",
    "orders_spend_trend",
    "ivm_grouped_refresh",
    "cdc_envelope",
    "text_inverted_index",
    "snapshot_pruned_read",
    "ivm_stream_refresh",
    "events_asof_enrich_chunked",
    "skew_key_profile",
    "events_markov_transitions",
    "text_bm25_scores",
    "validate_constraints",
    "scd2_user_state",
    "retrieval_hybrid_rrf",
    "sketch_hll_grouped",
    "record_linkage_fuzzy",
    "graph_pagerank_suppliers",
    "reconcile_merkle_ranges",
    "events_concurrency_sweep",
    "events_type_bitmap_profile",
    "sketch_quantile_grouped",
    "sketch_hll_setops",
    "dedup_cluster_keepers",
    "orders_revenue_share",
    "curation_report_by_source",
    "cdc_ingest_dedup",
    "events_attribution_journeys",
    "quality_bigram_logprob",
    # r5 wave 5
    "doc_line_dedup",
    "text_sparse_cosine_pairs",
    "events_interval_merge",
    "quarantine_report_orders",
    "kanonymity_audit",
    "training_shards_manifest",
    "hilbert_layout_key",
    "bucketed_join_colocated",
    # r5 wave 6
    "doc_winnowing_pairs",
    "layout_pruning_stats",
    "quality_perplexity_buckets",
    "token_budget_selection",
    "text_keywords_topk",
    "source_schema_evolution",
    # r5 wave 7
    "ivm_join_refresh",
    "scd2_point_in_time_join",
    "events_grouping_sets_time",
    "orders_trailing_90d_spend",
    "dedup_lsh_tuning_table",
    "documents_langdist_chi2",
    # r5 wave 8
    "dedup_minhash_accuracy",
    "embedding_scalar_quantization",
    "orders_window_rank_suite",
    "events_freshness_report",
    # r5 wave 9
    "pipeline_end_to_end",
    "cdc_orphan_lineitems",
    "similarity_recall_at_k",
    # r5 wave 10
    "orders_rfm_segmentation",
    "features_user_behavior",
    "reconcile_rowhash_checksum",
    "orders_seasonal_dow_index",
    # r5 wave 11
    "text_zipf_fit",
    "documents_vocab_growth_heaps",
    "events_power_users_gini",
    # r5 wave 12
    "multimodal_image_text_chunks",
    "events_conversion_latency",
    # r5 wave 13
    "events_wau_rolling",
    "orders_pareto_8020",
    # r5 wave 14
    "text_langid_confusion",
    "embedding_centroid_drift",
    # r5 wave 15
    "lineitem_ship_lag_distribution",
    # r6 (registration freeze round: 3 new queries, 39-query backlog
    # takes the rest of the driver window)
    "snapshot_time_travel",
    "multimodal_bmp_pixel_decode",
    "multimodal_wav_pcm_decode",
    "multimodal_jpeg_pixel_decode",
    # r7 (driver rows for the r6 pytest-only tiers: PQ + the remaining
    # stdlib codecs)
    "multimodal_gif_pixel_decode",
    "multimodal_png_pixel_decode",
    "multimodal_g711_audio_decode",
    "multimodal_adpcm_audio_decode",
    "multimodal_mjpeg_frame_sample",
    "similarity_pq_recall",
    "similarity_ivfpq_recall",
    "multimodal_progressive_jpeg_decode",
    "multimodal_flac_audio_decode",
    "source_statementlog_roundtrip",
    "source_xml_roundtrip",
    "embedding_kmeans_train_sample",
    "multimodal_y4m_pixel_decode",
    "source_statementlog_stream",
    # r11
    "bpe_top_pairs_batched",
]


def main() -> None:
    from pyspark.sql import functions as F

    from cql_replicator_spark.queries import REGISTRY, queries
    from cql_replicator_spark.session import get_spark

    queries()  # force-register the analytics query set

    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            # NOT overridden: spark.sql.files.maxPartitionBytes. A 4m
            # split (32-way scans of the small local files) was A/B
            # tested interleaved in one session: warm best-of-N times
            # are equal-or-worse (task overhead eats the parallelism
            # once the page cache is hot), so the SCALE_CONF 128m
            # stands here too.
        },
    )

    # warm the JVM + parquet footers + codegen/shuffle/broadcast paths once
    # so per-query numbers measure the engine, not session bring-up
    from cql_replicator_spark.session import load_tables
    t = load_tables(spark, SF_DIR)
    w = t["orders"].select("o_orderkey").limit(10_000)
    w.join(w.withColumnRenamed("o_orderkey", "k"),
           w.o_orderkey == F.col("k")).groupBy().count().count()

    def run_calibration() -> dict[str, float]:
        out = {}
        for name in CALIBRATION_REF:
            t0 = time.perf_counter()
            REGISTRY[name].build(spark, SF_DIR).count()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    names = [n for n in HEADLINE if n in REGISTRY]
    # best-of-2 per query: local[N] scheduling jitter is ±25% run-to-run;
    # the min is the engine's cost, the rest is the scheduler's.
    # Calibration probes run interleaved at the window start, mid-pass,
    # between passes, and end (5 sample sets) so drift during the
    # window itself is sampled, not just its edges — the r11 artifact's
    # 3-set calibrator read 0.70 while the 169-query population median
    # read 0.817; more interleaved samples tighten the min-of-N.
    calib_samples = [run_calibration()]
    timings: dict[str, float] = {}
    for _ in range(2):
        for half in (names[: len(names) // 2], names[len(names) // 2:]):
            for name in half:
                t0 = time.perf_counter()
                df = REGISTRY[name].build(spark, SF_DIR)
                df.count()
                dt = round(time.perf_counter() - t0, 3)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
            calib_samples.append(run_calibration())
    total = round(sum(timings.values()), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    at_ref_sf = float(sf) == CALIBRATION_REF_SF
    # The reference times are best-of-2 warm minima, so compare like
    # with like: per-query min across the five interleaved sample sets
    # (one at window start plus one after each of the four half-passes;
    # the first is cold — the min discards it), then the median ratio
    # across the five queries.
    ratios = sorted(
        min(s[n] for s in calib_samples) / CALIBRATION_REF[n]
        for n in CALIBRATION_REF)
    drift = round(ratios[len(ratios) // 2], 4) if at_ref_sf else None

    # Population normalizer (the headline — see the calibrator note):
    # median per-query best-of-2 ratio vs the pinned r10 reference over
    # every query both rounds ran.
    pop_drift = pop_ref_total = None
    ref_path = Path(__file__).resolve().parent / "bench_ref_r10.json"
    if at_ref_sf:
        try:  # a missing/corrupt reference degrades the normalizer to
            ref_q = json.loads(ref_path.read_text())["queries"]  # null,
        except (OSError, ValueError, KeyError):  # never kills the run
            ref_q = {}
        common = sorted(
            timings[n] / ref_q[n]
            for n in timings if n in ref_q and ref_q[n] > 0)
        if common:
            mid = len(common) // 2
            med = (common[mid] if len(common) % 2
                   else (common[mid - 1] + common[mid]) / 2)
            pop_drift = round(med, 4)
            pop_ref_total = len(common)

    result = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "calibration": {
            "ref_round": CALIBRATION_REF_ROUND,
            "ref_sf": CALIBRATION_REF_SF,
            "ref": CALIBRATION_REF,
            "samples": calib_samples,
            "population_ref": "bench_ref_r10.json",
            "population_n_common": pop_ref_total,
            "population_drift_factor": pop_drift,
            "population_normalized_total": (
                round(total / pop_drift, 3) if pop_drift else None),
            "drift_factor": drift,
            "drift_normalized_total": (round(total / drift, 3)
                                       if drift else None),
        },
    }
    # The driver records only a bounded stdout TAIL (observed 2000
    # chars) and parses its last line as JSON. The full 167-query map
    # is ~5.4 KB compact — it can NEVER fit, so BENCH_r08/r09 both
    # recorded "parsed": null with the line's head sliced off. Persist
    # the complete result in the repo, and print as the FINAL stdout
    # line a compact JSON that provably fits the tail window: total +
    # as many per-query timings as fit, most expensive first (the rows
    # with plan-audit signal), plus a pointer to the full artifact.
    (Path(__file__).resolve().parent / "bench_result.json").write_text(
        json.dumps(result, indent=1) + "\n")
    spark.stop()

    # nothing may print after this — it must be the last stdout line
    print(tail_line(result), flush=True)


if __name__ == "__main__":
    main()
