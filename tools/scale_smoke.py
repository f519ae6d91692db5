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

    docs.select("doc_id").limit(100).count()  # warm
    result: dict[str, dict] = {}
    for scale, frame in (("base_1x", amplified(1)),
                         (f"amp_{AMPLIFY}x", amplified(AMPLIFY))):
        n = frame.count()
        row = {}
        for name, build in ops.items():
            t0 = time.perf_counter()
            cnt = build(frame).count()
            row[name] = {"sec": round(time.perf_counter() - t0, 2),
                         "rows_out": cnt}
        result[scale] = {"n_docs": n, "ops": row}

    base, amp = result["base_1x"], result[f"amp_{AMPLIFY}x"]
    for name in ops:
        b, a = base["ops"][name]["sec"], amp["ops"][name]["sec"]
        ratio = a / b if b else float("nan")
        print(f"{name:22s} 1x={b:7.2f}s {AMPLIFY}x={a:8.2f}s "
              f"time-ratio={ratio:6.1f} (linear would be ~{AMPLIFY})")
    (ROOT / "scale_smoke.json").write_text(json.dumps(
        {"sf_dir": SF_DIR, "amplify": AMPLIFY, "results": result}))


if __name__ == "__main__":
    main()
