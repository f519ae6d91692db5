#!/usr/bin/env python3
"""Interleaved A/B: split-inside-lambda vs tokenize-once (r16).

Three lanes still inlined `split(text)` into a per-element lambda
(winnowing's gram builder, bigram_logprob's bigram builder, chunk
dedup's chunk builder), which re-splits the whole text per element —
O(n^2) per doc at scan time. quality_repetition measured this exact
pattern at 2x whole-query cost when it was fixed (text.py's
"tokenize ONCE" note); this tool measures the same fix for the three
remaining sites, old form (inline here, byte-for-byte the pre-r16
expressions) vs new form (the library, post-fix).

A-pass = OLD forms, B-pass = NEW forms, alternating; per-form medians.
Run: python3 tools/ab_presplit.py   (SPARK_GRAFT_SF_DIR / _CPUS as bench.py)
Writes bench_ab_presplit.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("AB_PASSES", "8"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cql_replicator_spark.analytics import text as TX
    from cql_replicator_spark.analytics.dedup import md5h32
    from cql_replicator_spark.queries_analytics import _near_fixture
    from cql_replicator_spark.session import get_spark, load_tables

    spark = get_spark("ab_presplit", extra_conf={
        "spark.ui.enabled": "false",
        "spark.sql.shuffle.partitions": os.environ.get(
            "SPARK_GRAFT_CPUS", "32"),
    })
    load_tables(spark, SF_DIR)
    docs = spark.table("documents")

    # ---- OLD forms: byte-for-byte the pre-r16 expressions ----

    def old_winnowing_selected(df, id_col, text_col, k, w):
        grams = df.select(
            F.col(id_col),
            F.posexplode(F.expr(
                f"CASE WHEN size(split({text_col}, ' ')) >= {k} THEN "
                f"transform(sequence(0, size(split({text_col}, ' ')) - {k}), "
                f"i -> array_join(slice(split({text_col}, ' '), i + 1, {k}),"
                f" ' ')) "
                f"ELSE array() END"
            )).alias("pos", "gram"))
        hashed = grams.select(id_col, "pos", md5h32(F.col("gram")).alias("h"))
        win = Window.partitionBy(id_col).orderBy("pos") \
                    .rowsBetween(-(w - 1), 0)
        sel = (hashed.withColumn("__m", F.min("h").over(win))
               .filter((F.col("pos") >= w - 1) & (F.col("h") == F.col("__m"))))
        return sel.select(F.col(id_col), F.col("h").alias("fp"))

    def old_winnowing_pairs(df, k=3, w=4, min_shared=5, max_df=20):
        fps = old_winnowing_selected(df, "doc_id", "text", k, w)
        grouped = (fps.groupBy("fp")
                   .agg(F.collect_set("doc_id").alias("ids"))
                   .filter((F.size("ids") > 1)
                           & (F.size("ids") <= int(max_df))))
        return (grouped.select(F.explode(F.expr(
                    "flatten(transform(ids, x -> transform("
                    "filter(ids, y -> x < y), y -> struct(x AS id_a, y AS id_b))))"
                )).alias("p"))
                .select("p.id_a", "p.id_b")
                .groupBy("id_a", "id_b")
                .agg(F.count("*").cast("long").alias("n_shared"))
                .filter(F.col("n_shared") >= int(min_shared)))

    def old_bigram_logprob(df, id_col="doc_id", text_col="text"):
        w = F.split(F.col(text_col), " ")
        pairs = F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i),
                                  F.element_at(w, i + 1)))
        bg = (df.filter(F.size(w) >= 2)
              .select(F.col(id_col), F.explode(pairs).alias("big")))
        k = bg.groupBy(id_col, "big").agg(F.count("*").alias("k"))
        scored = (k.withColumn("c2",
                               F.sum("k").over(Window.partitionBy("big")))
                  .withColumn("c1", F.sum("k").over(Window.partitionBy(
                      F.substring_index("big", " ", 1))))
                  .select(F.col(id_col), "k",
                          (F.col("k").cast("double")
                           * (F.log(F.col("c2").cast("double"))
                              - F.log(F.col("c1").cast("double"))))
                          .alias("klp")))
        return (scored.groupBy(id_col)
                .agg(F.sum("k").cast("long").alias("n_bigrams"),
                     F.round(-F.sum("klp") / F.sum("k"), 6)
                      .alias("avg_neg_logprob")))

    def old_chunk_dedup(df, chunk_words=10):
        w = int(chunk_words)
        chunks = F.expr(
            f"transform(sequence(0, int((size(split(text, ' ')) - 1) / {w})), "
            f"i -> array_join(slice(split(text, ' '), i * {w} + 1, {w}), ' '))")
        out = df.select(F.col("doc_id"), chunks.alias("__chunks"))
        kept = F.expr(
            "filter(__chunks, (c, i) -> array_position(__chunks, c) = i + 1)")
        return out.select(
            F.col("doc_id"),
            F.size("__chunks").alias("n_chunks"),
            F.size(kept).alias("n_kept"),
            F.array_join(kept, " ").alias("dedup_text"))

    near = _near_fixture(spark, SF_DIR)

    forms = {
        "winnowing_pairs": {
            "old": lambda: old_winnowing_pairs(near),
            "new": lambda: TX.winnowing_pairs(near, k=3, w=4, min_shared=5,
                                              max_df=20),
        },
        "bigram_logprob": {
            "old": lambda: old_bigram_logprob(docs),
            "new": lambda: TX.bigram_logprob(docs),
        },
        "chunk_dedup": {
            "old": lambda: old_chunk_dedup(docs),
            "new": lambda: TX.dedup_chunks_within_doc(docs),
        },
    }

    # equivalence pin: old and new forms agree row-for-row
    for name, fb in forms.items():
        a = fb["old"]().exceptAll(fb["new"]())
        b = fb["new"]().exceptAll(fb["old"]())
        assert a.count() == 0 and b.count() == 0, f"{name} forms differ!"

    raw: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in forms}
    for p in range(PASSES):
        side = "old" if p % 2 == 0 else "new"
        for name, fb in forms.items():
            t0 = time.perf_counter()
            fb[side]().count()
            raw[name][side].append(round(time.perf_counter() - t0, 3))

    out = {"passes": PASSES, "sf_dir": SF_DIR, "raw": raw, "medians": {}}
    for name in forms:
        mo = statistics.median(raw[name]["old"])
        mn = statistics.median(raw[name]["new"])
        out["medians"][name] = {
            "old": round(mo, 3), "new": round(mn, 3),
            "ratio_new_over_old": round(mn / mo, 3)}
        print(f"{name}: old {mo:.3f}s new {mn:.3f}s "
              f"ratio {mn / mo:.3f}")
    (ROOT / "bench_ab_presplit.json").write_text(
        json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
