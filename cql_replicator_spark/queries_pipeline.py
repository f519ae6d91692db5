"""Wave-5 pipeline query registrations: within-doc dedup, sparse
cosine similarity join, interval merge, row-level quarantine,
k-anonymity, shard manifests, Hilbert layout, bucketed co-located
join (imported by cql_replicator_spark.queries via
queries_analytics' registration chain).

Float discipline follows the registry convention: a single
correctly-rounded ln/div/sqrt chain then round(..., 6) before any
comparison, so both engines land on the same digits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .analytics import dedup as D
from .analytics import text as TX
from .analytics import validate as V
from .queries import register, _t
from .queries_analytics import _NEAR_FIXTURE_SQL, _SHINGLE_SQL, _md5h32_sql
from .temporal import merge_intervals
from .tiling import hilbert_2d, hilbert_sql


# -- within-doc duplicate-chunk removal (C4 line dedup analogue) --------------

# a 10-word boilerplate "line"; three appended copies guarantee at least
# two identical aligned 10-word windows at ANY chunk offset (the 30-word
# suffix is 10-periodic, so any two full windows 10 apart inside it are
# equal strings regardless of where the original text ends)
_BP = ("ad tracker cookie banner subscribe newsletter footer privacy "
       "terms contact")
_BP3 = " ".join([_BP] * 3)

_SEED_BP_SQL = f"""
seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN text || ' {_BP3}' ELSE text END AS text
  FROM documents
)
"""


@register(
    "doc_line_dedup",
    oracle=f"""
WITH {_SEED_BP_SQL},
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM seeded),
ch AS (
  SELECT doc_id, i,
         array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
  FROM w, unnest(generate_series(0, CAST((len(w)-1)//10 AS INT))) t(i)
),
f AS (SELECT doc_id, chunk, min(i) AS fi FROM ch GROUP BY doc_id, chunk),
stats AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY fi) AS dedup_text
  FROM f GROUP BY doc_id
)
SELECT s.doc_id, CAST(s.n_chunks AS INT) AS n_chunks,
       CAST(k.n_kept AS INT) AS n_kept, k.dedup_text
FROM stats s JOIN kept k ON k.doc_id = s.doc_id
""",
    doc="C4-style within-document duplicate-line removal over fixed "
        "10-word chunks (Raffel et al.'s dedupe-lines-in-page rule for "
        "line-less corpora): repeats of an already-seen chunk are "
        "dropped and survivors re-join in order. Docs with doc_id%4==0 "
        "are seeded with a 3x-repeated boilerplate footer both engines "
        "reproduce. Pure higher-order array expressions (split, "
        "slice-transform, first-occurrence filter, re-join) in "
        "whole-stage codegen: a per-row projection with NO shuffle, so "
        "at 100 TB it runs at scan speed ahead of any cross-doc dedup",
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    seeded = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.col("text"), F.lit(" " + _BP3)))
         .otherwise(F.col("text")).alias("text"))
    return TX.dedup_chunks_within_doc(seeded, chunk_words=10)


# -- sparse TF-IDF all-pairs cosine over shingles -----------------------------

@register(
    "text_sparse_cosine_pairs",
    oracle=f"""
WITH {_NEAR_FIXTURE_SQL.strip().rstrip()},
{_SHINGLE_SQL.strip().lstrip()},
dfreq AS (SELECT gram, count(*) AS df_t FROM sh GROUP BY gram),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
p AS (
  SELECT s.doc_id, s.gram, ln(CAST(n.n_docs AS DOUBLE) / d.df_t) AS w
  FROM sh s JOIN dfreq d ON d.gram = s.gram CROSS JOIN n
  WHERE d.df_t <= 20
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nn FROM p GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
  FROM p a JOIN p b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(dot / (na.nn * nb.nn), 6) AS cosine
FROM dots
JOIN nrm na ON na.doc_id = id_a
JOIN nrm nb ON nb.doc_id = id_b
WHERE round(dot / (na.nn * nb.nn), 6) >= 0.3
""",
    doc="All-pairs sparse TF-IDF cosine via the inverted index "
        "(DISCO / Elsayed et al.): docs only meet through shared "
        "terms, so pairs are generated per posting list, and the "
        "df<=20 cutoff prunes high-df terms BEFORE pairing — the terms "
        "that explode the candidate space quadratically carry the "
        "least idf weight, so dropping them bounds per-term pair work "
        "at df_cutoff^2 (skew-capped by construction). Terms are "
        "3-word shingles (idf over the near-dup fixture); binary tf. "
        "The 100 TB shape: one scan, bounded aggregations, capped "
        "self-join — never an all-pairs cross product",
)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_analytics import _near_fixture
    docs = _near_fixture(spark, sf_dir)
    sh = D.shingles(docs).withColumnRenamed("gram", "tok")
    return TX.sparse_cosine_pairs(docs, df_cutoff=20, min_sim=0.3, terms=sh)


# -- per-user interval union ---------------------------------------------------

@register(
    "events_interval_merge",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 1800000 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pme
  FROM iv
),
o AS (
  SELECT user_id, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS op
  FROM m
),
g AS (
  SELECT user_id, s, e,
         sum(op) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM o
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       min(s) AS s, max(e) AS e,
       CAST(count(*) AS BIGINT) AS n_merged
FROM g GROUP BY user_id, island
""",
    doc="Interval union per user (PostgreSQL range_agg / session "
        "stitching): each event opens a half-open 30-min activity "
        "window; overlapping/touching windows coalesce into maximal "
        "disjoint spans. Island detection with two windows over ONE "
        "shuffle on the user key — an interval opens a new island iff "
        "its start exceeds the running max end of all earlier "
        "intervals; no self-join, nothing quadratic, skew follows the "
        "per-user event distribution",
)
def events_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    ms = F.unix_millis(F.col("ts").cast("timestamp"))  # NTZ -> UTC instant
    iv = events.select("user_id", ms.alias("s"), (ms + 1800000).alias("e"))
    out = merge_intervals(iv, "user_id", "s", "e")
    return out.withColumn("island", F.col("island").cast("long"))


# -- row-level quarantine ------------------------------------------------------

_SEED_VIOL_SQL = """
seeded AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 89 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 79 = 0
              THEN o_orderdate + INTERVAL 3650 DAY
              ELSE o_orderdate END AS o_orderdate,
         CASE WHEN o_orderkey % 83 = 0 THEN NULL
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders
)
"""


@register(
    "quarantine_report_orders",
    oracle=f"""
WITH {_SEED_VIOL_SQL},
fl AS (
  SELECT
    CASE WHEN NOT coalesce(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END AS v_price,
    CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
         THEN 1 ELSE 0 END AS v_status,
    CASE WHEN NOT coalesce(o_orderdate <= TIMESTAMP '1998-12-31', FALSE)
         THEN 1 ELSE 0 END AS v_date,
    CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END AS v_prio,
    CASE WHEN NOT coalesce(o_custkey > 0, FALSE) THEN 1 ELSE 0 END AS v_cust
  FROM seeded
)
SELECT reason, n FROM (
  SELECT 'price_positive' AS reason, CAST(sum(v_price) AS BIGINT) AS n FROM fl
  UNION ALL
  SELECT 'status_known', CAST(sum(v_status) AS BIGINT) FROM fl
  UNION ALL
  SELECT 'date_in_range', CAST(sum(v_date) AS BIGINT) FROM fl
  UNION ALL
  SELECT 'priority_present', CAST(sum(v_prio) AS BIGINT) FROM fl
  UNION ALL
  SELECT 'custkey_positive', CAST(sum(v_cust) AS BIGINT) FROM fl
) WHERE n > 0
UNION ALL
SELECT '__quarantined__',
       CAST(count(*) FILTER (WHERE v_price + v_status + v_date + v_prio
                                   + v_cust > 0) AS BIGINT)
FROM fl
UNION ALL
SELECT '__clean__',
       CAST(count(*) FILTER (WHERE v_price + v_status + v_date + v_prio
                                   + v_cust = 0) AS BIGINT)
FROM fl
""",
    doc="Row-level constraint quarantine (Deequ row-level results / "
        "DLT expect_or_drop): five codegen predicates evaluated in one "
        "scan tag each row with its violation reasons; the report "
        "aggregates per-reason counts plus clean/quarantined totals. "
        "NULL rule results count as violations (unevaluable rows are "
        "exactly the ones to hold). Violations are seeded by modular "
        "rules both engines reproduce; rules with zero violations are "
        "absent from the report by construction on both sides. The "
        "100 TB shape: pure projection + one explode of (usually "
        "empty) reason arrays — the DLQ write stays proportional to "
        "the damage, not the table",
)
def quarantine_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    k = F.col("o_orderkey")
    seeded = orders.select(
        "o_orderkey", "o_custkey",
        F.when(k % 89 == 0, "X").otherwise(F.col("o_orderstatus"))
         .alias("o_orderstatus"),
        F.when(k % 97 == 0, -F.col("o_totalprice"))
         .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(k % 79 == 0, F.col("o_orderdate") + F.expr("INTERVAL 3650 DAY"))
         .otherwise(F.col("o_orderdate")).alias("o_orderdate"),
        F.when(k % 83 == 0, F.lit(None).cast("string"))
         .otherwise(F.col("o_orderpriority")).alias("o_orderpriority"))
    rules = [
        ("price_positive", F.col("o_totalprice") > 0),
        ("status_known", F.col("o_orderstatus").isin("O", "F", "P")),
        ("date_in_range", F.col("o_orderdate") <= F.lit("1998-12-31").cast("timestamp")),
        ("priority_present", F.col("o_orderpriority").isNotNull()),
        ("custkey_positive", F.col("o_custkey") > 0),
    ]
    return V.quarantine_report(seeded, rules)


# -- k-anonymity audit ---------------------------------------------------------

@register(
    "kanonymity_audit",
    oracle="""
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
       CAST(count(*) AS BIGINT) AS class_size,
       count(*) < 5 AS suppress
FROM customer
GROUP BY c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)
""",
    doc="k-anonymity audit (Sweeney 2002) over the quasi-identifier "
        "tuple (nation, segment, balance-bucket): every equivalence "
        "class smaller than k=5 is re-identifiable by linkage and "
        "flagged for suppression/generalization before release. One "
        "map-side-combined groupBy; the result is class-sized, never "
        "table-sized",
)
def kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")["customer"]
    quasi = customer.select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"))
    return V.k_anonymity(quasi, ["c_nationkey", "c_mktsegment", "bal_bucket"],
                         k=5)


# -- training-shard manifest ---------------------------------------------------

@register(
    "training_shards_manifest",
    oracle=f"""
SELECT {_md5h32_sql("CAST(doc_id AS VARCHAR)")} % 16 AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM documents
GROUP BY {_md5h32_sql("CAST(doc_id AS VARCHAR)")} % 16
""",
    doc="Deterministic training-shard manifest: shard = md5h32(id) mod "
        "16 (the same engine-portable hash the split/dedup ops use, so "
        "any worker recomputes any row's shard with no RNG), manifest "
        "rows carry doc/token/char totals and the id range per shard — "
        "what a loader needs to plan epochs and an auditor needs to "
        "prove no shard was dropped. One map-side-combined groupBy "
        "with 16 groups: the shuffle moves 16 rows per input partition "
        "regardless of corpus size",
)
def training_shards_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    return TX.shard_manifest(docs, n_shards=16)


# -- Hilbert space-filling-curve layout key ------------------------------------

@register(
    "hilbert_layout_key",
    oracle=hilbert_sql(
        "o_orderkey", "(o_custkey % 256)", "(o_orderkey % 256)",
        "FROM orders", bits=8, out_col="hval"),
    doc="Hilbert-curve clustering key over (custkey, orderkey) buckets "
        "— the space-filling-curve layout with strictly better "
        "locality than Z-order (adjacent indexes are always adjacent "
        "cells; no quadrant-boundary jumps), so file min/max ranges "
        "overlap less and data skipping prunes more (why Delta "
        "OPTIMIZE grew Hilbert next to ZORDER). Canonical xy2d bit "
        "descent unrolled to 8 rounds of integer CASE arithmetic in "
        "whole-stage codegen; the oracle SQL is emitted by the SAME "
        "generator (tiling.hilbert_sql), so both engines run one "
        "algorithm — verified bijective against the pure-Python "
        "reference in pytest",
)
def hilbert_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    return hilbert_2d(orders.select("o_orderkey", "o_custkey"),
                      F.col("o_custkey") % 256, F.col("o_orderkey") % 256,
                      bits=8).select("o_orderkey", "hval")


# -- bucketed co-located join --------------------------------------------------

@register(
    "bucketed_join_colocated",
    oracle="""
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
    doc="Exchange-free fact-to-fact join via bucketed tables "
        "(bucketing.py): both sides are written bucketBy(orderkey) + "
        "sortBy once — spending the shuffle at WRITE time — after "
        "which Catalyst plans a SortMergeJoin with NO Exchange and no "
        "Sort on either side (asserted by "
        "tests/test_core.py::test_bucketed_join_has_no_exchange). At "
        "100 TB this is THE lever for repeated joins on the same key: "
        "every CDC diff cycle re-joins snapshots bucketed by PK "
        "without ever re-shuffling the table. The oracle is the plain "
        "join — bucketing must not change the answer",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .bucketing import write_bucketed_table
    t = _t(spark, sf_dir, "orders", "lineitem")
    suffix = f"p{os.getpid()}"
    ot, lt = f"sg_bkt_orders_{suffix}", f"sg_bkt_lineitem_{suffix}"
    write_bucketed_table(
        t["orders"].select("o_orderkey", "o_orderstatus"),
        ot, ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(
        t["lineitem"].select("l_orderkey", "l_extendedprice", "l_discount"),
        lt, ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    o, li = spark.table(ot), spark.table(lt)
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderstatus")
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                  .alias("revenue")))
