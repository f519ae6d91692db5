"""Round-5 pipeline query registrations (waves 5-6): within-doc dedup, sparse
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
from .distrank import global_rank_cumsum
from .queries import register, _t
from .queries_analytics import (
    _NEAR_FIXTURE_SQL, _SHINGLE_SQL, _floor_long_sql, _md5h32_sql,
)
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
SELECT s0.doc_id, CAST(s.n_chunks AS INT) AS n_chunks,
       CAST(k.n_kept AS INT) AS n_kept, k.dedup_text
FROM seeded s0
LEFT JOIN stats s ON s.doc_id = s0.doc_id
LEFT JOIN kept k ON k.doc_id = s0.doc_id
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
         max(e) OVER (PARTITION BY user_id ORDER BY s NULLS FIRST, e NULLS FIRST
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
         sum(op) OVER (PARTITION BY user_id ORDER BY s NULLS FIRST, e NULLS FIRST
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


# -- winnowing fingerprint candidate pairs ------------------------------------

@register(
    "doc_winnowing_pairs",
    oracle=f"""
WITH {_NEAR_FIXTURE_SQL.strip()},
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
grams AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[(i + 1):(i + 3)], ' ') AS gram
  FROM w, unnest(generate_series(0, CAST(len(w) - 3 AS INT))) t(i)
  WHERE len(w) >= 3
),
hashed AS (
  SELECT doc_id, pos, {_md5h32_sql('gram')} AS h FROM grams
),
sel AS (
  SELECT doc_id, h,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
         pos
  FROM hashed
),
fps AS (
  SELECT DISTINCT doc_id, h AS fp FROM sel WHERE pos >= 3 AND h = m
),
dfreq AS (SELECT fp, count(*) AS df_t FROM fps GROUP BY fp),
pruned AS (
  SELECT f.doc_id, f.fp FROM fps f JOIN dfreq d ON d.fp = f.fp
  WHERE d.df_t <= 20
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 5
""",
    doc="Winnowing fingerprint candidate pairs (Schleimer et al., "
        "MOSS): word-3-gram hashes thinned to trailing-window-4 local "
        "minima give each doc a small position-independent fingerprint "
        "set; docs pair through shared fingerprints (>=5), localizing "
        "shared PASSAGES that whole-doc MinHash dilutes away. max_df=20 "
        "drops boilerplate-phrase fingerprints before pairing — the "
        "same df cap as the sparse cosine join, so per-fingerprint "
        "pair work is bounded at 400 regardless of corpus size. Runs "
        "on the near-dup fixture; expected fingerprint density 2/(w+1)",
)
def doc_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_analytics import _near_fixture
    docs = _near_fixture(spark, sf_dir)
    return TX.winnowing_pairs(docs, k=3, w=4, min_shared=5, max_df=20)


# -- space-filling-curve pruning quality, measured -----------------------------

def _zval_xy_sql() -> str:
    from .queries_analytics import _zvalue_sql
    return _zvalue_sql("b.x", "b.y", bits=8)


_ZVAL_XY_SQL = _zval_xy_sql()


def _layout_branch_sql(key_expr: str, label: str) -> str:
    return f"""
SELECT '{label}' AS layout, tile,
       max(x) - min(x) AS x_span, max(y) - min(y) AS y_span
FROM (
  SELECT x, y,
         ntile(64) OVER (ORDER BY {key_expr} NULLS FIRST,
                         o_orderkey NULLS FIRST) AS tile
  FROM keyed
) GROUP BY tile
"""


@register(
    "layout_pruning_stats",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         o_custkey % 256 AS x, o_orderkey % 256 AS y
  FROM orders
),
hil AS (
  {hilbert_sql("o_orderkey, x, y", "x", "y", "FROM base", bits=8,
               out_col="hval")}
),
keyed AS (
  SELECT b.o_orderkey, b.x, b.y,
         CAST({_ZVAL_XY_SQL} AS BIGINT) AS zval,
         h.hval
  FROM base b JOIN hil h ON h.o_orderkey = b.o_orderkey
),
spans AS (
  {_layout_branch_sql('o_orderkey', 'natural')}
  UNION ALL
  {_layout_branch_sql('zval', 'zorder')}
  UNION ALL
  {_layout_branch_sql('hval', 'hilbert')}
)
SELECT layout,
       round(avg(x_span), 2) AS avg_x_span,
       round(avg(y_span), 2) AS avg_y_span
FROM spans GROUP BY layout
""",
    doc="Space-filling-curve pruning quality, MEASURED instead of "
        "asserted: rows are packed into 64 equal 'files' by ntile over "
        "each layout key (natural orderkey, Z-order, Hilbert) and the "
        "per-file min/max span of each dimension is averaged — exactly "
        "the min/max statistics data skipping consults, so a smaller "
        "avg span = fewer files read per point/range predicate. "
        "Measured at sf0.01: natural order is useless on BOTH mod-256 "
        "digits (~253 avg span — each 234-row file wraps the full "
        "bucket range); Z-order averages (66.6, 41.3); Hilbert "
        "(38.9, 39.2) — tighter and balanced, the "
        "no-quadrant-boundary-jumps property made measurable. The "
        "tiling is EXACT ntile semantics computed distributed: "
        "distrank's two-pass global rank (range partition, parallel "
        "per-partition windows, broadcast offsets) plus the SQL ntile "
        "bucket formula — first n%%64 tiles get ceil(n/64) rows, the "
        "rest floor(n/64) — so no layout branch ever funnels the "
        "table into a single-partition sort",
)
def layout_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tiling import zvalue_2d
    orders = _t(spark, sf_dir, "orders")["orders"]
    base = orders.select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (F.col("o_orderkey") % 256).alias("y"))
    keyed = (hilbert_2d(base, "x", "y", bits=8)
             .withColumn("zval", zvalue_2d("x", "y", bits=8))
             .localCheckpoint())  # 3 layout branches + the count below
    # exact ntile(64) from the global rank: q/rem are driver literals,
    # tile = ceil-sized buckets first (SQL ntile's row distribution)
    n = keyed.count()
    q, rem = divmod(n, 64)
    # ONE stacked distrank pass instead of three (r16): each branch is
    # a contiguous block of the total order (_layout, key, o_orderkey),
    # so one global rank serves all three — per-branch rank is
    # _r - _layout*n (every block holds exactly n rows). Same bytes
    # through the range exchange as 3 separate passes, but one
    # localCheckpoint + one offsets collect + one broadcast join
    # instead of three of each (distrank's fixed per-call barriers were
    # ~2/3 of this lane's wall time).
    layouts = (("natural", "o_orderkey"), ("zorder", "zval"),
               ("hilbert", "hval"))
    stacked = None
    for li, (_label, key) in enumerate(layouts):
        b = keyed.select(
            F.lit(li).alias("_layout"),
            F.col(key).cast("long").alias("_key"),
            "o_orderkey", "x", "y")
        stacked = b if stacked is None else stacked.unionByName(b)
    ranked = global_rank_cumsum(
        stacked,
        order=[("_layout", False), ("_key", False), ("o_orderkey", False)],
        rank_col="_r")
    ranked = ranked.withColumn(
        "_lr", F.col("_r") - F.col("_layout").cast("long") * F.lit(n))
    head = rem * (q + 1)
    if q == 0:  # fewer rows than tiles: ntile gives row r bucket r
        tile = F.expr("CAST(_lr AS INT)")
    else:  # integer DIV keeps the bucket boundary exact at any n
        tile = F.expr(
            f"CAST(CASE WHEN _lr <= {head} THEN (_lr - 1) DIV {q + 1} + 1 "
            f"ELSE {rem} + (_lr - {head} - 1) DIV {q} + 1 END AS INT)")
    label = F.element_at(
        F.array(*[F.lit(lb) for lb, _ in layouts]), F.col("_layout") + 1)
    spans = (ranked.select(label.alias("layout"), "x", "y",
                           tile.alias("tile"))
             .groupBy("layout", "tile")
             .agg((F.max("x") - F.min("x")).alias("x_span"),
                  (F.max("y") - F.min("y")).alias("y_span")))
    return (spans.groupBy("layout")
            .agg(F.round(F.avg("x_span"), 2).alias("avg_x_span"),
                 F.round(F.avg("y_span"), 2).alias("avg_y_span")))


# -- CCNet perplexity buckets --------------------------------------------------

_UNIGRAM_SCORE_SQL = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
v AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
nn AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM v),
score AS (
  SELECT t.doc_id,
         round(-avg(ln(CAST(v.tf AS DOUBLE)) - ln(nn.n)), 6) AS s
  FROM tok t JOIN v ON v.tok = t.tok CROSS JOIN nn
  GROUP BY t.doc_id
),
langd AS (
  SELECT sc.doc_id, d.lang, sc.s
  FROM score sc JOIN documents d ON d.doc_id = sc.doc_id
)
"""


@register(
    "quality_perplexity_buckets",
    oracle=f"""
WITH {_UNIGRAM_SCORE_SQL.strip()},
cuts AS (
  SELECT lang,
         round(quantile_cont(s, 0.3333333333333333), 6) AS p33,
         round(quantile_cont(s, 0.6666666666666666), 6) AS p67
  FROM langd GROUP BY lang
)
SELECT l.lang,
       CASE WHEN l.s <= c.p33 THEN 'head'
            WHEN l.s <= c.p67 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(l.s), 6) AS avg_score
FROM langd l JOIN cuts c ON c.lang = l.lang
GROUP BY l.lang, CASE WHEN l.s <= c.p33 THEN 'head'
                      WHEN l.s <= c.p67 THEN 'middle'
                      ELSE 'tail' END
""",
    doc="CCNet perplexity bucketing (Wenzek et al. 2020): per-language "
        "head/middle/tail terciles of the unigram-LM quality score — "
        "the curriculum knob CCNet exposes (train on head, drop tail). "
        "Exact interpolated tercile cuts per language from one bounded "
        "aggregation (languages are few), bucket assignment as a "
        "comparison against the broadcast cut frame, then a "
        "3x|langs|-row rollup. No global sort anywhere — the scalable "
        "shape for a 100 TB corpus scoring pass",
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    scored = (TX.unigram_logprob(docs)
              .select("doc_id", F.col("avg_neg_logprob").alias("s"))
              .join(docs.select("doc_id", "lang"), "doc_id"))
    # cuts rounded to the SAME 6dp grid as the scores (both engines):
    # the interpolated percentile differs between engines in the last
    # ulp, and a doc whose s sits exactly on a cut then flips buckets —
    # found by the r14 full-registry sf0.1 oracle run (two 'es' docs
    # swapped head/middle; invisible at sf0.01 where no doc lands on a
    # cut). Thirds of 6dp values never fall near a rounding midpoint,
    # so the shared grid absorbs the ulp divergence completely.
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("s", F.lit(1.0 / 3)), 6).alias("p33"),
        F.round(F.percentile("s", F.lit(2.0 / 3)), 6).alias("p67"))
    bucket = (F.when(F.col("s") <= F.col("p33"), "head")
              .when(F.col("s") <= F.col("p67"), "middle")
              .otherwise("tail"))
    return (scored.join(F.broadcast(cuts), "lang")
            .groupBy("lang", bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.round(F.avg("s"), 6).alias("avg_score")))


# -- token-budget corpus selection ---------------------------------------------

@register(
    "token_budget_selection",
    oracle=f"""
WITH {_UNIGRAM_SCORE_SQL.strip()},
counted AS (
  SELECT l.doc_id, l.s,
         len(string_split(d.text, ' ')) AS n_tokens
  FROM langd l JOIN documents d ON d.doc_id = l.doc_id
),
run AS (
  SELECT doc_id, s, n_tokens,
         sum(n_tokens) OVER (ORDER BY s, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_tokens
  FROM counted
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM run WHERE cum_tokens <= 10000
""",
    doc="Token-budget corpus selection: docs ranked by LM quality "
        "(unigram score asc = most natural first, id tiebreak), "
        "admitted in rank order until the 10k-token training budget is "
        "exhausted — the 'best data first under a budget' selection "
        "every data-constrained training run makes. The running sum is "
        "distrank's two-pass distributed cumsum (range partition by "
        "quality, per-partition windows, broadcast prefix offsets) — "
        "exact because token counts are integers — so no global total "
        "order is ever funneled into one partition",
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    counted = (TX.unigram_logprob(docs)
               .select("doc_id", F.col("avg_neg_logprob").alias("s"),
                       "n_tokens"))
    ranked = global_rank_cumsum(
        counted, order=[("s", False), ("doc_id", False)],
        sum_cols={"cum_tokens": "n_tokens"}, rank_col="_r")
    return (ranked
            .filter(F.col("cum_tokens") <= 10000)
            .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("cum_tokens").cast("long").alias("cum_tokens")))


# -- top-k TF-IDF keywords per doc ---------------------------------------------

@register(
    "text_keywords_topk",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token
  HAVING count(DISTINCT doc_id) >= 2
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.doc_freq), 6)
           AS tfidf
  FROM tf JOIN dfreq ON dfreq.token = tf.token CROSS JOIN n
),
ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, token) AS rk
  FROM scored
)
SELECT doc_id, token, tfidf, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
""",
    doc="Top-3 TF-IDF keywords per document — the keyword-extraction "
        "composition (tf_idf + per-doc window): rank by rounded score "
        "(deterministic cross-engine), token tiebreak. Spark's "
        "WindowGroupLimit pushes the rank<=3 filter below the sort, so "
        "each partition keeps 3 rows per doc before the exchange — the "
        "shuffle carries O(docs x 3), not the full (doc, token) matrix",
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    docs = _t(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (TX.tf_idf(docs, min_doc_freq=2)
            .select("doc_id", "token", "tfidf")
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3))


# -- schema-evolution source ---------------------------------------------------

@register(
    "source_schema_evolution",
    oracle="""
SELECT doc_id, length(text) AS n_chars,
       CASE WHEN doc_id % 2 = 1
            THEN round(CAST(doc_id % 7 AS DOUBLE) / 7, 6)
            ELSE NULL END AS quality
FROM documents
""",
    doc="Schema-evolution read path: two parquet batches staged with "
        "DIFFERENT schemas (batch 2 adds a quality column), read back "
        "through mergeSchema=true — the additive-evolution contract "
        "every long-lived ingest hits (old files never rewritten; "
        "missing columns surface as NULL). The oracle reconstructs the "
        "merged view from the source table directly, so the evolved "
        "read must be value-exact. At 100 TB mergeSchema's footer "
        "union is the cheap part; the lesson encoded here is explicit "
        "schemas + additive-only evolution",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .queries_analytics import _stage_dir
    docs = _t(spark, sf_dir, "documents")["documents"]
    stage = _stage_dir("schema_evo")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = (docs.filter(F.col("doc_id") % 2 == 1)
           .select("doc_id", "text",
                   F.round((F.col("doc_id") % 7).cast("double") / 7, 6)
                    .alias("quality")))
    old.write.mode("overwrite").parquet(f"{stage}/batch=1")
    new.write.mode("overwrite").parquet(f"{stage}/batch=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{stage}/batch=1", f"{stage}/batch=2")
    return back.select("doc_id", F.length("text").alias("n_chars"), "quality")


# -- incremental maintenance of a JOIN view ------------------------------------

from .queries import _CDC_BASE_SQL as _CDC_BASE_SQL_REF  # noqa: E402

_DIM_SQL = """
dim AS (
  SELECT i AS dk, (i % 7) + 1 AS w, i % 5 AS g
  FROM unnest(generate_series(0, 99)) t(i)
)
"""


@register(
    "ivm_join_refresh",
    oracle=f"""
WITH {_CDC_BASE_SQL_REF.strip()},
{_DIM_SQL.strip()}
SELECT d.g,
       CAST(sum(t.ts * d.w) AS BIGINT) AS sum_v,
       CAST(count(*) AS BIGINT) AS n
FROM t1 t JOIN dim d ON d.dk = t.pk % 100
GROUP BY d.g
""",
    doc="Incremental maintenance of a JOIN view (the delta-join "
        "algebra): the materialized view aggregates fact JOIN dim "
        "(weighted sums per dim group); the refresh never rescans the "
        "fact table — row-level CDC changes (one tagged full-outer "
        "diff) are joined to the broadcast dim, updates fetch their "
        "old value with a change-sized semi-join back into T0, and the "
        "signed delta rows merge into the previous state exactly as "
        "ivm.refresh_aggregate does for plain aggregates. ΔV = "
        "Δfact ⋈ dim — the static-dim case of the full bilinear rule "
        "Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB. The oracle recomputes the "
        "view from T1, so the O(changes) path must land on the "
        "O(table) recompute's answer. 100 TB point: after a 0.1%% "
        "discovery cycle the join view refreshes at change-set cost",
)
def ivm_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .diff import compute_changes_tagged
    from .ivm import refresh_aggregate
    from .queries import _cdc_snapshots
    t0, t1 = _cdc_snapshots(spark, sf_dir)
    dim = spark.range(100).select(
        F.col("id").alias("dk"), ((F.col("id") % 7) + 1).alias("w"),
        (F.col("id") % 5).alias("g"))

    def joined(t: DataFrame) -> DataFrame:
        return (t.withColumn("dk", F.col("pk") % 100)
                .join(F.broadcast(dim), "dk")
                .select("pk", "g", (F.col("ts") * F.col("w")).alias("v")))

    # V0: the materialized state (the only full-fact join, done once);
    # nn = non-null counter for SQL-exact NULL semantics on refresh
    v0 = joined(t0).groupBy("g").agg(
        F.sum("v").alias("sum_v"), F.count("*").alias("n"),
        F.count("v").alias("nn"))

    # refresh path: change-set-sized all the way
    ch = compute_changes_tagged(t1, t0, ["pk"])
    new_side = (ch.filter(F.col("op").isin("insert", "update"))
                .select("pk", "ts"))
    old_upd = (ch.filter(F.col("op") == "update").select("pk")
               .join(t0, "pk"))  # change-sized fetch of the old values
    deletes = ch.filter(F.col("op") == "delete").select("pk", "ts")
    pos = joined(new_side).select("g", "v", F.lit(1).alias("s"))
    neg = (joined(old_upd).unionByName(joined(deletes))
           .select("g", "v", F.lit(-1).alias("s")))
    deltas = (pos.unionByName(neg).groupBy("g")
              .agg(F.coalesce(F.sum(F.col("s") * F.col("v")), F.lit(0))
                    .alias("d_sum"),
                   F.sum("s").alias("d_count"),
                   F.coalesce(
                       F.sum(F.col("s")
                             * F.col("v").isNotNull().cast("int")),
                       F.lit(0)).alias("d_nn")))
    v1 = refresh_aggregate(v0, deltas, ["g"])
    return v1.select("g", F.col("sum_v").cast("long").alias("sum_v"),
                     F.col("n").cast("long").alias("n"))


# -- SCD2 point-in-time (temporal) join ----------------------------------------

_STATE_IV_SQL = """
state_feed AS (
  SELECT user_id, event_type, ts, event_id FROM events
  WHERE event_type <> 'purchase'
),
ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
           AS prev_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS rn
  FROM state_feed
),
chg AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
),
iv AS (
  SELECT user_id, event_type, ts AS vf,
         lead(ts) OVER w AS vt,
         row_number() OVER w AS version
  FROM chg
  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
)
"""


@register(
    "scd2_point_in_time_join",
    oracle=f"""
WITH {_STATE_IV_SQL.strip()}
SELECT e.event_id, e.user_id, i.event_type AS state_type,
       CAST(i.version AS BIGINT) AS version,
       epoch_ms(e.ts) AS purchase_ts_ms
FROM events e
JOIN iv i ON i.user_id = e.user_id
         AND e.ts >= i.vf AND (i.vt IS NULL OR e.ts < i.vt)
WHERE e.event_type = 'purchase'
""",
    doc="Point-in-time join of facts against SCD2 validity intervals — "
        "the warehouse temporal-join (Kimball type-2 lookup): each "
        "purchase event joins the state version whose half-open "
        "[valid_from, valid_to) interval contains its timestamp, "
        "answering 'what state was the user in when they bought'. The "
        "state dimension is built from the non-purchase event feed via "
        "temporal.scd2_history (one user-keyed shuffle); the interval "
        "join is an EQUI join on user_id with the containment "
        "predicate as post-filter — per-user version counts are small, "
        "so no interval-bucketing is needed (temporal.range_join is "
        "the fallback when they are not). Purchases preceding any "
        "state event are dropped (inner join) — deterministic both "
        "sides",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .temporal import scd2_history
    events = _t(spark, sf_dir, "events")["events"]
    state_feed = (events.filter(F.col("event_type") != "purchase")
                  .select("user_id", "ts", "event_id", "event_type"))
    hist = scd2_history(state_feed, key="user_id", tracked=["event_type"],
                        ts="ts", tiebreak=["event_id"])
    iv = hist.select(
        "user_id", F.col("event_type").alias("state_type"),
        F.col("valid_from").alias("vf"), F.col("valid_to").alias("vt"),
        F.col("version").cast("long").alias("version"))
    purch = (events.filter(F.col("event_type") == "purchase")
             .select("event_id", "user_id", "ts"))
    return (purch.join(iv, "user_id")
            .filter((F.col("ts") >= F.col("vf"))
                    & (F.col("vt").isNull() | (F.col("ts") < F.col("vt"))))
            .select("event_id", "user_id", "state_type", "version",
                    F.unix_millis(F.col("ts").cast("timestamp"))
                     .alias("purchase_ts_ms")))


# -- GROUPING SETS multi-grain rollup ------------------------------------------

@register(
    "events_grouping_sets_time",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS d, event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY GROUPING SETS ((strftime(CAST(ts AS DATE), '%Y-%m-%d'), event_type),
                        (strftime(CAST(ts AS DATE), '%Y-%m-%d')),
                        (event_type), ())
""",
    doc="Multi-grain rollup via grouping sets OVER THE FINEST-GRAIN "
        "PRE-AGGREGATE: base = groupBy(day, type) shuffles the fact "
        "table once, keeping the RAW double sum; the Expand for the "
        "(day x type)/(day)/(type) grains copies only base's tiny "
        "grouped output, the () grain is an explicit aggregate of "
        "base reusing its exchange, and rounding happens once, at "
        "the end, per grain. Cost at 100 TB: ONE fact scan and ONE "
        "fact-sized shuffle (executed plan pinned) — vs Expand-over-"
        "fact (3 copies of every row through the map-side aggregate: "
        "a CPU term; map-side combine keeps shuffle bytes low) PLUS "
        "the r15 union form's second full scan, or four independent "
        "GROUP BYs scanning four times. "
        "count is exactly decomposable; the double sum reassociates "
        "(partial aggregation already sums in arbitrary partition "
        "order on both engines — the 2dp rounding absorbs it, "
        "verified against the oracle on clean AND degenerate "
        "fixtures). The explicit () grain keeps ANSI empty-input "
        "semantics (Spark's Expand loses the grand row on empty "
        "input; the standard and the oracle emit it). Super-"
        "aggregate rows carry NULL group keys (distinct null "
        "patterns separate grains; no natural NULLs in either "
        "column). Local-cost disclosure (bench_ab_grains.json): "
        "+~0.07s fixed stage overhead at sf0.1; the keep decision "
        "is the shuffle-volume term, which dominates at scale",
)
def events_grouping_sets_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    base = (events
            .select(F.date_format("ts", "yyyy-MM-dd").alias("d"),
                    "event_type", "value")
            .groupBy("d", "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv")))
    null_s = F.lit(None).cast("string")

    keyed = (base.groupingSets([["d", "event_type"], ["d"], ["event_type"]],
                               "d", "event_type")
             .agg(F.sum("cnt").alias("n"),
                  F.round(F.sum("sv"), 2).alias("sum_value")))
    grand = (base.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long")
                      .alias("n"),
                      F.round(F.sum("sv"), 2).alias("sum_value"))
             .select(null_s.alias("d"), null_s.alias("event_type"),
                     "n", "sum_value"))
    return keyed.unionByName(grand)


# -- RANGE-frame window (value-based frames) -----------------------------------

@register(
    "orders_trailing_90d_spend",
    oracle="""
SELECT o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW), 2) AS spend_90d
FROM orders
""",
    doc="Trailing-90-day spend per customer via a RANGE window frame — "
        "the VALUE-based frame (all orders within 90 days by the "
        "ORDER BY value), distinct from ROWS frames: same-day orders "
        "are peers and always aggregate together, so the result is "
        "order-insensitive and deterministic without a tiebreak. One "
        "customer-keyed shuffle; the frame arithmetic is integer "
        "day-offsets from a fixed epoch in both engines",
)
def orders_trailing_90d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    orders = _t(spark, sf_dir, "orders")["orders"]
    days = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long")
    w = (Window.partitionBy("o_custkey").orderBy(days.alias("d"))
         .rangeBetween(-90, 0))
    return orders.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_90d"))


# -- MinHash LSH tuning table --------------------------------------------------

@register(
    "dedup_lsh_tuning_table",
    oracle="""
WITH cfg AS (
  SELECT CAST(b AS BIGINT) AS bands, CAST(128 // b AS BIGINT) AS rows_per_band
  FROM unnest(generate_series(1, 128)) t(b)
  WHERE 128 % b = 0
),
scored AS (
  SELECT bands, rows_per_band,
         round(pow(1.0 / bands, 1.0 / rows_per_band), 6) AS s50,
         round(1 - pow(1 - pow(0.8, rows_per_band), bands), 6) AS p_catch_80,
         round(1 - pow(1 - pow(0.4, rows_per_band), bands), 6) AS p_false_40
  FROM cfg
)
SELECT bands, rows_per_band, s50, p_catch_80, p_false_40,
       abs(s50 - 0.8) = min(abs(s50 - 0.8)) OVER () AS recommended
FROM scored
""",
    doc="MinHash LSH tuning table — the S-curve calculus that sizes "
        "every banding scheme (Leskovec/Rajaraman/Ullman ch.3): for "
        "each (bands b, rows r) factorization of a 128-hash signature, "
        "the threshold midpoint s50 = (1/b)^(1/r), the catch "
        "probability at Jaccard 0.8 and the false-candidate "
        "probability at 0.4 (P = 1-(1-s^r)^b), and the recommended "
        "config for a 0.8 target. Pure engine-side arithmetic from a "
        "generated series — the same numbers dedup_minhash_lsh's "
        "defaults were chosen from; a planner op, not a data op",
)
def dedup_lsh_tuning_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    cfg = (spark.range(1, 129).select(F.col("id").alias("bands"))
           .filter(F.lit(128) % F.col("bands") == 0)
           .select("bands", (F.lit(128) / F.col("bands"))
                   .cast("long").alias("rows_per_band")))
    r = F.col("rows_per_band").cast("double")
    b = F.col("bands").cast("double")
    scored = cfg.select(
        "bands", "rows_per_band",
        F.round(F.pow(1.0 / b, 1.0 / r), 6).alias("s50"),
        F.round(1 - F.pow(1 - F.pow(F.lit(0.8), r), b), 6).alias("p_catch_80"),
        F.round(1 - F.pow(1 - F.pow(F.lit(0.4), r), b), 6).alias("p_false_40"))
    w = Window.partitionBy()
    return scored.withColumn(
        "recommended",
        F.abs(F.col("s50") - 0.8) == F.min(F.abs(F.col("s50") - 0.8)).over(w))


# -- chi-squared independence (source x lang) ----------------------------------

@register(
    "documents_langdist_chi2",
    oracle="""
WITH o AS (
  SELECT source, lang, CAST(count(*) AS DOUBLE) AS obs
  FROM documents GROUP BY source, lang
),
rt AS (SELECT source, sum(obs) AS r FROM o GROUP BY source),
ct AS (SELECT lang, sum(obs) AS c FROM o GROUP BY lang),
n AS (SELECT sum(obs) AS n FROM o)
SELECT o.source,
       CAST(sum(CAST(o.obs AS BIGINT)) AS BIGINT) AS n_docs,
       round(sum(pow(o.obs - rt.r * ct.c / n.n, 2) / (rt.r * ct.c / n.n)), 6)
         AS chi2_part
FROM o JOIN rt ON rt.source = o.source
       JOIN ct ON ct.lang = o.lang CROSS JOIN n
GROUP BY o.source
""",
    doc="Chi-squared independence contributions per source for the "
        "source x language contingency table — the drift/balance test "
        "a corpus-intake pipeline runs to catch a provider whose "
        "language mix shifted (sum over sources = the chi2 statistic "
        "against dof (S-1)(L-1)). Observed cells from one "
        "map-side-combined groupBy; marginals are bounded aggregates "
        "joined back (row marginal broadcast, column marginal "
        "broadcast); only present cells contribute, consistently in "
        "both engines",
)
def documents_langdist_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    o = (docs.groupBy("source", "lang")
         .agg(F.count("*").cast("double").alias("obs")))
    rt = o.groupBy("source").agg(F.sum("obs").alias("r"))
    ct = o.groupBy("lang").agg(F.sum("obs").alias("c"))
    n = o.agg(F.sum("obs").alias("n"))
    e = F.col("r") * F.col("c") / F.col("n")
    return (o.join(F.broadcast(rt), "source").join(F.broadcast(ct), "lang")
            .crossJoin(F.broadcast(n))
            .groupBy("source")
            .agg(F.sum(F.col("obs").cast("long")).cast("long").alias("n_docs"),
                 F.round(F.sum(F.pow(F.col("obs") - e, 2) / e), 6)
                  .alias("chi2_part")))


# -- MinHash estimator accuracy audit ------------------------------------------

def _minhash_accuracy_tail(num_hashes: int = 16) -> str:
    agree = " + ".join(
        f"(CASE WHEN a.mh{j} = b.mh{j} THEN 1 ELSE 0 END)"
        for j in range(num_hashes))
    return f"""
, agree AS (
  SELECT p.id_a, p.id_b,
         round(({agree}) / {num_hashes}.0, 6) AS est_jaccard
  FROM pairs p
  JOIN sig a ON a.doc_id = p.id_a
  JOIN sig b ON b.doc_id = p.id_b
),
sizes AS (SELECT doc_id, count(*) AS nsz FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS i
  FROM pairs p
  JOIN sh x ON x.doc_id = p.id_a
  JOIN sh y ON y.doc_id = p.id_b AND y.gram = x.gram
  GROUP BY p.id_a, p.id_b
)
SELECT g.id_a, g.id_b, g.est_jaccard,
       round(CAST(i.i AS DOUBLE) / (sa.nsz + sb.nsz - i.i), 6)
         AS exact_jaccard,
       round(abs(g.est_jaccard
                 - round(CAST(i.i AS DOUBLE) / (sa.nsz + sb.nsz - i.i), 6)),
             6) AS abs_err
FROM agree g
JOIN inter i ON i.id_a = g.id_a AND i.id_b = g.id_b
JOIN sizes sa ON sa.doc_id = g.id_a
JOIN sizes sb ON sb.doc_id = g.id_b
"""


def _register_minhash_accuracy():
    from .queries_analytics import _minhash_oracle

    @register(
        "dedup_minhash_accuracy",
        oracle=_minhash_oracle(max_bucket_size=256,
                               tail=_minhash_accuracy_tail()),
        doc="MinHash estimator-quality audit: per LSH candidate pair, "
            "the signature-agreement Jaccard estimate next to the exact "
            "shingle Jaccard and the absolute error — the monitoring "
            "query an approximate-dedup deployment runs on a sample "
            "(E[err] ~ 1/sqrt(k)); a bad hash family or shingling bug "
            "surfaces here before it silently over/under-dedups a "
            "corpus. Candidates come from the same capped banding path "
            "as production; exact verification joins shingles only for "
            "candidates — never all pairs",
    )
    def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .queries_analytics import _near_fixture, _shared_capped_lsh
        sigs, pairs = _shared_capped_lsh(spark, sf_dir)
        # shingle_frame deliberately NOT passed: a persisted gram
        # stream measured warm-equal (0.997/0.959 over 10/6 interleaved
        # passes, bench_ab_accshingles.json), and unlike the tiny
        # signature/pair memo the gram stream is corpus-sized — at
        # scale the persist write can cost more than the scans it
        # saves. The parameter stays for callers whose storage tier
        # makes the trade differently.
        return D.minhash_accuracy_pairs(_near_fixture(spark, sf_dir),
                                        n=3, num_hashes=16, bands=4,
                                        max_bucket_size=256,
                                        signatures=sigs, pairs=pairs)


_register_minhash_accuracy()


# -- per-dimension scalar quantization of embeddings ---------------------------

@register(
    "embedding_scalar_quantization",
    oracle="""
WITH cell AS (
  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings,
       unnest(generate_series(1, CAST(len(embedding) AS INT))) t(i)
),
cuts AS (
  -- finite-only cuts: one NaN/inf poison component must not shift a
  -- dimension's entire codebook (and Spark's percentile and DuckDB's
  -- quantile_cont disagree on non-finite ordering anyway); codes are
  -- still emitted for EVERY cell — non-finite v compares against the
  -- cuts (NaN/inf above all in both engines' total order -> code 15)
  SELECT dim, quantile_cont(v, [0.0625, 0.125, 0.1875, 0.25, 0.3125,
                                0.375, 0.4375, 0.5, 0.5625, 0.625,
                                0.6875, 0.75, 0.8125, 0.875, 0.9375])
           AS qs
  FROM cell WHERE isfinite(v) GROUP BY dim
)
SELECT c.vec_id, CAST(c.dim AS INT) AS dim,
       CAST(len(list_filter(k.qs, q -> c.v >= q)) AS INT) AS code
FROM cell c JOIN cuts k ON k.dim = c.dim
""",
    doc="Per-dimension 4-bit scalar quantization (FAISS SQ4 shape): 15 "
        "exact equi-depth cuts per dimension from ONE aggregation over "
        "the exploded (vec, dim, value) cells, code = number of cuts "
        "<= value via a broadcast join against the 64-row cut table — "
        "8x compression of the embedding store with rank-preserving "
        "per-dim codes (the memory lever that makes billion-vector ANN "
        "fit; IVF+SQ is the standard combination with the registered "
        "IVF index). Everything is bounded aggregation + broadcast "
        "projection — no shuffle touches the corpus twice",
)
def embedding_scalar_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    cell = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim0", "v0")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"),
             F.col("v0").cast("double").alias("v"))
    # finite-only cuts (oracle-mirrored): a NaN/inf poison component
    # must not shift the dimension's codebook; codes still cover every
    # cell (non-finite v ranks above all cuts -> code 15 both engines)
    finite = ~F.isnan(F.col("v")) & (F.abs(F.col("v")) < F.lit(float("inf")))
    cuts = cell.filter(finite).groupBy("dim").agg(
        F.percentile("v", F.array(*[F.lit(i / 16.0) for i in range(1, 16)]))
         .alias("qs"))
    code = F.expr("size(filter(qs, q -> v >= q))")
    return (cell.join(F.broadcast(cuts), "dim")
            .select("vec_id", F.col("dim").cast("int").alias("dim"),
                    code.cast("int").alias("code")))


# -- window-function rank suite ------------------------------------------------

@register(
    "orders_window_rank_suite",
    oracle="""
SELECT o_orderkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile(10) OVER w AS INT) AS decile,
       nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderpriority
         ORDER BY o_totalprice, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS third_lowest
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    doc="Ranking-function suite in one pass: percent_rank, cume_dist, "
        "ntile(10), nth_value over the same (priority, price) order — "
        "one shuffle, one sort, four analytic outputs (Spark fuses "
        "same-spec window functions into a single Window node). Unique "
        "orderkey tiebreak makes every rank deterministic cross-engine",
)
def orders_window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window
    orders = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice",
                                                      "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.nth_value("o_totalprice", 3).over(wf).alias("third_lowest"))


# -- pipeline freshness report -------------------------------------------------

@register(
    "events_freshness_report",
    oracle="""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         max(epoch_ms(ts)) AS latest_ms
  FROM events GROUP BY event_type
),
g AS (SELECT max(latest_ms) AS global_ms FROM per)
SELECT p.event_type, p.n, p.latest_ms,
       g.global_ms - p.latest_ms AS lag_ms,
       (g.global_ms - p.latest_ms) < 3600000 AS fresh
FROM per p CROSS JOIN g
""",
    doc="Per-stream freshness report — the operational lag metric every "
        "CDC/ingest pipeline alerts on (max event time per stream vs "
        "the global high-water mark, flag if over an hour behind): one "
        "map-side-combined groupBy to stream cardinality, one scalar "
        "broadcast; the report is stream-count-sized. The streaming "
        "twin of this check is the watermark lag the Structured "
        "Streaming paths already carry",
)
def events_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    per = (events.groupBy("event_type")
           .agg(F.count("*").cast("long").alias("n"),
                F.max(ms).alias("latest_ms")))
    g = per.agg(F.max("latest_ms").alias("global_ms"))
    return (per.crossJoin(F.broadcast(g))
            .select("event_type", "n", "latest_ms",
                    (F.col("global_ms") - F.col("latest_ms")).alias("lag_ms"),
                    ((F.col("global_ms") - F.col("latest_ms")) < 3600000)
                     .alias("fresh")))


# -- end-to-end training-data pipeline in ONE DAG ------------------------------

def _pipeline_e2e_oracle() -> str:
    from .queries_analytics import (_EXACT_FIXTURE_SQL, _NORM_SQL,
                                    _lang_hits_and_case, _md5h32_sql)
    hits, case_sql = _lang_hits_and_case()
    split_h = _md5h32_sql("CAST(doc_id AS VARCHAR)")
    shard_h = _md5h32_sql("'shard|' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_EXACT_FIXTURE_SQL},
keep AS (
  SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5({_NORM_SQL})
),
kept AS (SELECT d.doc_id, d.text FROM docs d JOIN keep USING (doc_id)),
h AS (
  SELECT doc_id, text,
  {hits}
  FROM kept
),
m AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    round(CAST(hits_en AS DOUBLE) / len(string_split(text, ' ')), 6)
      AS stopword_ratio,
    round(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
          / length(text), 6) AS punct_ratio,
    {case_sql} AS predicted_lang
  FROM h
),
sel AS (
  SELECT doc_id, n_tokens FROM m
  WHERE predicted_lang = 'en' AND n_tokens BETWEEN 20 AND 90
    AND stopword_ratio >= 0.03 AND punct_ratio <= 0.2
),
asg AS (
  SELECT doc_id, n_tokens,
         CASE WHEN {split_h} % 100 < 80 THEN 'train'
              WHEN {split_h} % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         {shard_h} % 8 AS shard
  FROM sel
)
SELECT split, shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM asg GROUP BY split, shard
"""


def _register_pipeline_e2e():
    @register(
        "pipeline_end_to_end",
        oracle=_pipeline_e2e_oracle(),
        doc="The whole training-data pipeline as ONE Spark DAG: exact "
            "dedup (min-id canonical per content fingerprint) -> "
            "language gate -> quality gates (token range, stopword "
            "floor, punct ceiling) -> deterministic hash split -> "
            "salt-decorrelated shard assignment -> per-(split, shard) "
            "manifest. One content-fingerprint shuffle plus one "
            "24-group aggregation; every gate is a codegen projection "
            "between them — Catalyst fuses the whole curation into "
            "scan -> dedup shuffle -> filter -> manifest, which is the "
            "minimum ANY dedup-then-curate pipeline can do. This is "
            "the composability proof: the same library calls users "
            "chain (curate | hash_split | shard_manifest) plan as one "
            "job with no materialization between stages",
    )
    def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .analytics.dedup import md5h32
        from .queries_analytics import _exact_fixture
        kept = TX.curate(_exact_fixture(spark, sf_dir))
        sp = TX.hash_split(kept.select("doc_id", "n_tokens"))
        shard = F.pmod(
            md5h32(F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))),
            F.lit(8))
        return (sp.withColumn("shard", shard)
                .groupBy("split", "shard")
                .agg(F.count("*").cast("long").alias("n_docs"),
                     F.sum("n_tokens").cast("long").alias("total_tokens")))


_register_pipeline_e2e()


# -- replication orphan audit --------------------------------------------------

@register(
    "cdc_orphan_lineitems",
    oracle="""
WITH t1 AS (
  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0
)
SELECT l.l_linestatus,
       CAST(count(*) AS BIGINT) AS n_orphan_lines,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_missing_orders
FROM lineitem l
WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM t1)
GROUP BY l.l_linestatus
""",
    doc="Cross-table replication consistency audit: lineitems whose "
        "parent order is absent from the T1 replica (the CDC fixture's "
        "pk%7 deletion rule) — the referential-orphan report a "
        "multi-table replication runs after each cycle to catch "
        "child-before-parent application or missed parent deletes. One "
        "LEFT ANTI join on the replica key set (AQE broadcasts the key "
        "side when the cycle was small) + a status-cardinality rollup",
)
def cdc_orphan_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    t1_keys = (t["orders"].filter(F.col("o_orderkey") % 7 != 0)
               .select("o_orderkey"))
    li = t["lineitem"].select("l_orderkey", "l_linestatus")
    return (li.join(t1_keys, li["l_orderkey"] == t1_keys["o_orderkey"],
                    "left_anti")
            .groupBy("l_linestatus")
            .agg(F.count("*").cast("long").alias("n_orphan_lines"),
                 F.countDistinct("l_orderkey").cast("long")
                  .alias("n_missing_orders")))


# -- ANN recall@k audit --------------------------------------------------------

def _recall_oracle() -> str:
    # single-source the IVF chain: reuse the registered similarity_ann_ivf
    # oracle's CTEs (cents/corpus/assigned/q/probes/scored/ranked) and
    # swap its final SELECT for the recall computation
    from .queries import REGISTRY
    base = REGISTRY["similarity_ann_ivf"].oracle
    marker = "SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5"
    assert marker in base, "similarity_ann_ivf oracle tail changed"
    prefix = base.rsplit(marker, 1)[0].rstrip()
    assert prefix.endswith(")"), "unexpected ivf oracle shape"
    return prefix + """,
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             CASE WHEN q.qv IS NULL OR c.cv IS NULL OR len(q.qv) = 0 OR len(q.qv) <> len(c.cv) THEN NULL ELSE (CASE WHEN isnan(list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv)))) THEN NULL ELSE list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) END) END DESC,
             c.vec_id) AS rn
    FROM q CROSS JOIN corpus c
    WHERE c.vec_id <> q.query_id)
  WHERE rn <= 5
),
ann AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 5)
SELECT a.query_id,
       CAST(count(*) AS BIGINT) AS n_ann,
       round(CAST(count(e.neighbor_id) AS DOUBLE) / 5, 6) AS recall_at_5
FROM ann a LEFT JOIN exact e
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY a.query_id
"""


def _register_recall_audit():
    @register(
        "similarity_recall_at_k",
        oracle=_recall_oracle(),
        doc="ANN recall@5 audit — the vector twin of the MinHash "
            "estimator audit: the IVF (nprobe=2/8) result set per query "
            "scored against the exact brute-force top-5, recall = "
            "overlap/k. This is the quality dial every ANN deployment "
            "monitors before trading recall for probe count; both "
            "branches are the already-registered deterministic "
            "pipelines (ivf_search and the |Q|-broadcast cosine_topk), "
            "so the audit is SQL-oracle-checked end-to-end. The exact "
            "branch stays O(|Q|·n) — query sets are small by "
            "construction; the corpus is never self-joined",
    )
    def similarity_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .analytics import similarity as S
        emb = _t(spark, sf_dir, "embeddings")["embeddings"]
        centroids = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("centroid_id"), "embedding")
        queries = emb.filter(F.col("vec_id") < 5)
        ann = S.ivf_search(queries, S.ivf_build(emb, centroids), centroids,
                           k=5, nprobe=2).select("query_id", "neighbor_id")
        exact = (S.cosine_topk(queries, emb, k=5)
                 .select("query_id", "neighbor_id")
                 .withColumn("hit", F.lit(1)))
        return (ann.join(exact, ["query_id", "neighbor_id"], "left")
                .groupBy("query_id")
                .agg(F.count("*").cast("long").alias("n_ann"),
                     F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                             .cast("double") / 5, 6).alias("recall_at_5")))


_register_recall_audit()


_PQ_RECALL_ORACLE = f"""
WITH qc AS (
  -- well_formed mirror (the lane's subspace slicing excludes
  -- NULL/ragged vectors) + Spark's saturating floor->long (DuckDB's
  -- plain CAST crashes on poison magnitudes)
  SELECT vec_id,
         list_transform(embedding, v -> greatest(-127, least(127,
           {_floor_long_sql('(CAST(v AS DOUBLE) * 100)')}))) AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
subs AS (SELECT s FROM (VALUES (0), (1)) t(s)),
-- rounds=0 codebooks: centroid cid of subspace s is the quantized
-- subvector of vec_id = cid (seeding = lowest-k ids of the capped
-- train frame, k=4 <= train_sample=64)
books AS (
  SELECT s.s, q.vec_id AS cid,
         q.qv[(s.s * 32 + 1):((s.s + 1) * 32)] AS cv
  FROM qc q CROSS JOIN subs s WHERE q.vec_id < 4
),
pieces AS (
  SELECT q.vec_id, s.s, q.qv[(s.s * 32 + 1):((s.s + 1) * 32)] AS sv
  FROM qc q CROSS JOIN subs s
),
enc AS (
  SELECT vec_id, s, cid AS code FROM (
    SELECT p.vec_id, p.s, b.cid,
           row_number() OVER (PARTITION BY p.vec_id, p.s ORDER BY
             list_dot_product(p.sv, p.sv)
               - 2 * list_dot_product(p.sv, b.cv)
               + list_dot_product(b.cv, b.cv), b.cid) AS rn
    FROM pieces p JOIN books b ON b.s = p.s)
  WHERE rn = 1
),
tab AS (
  SELECT p.vec_id AS query_id, b.s, b.cid,
         list_dot_product(p.sv, p.sv)
           - 2 * list_dot_product(p.sv, b.cv)
           + list_dot_product(b.cv, b.cv) AS d
  FROM pieces p JOIN books b ON b.s = p.s
  WHERE p.vec_id IN (3, 11, 42)
),
cand AS (
  SELECT t.query_id, e.vec_id, sum(t.d) AS adc
  FROM enc e JOIN tab t ON t.s = e.s AND t.cid = e.code
  WHERE e.vec_id <> t.query_id
  GROUP BY t.query_id, e.vec_id
),
ann AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rank
    FROM cand)
  WHERE rank <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             CASE WHEN q.embedding IS NULL OR c.embedding IS NULL OR len(q.embedding) = 0 OR len(q.embedding) <> len(c.embedding) THEN NULL ELSE (CASE WHEN isnan(list_dot_product(q.embedding, c.embedding) / (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(c.embedding, c.embedding)))) THEN NULL ELSE list_dot_product(q.embedding, c.embedding) / (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(c.embedding, c.embedding))) END) END DESC,
             c.vec_id) AS rn
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id IN (3, 11, 42))
  WHERE rn <= 5
)
SELECT a.query_id,
       CAST(count(*) AS BIGINT) AS n_ann,
       round(CAST(count(e.neighbor_id) AS DOUBLE) / 5, 6) AS recall_at_5
FROM ann a LEFT JOIN exact e
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY a.query_id
"""


@register(
    "similarity_pq_recall",
    oracle=_PQ_RECALL_ORACLE,
    doc="PQ recall@5 audit — the product-quantization twin of "
        "similarity_recall_at_k: asymmetric-distance top-5 over "
        "pq_encode codes (m=2 subspaces, k=4 centroids) scored "
        "against the exact brute-force top-5, recall = overlap/5. "
        "Codebooks are rounds=0 seeds (quantized subvectors of the "
        "lowest-k ids of the train_sample cap) so the whole chain — "
        "quantize-floor, subspace slice, argmin encode with "
        "lowest-cid ties, integer ADC table, rank-window ties — is "
        "deterministic integer arithmetic the oracle replays literally "
        "in SQL; the Lloyd update those seeds would feed is the same "
        "code kmeans_quantized runs under its own driver-green "
        "queries. Encode is map-only (codebooks ride the closure); "
        "ADC scans code columns, never embeddings",
)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytics import similarity as S
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    # ONE probe-row collect (r17, guide §5 driver overhead): the old
    # shape ran an emptiness first() plus one filter+first() job PER
    # probe id — four scans of the corpus before any real work. No
    # probe rows covers both the empty-table and absent-probe cases;
    # either way the declared result is the schema-correct empty frame
    # (pq_train, which refuses empty input, is then never reached).
    qrows = {int(r.vec_id): r for r in
             emb.filter(F.col("vec_id").isin(3, 11, 42)).collect()}
    if not qrows:
        return spark.createDataFrame(
            [], "query_id LONG, n_ann LONG, recall_at_5 DOUBLE")
    books = S.pq_train(emb, m=2, k=4, rounds=0, train_sample=64)
    enc = S.pq_encode(emb, books)
    parts = []
    for qid in (3, 11, 42):
        qrow = qrows.get(qid)
        if qrow is None:
            continue  # probe id absent: the oracle emits no row for it
        parts.append(
            S.pq_adc_topk(list(qrow.embedding),
                          enc.filter(F.col("vec_id") != qid), books, k=5)
            .withColumn("query_id", F.lit(qid).cast("long"))
            .select("query_id", "neighbor_id"))
    if not parts:
        return spark.createDataFrame(
            [], "query_id LONG, n_ann LONG, recall_at_5 DOUBLE")
    ann = parts[0]
    for p in parts[1:]:
        ann = ann.unionByName(p)
    exact = (S.cosine_topk(emb.filter(F.col("vec_id").isin(3, 11, 42)),
                           emb, k=5)
             .select("query_id", "neighbor_id")
             .withColumn("hit", F.lit(1)))
    return (ann.join(exact, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("n_ann"),
                 F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                         .cast("double") / 5, 6).alias("recall_at_5")))


_IVFPQ_RECALL_ORACLE = f"""
WITH qc AS (
  -- well_formed mirror + saturating floor->long (see _PQ_RECALL_ORACLE)
  SELECT vec_id,
         list_transform(embedding, v -> greatest(-127, least(127,
           {_floor_long_sql('(CAST(v AS DOUBLE) * 100)')}))) AS qv
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) = 64
),
subs AS (SELECT s FROM (VALUES (0), (1)) t(s)),
-- rounds=0 codebooks, identical to the similarity_pq_recall seeds
books AS (
  SELECT s.s, q.vec_id AS cid,
         q.qv[(s.s * 32 + 1):((s.s + 1) * 32)] AS cv
  FROM qc q CROSS JOIN subs s WHERE q.vec_id < 4
),
pieces AS (
  SELECT q.vec_id, s.s, q.qv[(s.s * 32 + 1):((s.s + 1) * 32)] AS sv
  FROM qc q CROSS JOIN subs s
),
enc AS (
  SELECT vec_id, s, cid AS code FROM (
    SELECT p.vec_id, p.s, b.cid,
           row_number() OVER (PARTITION BY p.vec_id, p.s ORDER BY
             list_dot_product(p.sv, p.sv)
               - 2 * list_dot_product(p.sv, b.cv)
               + list_dot_product(b.cv, b.cv), b.cid) AS rn
    FROM pieces p JOIN books b ON b.s = p.s)
  WHERE rn = 1
),
-- coarse IVF layer, identical to the similarity_ann_ivf assignment
cents AS (
  SELECT vec_id AS ccid, CAST(embedding AS DOUBLE[]) AS centv
  FROM embeddings WHERE vec_id < 8
),
corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
assigned AS (
  SELECT vec_id, ccid FROM (
    SELECT corpus.vec_id, cents.ccid,
           row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
             CASE WHEN cv IS NULL OR centv IS NULL OR len(cv) = 0 OR len(cv) <> len(centv) THEN NULL ELSE (CASE WHEN isnan(list_dot_product(cv, centv) / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(centv, centv)))) THEN NULL ELSE list_dot_product(cv, centv) / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(centv, centv))) END) END DESC,
             ccid) AS rn
    FROM corpus, cents)
  WHERE rn = 1
),
qf AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       FROM embeddings WHERE vec_id IN (3, 11, 42)),
probes AS (
  SELECT query_id, ccid FROM (
    SELECT qf.query_id, cents.ccid,
           row_number() OVER (PARTITION BY qf.query_id ORDER BY
             CASE WHEN qv IS NULL OR centv IS NULL OR len(qv) = 0 OR len(qv) <> len(centv) THEN NULL ELSE (CASE WHEN isnan(list_dot_product(qv, centv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(centv, centv)))) THEN NULL ELSE list_dot_product(qv, centv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(centv, centv))) END) END DESC,
             ccid) AS rn
    FROM qf, cents)
  WHERE rn <= 2
),
tab AS (
  SELECT p.vec_id AS query_id, b.s, b.cid,
         list_dot_product(p.sv, p.sv)
           - 2 * list_dot_product(p.sv, b.cv)
           + list_dot_product(b.cv, b.cv) AS d
  FROM pieces p JOIN books b ON b.s = p.s
  WHERE p.vec_id IN (3, 11, 42)
),
cand AS (
  SELECT t.query_id, e.vec_id, sum(t.d) AS adc
  FROM enc e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN probes p ON p.ccid = a.ccid
  JOIN tab t ON t.query_id = p.query_id AND t.s = e.s AND t.cid = e.code
  WHERE e.vec_id <> t.query_id
  GROUP BY t.query_id, e.vec_id
),
ann AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc, vec_id) AS rank
    FROM cand)
  WHERE rank <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             CASE WHEN q.embedding IS NULL OR c.embedding IS NULL OR len(q.embedding) = 0 OR len(q.embedding) <> len(c.embedding) THEN NULL ELSE (CASE WHEN isnan(list_dot_product(q.embedding, c.embedding) / (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(c.embedding, c.embedding)))) THEN NULL ELSE list_dot_product(q.embedding, c.embedding) / (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(c.embedding, c.embedding))) END) END DESC,
             c.vec_id) AS rn
    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id IN (3, 11, 42))
  WHERE rn <= 5
)
SELECT a.query_id,
       CAST(count(*) AS BIGINT) AS n_ann,
       round(CAST(count(e.neighbor_id) AS DOUBLE) / 5, 6) AS recall_at_5
FROM ann a LEFT JOIN exact e
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY a.query_id
"""


@register(
    "similarity_ivfpq_recall",
    oracle=_IVFPQ_RECALL_ORACLE,
    doc="IVF-PQ composed search recall@5 — the FAISS-standard shape "
        "end-to-end (similarity.py ivfpq_search): the coarse quantizer "
        "restricts candidates to the nprobe=2 nearest of 8 IVF buckets "
        "and PQ asymmetric distance (m=2, k=4, rounds=0 seed "
        "codebooks) ranks within them, scored against the exact "
        "brute-force top-5. The oracle replays BOTH layers literally: "
        "the similarity_ann_ivf cosine assignment CTEs compose with "
        "the similarity_pq_recall integer-ADC CTEs, restricted by the "
        "probe join. The searched frame is codes + a bucket id per "
        "vector (never embeddings); candidate generation is a "
        "bucket-membership join — the 100 TB plan is nprobe bucket "
        "scans of m-byte codes per query",
)
def similarity_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytics import similarity as S
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    # ONE probe-row collect instead of four scans — see
    # similarity_pq_recall (r17); same empty-frame contract
    qrows = {int(r.vec_id): r for r in
             emb.filter(F.col("vec_id").isin(3, 11, 42)).collect()}
    if not qrows:
        return spark.createDataFrame(
            [], "query_id LONG, n_ann LONG, recall_at_5 DOUBLE")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    books = S.pq_train(emb, m=2, k=4, rounds=0, train_sample=64)
    indexed_encoded = (
        S.ivf_build(emb, centroids).select("vec_id", "centroid_id")
        .join(S.pq_encode(emb, books), "vec_id"))
    parts = []
    for qid in (3, 11, 42):
        qrow = qrows.get(qid)
        if qrow is None:
            continue  # probe id absent: the oracle emits no row for it
        parts.append(
            S.ivfpq_search(list(qrow.embedding),
                           indexed_encoded.filter(F.col("vec_id") != qid),
                           centroids, books, k=5, nprobe=2)
            .withColumn("query_id", F.lit(qid).cast("long"))
            .select("query_id", "neighbor_id"))
    if not parts:
        return spark.createDataFrame(
            [], "query_id LONG, n_ann LONG, recall_at_5 DOUBLE")
    ann = parts[0]
    for p in parts[1:]:
        ann = ann.unionByName(p)
    exact = (S.cosine_topk(emb.filter(F.col("vec_id").isin(3, 11, 42)),
                           emb, k=5)
             .select("query_id", "neighbor_id")
             .withColumn("hit", F.lit(1)))
    return (ann.join(exact, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count("*").cast("long").alias("n_ann"),
                 F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                         .cast("double") / 5, 6).alias("recall_at_5")))


# -- RFM customer segmentation -------------------------------------------------

@register(
    "orders_rfm_segmentation",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
rfm AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), mx.mxd) AS recency_days,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders CROSS JOIN mx
  GROUP BY o_custkey, mx.mxd
),
cuts AS (
  SELECT quantile_cont(CAST(recency_days AS DOUBLE), [0.2,0.4,0.6,0.8]) AS rq,
         quantile_cont(CAST(frequency AS DOUBLE), [0.2,0.4,0.6,0.8]) AS fq,
         quantile_cont(monetary, [0.2,0.4,0.6,0.8]) AS mq
  FROM rfm
)
SELECT r.o_custkey, CAST(r.recency_days AS BIGINT) AS recency_days,
       CAST(r.frequency AS BIGINT) AS frequency, r.monetary,
       CAST(1 + len(list_filter(c.rq, q -> r.recency_days > q)) AS INT) AS r_q,
       CAST(1 + len(list_filter(c.fq, q -> r.frequency > q)) AS INT) AS f_q,
       CAST(1 + len(list_filter(c.mq, q -> r.monetary > q)) AS INT) AS m_q
FROM rfm r CROSS JOIN cuts c
""",
    doc="RFM customer segmentation — the classic lifecycle analysis: "
        "recency (days since last order vs corpus high-water), "
        "frequency, monetary per customer, each scored into exact "
        "interpolated quintiles (strictly-greater-than-cut rule, ties "
        "to the lower bucket identically in both engines). One "
        "customer groupBy + a 3x4-value broadcast cut row; no global "
        "sort, no ntile — the same scalable boundary pattern as the "
        "equi-depth histogram",
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    mx = orders.agg(F.max("o_orderdate").alias("mxd"))
    rfm = (orders.crossJoin(F.broadcast(mx))
           .groupBy("o_custkey", "mxd")
           .agg(F.datediff(F.col("mxd"), F.max("o_orderdate"))
                 .alias("__rd_tmp"),
                F.count("*").alias("frequency"),
                F.round(F.sum("o_totalprice"), 2).alias("monetary"))
           .select("o_custkey",
                   F.col("__rd_tmp").cast("long").alias("recency_days"),
                   F.col("frequency").cast("long").alias("frequency"),
                   "monetary"))
    qs = [0.2, 0.4, 0.6, 0.8]
    cuts = rfm.agg(
        F.percentile(F.col("recency_days").cast("double"),
                     F.array(*[F.lit(q) for q in qs])).alias("rq"),
        F.percentile(F.col("frequency").cast("double"),
                     F.array(*[F.lit(q) for q in qs])).alias("fq"),
        F.percentile("monetary",
                     F.array(*[F.lit(q) for q in qs])).alias("mq"))

    def quint(val: str, arr: str):
        return (F.lit(1) + F.expr(
            f"size(filter({arr}, q -> {val} > q))")).cast("int")

    return (rfm.crossJoin(F.broadcast(cuts))
            .select("o_custkey", "recency_days", "frequency", "monetary",
                    quint("recency_days", "rq").alias("r_q"),
                    quint("frequency", "fq").alias("f_q"),
                    quint("monetary", "mq").alias("m_q")))


# -- per-user behavioral feature vector ----------------------------------------

@register(
    "features_user_behavior",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
         AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       round(sum(value), 2) AS total_value,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
       min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms
FROM events GROUP BY user_id
""",
    doc="Per-user behavioral feature vector — the feature-store "
        "materialization step of an ML pipeline: typed event counts "
        "(conditional aggregates, no pivot shuffle), spend, active "
        "days, first/last activity. ONE map-side-combined groupBy "
        "produces every feature; at 100 TB this is the canonical "
        "'wide aggregate' whose cost is one shuffle of partial "
        "aggregates per user",
)
def features_user_behavior(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    ms = F.unix_millis(F.col("ts").cast("timestamp"))

    def n_of(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)) \
            .cast("long").alias(f"n_{t}")

    return (events.groupBy("user_id")
            .agg(F.count("*").cast("long").alias("n_events"),
                 n_of("click"), n_of("view"), n_of("purchase"),
                 n_of("signup"), n_of("error"),
                 F.round(F.sum("value"), 2).alias("total_value"),
                 F.countDistinct(F.col("ts").cast("date")).cast("long")
                  .alias("active_days"),
                 F.min(ms).alias("first_ms"), F.max(ms).alias("last_ms")))


# -- one-pass bucketed checksum reconcile --------------------------------------

@register(
    "reconcile_rowhash_checksum",
    oracle=f"""
WITH {_CDC_BASE_SQL_REF.strip()},
h0 AS (
  SELECT {_md5h32_sql("CAST(pk AS VARCHAR)")} % 16 AS bucket,
         bit_xor({_md5h32_sql("CAST(pk AS VARCHAR) || '|' || CAST(ts AS VARCHAR)")})
           AS csum,
         sum(CAST({_md5h32_sql("CAST(pk AS VARCHAR) || '|' || CAST(ts AS VARCHAR)")}
             AS DECIMAL(38,0))) AS asum,
         count(*) AS n
  FROM t0 GROUP BY 1
),
h1 AS (
  SELECT {_md5h32_sql("CAST(pk AS VARCHAR)")} % 16 AS bucket,
         bit_xor({_md5h32_sql("CAST(pk AS VARCHAR) || '|' || CAST(ts AS VARCHAR)")})
           AS csum,
         sum(CAST({_md5h32_sql("CAST(pk AS VARCHAR) || '|' || CAST(ts AS VARCHAR)")}
             AS DECIMAL(38,0))) AS asum,
         count(*) AS n
  FROM t1 GROUP BY 1
)
SELECT COALESCE(h0.bucket, h1.bucket) AS bucket,
       CAST(COALESCE(h0.n, 0) AS BIGINT) AS n_source,
       CAST(COALESCE(h1.n, 0) AS BIGINT) AS n_target,
       COALESCE(h0.csum, 0) = COALESCE(h1.csum, 0)
         AND COALESCE(h0.asum, 0) = COALESCE(h1.asum, 0) AS bucket_match
FROM h0 FULL OUTER JOIN h1 ON h1.bucket = h0.bucket
""",
    doc="One-pass bucketed checksum reconcile — the cheap companion to "
        "the Merkle anti-entropy tree: per hash bucket, BOTH an XOR "
        "row-hash checksum (bit_xor of md5h32(pk|ts)) AND an additive "
        "DECIMAL(38,0) sum of the same hash, 16 buckets. XOR alone "
        "cancels even-multiplicity duplicates (source {A,A,B} vs "
        "target {B,C,C}: equal counts AND equal XOR — duplicate-apply "
        "drift invisible); a BIGINT sum alone overflows at ~2^31 "
        "rows/bucket under ANSI. DECIMAL(38,0) accumulation is exact "
        "to ~1e28 rows/bucket in both engines and order-independent, "
        "and the pair of aggregates closes both failure modes in the "
        "same single aggregation pass per side; "
        "mismatched buckets localize drift to 1/16 of the key space "
        "with NO tree levels and no re-scans. Use this every cycle; "
        "escalate to the Merkle tree (log-localization) only on "
        "mismatch. Map-side combined, shuffle = 16 rows per partition",
)
def reconcile_rowhash_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytics.dedup import md5h32
    from .queries import _cdc_snapshots
    t0, t1 = _cdc_snapshots(spark, sf_dir)

    def side(t: DataFrame, n_name: str) -> DataFrame:
        rh = md5h32(F.concat(F.col("pk").cast("string"), F.lit("|"),
                             F.col("ts").cast("string")))
        # Two order-independent checksums per bucket: bit_xor (never
        # widens — a BIGINT sum of 32-bit hashes would overflow at
        # ~2^31 rows/bucket, an ANSI ArithmeticException at 100 TB row
        # counts) PLUS an additive DECIMAL(38,0) sum (XOR alone cancels
        # even-multiplicity duplicates: {A,A,B} vs {B,C,C} match on
        # count AND xor, hiding duplicate-apply drift; decimal is exact
        # to ~1e28 rows/bucket). A bucket matches only if both agree.
        return (t.groupBy(F.pmod(md5h32(F.col("pk").cast("string")),
                                 F.lit(16)).alias("bucket"))
                .agg(F.bit_xor(rh).alias(f"__c_{n_name}"),
                     F.sum(rh.cast("decimal(38,0)")).alias(f"__a_{n_name}"),
                     F.count("*").cast("long").alias(n_name)))

    s0 = side(t0, "n_source")
    s1 = side(t1, "n_target")
    zero_d = F.lit(0).cast("decimal(38,0)")
    return (s0.join(s1, "bucket", "full_outer")
            .select("bucket",
                    F.coalesce("n_source", F.lit(0)).alias("n_source"),
                    F.coalesce("n_target", F.lit(0)).alias("n_target"),
                    ((F.coalesce("__c_n_source", F.lit(0))
                      == F.coalesce("__c_n_target", F.lit(0)))
                     & (F.coalesce("__a_n_source", zero_d)
                        == F.coalesce("__a_n_target", zero_d)))
                     .alias("bucket_match")))


# -- day-of-week seasonality index ---------------------------------------------

@register(
    "orders_seasonal_dow_index",
    oracle="""
WITH d AS (
  -- positive mod, mirroring the lane's pmod: a pre-epoch date must
  -- land in 0..6, not a negative remainder bucket
  SELECT ((date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) % 7)
          + 7) % 7 AS dow,
         o_totalprice
  FROM orders
),
g AS (SELECT avg(o_totalprice) AS overall FROM d)
SELECT d.dow, CAST(count(*) AS BIGINT) AS n_orders,
       round(avg(d.o_totalprice), 4) AS avg_price,
       round(avg(d.o_totalprice) / g.overall, 6) AS seasonal_index
FROM d CROSS JOIN g
GROUP BY d.dow, g.overall
""",
    doc="Day-of-week seasonality index: per-weekday average order value "
        "against the overall mean (index > 1 = hot day) — the basic "
        "seasonal profile a forecasting pipeline extracts before "
        "detrending. The weekday is epoch-day mod 7 (integer-exact, "
        "engine-portable; no locale-dependent day names). One groupBy "
        "+ one scalar broadcast",
)
def orders_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    dow = F.pmod(F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")),
                 F.lit(7))
    d = orders.select(dow.alias("dow"), "o_totalprice")
    g = d.agg(F.avg("o_totalprice").alias("overall"))
    return (d.crossJoin(F.broadcast(g))
            .groupBy("dow", "overall")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
                 F.round(F.avg("o_totalprice") / F.first("overall"), 6)
                  .alias("seasonal_index"))
            .drop("overall"))


# -- Zipf rank-frequency fit ---------------------------------------------------

@register(
    "text_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
freq AS (SELECT tok, CAST(count(*) AS DOUBLE) AS f FROM tok GROUP BY tok),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
)
SELECT CAST(count(*) AS BIGINT) AS vocab_size,
       round(regr_slope(ln(f), ln(CAST(r AS DOUBLE))), 6) AS zipf_slope,
       round(regr_r2(ln(f), ln(CAST(r AS DOUBLE))), 6) AS r2
FROM ranked
""",
    doc="Zipf's-law fit over the corpus vocabulary: OLS slope of "
        "ln(freq) on ln(rank) (natural text sits near -1; templated or "
        "synthetic corpora deviate — a cheap distribution-shift alarm "
        "for an intake pipeline) plus the fit R². One token explode -> "
        "vocab-sized count, one distributed rank over the VOCAB (not "
        "the stream; distrank two-pass, no single-partition window), "
        "one co-moment regression aggregate — the SQL:2003 regr_* "
        "family both engines implement bit-compatibly after round-6",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    freq = (docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .groupBy("tok").agg(F.count("*").cast("double").alias("f")))
    ranked = global_rank_cumsum(
        freq, order=[("f", True), ("tok", False)], rank_col="r")
    lr, lf = F.log(F.col("r").cast("double")), F.log("f")
    return ranked.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"))


# -- Heaps'-law vocabulary growth ----------------------------------------------

@register(
    "documents_vocab_growth_heaps",
    # terms are word 3-grams: the word vocabulary of the synthetic
    # corpus is tiny (everything is first-seen immediately), while the
    # shingle space grows the way a real vocabulary does
    oracle=f"""
WITH docs AS (SELECT doc_id, text FROM documents),
{_SHINGLE_SQL.strip()},
first_seen AS (SELECT gram, min(doc_id) AS fs FROM sh GROUP BY gram),
cohorts AS (
  SELECT CAST(fs // 50 AS BIGINT) AS cohort, count(*) AS new_terms
  FROM first_seen GROUP BY 1
)
SELECT cohort, CAST(new_terms AS BIGINT) AS new_terms,
       CAST(sum(new_terms) OVER (ORDER BY cohort
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS vocab_size
FROM cohorts
""",
    doc="Heaps'-law vocabulary growth curve over word 3-grams: "
        "distinct-term count as the corpus grows, computed WITHOUT any "
        "cumulative-distinct scan — each term's first-seen doc (one "
        "vocab-sized min aggregation) is bucketed into 50-doc cohorts "
        "and a running sum over the tiny cohort frame yields the "
        "growth curve. Sub-linear growth = natural text; a linear "
        "curve flags id-like/noisy token streams. The 100 TB shape: "
        "the only corpus-sized step is the one shingle aggregation "
        "every dedup op already pays; the cohort running sum is "
        "distrank's two-pass distributed cumsum (exact — integer "
        "counts), since the cohort frame itself grows with the corpus",
)
def documents_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")["documents"]
    first_seen = (D.shingles(docs)
                  .groupBy("gram").agg(F.min("doc_id").alias("fs")))
    cohorts = (first_seen
               .groupBy((F.col("fs") / 50).cast("long").alias("cohort"))
               .agg(F.count("*").cast("long").alias("new_terms")))
    ranked = global_rank_cumsum(
        cohorts, order=[("cohort", False)],
        sum_cols={"vocab_size": "new_terms"}, rank_col="_r")
    return ranked.select(
        "cohort", "new_terms", F.col("vocab_size").cast("long"))


# -- Gini concentration of user activity ---------------------------------------

@register(
    "events_power_users_gini",
    oracle="""
WITH c AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS x FROM events
           GROUP BY user_id),
r AS (SELECT x, row_number() OVER (ORDER BY x, user_id) AS i FROM c)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round((2.0 * sum(i * x)) / (count(*) * sum(x))
             - (count(*) + 1.0) / count(*), 6) AS gini
FROM r
""",
    doc="Gini coefficient of per-user event concentration — the "
        "power-user inequality metric (0 = uniform activity, ->1 = a "
        "few users generate everything; capacity planning and abuse "
        "detection both read this dial). Exact rank formulation "
        "G = 2·Σ i·x_i / (n·Σx) - (n+1)/n over ascending counts, "
        "deterministic via the user-id tiebreak; the rank runs over "
        "the per-user aggregate (users, not events) through distrank's "
        "two-pass distributed formulation, not a single-partition "
        "global window",
)
def events_power_users_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    c = (events.groupBy("user_id")
         .agg(F.count("*").cast("double").alias("x")))
    r = global_rank_cumsum(
        c, order=[("x", False), ("user_id", False)], rank_col="i")
    return r.agg(
        F.count("*").cast("long").alias("n_users"),
        F.round((2.0 * F.sum(F.col("i") * F.col("x")))
                / (F.count("*") * F.sum("x"))
                - (F.count("*") + 1.0) / F.count("*"), 6).alias("gini"))


# -- PNG embedded-metadata extraction ------------------------------------------

@register(
    "multimodal_image_text_chunks",
    oracle="""
SELECT doc_id AS id, 'src' AS key,
       'doc' || CAST(doc_id AS VARCHAR) AS value
FROM documents
WHERE text IS NOT NULL
""",
    doc="Embedded image metadata round-trip: PNGs are SYNTHESIZED "
        "JVM-side carrying a tEXt chunk ('src' -> 'doc<id>'; "
        "length-prefixed chunk layout, dims from the text length), "
        "then a pure-Python chunk WALKER (mapInPandas, Arrow batches) "
        "recovers every key/value — the author/source/copyright mining "
        "path real intake pipelines run before pixel work, and the "
        "third real container parser next to the image/audio/video "
        "header triple. The oracle reconstructs the expected metadata "
        "arithmetically, so a single mis-parsed length field fails the "
        "hash. Media bytes never shuffle — the parser projects them "
        "away in the map stage",
)
def multimodal_image_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .analytics.multimodal import image_text_chunks, synthesize_png_with_text
    docs = _t(spark, sf_dir, "documents")["documents"]
    return image_text_chunks(synthesize_png_with_text(docs))


# -- conversion latency percentiles --------------------------------------------

@register(
    "events_conversion_latency",
    oracle="""
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
),
lat AS (
  SELECT (epoch_ms(first_purchase) - epoch_ms(first_view)) / 1000.0 AS sec
  FROM u
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase > first_view
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(sec, 0.25), 3) AS p25_sec,
       round(quantile_cont(sec, 0.5), 3) AS p50_sec,
       round(quantile_cont(sec, 0.75), 3) AS p75_sec,
       round(quantile_cont(sec, 0.9), 3) AS p90_sec
FROM lat
""",
    doc="First-view -> first-purchase conversion latency distribution: "
        "per-user firsts from ONE conditional-min groupBy (no "
        "view x purchase self-join), then exact interpolated "
        "percentiles over the small converted-user frame — the "
        "time-to-convert funnel metric product teams track next to "
        "the conversion-rate funnel already registered",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    u = (events.groupBy("user_id")
         .agg(F.min(F.when(F.col("event_type") == "view", ms)).alias("fv"),
              F.min(F.when(F.col("event_type") == "purchase", ms))
               .alias("fp")))
    lat = (u.filter(F.col("fv").isNotNull() & F.col("fp").isNotNull()
                    & (F.col("fp") > F.col("fv")))
           .select(((F.col("fp") - F.col("fv")) / 1000.0).alias("sec")))
    return lat.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("sec", F.lit(0.25)), 3).alias("p25_sec"),
        F.round(F.percentile("sec", F.lit(0.5)), 3).alias("p50_sec"),
        F.round(F.percentile("sec", F.lit(0.75)), 3).alias("p75_sec"),
        F.round(F.percentile("sec", F.lit(0.9)), 3).alias("p90_sec"))


# -- rolling weekly active users -----------------------------------------------

@register(
    "events_wau_rolling",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
FROM days d
JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
""",
    doc="Rolling 7-day active users per day (the WAU curve next to "
        "DAU/MAU — THE product-analytics engagement metric): distinct "
        "(day, user) pairs first (one dedup shuffle collapses the "
        "event stream to at most days x users rows), then each day "
        "joins its trailing 7-day window of that SMALL frame and "
        "counts distinct users. The range join is days x (7 x daily "
        "actives) — calendar-sized, never event-stream-sized; no "
        "approximate sketch needed until daily actives themselves "
        "explode, at which point the registered per-group HLL ops "
        "swap in mergeably",
)
def events_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")["events"]
    day = (F.unix_millis(F.col("ts").cast("timestamp")) / 86400000) \
        .cast("long")
    du = events.select(day.alias("day"), "user_id").distinct()
    days = du.select("day").distinct()
    u = du.select(F.col("day").alias("uday"), "user_id")
    return (days.join(u, (F.col("uday") >= F.col("day") - 6)
                      & (F.col("uday") <= F.col("day")))
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("long").alias("wau")))


# -- Pareto concentration point ------------------------------------------------

@register(
    "orders_pareto_8020",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         sum(CAST(TRY_CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT count(*) AS n, sum(s) AS tot FROM spend),
ranked AS (
  SELECT s,
         row_number() OVER (ORDER BY s DESC, o_custkey) AS r,
         sum(s) OVER (ORDER BY s DESC, o_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM spend
)
SELECT CAST(min(r) AS BIGINT) AS customers_for_80pct,
       CAST(max(t.n) AS BIGINT) AS n_customers,
       round(CAST(min(r) AS DOUBLE) / max(t.n), 6) AS pareto_fraction
FROM ranked CROSS JOIN tot t WHERE 5 * cum >= 4 * t.tot
""",
    doc="Pareto 80/20 concentration point: the smallest top-customer "
        "prefix whose cumulative spend reaches 80%% of revenue, as a "
        "count and as a fraction of the customer base — the "
        "concentration dial next to the Gini coefficient (Gini "
        "summarizes the whole curve; this names the actionable "
        "prefix). Rank/cumsum run over the per-customer AGGREGATE "
        "(customers, not orders) via distrank's two-pass distributed "
        "formulation — never a single-partition global window. Spend "
        "is summed in CENTS AS LONG (exact integer scale, distrank's "
        "own contract: a double running sum can differ from a "
        "sequential window in the last ulp and flip the boundary "
        "row), the 80%% test is the integer comparison 5*cum >= 4*tot "
        "(no float multiply on either engine), and n/tot come from a "
        "plain 1-row aggregate over spend — max(cum) equals total "
        "spend only when every per-customer sum is non-negative, "
        "which poisoned inputs violate",
)
def orders_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    cents = (F.col("o_totalprice").try_cast("decimal(18,2)") * 100) \
        .cast("long")
    spend = orders.groupBy("o_custkey").agg(F.sum(cents).alias("s"))
    # distributed rank + running sum (distrank two-pass: range
    # partition, per-partition window, broadcast prefix offsets) —
    # replaces the r12-banned partition-less window
    ranked = global_rank_cumsum(
        spend, order=[("s", True), ("o_custkey", False)],
        sum_cols={"cum": "s"}, rank_col="r")
    totals = spend.agg(F.count("*").cast("long").alias("n"),
                       F.sum("s").alias("tot"))
    return (ranked.crossJoin(F.broadcast(totals))
            .filter(F.col("cum") * 5 >= F.col("tot") * 4)
            .agg(F.min("r").cast("long").alias("customers_for_80pct"),
                 F.max("n").cast("long").alias("n_customers"),
                 F.round(F.min("r").cast("double") / F.max("n"), 6)
                  .alias("pareto_fraction")))


# -- language-ID confusion audit -----------------------------------------------

def _register_langid_confusion():
    from .queries_analytics import _lang_hits_and_case
    hits, case_sql = _lang_hits_and_case()

    @register(
        "text_langid_confusion",
        oracle=f"""
WITH h AS (
  SELECT doc_id, lang,
  {hits}
  FROM documents
),
pred AS (SELECT doc_id, lang, {case_sql} AS predicted FROM h)
SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY lang, predicted
""",
        doc="Language-ID confusion matrix: the heuristic classifier's "
            "predictions cross-tabulated against the declared lang "
            "column — the audit every classifier-gated pipeline runs "
            "before trusting a filter (off-diagonal mass = docs a "
            "language gate would mis-route; per-language recall reads "
            "off the diagonal). Pure projection + one "
            "|langs|^2-bounded groupBy; the classifier and its SQL "
            "mirror are the registered language_id pair, so this also "
            "cross-checks the classifier's engine parity",
    )
    def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .analytics.text import language_id
        docs = _t(spark, sf_dir, "documents")["documents"]
        pred = language_id(docs).select("doc_id", "predicted_lang")
        return (docs.select("doc_id", "lang").join(pred, "doc_id")
                .groupBy("lang", F.col("predicted_lang").alias("predicted"))
                .agg(F.count("*").cast("long").alias("n_docs")))


_register_langid_confusion()


# -- embedding centroid drift --------------------------------------------------

@register(
    "embedding_centroid_drift",
    oracle="""
WITH cell AS (
  SELECT vec_id % 2 AS cohort, label, i AS dim,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings,
       unnest(generate_series(1, CAST(len(embedding) AS INT))) t(i)
),
cent AS (
  SELECT cohort, label, dim, avg(v) AS m
  FROM cell GROUP BY cohort, label, dim
)
SELECT a.label,
       round(sqrt(sum(pow(a.m - b.m, 2))), 6) AS centroid_l2_drift,
       CAST(count(*) AS BIGINT) AS n_dims
FROM cent a JOIN cent b
  ON b.label = a.label AND b.dim = a.dim
WHERE a.cohort = 0 AND b.cohort = 1
GROUP BY a.label
""",
    doc="Embedding centroid drift between two deterministic cohorts "
        "(even vs odd vec_ids — standing in for week-over-week model "
        "or data versions): per-label mean vector per cohort, L2 "
        "distance between the cohort centroids — the embedding-space "
        "drift alarm an ML-ops pipeline fires before re-clustering or "
        "re-indexing (an ANN index built on drifted centroids loses "
        "recall silently; cf. the registered recall@5 audit). The "
        "corpus-sized step is one (cohort, label, dim) mean "
        "aggregation over the exploded cells; the drift join runs on "
        "the labels x dims centroid frame",
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")["embeddings"]
    cell = emb.select(
        (F.col("vec_id") % 2).alias("cohort"), "label",
        F.posexplode(F.col("embedding")).alias("dim0", "v0")
    ).select("cohort", "label", (F.col("dim0") + 1).alias("dim"),
             F.col("v0").cast("double").alias("v"))
    cent = (cell.groupBy("cohort", "label", "dim")
            .agg(F.avg("v").alias("m")))
    a = cent.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("m").alias("ma"))
    b = cent.filter(F.col("cohort") == 1).select(
        "label", "dim", F.col("m").alias("mb"))
    return (a.join(b, ["label", "dim"])
            .groupBy("label")
            .agg(F.round(F.sqrt(F.sum(F.pow(F.col("ma") - F.col("mb"), 2))),
                         6).alias("centroid_l2_drift"),
                 F.count("*").cast("long").alias("n_dims")))


# -- fulfillment latency distribution ------------------------------------------

@register(
    "lineitem_ship_lag_distribution",
    oracle="""
WITH lag AS (
  SELECT l.l_returnflag,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(quantile_cont(CAST(d AS DOUBLE), 0.5), 3) AS p50_days,
       round(quantile_cont(CAST(d AS DOUBLE), 0.9), 3) AS p90_days,
       CAST(max(d) AS BIGINT) AS max_days,
       CAST(count(*) FILTER (WHERE d > 90) AS BIGINT) AS n_over_90d
FROM lag GROUP BY l_returnflag
""",
    doc="Fulfillment-latency distribution: order-date -> ship-date lag "
        "percentiles per return flag plus a 90-day SLA breach count — "
        "the operational latency report next to the revenue queries "
        "(TPC-H measures money; operations teams measure days). One "
        "orderkey join (AQE picks the strategy), exact interpolated "
        "percentiles per small group; integer day arithmetic from a "
        "shared epoch on both engines",
)
def lineitem_ship_lag_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    lag = (t["lineitem"].select("l_orderkey", "l_returnflag", "l_shipdate")
           .join(t["orders"].select("o_orderkey", "o_orderdate"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .select("l_returnflag",
                   F.datediff("l_shipdate", "o_orderdate").alias("d")))
    return (lag.groupBy("l_returnflag")
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.round(F.percentile(F.col("d").cast("double"),
                                      F.lit(0.5)), 3).alias("p50_days"),
                 F.round(F.percentile(F.col("d").cast("double"),
                                      F.lit(0.9)), 3).alias("p90_days"),
                 F.max("d").cast("long").alias("max_days"),
                 F.sum(F.when(F.col("d") > 90, 1).otherwise(0))
                  .cast("long").alias("n_over_90d")))
