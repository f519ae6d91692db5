"""Extended TPC-H-shaped analytic queries (imported by .queries).

The reference engine's query surface is fixed CDC pipelines (SURVEY.md
§0); these queries extend the rebuild's analytics coverage over the same
join/aggregate substrate — each is the standard TPC-H form adapted to
the synthetic tables' columns (no partsupp/shipmode/comment columns in
the fixtures, so Q2/Q11/Q21 have no faithful shape and Q9/Q12/Q19/Q20/
Q22 substitute equivalent predicates over existing columns; the JOIN/
AGG/subquery topology — which is what exercises the engine — is kept).

Oracle conventions follow queries.py: identical aliases both sides,
money math in exact DECIMAL(18,2) with a single final cast/divide in
IEEE double (summation order can never perturb bits), ratio compares
cross-multiplied in decimal so threshold-boundary rows are engine-
portable.

Scale notes ride each query's doc: dims reduce through broadcast chains
before touching the fact table (the q3/q5 pattern), one fact shuffle
per query, AQE picks the physical join for reduced sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import register, _t, _DEC


def _rev() -> F.Column:
    return (F.col("l_extendedprice").try_cast(_DEC)
            * (1 - F.col("l_discount").try_cast(_DEC)))


_REV_SQL = ("TRY_CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (1 - TRY_CAST(l_discount AS DECIMAL(18,2)))")


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
    doc="TPC-H Q7 shape: bi-directional nation-pair shipping volume by "
        "year. Suppliers and customers are pre-filtered to the two "
        "nations through broadcast joins, so the fact table only ever "
        "joins reduced sides (~2/25 of each dim); the disjunctive "
        "nation-pair predicate runs post-join on two ints",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier", "nation", "orders",
           "customer")
    two = t["nation"].filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = (t["supplier"]
            .join(F.broadcast(two.select(F.col("n_nationkey"),
                                         F.col("n_name").alias("supp_nation"))),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "supp_nation"))
    cust = (t["customer"]
            .join(F.broadcast(two.select(F.col("n_nationkey"),
                                         F.col("n_name").alias("cust_nation"))),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "cust_nation"))
    ords = (t["orders"]
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "cust_nation"))
    return (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
SELECT year(o.o_orderdate) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                THEN {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n2.n_regionkey
WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
GROUP BY year(o.o_orderdate)
""",
    doc="TPC-H Q8 shape: supplier nation's market share of ECONOMY-part "
        "revenue sold into AMERICA, by order year. Both decimal sums "
        "come out of ONE aggregation (conditional sum, not two passes); "
        "the share is a single IEEE division of two exact decimals cast "
        "to double — bit-stable in any engine. Part/supplier/customer "
        "chains all reduce via broadcast before the fact shuffle",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation",
           "orders", "customer", "region")
    econ = t["part"].filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    supp = (t["supplier"]
            .join(F.broadcast(t["nation"].select(
                F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
                F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "supp_nation"))
    america = (t["nation"]
               .join(F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
                     F.col("n_regionkey") == F.col("r_regionkey"))
               .select(F.col("n_nationkey").alias("cust_nationkey")))
    cust = (t["customer"]
            .join(F.broadcast(america),
                  F.col("c_nationkey") == F.col("cust_nationkey"))
            .select("c_custkey"))
    ords = (t["orders"]
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate"))
    zero = F.lit(0).try_cast(_DEC)
    nat3 = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero)
    return (
        t["lineitem"]
        .join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(nat3).cast("double")
              / F.sum(_rev()).cast("double")).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q9 — product-line profit by nation and year (adapted: no ps_supplycost
# in the fixtures; cost proxied as l_quantity * p_retailprice / 10)
# ---------------------------------------------------------------------------

@register(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       year(o.o_orderdate) AS o_year,
       CAST(sum(TRY_CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - TRY_CAST(l.l_discount AS DECIMAL(18,2))) * 10
                - TRY_CAST(l.l_quantity AS DECIMAL(18,2))
                * TRY_CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
       / 10.0 AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE 'red%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
    doc="TPC-H Q9 shape (cost proxied by quantity*retailprice/10 — the "
        "fixtures carry no partsupp): per-nation, per-year profit on "
        "red parts. The /10 happens ONCE on the final decimal sum in "
        "double (profit*10 accumulates exactly in decimal), never per "
        "row, so no decimal-division scale rules enter the result. "
        "Part filter broadcasts; orders join is the only big-side "
        "shuffle besides the fact scan",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    red = (t["part"].filter(F.col("p_name").like("red%"))
           .select("p_partkey", "p_retailprice"))
    supp = (t["supplier"]
            .join(F.broadcast(t["nation"].select(
                F.col("n_nationkey"), F.col("n_name").alias("nation"))),
                F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "nation"))
    profit_x10 = (_rev() * 10
                  - F.col("l_quantity").try_cast(_DEC)
                  * F.col("p_retailprice").try_cast(_DEC))
    return (
        t["lineitem"]
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit_x10).cast("double") / 10.0).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue ranking
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment,
       CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: top-20 customers by revenue lost to returns in "
        "a quarter. Ties broken by custkey so the LIMIT set is "
        "deterministic across engines. The quarter predicate reduces "
        "orders before the lineitem join; returnflag pushes to the "
        "fact scan; customer attributes join AFTER the per-custkey "
        "aggregate (group on the key, decorate the 20-row result — not "
        "a wide pre-agg carry)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    q_orders = (t["orders"]
                .filter((F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
                        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00")))
                .select("o_orderkey", "o_custkey"))
    per_cust = (
        t["lineitem"].filter(F.col("l_returnflag") == "R")
        .join(q_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("rev_dec")))
    cust = (t["customer"]
            .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_name", "c_acctbal", "n_name",
                    "c_mktsegment"))
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment",
                F.col("rev_dec").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping priority classes (adapted: grouped by l_linestatus, the
# fixtures carry no l_shipmode)
# ---------------------------------------------------------------------------

@register(
    "q12_priority_lines",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape (l_linestatus stands in for the absent "
        "l_shipmode): high/low-priority line counts per status class "
        "for one ship year. Shipdate range pushes to the fact scan; "
        "both counts come from one conditional aggregation pass",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders")
    li = (t["lineitem"]
          .filter((F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
                  & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00")))
          .select("l_orderkey", "l_linestatus"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"].select("o_orderkey", "o_orderpriority"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@register(
    "q13_customer_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: distribution of per-customer order counts "
        "(excluding urgent orders), customers with zero orders included "
        "via the left join. Two shuffles by construction (per-key "
        "count, then histogram on the count) — the first has map-side "
        "partial agg, the second moves one row per distinct count value",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"].select("c_custkey")
        .join(t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
              .select("o_custkey", "o_orderkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS promo_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
""",
    doc="TPC-H Q14 shape: PROMO-part share of one month's revenue. One "
        "conditional aggregation; the ratio is 100*x/y over two exact "
        "decimals in double (two IEEE ops on bit-identical inputs). "
        "Part dim broadcasts; the month predicate pushes to the scan",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    zero = F.lit(0).try_cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= _ts("1997-03-01 00:00:00"))
                & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00")))
        .join(F.broadcast(t["part"].select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * F.sum(promo).cast("double")
              / F.sum(_rev()).cast("double")).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarter revenue
# ---------------------------------------------------------------------------

@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum({_REV_SQL}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.total_dec AS DOUBLE) AS total_revenue
FROM revenue r
JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_dec = (SELECT max(total_dec) FROM revenue)
""",
    doc="TPC-H Q15 shape: supplier(s) achieving the maximum quarter "
        "revenue. The max comes from re-aggregating the same per-"
        "supplier plan and broadcasting the 1-row result back as an "
        "equi-join — the two consumers share an identical aggregation "
        "subtree, so AQE covers the second with a ReusedExchange "
        "instead of a second fact scan; the equality compare runs on "
        "the exact DECIMAL, with the double cast only in the output",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .filter((F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
                & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_dec")))
    mx = revenue.agg(F.max("total_dec").alias("max_dec"))
    return (
        revenue
        .join(F.broadcast(mx), F.col("total_dec") == F.col("max_dec"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("total_dec").cast("double").alias("total_revenue"))
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive brand/quantity/size predicates
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(sum({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
    doc="TPC-H Q19 shape: disjunction of three brand/size/quantity "
        "conjunctions across the join. The part side pre-filters to "
        "the union of the three brand/size envelopes (a pushable "
        "disjunction on one table) and broadcasts; the full cross-"
        "table disjunction re-applies post-join — same rows, but the "
        "scan only reads three brands' parts",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    q = F.col("l_quantity")
    parts = t["part"].filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15))
    ).select("p_partkey", "p_brand", "p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30)))
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with excess shipped volume (adapted: volume from
# lineitem, the fixtures carry no partsupp availability)
# ---------------------------------------------------------------------------

@register(
    "q20_volume_suppliers",
    oracle="""
WITH part_qty AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(TRY_CAST(l.l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'blue%'
  GROUP BY l.l_partkey, l.l_suppkey
),
part_total AS (
  SELECT l_partkey, sum(supp_qty) AS total_qty
  FROM part_qty GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM part_qty pq
JOIN part_total pt ON pt.l_partkey = pq.l_partkey
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
WHERE pq.supp_qty * 10 > pt.total_qty
""",
    doc="TPC-H Q20 shape (availability proxied by shipped volume): "
        "suppliers who shipped more than a tenth of a blue part's total "
        "volume (the fixtures spread parts over ~40 suppliers each, so "
        "the classic half-share threshold selects nobody at any SF). "
        "Nested aggregation (per part+supplier, then per part) "
        "reuses the first aggregate as input to the second — one fact "
        "scan; the >half compare is cross-multiplied in exact decimal; "
        "the semi-join to supplier names is the final broadcast",
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier")
    blue = t["part"].filter(F.col("p_name").like("blue%")).select("p_partkey")
    part_qty = (
        t["lineitem"]
        .join(F.broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").try_cast(_DEC)).alias("supp_qty")))
    part_total = (part_qty.groupBy(F.col("l_partkey").alias("pt_partkey"))
                  .agg(F.sum("supp_qty").alias("total_qty")))
    return (
        part_qty
        .join(part_total, F.col("l_partkey") == F.col("pt_partkey"))
        .filter(F.col("supp_qty") * 10 > F.col("total_qty"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q22 — prospects: above-average balance, never ordered (adapted:
# mktsegment stands in for the absent phone country code)
# ---------------------------------------------------------------------------

@register(
    "q22_prospects",
    oracle="""
WITH pos AS (
  SELECT sum(TRY_CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
         count(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       count(*) AS numcust,
       CAST(sum(TRY_CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, pos
WHERE TRY_CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.bal_cnt > pos.bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment
""",
    doc="TPC-H Q22 shape: customers with above-average positive balance "
        "and no URGENT orders, per segment (segment stands in for the "
        "phone prefix; the fixtures give every customer at least one "
        "order, so the classic no-orders test selects nobody at any "
        "SF). The scalar 'average' subquery broadcasts as a 1-row "
        "(sum, count) frame and the compare cross-multiplies in exact "
        "decimal — no float average ever exists, so boundary customers "
        "agree across engines. The no-orders test is a left_anti join "
        "on the orders key projection",
)
def q22_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    bal = F.col("c_acctbal").try_cast(_DEC)
    pos = (t["customer"].filter(F.col("c_acctbal") > 0.0)
           .agg(F.sum(bal).alias("bal_sum"), F.count("*").alias("bal_cnt")))
    return (
        t["customer"]
        .join(F.broadcast(pos))
        .filter(bal * F.col("bal_cnt") > F.col("bal_sum"))
        .join(t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"),
             F.sum(bal).cast("double").alias("totacctbal"))
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-price supplier per part (adapted: the fixtures carry no
# partsupp, so lineitem's observed prices stand in for supply cost)
# ---------------------------------------------------------------------------

@register(
    "q2_min_price_supplier",
    oracle="""
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(TRY_CAST(l.l_extendedprice AS DECIMAL(18,2))) AS best_price
  FROM lineitem l
  GROUP BY l.l_partkey, l.l_suppkey
),
part_min AS (
  SELECT l_partkey, min(best_price) AS min_price
  FROM offers GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, n.n_name,
       CAST(o.best_price AS DOUBLE) AS best_price
FROM offers o
JOIN part_min m ON m.l_partkey = o.l_partkey AND o.best_price = m.min_price
JOIN part p ON p.p_partkey = o.l_partkey AND p.p_size = 10
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
""",
    doc="TPC-H Q2 shape (observed lineitem prices stand in for the "
        "absent partsupp supply cost): for every size-10 part, the "
        "supplier(s) whose best offered price equals the part's "
        "minimum. Correlated-min decorrelated into a per-part "
        "aggregate joined back on (part, price); min/equality run on "
        "exact DECIMAL (min selects, never accumulates). The per-part "
        "min is offer-count-shaped — it reuses the first aggregate's "
        "output, not a second fact scan; part/supplier/nation all "
        "broadcast as decorations of the tiny result",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    size10 = t["part"].filter(F.col("p_size") == 10).select(
        "p_partkey", "p_name")
    # the part filter pushes BELOW both aggregations: only size-10
    # parts can survive the join-back, so the fact rows of every other
    # part (~98%) drop at the scan-side broadcast semi-join instead of
    # being aggregated and discarded later. The oracle keeps the
    # filter at the end — identical result, partkey-functional filter.
    offers = (t["lineitem"]
              .join(F.broadcast(size10.select("p_partkey")),
                    F.col("l_partkey") == F.col("p_partkey"), "left_semi")
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.col("l_extendedprice").try_cast(_DEC))
                   .alias("best_price")))
    part_min = (offers.groupBy(F.col("l_partkey").alias("pm_partkey"))
                .agg(F.min("best_price").alias("min_price")))
    supp = (t["supplier"]
            .join(F.broadcast(t["nation"].select("n_nationkey", "n_name")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))
    return (
        offers
        .join(part_min, (F.col("l_partkey") == F.col("pm_partkey"))
              & (F.col("best_price") == F.col("min_price")))
        .join(F.broadcast(size10), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
                F.col("best_price").cast("double").alias("best_price"))
    )


# ---------------------------------------------------------------------------
# CUBE grouping over order dimensions
# ---------------------------------------------------------------------------

@register(
    "orders_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(TRY_CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="CUBE grouping sets over (status, priority), computed as "
        "grouping sets OVER THE FINEST-GRAIN PRE-AGGREGATE: base = "
        "groupBy(status, priority) shuffles the fact table once; the "
        "Expand that materializes the (s,p)/(s)/(p) grains then copies "
        "only base's tiny grouped output, and the () grain is an "
        "explicit aggregate of base reusing its exchange. All "
        "aggregates are decomposable (count->sum, exact decimal "
        "sum->sum), so results are identical to GROUP BY CUBE. Cost "
        "at 100 TB: ONE fact scan and ONE fact-sized shuffle "
        "(executed plan pinned: 1 'Scan parquet', ReusedExchange for "
        "the () branch) — vs Expand-over-fact (3 copies of every row "
        "through the map-side aggregate: a CPU term, since map-side "
        "combine keeps shuffle bytes low for these keys) PLUS the "
        "r15 union form's second full scan for the () grain. The "
        "explicit () grain also keeps ANSI empty-input "
        "semantics: Spark's Expand loses the grand-total row on "
        "empty input while the standard (and the oracle) emit it — "
        "count 0 via coalesce, sum NULL. Null grouping markers match "
        "ANSI on both engines; spend accumulates in exact decimal. "
        "Local-cost disclosure (bench_ab_grains.json): +~0.07s fixed "
        "stage overhead at sf0.1 — the keep decision is the shuffle-"
        "volume term, which dominates at fact-table scale",
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")["orders"]
    base = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").try_cast(_DEC)).alias("spend"))
    null_s = F.lit(None).cast("string")

    keyed = (base.groupingSets(
        [["o_orderstatus", "o_orderpriority"],
         ["o_orderstatus"], ["o_orderpriority"]],
        "o_orderstatus", "o_orderpriority")
        .agg(F.sum("n").alias("n_orders"),
             F.sum("spend").cast("double").alias("total_spend")))
    grand = (base.agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_orders"),
                      F.sum("spend").cast("double").alias("total_spend"))
             .select(null_s.alias("o_orderstatus"),
                     null_s.alias("o_orderpriority"),
                     "n_orders", "total_spend"))
    return keyed.unionByName(grand)


# ---------------------------------------------------------------------------
# Q11 — important parts (adapted: revenue share stands in for the absent
# partsupp supplycost*availqty stock value)
# ---------------------------------------------------------------------------

@register(
    "q11_important_parts",
    oracle=f"""
WITH partrev AS (
  SELECT l_partkey, sum({_REV_SQL}) AS part_value
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT sum(part_value) AS total_value FROM partrev)
SELECT p.l_partkey AS p_partkey,
       CAST(p.part_value AS DOUBLE) AS part_value
FROM partrev p, total t
WHERE p.part_value > t.total_value * CAST(0.0007 AS DECIMAL(5,4))
""",
    doc="TPC-H Q11 shape (per-part revenue stands in for the absent "
        "partsupp stock value): parts whose revenue exceeds a fixed "
        "fraction of global revenue. The HAVING-against-scalar-subquery "
        "decorrelates into one fact aggregate whose output is re-"
        "aggregated for the global total (no second fact scan) and "
        "broadcast back as a 1-row frame; the threshold compare runs "
        "entirely in exact decimal (sum decimal x decimal(5,4) literal "
        "— scale-6 exact product), so boundary parts agree across "
        "engines. At 100 TB this is one partkey shuffle + a 1-row "
        "broadcast — the same cost profile as a plain groupBy",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")["lineitem"]
    partrev = (lineitem.groupBy("l_partkey")
               .agg(F.sum(_rev()).alias("part_value")))
    total = partrev.agg(F.sum("part_value").alias("total_value"))
    return (
        partrev
        .join(F.broadcast(total))
        .filter(F.col("part_value")
                > F.col("total_value") * F.lit("0.0007").cast("decimal(5,4)"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.col("part_value").cast("double").alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted: shipdate lateness vs
# order date stands in for the absent receipt/commit dates)
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
""",
    doc="TPC-H Q21 shape (shipdate>orderdate+60d lateness stands in for "
        "the absent receipt/commit dates): per supplier in NATION_3, "
        "late lines in multi-supplier failed orders where theirs is the "
        "ONLY late supplier. The EXISTS / NOT-EXISTS pair decorrelates "
        "into one per-order aggregate — countDistinct(supp) and "
        "countDistinct(late supp) in a single groupBy — then late lines "
        "join back on orderkey; the oracle keeps the correlated form, "
        "so the two engines prove the rewrite against each other. One "
        "orderkey shuffle over the fact, supplier+nation broadcast; at "
        "100 TB the per-order aggregate is the same exchange the "
        "join-back reuses (co-partitioned on orderkey)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "orders", "supplier", "nation")
    lf = (t["lineitem"]
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(t["orders"].filter(F.col("o_orderstatus") == "F")
                .select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .withColumn("late",
                      F.col("l_shipdate")
                      > F.expr("o_orderdate + INTERVAL '60' DAY")))
    per_order = (lf.groupBy(F.col("l_orderkey").alias("po_orderkey"))
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.when(F.col("late"),
                                             F.col("l_suppkey")))
                       .alias("n_late_supp")))
    supp = (t["supplier"]
            .join(F.broadcast(t["nation"]
                              .filter(F.col("n_name") == "NATION_3")
                              .select("n_nationkey")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    return (
        lf.filter(F.col("late"))
        .join(per_order.filter((F.col("n_supp") > 1)
                               & (F.col("n_late_supp") == 1)),
              F.col("l_orderkey") == F.col("po_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
