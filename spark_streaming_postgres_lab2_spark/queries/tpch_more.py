"""Second batch of TPC-H-shaped scale queries (q7/q10/q13/q14/q17/q19/
q22 adaptations to the driver fixture's columns -- no shipmode/comment/
phone columns exist, so the shapes keep each query's characteristic
plan: multi-dimension equi-join chains, left-join distributions,
conditional-aggregate ratios, per-group-average correlated filters,
disjunctive pushdown predicates, and anti-join + scalar-subquery
combinations).

Every query pairs with a DuckDB oracle; money sums go through
money_sum/sql_money_sum (fixed-point, associative) so Spark's
parallel float reduction and DuckDB's serial one agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from . import QuerySpec
from .core import money_sum, sql_money_sum

def _rev():
    # lazy: F.col needs an active SparkContext, and this module is
    # imported at pytest collection time before any session exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


# --- q7-shape: cross-nation shipping volume ----------------------------------


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flow supplier-nation -> customer-nation
    by ship year.  Two independent dimension chains hang off lineitem;
    nation is broadcast on both ends (25 rows however large the fact
    side grows), supplier/customer stay shuffle joins because they
    scale with SF."""
    t = load_tables(
        spark, sf_dir, ["lineitem", "orders", "customer", "supplier", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("__s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("__c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__s_nkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(money_sum(_rev()).alias("revenue"))
    )


ORACLE_NATION_VOLUME = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       {sql_money_sum(_SQL_REV, "revenue")}
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name != n2.n_name
GROUP BY 1, 2, 3
"""


# --- q10-shape: returned-item revenue ----------------------------------------


def q_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top 20 customers by revenue lost to returns
    (l_returnflag = 'R') for orders placed in a half-year window.
    Deterministic top-k: ORDER BY revenue DESC, c_custkey."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
        )
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(money_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_REVENUE = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {sql_money_sum(_SQL_REV, "revenue")}
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- q13-shape: customer order-count distribution ----------------------------


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT join so zero-order customers keep a
    c_count of 0, then a second aggregation over the counts.  Two
    shuffles total (custkey, then c_count); the second input is one
    row per customer, already tiny."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    per_cust = (
        t["customer"]
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_ORDER_COUNT_DIST = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q14-shape: promo revenue ratio ------------------------------------------


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio in ONE pass over
    the joined fact slice -- no second scan, no self-join; the CASE
    folds into the same partial aggregate."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * money_sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0))
                / money_sum(_rev()),
                4,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_PROMO_REVENUE = f"""
SELECT round(
         100.0
         * (CAST(sum(CAST(floor((CASE WHEN p_type = 'PROMO' THEN {_SQL_REV} ELSE 0.0 END) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0)
         / (CAST(sum(CAST(floor(({_SQL_REV}) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0),
         4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
"""


# --- q17-shape: small-quantity revenue ---------------------------------------


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems whose quantity is below 20% of their
    part's average.  The correlated subquery is decorrelated into a
    per-part aggregate + equi-join (partial aggregation map-side; the
    per-part frame is |part|-sized, far smaller than the fact)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"]
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__qty_cut")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cut"))
        .agg(
            F.round((money_sum(F.col("l_extendedprice")) / F.lit(7.0)), 4).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_SMALL_QUANTITY = """
SELECT round(
         (CAST(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0) / 7.0,
         4) AS avg_yearly
FROM lineitem l
JOIN (
  SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
  FROM lineitem GROUP BY l_partkey
) p ON l.l_partkey = p.pk
WHERE l.l_quantity < p.qty_cut
"""


# --- q19-shape: disjunctive predicate pushdown -------------------------------


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three brand/size/quantity disjuncts.  The
    common join key stays an equi-join; only the residual disjunction
    is evaluated post-join, so the plan is still a hash join (a naive
    translation that ORs the join conditions degrades to a
    nested-loop cross product)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(1, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(money_sum(_rev()).alias("revenue"))
    )


ORACLE_DISJUNCTIVE = f"""
SELECT {sql_money_sum(_SQL_REV, "revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


# --- q22-shape: idle high-balance customers ----------------------------------


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the global positive-balance
    average with no order since 2000 (the fixture's order history is
    dense enough that literally-never-ordered is an empty set -- a
    0-row result would be evidence-free, the VERDICT r2
    embedding-LSH lesson).  The scalar average is a 1-row broadcast
    cross join (no per-row subquery); the recency test is a left_anti
    join against the date-filtered order slice (no row explosion, no
    distinct)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            t["orders"]
            .filter(F.col("o_orderdate") >= "2000-01-01")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


ORACLE_IDLE_CUSTOMERS = f"""
SELECT c_nationkey,
       count(*) AS numcust,
       {sql_money_sum("c_acctbal", "totacctbal")}
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    -- NOT EXISTS, not NOT IN: matches Spark left_anti NULL semantics
    -- (a NULL o_custkey would collapse NOT IN to zero rows)
    SELECT 1 FROM orders o
    WHERE o.o_custkey = customer.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def _fact_join_agg(li: DataFrame, o: DataFrame) -> DataFrame:
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            money_sum(_rev()).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def q_fact_join_unbucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control half of the bucketing bench pair (VERDICT r3 item 5):
    lineitem x orders fact-fact join straight off parquet -- both sides
    shuffle on the join key every time the query runs."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    return _fact_join_agg(t["lineitem"], t["orders"])


def q_fact_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed half of the pair: both facts bucketed+sorted on the
    join key (sources/bucketing.ensure_bucketed, one-time layout cost
    per session), so the join itself is a zero-exchange zip of
    co-located buckets -- the plan is pinned Exchange-free in
    tests/test_plans_tpch_more.py.  Same result, same oracle, as the
    unbucketed control: at 100 TB the difference is the fact-fact
    shuffle, the dominant cost of the control plan."""
    from ..sources.bucketing import ensure_bucketed

    li = ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey", 16)
    o = ensure_bucketed(spark, sf_dir, "orders", "o_orderkey", 16)
    return _fact_join_agg(li, o)


ORACLE_FACT_JOIN = f"""
SELECT o_orderpriority,
       count(*) AS n_items,
       {sql_money_sum(_SQL_REV, "revenue")}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q11-shape: group agg vs scalar-subquery threshold -----------------------


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp table in the fixture, so revenue
    share stands in for stock value): parts whose revenue exceeds
    1.5x the average per-part share of total revenue.  The
    characteristic plan is GROUP BY + HAVING > scalar subquery --
    Catalyst evaluates the global aggregates once and broadcasts the
    1-row result into the filter.

    The threshold compare is INTEGER-exact: both sides stay in
    fixed-point cents-of-a-basis-point (2 * rev_cents * n_parts >
    3 * total_cents, i.e. share > 1.5x average -- the p99 of the
    fixture's near-uniform revenue distribution), so no float
    boundary can flip a row between engines, and the relative form
    self-scales with SF.  The cross-multiplied product is computed in
    DECIMAL(38,0) on the Spark side and HUGEINT on the DuckDB side:
    a plain BIGINT product would silently wrap in Spark (ANSI off)
    once SF pushes rev_cents * n_parts past 2^63, exactly where
    DuckDB promotes to HUGEINT -- 38 digits covers any realistic SF
    (rev_cents ~1e18 x n_parts ~1e10 = 28 digits)."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].select(
        "l_partkey", F.floor(_rev() * 10000 + F.lit(0.5)).cast("long").alias("__cents")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("__cents").alias("__rev_cents"))
    totals = per_part.agg(
        F.sum("__rev_cents").alias("__total_cents"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.lit(2).cast("decimal(38,0)")
            * F.col("__rev_cents").cast("decimal(38,0)")
            * F.col("__n_parts").cast("decimal(38,0)")
            > F.lit(3).cast("decimal(38,0)")
            * F.col("__total_cents").cast("decimal(38,0)")
        )
        .select(
            "l_partkey",
            (F.col("__rev_cents") / F.lit(10000.0)).cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "l_partkey")
    )


ORACLE_IMPORTANT_PARTS = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(floor(({_SQL_REV}) * 10000 + 0.5) AS BIGINT)) AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
totals AS (
  SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM per_part
)
SELECT l_partkey,
       CAST(rev_cents AS DOUBLE) / 10000.0 AS revenue
FROM per_part, totals
WHERE 2 * CAST(rev_cents AS HUGEINT) * CAST(n_parts AS HUGEINT)
      > 3 * CAST(total_cents AS HUGEINT)
ORDER BY revenue DESC, l_partkey
"""


# --- q12-shape: two-path conditional counts ----------------------------------


def q_priority_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus stands in for the fixture's
    missing l_shipmode): per line status, how many lines belong to
    critical-priority orders (1-URGENT / 2-HIGH) vs the rest.  One
    fact-fact equi-join + a conditional two-way count -- the plan Q12
    exists to exercise."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_PRIORITY_LINESTATUS = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --- q16-shape: distinct-supplier counts with NOT IN exclusion ---------------


def q_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type)
    excluding one brand and a supplier blocklist (negative account
    balance stands in for the original's complaint-comment scan).
    The characteristic pieces: COUNT(DISTINCT) over a join, a
    blocklist anti join, and a high-cardinality group-by.  The oracle
    uses NOT EXISTS, not Q16's literal NOT IN: left_anti matches
    NOT-EXISTS null semantics, while a NULL in a NOT-IN blocklist
    collapses the whole result (the same trap idle_customers'
    oracle was converted for in ADVICE r3)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part", "supplier"])
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("p_brand") != "Brand#1")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


ORACLE_SUPPLIER_COUNT = """
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND NOT EXISTS (SELECT 1 FROM supplier
                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
"""


# --- q20-shape: aggregate-on-aggregate semi-join chain -----------------------


def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp availqty, so shipped share stands
    in): suppliers who shipped MORE THAN 20% of some part's total
    quantity (the fixture spreads each part over ~15 suppliers, so
    20% is 3x the expected share; >50% matches nothing) -- an
    aggregate compared against a second aggregate one level up, then
    a DISTINCT semi-join back to the supplier dim.  Quantities are
    integer-valued doubles, so the 5*pair > part compare is exact in
    both engines regardless of sum order."""
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    pair = t["lineitem"].groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("__pair_qty")
    )
    part_tot = t["lineitem"].groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("__part_qty")
    )
    dominant = (
        pair.join(part_tot, "l_partkey")
        .filter(5 * F.col("__pair_qty") > F.col("__part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ORACLE_DOMINANT_SUPPLIERS = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT pair.l_suppkey
  FROM (SELECT l_suppkey, l_partkey, sum(l_quantity) AS pair_qty
        FROM lineitem GROUP BY l_suppkey, l_partkey) pair
  JOIN (SELECT l_partkey, sum(l_quantity) AS part_qty
        FROM lineitem GROUP BY l_partkey) tot
    ON pair.l_partkey = tot.l_partkey
  WHERE 5 * pair.pair_qty > tot.part_qty
)
ORDER BY s_suppkey
"""


# --- q21-shape: double-correlated EXISTS / NOT EXISTS ------------------------


def q_sole_failed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (l_returnflag='R' stands in for the missing
    receipt-after-commit lateness): suppliers who were the ONLY
    supplier with a returned line in a multi-supplier order --
    EXISTS(another supplier in the order) AND NOT EXISTS(another
    supplier with a returned line).  Expressed as the grouped-rewrite
    Catalyst produces for Q21 anyway -- per (order, supplier) failure
    flags, per-order supplier/failure counts, the exactly-one-failed
    filter -- but on ONE reused fact partitioning (r10): lineitem is
    repartitioned by l_orderkey once, the (order, supplier) aggregate
    rides that exchange (HashPartitioning(ok) satisfies the (ok, sk)
    clustering requirement), and the per-order counts are WINDOW
    functions over the same partitioning instead of a second
    aggregate joined back, which cost two more fact-scale exchanges
    and, at sf10, the broadcast->SMJ cliff (A/B measured 24.5s -> 8s,
    results identical; SCALING.md r10 batch 3).  Top 20 by count.
    The final group key is s_name on BOTH sides (names joined before
    the count), matching the oracle exactly -- grouping Spark by
    l_suppkey and the oracle by s_name would diverge if two suppliers
    ever shared a name."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    per_os = (
        t["lineitem"]
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("__failed")
        )
    )
    w = Window.partitionBy("l_orderkey")
    culprits = (
        per_os.withColumn("__n_supp", F.count(F.lit(1)).over(w))
        .withColumn("__n_failed", F.sum("__failed").over(w))
        .filter(
            (F.col("__failed") == 1)
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_failed") == 1)
        )
    )
    return (
        culprits.join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


ORACLE_SOLE_FAILED = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
per_o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(failed) AS n_failed
  FROM per_os GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_os
JOIN per_o USING (l_orderkey)
JOIN supplier ON s_suppkey = per_os.l_suppkey
WHERE per_os.failed = 1 AND per_o.n_supp >= 2 AND per_o.n_failed = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --- market-basket association rules -----------------------------------------

_MB_TOPK = 30


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets (the support /
    confidence / lift triple of retail analytics): top-30 part pairs
    by co-occurrence count across orders.

    Scale shape: baskets are orders, so the pair join is an
    order-local self-join over the distinct (order, part) frame --
    bounded by C(items-per-order, 2) per basket (max 13 items on the
    fixture), linear in order count, never corpus-quadratic.  Counts
    are exact BIGINTs; confidence/lift are display-only ratios
    (rounded 4); the top-k orders on (pair_count DESC, part_a,
    part_b) -- fully discrete."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    # r15 (guide §2.4): ``op`` feeds three consumers (item_cnt and both
    # self-join sides), each planned as an independent subtree -- the
    # scan + distinct ran three times.  The lineage cut makes it run
    # once; the checkpointed rows are two slim longs.
    op = (
        t["lineitem"]
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    item_cnt = op.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("__cnt")
    )
    n_row = t["orders"].agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
    )
    ca = item_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("__cnt").alias("count_a")
    )
    cb = item_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("__cnt").alias("count_b")
    )
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(n_row))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            "count_a",
            "count_b",
            F.round(F.col("pair_count") / F.col("count_a"), 4).alias("conf_a_to_b"),
            F.round(F.col("pair_count") / F.col("count_b"), 4).alias("conf_b_to_a"),
            F.round(
                (F.col("pair_count") * F.col("__n"))
                / (F.col("count_a") * F.col("count_b")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_count"), "part_a", "part_b")
        .limit(_MB_TOPK)
    )


ORACLE_MARKET_BASKET = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item_cnt AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY l_partkey
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_orders FROM orders),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, pair_count,
       ca.cnt AS count_a, cb.cnt AS count_b,
       round(CAST(pair_count AS DOUBLE) / ca.cnt, 4) AS conf_a_to_b,
       round(CAST(pair_count AS DOUBLE) / cb.cnt, 4) AS conf_b_to_a,
       round(CAST(pair_count * n.n_orders AS DOUBLE) / (ca.cnt * cb.cnt), 4)
         AS lift
FROM pairs
JOIN item_cnt ca ON ca.l_partkey = part_a
JOIN item_cnt cb ON cb.l_partkey = part_b, n
ORDER BY pair_count DESC, part_a, part_b
LIMIT {_MB_TOPK}
"""


# --- GDPR erasure-scope audit -------------------------------------------------

_GDPR_MOD = 97  # synthetic deletion list: every 97th customer


def q_gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten scope audit: given a deletion list (every
    ``_GDPR_MOD``-th customer -- the deterministic stand-in for an
    erasure-request table), report how many rows each table in the
    customer -> orders -> lineitem cascade would lose, plus each
    table's share.  The read-only half of deletion tooling: run it
    BEFORE the destructive pass, and again after (all zeros) as the
    compliance check.

    Scale shape: each FACT table is scanned exactly once -- its total
    count and its doomed count come from the SAME conditional
    aggregate (orders: one left join against the broadcast deletion
    list; lineitem: one lineitem ⋈ orders join with the same
    broadcast flag) -- and the three 1-row aggregates are assembled
    into 3 rows with one stack over their crossJoin, never an
    N-branch union re-executing shared frames (the table_profile
    38-scans lesson).  The dim-sized customer table is re-read by the
    two flag joins; that is deliberate -- re-deriving a broadcast dim
    is free next to re-scanning a fact table."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    victims = t["customer"].filter(
        F.col("c_custkey") % _GDPR_MOD == 0
    ).select("c_custkey")

    # sum() over an EMPTY table is NULL, not 0 -- coalesce every doomed
    # count so an empty cascade member reports 0 (found by the gdpr
    # property test's minimal falsifying example)
    cust = t["customer"].agg(
        F.count(F.lit(1)).cast("bigint").alias("c_total"),
        F.coalesce(
            F.sum((F.col("c_custkey") % _GDPR_MOD == 0).cast("int")), F.lit(0)
        ).cast("bigint").alias("c_doomed"),
    )
    o_flagged = t["orders"].join(
        F.broadcast(victims), F.col("o_custkey") == F.col("c_custkey"), "left"
    )
    ords = o_flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("o_total"),
        F.coalesce(F.sum(F.col("c_custkey").isNotNull().cast("int")), F.lit(0))
        .cast("bigint")
        .alias("o_doomed"),
    )
    li_flagged = t["lineitem"].join(
        o_flagged.select("o_orderkey", "c_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    lines = li_flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("l_total"),
        F.coalesce(F.sum(F.col("c_custkey").isNotNull().cast("int")), F.lit(0))
        .cast("bigint")
        .alias("l_doomed"),
    )
    wide = cust.crossJoin(F.broadcast(ords)).crossJoin(F.broadcast(lines))
    return (
        wide.selectExpr(
            "stack(3, 'customer', c_doomed, c_total,"
            "         'orders',   o_doomed, o_total,"
            "         'lineitem', l_doomed, l_total)"
            " AS (table_name, rows_to_delete, total_rows)"
        )
        .withColumn(
            "share",
            # NULL (not NaN/inf) when a cascade member is empty
            F.when(
                F.col("total_rows") > 0,
                F.round(
                    F.col("rows_to_delete").cast("double") / F.col("total_rows"),
                    4,
                ),
            ),
        )
        .orderBy("table_name")
    )


ORACLE_GDPR_AUDIT = f"""
WITH victims AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_GDPR_MOD} = 0
),
doomed_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM victims)
),
rows_ AS (
  SELECT 'customer' AS table_name,
         (SELECT CAST(count(*) AS BIGINT) FROM victims) AS rows_to_delete,
         (SELECT CAST(count(*) AS BIGINT) FROM customer) AS total_rows
  UNION ALL
  SELECT 'orders',
         (SELECT CAST(count(*) AS BIGINT) FROM doomed_orders),
         (SELECT CAST(count(*) AS BIGINT) FROM orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)),
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
)
SELECT table_name, rows_to_delete, total_rows,
       CASE WHEN total_rows > 0
            THEN round(CAST(rows_to_delete AS DOUBLE) / total_rows, 4)
       END AS share
FROM rows_
ORDER BY table_name
"""


# --- SCD Type-2 dimension build ----------------------------------------------


def q_scd2_priority_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build -- the warehouse
    operator that turns a change stream into versioned validity
    intervals: per customer, each ORDER PRIORITY change opens a new
    version [valid_from, valid_to) and closes the previous one;
    consecutive orders with the SAME priority collapse into one
    version (gaps-and-islands change detection, the defining SCD2
    behavior vs naive snapshotting).

    Columns: version ordinal, priority, valid_from/valid_to as
    epoch_us BIGINT (valid_to NULL on the current version),
    is_current flag.  Everything is integer/string -- exact.

    Scale shape: two window passes partitioned by customer (change
    flag via lag, then interval close via lead over the collapsed
    version frame) -- partition size is per-customer order history,
    never corpus-wide; the collapse groupBy is map-side combinable."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir, ["orders"])
    o = t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("__us"),
    )
    w = Window.partitionBy("o_custkey").orderBy("__us", "o_orderkey")
    flagged = o.withColumn(
        "__chg",
        F.when(
            F.lag("o_orderpriority").over(w).isNull()
            | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
            1,
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "__ver",
        F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = versioned.groupBy("o_custkey", "__ver").agg(
        # every order in an island shares one priority by construction;
        # MIN is a deterministic "any" on both engines
        F.min("o_orderpriority").alias("priority"),
        F.min("__us").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    vw = Window.partitionBy("o_custkey").orderBy("__ver")
    return (
        islands.select(
            F.col("o_custkey").alias("custkey"),
            F.col("__ver").cast("int").alias("version"),
            "priority",
            "valid_from",
            F.lead("valid_from", 1).over(vw).alias("valid_to"),
            "n_orders",
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int"),
        )
        .orderBy("custkey", "version")
    )


ORACLE_SCD2_PRIORITY = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         epoch_us(o_orderdate) AS us
  FROM orders
),
flagged AS (
  SELECT *,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                OR lag(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY us, o_orderkey)
),
versioned AS (
  SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY us, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS ver
  FROM flagged
),
islands AS (
  SELECT o_custkey, ver,
         min(o_orderpriority) AS priority,
         min(us) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM versioned GROUP BY o_custkey, ver
)
SELECT o_custkey AS custkey,
       CAST(ver AS INTEGER) AS version,
       priority,
       valid_from,
       lead(valid_from, 1) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to,
       n_orders,
       CAST(CASE WHEN lead(valid_from, 1) OVER (
              PARTITION BY o_custkey ORDER BY ver
            ) IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM islands
ORDER BY custkey, version
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("scd2_priority_dim", q_scd2_priority_dim,
                  ORACLE_SCD2_PRIORITY,
                  "SCD Type-2 dimension build (versioned validity intervals)"),
        QuerySpec("market_basket", q_market_basket,
                  ORACLE_MARKET_BASKET,
                  "association rules: top part pairs with confidence and lift"),
        QuerySpec("gdpr_erasure_audit", q_gdpr_erasure_audit,
                  ORACLE_GDPR_AUDIT,
                  "right-to-be-forgotten cascade scope per table"),
        QuerySpec("nation_volume", q_nation_volume, ORACLE_NATION_VOLUME,
                  "TPC-H Q7-shaped cross-nation revenue flow"),
        QuerySpec("returned_revenue", q_returned_revenue, ORACLE_RETURNED_REVENUE,
                  "TPC-H Q10-shaped returned-item top 20"),
        QuerySpec("order_count_distribution", q_order_count_distribution,
                  ORACLE_ORDER_COUNT_DIST,
                  "TPC-H Q13-shaped left-join count distribution"),
        QuerySpec("promo_revenue", q_promo_revenue, ORACLE_PROMO_REVENUE,
                  "TPC-H Q14-shaped conditional-aggregate ratio"),
        QuerySpec("small_quantity_revenue", q_small_quantity_revenue,
                  ORACLE_SMALL_QUANTITY,
                  "TPC-H Q17-shaped per-part-average correlated filter"),
        QuerySpec("disjunctive_revenue", q_disjunctive_revenue, ORACLE_DISJUNCTIVE,
                  "TPC-H Q19-shaped disjunctive residual predicate"),
        QuerySpec("idle_customers", q_idle_customers, ORACLE_IDLE_CUSTOMERS,
                  "TPC-H Q22-shaped anti join + scalar-average filter"),
        QuerySpec("fact_join_unbucketed", q_fact_join_unbucketed, ORACLE_FACT_JOIN,
                  "fact-fact join control: shuffles both sides"),
        QuerySpec("fact_join_bucketed", q_fact_join_bucketed, ORACLE_FACT_JOIN,
                  "zero-exchange bucketed fact-fact join (same oracle)"),
        QuerySpec("important_parts", q_important_parts, ORACLE_IMPORTANT_PARTS,
                  "TPC-H Q11-shaped HAVING > scalar-subquery threshold"),
        QuerySpec("priority_linestatus", q_priority_linestatus,
                  ORACLE_PRIORITY_LINESTATUS,
                  "TPC-H Q12-shaped two-path conditional counts"),
        QuerySpec("supplier_count_by_part", q_supplier_count_by_part,
                  ORACLE_SUPPLIER_COUNT,
                  "TPC-H Q16-shaped COUNT DISTINCT + NOT IN anti join"),
        QuerySpec("dominant_suppliers", q_dominant_suppliers,
                  ORACLE_DOMINANT_SUPPLIERS,
                  "TPC-H Q20-shaped aggregate-vs-aggregate semi join"),
        QuerySpec("sole_failed_supplier", q_sole_failed_supplier, ORACLE_SOLE_FAILED,
                  "TPC-H Q21-shaped double-EXISTS grouped rewrite"),
    ]
