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


def specs() -> list[QuerySpec]:
    return [
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
    ]
