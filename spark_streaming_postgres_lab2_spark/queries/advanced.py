"""Advanced OLAP inventory: the TPC-H shapes the reference's SQL
surface implies but never reaches (correlated-min Q2, market-share Q8,
profit Q9, top-supplier Q15, large-order Q18), a full window-function
suite, set operations, array higher-order functions, and the string
scalar surface.

These exercise Catalyst's subquery decorrelation, window exec, and
set-op planning -- all declarative, zero UDFs.  Money totals use the
fixed-point recipe from queries.core.money_sum so double accumulation
order can never flip a cent between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions.sessions import with_session_ids
from ..sources.tables import load_tables, register_views
from . import QuerySpec
from .core import money_sum, sql_money_sum

# ---------------------------------------------------------------------------
# TPC-H Q2 shape: correlated-min subquery (min-cost supplier per part).
# Catalyst decorrelates the scalar subquery into an aggregate + join;
# unit_price is a per-row double division (bit-identical across
# engines), and MIN over doubles is order-free, so the equality
# predicate is deterministic.
# ---------------------------------------------------------------------------

_MIN_COST_SQL = """
WITH up AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
)
SELECT p_brand,
       count(*) AS min_cost_lines,
       count(DISTINCT l_suppkey) AS distinct_suppliers
FROM up u
JOIN part ON p_partkey = u.l_partkey
WHERE unit_price = (
  SELECT min(u2.unit_price) FROM up u2 WHERE u2.l_partkey = u.l_partkey
)
GROUP BY p_brand
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated-min: lineitem rows priced at their
    part's minimum unit price, rolled up per brand."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(_MIN_COST_SQL)


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit per supplier-nation per order-year.
# ---------------------------------------------------------------------------


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup: revenue minus a retail-price cost
    proxy (the fixtures carry no partsupp/supplycost), for parts whose
    name contains 'red', grouped by supplier nation x order year.
    lineitem x orders shuffles on orderkey; supplier/nation/part are
    broadcast dimensions."""
    t = load_tables(spark, sf_dir, ["nation", "supplier", "part", "orders", "lineitem"])
    red_parts = t["part"].filter(F.col("p_name").contains("red"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            money_sum(amount).alias("profit"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


ORACLE_NATION_PROFIT = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_money_sum(
           "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1",
           "profit",
       )},
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share of one supplier nation per order year.
# Both numerator and denominator are exact fixed-point BIGINT sums, so
# the ratio is the division of two identical doubles on both engines.
# ---------------------------------------------------------------------------

_SHARE_NATION = "NATION_7"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_7 suppliers' slice of total
    discounted revenue per order year (conditional aggregation over one
    fact pass)."""
    t = load_tables(spark, sf_dir, ["nation", "supplier", "orders", "lineitem"])
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("n_name") == _SHARE_NATION, cents).otherwise(0)).alias(
                "__nation_cents"
            ),
            F.sum(cents).alias("__total_cents"),
        )
        .select(
            "o_year",
            (F.col("__nation_cents") / F.lit(10000.0)).alias("nation_volume"),
            (F.col("__total_cents") / F.lit(10000.0)).alias("total_volume"),
            F.round(
                F.col("__nation_cents").cast("double") / F.col("__total_cents"), 6
            ).alias("market_share"),
        )
    )


_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)"

ORACLE_MARKET_SHARE = f"""
WITH per_year AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(sum(CASE WHEN n_name = '{_SHARE_NATION}' THEN {_CENTS} ELSE 0 END) AS BIGINT) AS nation_cents,
         CAST(sum({_CENTS}) AS BIGINT) AS total_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1
)
SELECT o_year,
       nation_cents / 10000.0 AS nation_volume,
       total_cents / 10000.0 AS total_volume,
       round(CAST(nation_cents AS DOUBLE) / total_cents, 6) AS market_share
FROM per_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) by quarterly revenue (HAVING = MAX).
# ---------------------------------------------------------------------------


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) whose 1996-Q1 shipped revenue
    equals the global maximum (deterministic: revenue is an exact
    fixed-point sum, so the MAX-equality can't be split by rounding)."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    max_rev = rev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("__max_rev"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


ORACLE_TOP_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         {sql_money_sum("l_extendedprice * (1 - l_discount)", "total_rev")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-quantity orders (HAVING over an exact sum).
# l_quantity is integral-valued, so the double sum is exact and the
# threshold comparison is engine-independent.
# ---------------------------------------------------------------------------


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total line quantity exceeds 300,
    with customer attribution."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


ORACLE_BIG_ORDERS = """
SELECT c_name,
       o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Window-function suite: ranking, ntile, lead/lag, running totals,
# percent_rank -- one shuffle on o_custkey feeds every window.
# Monetary running totals accumulate BIGINT cents: window SUM order is
# frame-defined, but DuckDB's segment-tree windows re-associate double
# addition, so only integer accumulation is engine-stable.
# ---------------------------------------------------------------------------


def q_order_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: sequence number, quartile, previous
    and next order value, running spend, percentile position."""
    t = load_tables(spark, sf_dir, ["orders"])
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t["orders"].select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("order_seq"),
        F.ntile(4).over(w).alias("spend_quartile"),
        F.lag(cents).over(w).alias("prev_cents"),
        F.lead(cents).over(w).alias("next_cents"),
        F.sum(cents).over(running).alias("running_cents"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


ORACLE_WINDOW_SUITE = """
SELECT o_orderkey,
       o_custkey,
       CAST(row_number() OVER w AS INTEGER) AS order_seq,
       CAST(ntile(4) OVER w AS INTEGER) AS spend_quartile,
       lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS prev_cents,
       lead(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w AS next_cents,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT with distinct semantics.
# ---------------------------------------------------------------------------


def q_user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience segmentation via set algebra: purchasers vs viewers
    (INTERSECT and both EXCEPT directions, distinct semantics)."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("user_id").isNotNull())
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")

    def count_as(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).withColumn(
            "segment", F.lit(label)
        )

    return (
        count_as(purch.intersect(views), "purchase_and_view")
        .unionByName(count_as(views.subtract(purch), "view_only"))
        .unionByName(count_as(purch.subtract(views), "purchase_only"))
        .select("segment", "n_users")
    )


def q_user_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set algebra (INTERSECT ALL / EXCEPT ALL): event
    multiplicity survives, so the counts weigh repeat behaviour."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("user_id").isNotNull())
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")

    def count_as(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_rows")).withColumn(
            "segment", F.lit(label)
        )

    return (
        count_as(purch.intersectAll(views), "purchase_intersect_all_view")
        .unionByName(count_as(views.exceptAll(purch), "view_except_all_purchase"))
        .select("segment", "n_rows")
    )


ORACLE_SET_OPS_ALL = """
WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
     v AS (SELECT user_id FROM events WHERE event_type = 'view' AND user_id IS NOT NULL)
SELECT 'purchase_intersect_all_view' AS segment, count(*) AS n_rows
FROM (SELECT * FROM p INTERSECT ALL SELECT * FROM v)
UNION ALL
SELECT 'view_except_all_purchase', count(*)
FROM (SELECT * FROM v EXCEPT ALL SELECT * FROM p)
"""


ORACLE_SET_OPS = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
     v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view' AND user_id IS NOT NULL)
SELECT 'purchase_and_view' AS segment, count(*) AS n_users FROM (SELECT * FROM p INTERSECT SELECT * FROM v)
UNION ALL
SELECT 'view_only', count(*) FROM (SELECT * FROM v EXCEPT SELECT * FROM p)
UNION ALL
SELECT 'purchase_only', count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM v)
"""


# ---------------------------------------------------------------------------
# Array higher-order functions over document tokens (aggregate /
# exists / filter) -- all codegen'd Column expressions, no UDFs.
# ---------------------------------------------------------------------------


def q_doc_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-shape stats via array HOFs: mean token length
    (aggregate), documents containing any >12-char token (exists),
    average count of >8-char tokens (filter + size)."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = TX.tokens("text")
    tok_len_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_tok_len = tok_len_sum.cast("double") / F.size(toks)
    has_long = F.exists(toks, lambda x: F.length(x) > 12)
    n_long8 = F.size(F.filter(toks, lambda x: F.length(x) > 8))
    return (
        t["documents"]
        .select(
            "source",
            mean_tok_len.alias("__mean_tok_len"),
            has_long.alias("__has_long"),
            n_long8.alias("__n_long8"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__mean_tok_len"), 4).alias("avg_token_len"),
            F.count(F.when(F.col("__has_long"), 1)).alias("docs_with_long_token"),
            F.round(F.avg("__n_long8"), 4).alias("avg_long8_tokens"),
        )
    )


ORACLE_DOC_HOF = """
WITH feats AS (
  SELECT source,
         CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_tok_len,
         len(list_filter(string_split(text, ' '), x -> length(x) > 12)) > 0 AS has_long,
         len(list_filter(string_split(text, ' '), x -> length(x) > 8)) AS n_long8
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(avg(mean_tok_len), 4) AS avg_token_len,
       count(CASE WHEN has_long THEN 1 END) AS docs_with_long_token,
       round(avg(n_long8), 4) AS avg_long8_tokens
FROM feats
GROUP BY source
"""


# ---------------------------------------------------------------------------
# String scalar surface: case, substring, padding, replace, LIKE.
# ---------------------------------------------------------------------------


def q_part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function suite over part: prefix dedup, length stats,
    padded keys, pattern counts, normalized concatenation."""
    t = load_tables(spark, sf_dir, ["part"])
    return (
        t["part"]
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct(F.upper(F.substring("p_type", 1, 8))).alias(
                "distinct_type_prefixes"
            ),
            F.max(F.length("p_name")).alias("max_name_len"),
            F.min(F.lpad(F.col("p_size").cast("string"), 3, "0")).alias(
                "min_size_padded"
            ),
            F.count(F.when(F.col("p_name").like("%red%"), 1)).alias("red_parts"),
            F.max(F.concat_ws("#", F.col("p_brand"), F.replace(F.col("p_name"), F.lit(" "), F.lit("_")))).alias(
                "max_brand_key"
            ),
        )
    )


ORACLE_STRING_FUNCS = """
SELECT p_brand,
       count(*) AS n_parts,
       count(DISTINCT upper(substring(p_type, 1, 8))) AS distinct_type_prefixes,
       CAST(max(length(p_name)) AS INTEGER) AS max_name_len,
       min(lpad(CAST(p_size AS VARCHAR), 3, '0')) AS min_size_padded,
       count(CASE WHEN p_name LIKE '%red%' THEN 1 END) AS red_parts,
       max(concat_ws('#', p_brand, replace(p_name, ' ', '_'))) AS max_brand_key
FROM part
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Time-series gap-fill: generate the full hour spine (sequence +
# explode), left-join the sparse aggregate, coalesce the holes.
# ---------------------------------------------------------------------------


def q_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly error-event series: every hour between the
    first and last error appears exactly once, empty hours as 0."""
    t = load_tables(spark, sf_dir, ["events"])
    errors = t["events"].filter(F.col("event_type") == "error")
    bounds = errors.agg(
        F.date_trunc("hour", F.min("ts")).alias("__h0"),
        F.date_trunc("hour", F.max("ts")).alias("__h1"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("__h0"), F.col("__h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("__hour")
    )
    hourly = errors.groupBy(F.date_trunc("hour", F.col("ts")).alias("__hour")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum("value"), 2).alias("__v"),
    )
    return spine.join(hourly, "__hour", "left").select(
        F.unix_micros("__hour").alias("hour_us"),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_errors"),
        F.coalesce(F.col("__v"), F.lit(0.0)).alias("total_value"),
    )


ORACLE_GAPFILL = """
WITH b AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
  FROM events WHERE event_type = 'error'
),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
hourly AS (
  SELECT date_trunc('hour', ts) AS hour, count(*) AS n, round(sum(value), 2) AS v
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT epoch_us(s.hour) AS hour_us,
       coalesce(n, 0) AS n_errors,
       coalesce(v, 0.0) AS total_value
FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
"""


# ---------------------------------------------------------------------------
# Rolling range-interval window: 7-day trailing revenue over the daily
# aggregate.  The window runs over the (small) per-day rollup, not the
# fact table; cents accumulate as BIGINT because DuckDB's segment-tree
# window re-associates double addition.
# ---------------------------------------------------------------------------


def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a 7-day trailing window (RANGE over a
    day index, so missing days genuinely shrink the window)."""
    t = load_tables(spark, sf_dir, ["orders"])
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("__day"))
        .agg(F.sum(cents).alias("__day_cents"))
        .withColumn(
            "__day_idx",
            F.datediff(F.col("__day").cast("date"), F.lit("1995-01-01").cast("date")),
        )
    )
    w = Window.orderBy("__day_idx").rangeBetween(-6, 0)
    return daily.select(
        F.unix_micros(F.col("__day").cast("timestamp")).alias("day_us"),
        (F.col("__day_cents") / F.lit(100.0)).alias("day_revenue"),
        (F.sum("__day_cents").over(w) / F.lit(100.0)).alias("rolling_7d_revenue"),
    )


ORACLE_ROLLING_7D = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
  FROM orders GROUP BY 1
)
SELECT epoch_us(day) AS day_us,
       day_cents / 100.0 AS day_revenue,
       CAST(sum(day_cents) OVER (
         ORDER BY date_diff('day', DATE '1995-01-01', CAST(day AS DATE))
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS rolling_7d_revenue
FROM daily
"""


# ---------------------------------------------------------------------------
# Distributed arg-max: latest event per user via MAX over a struct.
# Partial-aggregates map-side (one row per user per partition enters
# the shuffle) -- strictly cheaper than the row_number window, which
# shuffles every event.  The oracle uses the window formulation; they
# agree because (ts, event_id) totally orders each user's events.
# ---------------------------------------------------------------------------


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent event per user (struct-max arg-max pattern)."""
    t = load_tables(spark, sf_dir, ["events"])
    last = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value"))
    ).alias("__last")
    return (
        t["events"]
        .groupBy("user_id")
        .agg(last)
        .select(
            "user_id",
            F.unix_micros(F.col("__last.ts")).alias("last_ts_us"),
            F.col("__last.event_id").alias("last_event_id"),
            F.col("__last.event_type").alias("last_event_type"),
            F.round(F.col("__last.value"), 2).alias("last_value"),
        )
    )


ORACLE_LATEST_EVENT = """
SELECT user_id,
       epoch_us(ts) AS last_ts_us,
       event_id AS last_event_id,
       event_type AS last_event_type,
       round(value, 2) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Regex scalar surface: extraction groups, match counting, global
# replacement.  NOTE: Spark regexp_replace is global by default;
# DuckDB needs the explicit 'g' flag.
# ---------------------------------------------------------------------------


def q_doc_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level regex features per document: first s-word (capture
    group), 'sc*' match count, length after global replacement."""
    t = load_tables(spark, sf_dir, ["documents"])
    return t["documents"].select(
        "doc_id",
        F.regexp_extract("text", r"\b(s[a-z]+)", 1).alias("first_s_word"),
        F.regexp_count("text", F.lit("sc[a-z]*")).cast("int").alias("n_sc_words"),
        F.length(F.regexp_replace("text", "table", "TBL")).alias("replaced_len"),
    )


ORACLE_REGEX_EXTRACT = r"""
SELECT doc_id,
       regexp_extract(text, '\b(s[a-z]+)', 1) AS first_s_word,
       CAST(len(regexp_extract_all(text, 'sc[a-z]*')) AS INTEGER) AS n_sc_words,
       CAST(length(regexp_replace(text, 'table', 'TBL', 'g')) AS INTEGER) AS replaced_len
FROM documents
"""


# ---------------------------------------------------------------------------
# NOT IN subquery: Catalyst plans this as a null-aware anti join
# (distinct from the EXISTS/left-anti path of customers_without_orders
# -- NOT IN must reject everything when the subquery yields a NULL).
# ---------------------------------------------------------------------------

_NOT_IN_SQL = """
SELECT p_brand, count(*) AS never_shipped_parts
FROM part
WHERE p_partkey NOT IN (
  SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01'
)
GROUP BY p_brand
"""


def q_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped NOT IN: parts with no shipments since 2000,
    per brand (null-aware anti join)."""
    register_views(spark, sf_dir, ["part", "lineitem"])
    return spark.sql(_NOT_IN_SQL)


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: per outer row, a dependent table
# expression (top-2 spenders per nation).  Catalyst decorrelates the
# LATERAL into a ranked window join -- the remaining subquery shape
# not covered by the correlated-scalar / EXISTS / NOT IN queries.
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT n_name, t.c_custkey, t.total_spend
FROM nation, LATERAL (
  SELECT c.c_custkey,
         CAST(CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_spend
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey = n_nationkey
  GROUP BY c.c_custkey
  ORDER BY total_spend DESC, c.c_custkey
  LIMIT 2
) t
"""


def q_top_spenders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 spenders per nation via a LATERAL correlated subquery."""
    register_views(spark, sf_dir, ["nation", "customer", "orders"])
    return spark.sql(_LATERAL_SQL)


# --- session_window batch twin ----------------------------------------------


def q_user_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch flavor of the session_window operator (10-minute gap):
    per-user sessions with start/end/count/value.  The oracle is the
    classic gaps-and-islands SQL: lag -> new-session flag on gap
    STRICTLY GREATER than 10 minutes -> running-sum session id ->
    group.  The strict inequality is Spark's measured boundary rule:
    session_window merges while next.start <= current session end
    (= last + gap), so an EXACTLY-gap-sized step still merges -- the
    r13 randomized mirror caught the oracle's original >= here; the
    fixture's microsecond timestamps never produce an exact
    600.000000 s step, which is why nine driver-green rounds never
    sampled the boundary.  Pins the streaming operator's semantics
    against plain ANSI SQL."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("user_id", F.session_window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )


ORACLE_SESSION_WINDOW = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL 10 MINUTE) AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s
GROUP BY user_id, sid
"""


# --- first/last/nth_value window suite ---------------------------------------


def q_order_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a full unbounded frame
    per customer (order history summary in one window pass)."""
    t = load_tables(spark, sf_dir, ["orders"])
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            "o_custkey",
            F.first("o_totalprice").over(full).alias("first_price"),
            F.last("o_totalprice").over(full).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
            F.count(F.lit(1)).over(full).alias("n_orders"),
            F.row_number().over(rn).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


ORACLE_FIRST_LAST_NTH = """
WITH w AS (
  SELECT o_custkey,
         first_value(o_totalprice) OVER win AS first_price,
         last_value(o_totalprice) OVER win AS last_price,
         nth_value(o_totalprice, 2) OVER win AS second_price,
         count(*) OVER win AS n_orders,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
  WINDOW win AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey, first_price, last_price, second_price, n_orders
FROM w WHERE rn = 1
"""


# --- map-type functions -------------------------------------------------------

_MAP_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def q_user_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function surface: create_map -> map_filter ->
    map_keys / map_values / transform_values / aggregate over per-user
    event-type counts.  The oracle recomputes the same scalars from
    conditional counts -- map semantics pinned against plain SQL."""
    t = load_tables(spark, sf_dir, ["events"])
    counts = t["events"].groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == et, 1)).alias(f"n_{et}")
            for et in _MAP_EVENT_TYPES
        ]
    )
    kv_pairs: list = []
    for et in _MAP_EVENT_TYPES:
        kv_pairs += [F.lit(et), F.col(f"n_{et}")]
    active = F.map_filter(F.create_map(*kv_pairs), lambda _k, v: v > 0)
    return counts.select(
        "user_id",
        F.array_join(F.array_sort(F.map_keys(active)), ",").alias("active_types"),
        F.size(F.map_keys(active)).cast("int").alias("n_active_types"),
        F.aggregate(
            F.map_values(active), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_events"),
        F.array_max(
            F.map_values(F.transform_values(active, lambda _k, v: v * v))
        ).alias("max_sq_count"),
    )


def _map_oracle() -> str:
    conds = ",\n         ".join(
        f"count(CASE WHEN event_type = '{et}' THEN 1 END) AS n_{et}"
        for et in _MAP_EVENT_TYPES
    )
    pairs = ", ".join(
        f"struct_pack(k := '{et}', v := n_{et})" for et in _MAP_EVENT_TYPES
    )
    squares = ", ".join(f"n_{et} * n_{et}" for et in _MAP_EVENT_TYPES)
    total = " + ".join(f"n_{et}" for et in _MAP_EVENT_TYPES)
    return f"""
WITH c AS (
  SELECT user_id,
         {conds}
  FROM events GROUP BY user_id
)
SELECT user_id,
       array_to_string(list_sort(list_transform(
         list_filter([{pairs}], s -> s.v > 0), s -> s.k)), ',') AS active_types,
       CAST(len(list_filter([{pairs}], s -> s.v > 0)) AS INTEGER) AS n_active_types,
       CAST({total} AS BIGINT) AS total_events,
       CAST(greatest({squares}) AS BIGINT) AS max_sq_count
FROM c
"""


# --- explicit GROUPING SETS + grouping_id ------------------------------------


def q_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE desugar to)
    with grouping_id disambiguating subtotal rows from genuine NULL
    group values."""
    register_views(spark, sf_dir, ["events"])
    return spark.sql(
        """
        SELECT event_type,
               CAST(year(ts) AS INT) AS yr,
               CAST(grouping_id(event_type, CAST(year(ts) AS INT)) AS INT) AS gid,
               count(*) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY GROUPING SETS ((event_type, CAST(year(ts) AS INT)),
                                (event_type), (CAST(year(ts) AS INT)), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT event_type,
       CAST(year(ts) AS INTEGER) AS yr,
       CAST(GROUPING_ID(event_type, CAST(year(ts) AS INTEGER)) AS INTEGER) AS gid,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(year(ts) AS INTEGER)),
                        (event_type), (CAST(year(ts) AS INTEGER)), ())
"""


# --- per-row array set operations ---------------------------------------------

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]


def q_doc_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation surface (array_intersect / array_except /
    array_union against a literal vocabulary) -- per-row, codegen'd, no
    shuffle."""
    t = load_tables(spark, sf_dir, ["documents"])
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    toks = F.array_distinct(TX.tokens("text"))
    return t["documents"].select(
        "doc_id",
        F.size(F.array_intersect(toks, stop)).cast("int").alias("n_stop_hits"),
        F.size(F.array_except(toks, stop)).cast("int").alias("n_content_tokens"),
        F.size(F.array_union(toks, stop)).cast("int").alias("n_union"),
    )


def _array_ops_oracle() -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
    return f"""
SELECT doc_id,
       CAST(len(list_intersect(list_distinct(string_split(text, ' ')), {lit})) AS INTEGER)
         AS n_stop_hits,
       CAST(len(list_filter(list_distinct(string_split(text, ' ')),
                            t -> NOT list_contains({lit}, t))) AS INTEGER)
         AS n_content_tokens,
       CAST(len(list_distinct(list_concat(list_distinct(string_split(text, ' ')), {lit}))) AS INTEGER)
         AS n_union
FROM documents
"""


# --- skew-mitigation techniques, correctness-pinned --------------------------


def q_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted COUNT(DISTINCT): stage 1 dedups (key, salt,
    value) with map-side partials, stage 2 merges -- the hot-key shape
    for COUNT(DISTINCT) at scale.  Salt partitions of a hash-salted
    value space are disjoint, so the merged sum is EXACTLY the distinct
    count; the oracle is the plain COUNT(DISTINCT)."""
    from ..operators.skew import salted_distinct_count

    t = load_tables(spark, sf_dir, ["events"])
    return salted_distinct_count(
        t["events"], "event_type", "user_id", salt_n=8
    ).withColumnRenamed("distinct_user_id", "distinct_users")


ORACLE_SALTED_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
"""


def q_salted_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim equi-join (supplier-nation revenue): the small
    side explodes salt_n-fold, the big side salts deterministically by
    a per-row unique column, and the join key becomes (key, salt) --
    identical result set to the plain join (the oracle), with hot keys
    spread over salt_n reducers."""
    from ..operators.skew import salted_join

    t = load_tables(spark, sf_dir, ["lineitem", "supplier", "nation"])
    supp_nation = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("l_suppkey"), "n_name")
    )
    joined = salted_join(
        t["lineitem"].select("l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"),
        supp_nation,
        key="l_suppkey",
        salt_n=8,
        big_unique_col="l_orderkey",
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


ORACLE_SALTED_JOIN = f"""
SELECT n_name AS nation,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS line_count
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# Interval-overlap join (range join).  Spark has no native range-join
# optimization (Databricks' range-join hint is proprietary): a naive
# `a.s <= b.e AND b.s <= a.e` theta join plans as BroadcastNestedLoop
# -- O(n^2) comparisons even when the time axis is sparse.  The scale
# pattern below turns it into an EQUI-join: explode each interval to
# the coarse time grains it covers, hash-join on the grain, then
# verify the exact overlap predicate on the survivors.  Grain choice
# trades explode factor against per-grain candidate density; pick it
# near the median interval length (sessions here are <= ~67 min, so a
# 1-hour grain gives <= 2 grains per session).
# ---------------------------------------------------------------------------

_GRAIN_US = 3_600_000_000  # 1 hour (fallback when auto-tune is off)


def _tuned_grain_us(iv: DataFrame) -> int:
    """Pick the range-join grain from the data: ~2x the median session
    length, clamped to [15 min, 1 day].  Grain choice only shapes the
    CANDIDATE set (exact verify filters it), so output is invariant --
    this trades explode factor against per-grain density.  Too-small
    grains explode long intervals into many rows; too-large grains
    pack unrelated intervals into one bucket and the self-join
    re-quadratizes.  One tiny agg job (median over the session table,
    already a fraction of the events count)."""
    row = iv.select(
        F.percentile_approx(F.col("e") - F.col("s"), 0.5).alias("med")
    ).first()
    med = int(row["med"] or 0)
    # med == 0 means the corpus is dominated by POINT sessions (single
    # event): the explode factor is already ~1 grain per session at ANY
    # grain, so the only cost that moves is per-bucket candidate
    # density, which scales linearly with the grain.  The old `or
    # _GRAIN_US` fallback jumped to the 1-hour ceiling here -- the
    # densest legal choice -- packing ~4x more unrelated sessions per
    # bucket than the 15-min clamp floor the tune already trusts (r16,
    # guide §2.5: candidate density IS the skew knob of this join).
    # Output is grain-invariant either way (exact verify + first-grain
    # emission); oracle parity re-proven at sf0.001/0.01/0.1.
    return max(900_000_000, min(86_400_000_000, 2 * med))


def _session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, sid, s, e) session intervals -- the 30-min-gap islands
    of q_sessionization as [min ts, max ts] epoch-micro ranges, shared
    by the range-join and sweep-line queries.  localCheckpoint: both
    consumers reference the frame from more than one side of a
    union/join, and without the cut the two-window sessionization
    pipeline re-executes once per reference."""
    t = load_tables(spark, sf_dir, ["events"])
    sess = with_session_ids(
        t["events"].select("user_id", "ts", "event_id")
    ).select("user_id", "ts", F.col("__sid").alias("sid"))
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("s"),
            F.max(F.unix_micros("ts")).alias("e"),
        )
        .localCheckpoint(eager=False)
    )


# the same pipeline as DuckDB CTEs, shared by both oracles below
_SQL_SESSION_IV = """flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM flagged
),
iv AS (
  SELECT user_id, sid, epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
  FROM sess GROUP BY user_id, sid
)"""


def q_session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user session concurrency: which pairs of users were active
    at the same time, how often, and for how long in total.  Sessions
    are the same 30-min-gap islands as q_sessionization; a session
    pair overlaps when s1 <= e2 AND s2 <= e1 (point-touch counts,
    overlap_us 0).  Top-100 pairs by total overlap, BIGINT-exact so
    ordering can never flip on float noise.

    Grains use integer division (`DIV`), not floor(double /): epoch
    micros ~1.7e15 survive a double round-trip today but the habit
    does not scale past 2^53.  The grain is auto-tuned from the
    measured median session length (_tuned_grain_us) -- output is
    grain-invariant, only candidate density depends on it."""
    iv = _session_intervals(spark, sf_dir)
    grain = _tuned_grain_us(iv)
    grains = iv.select(
        "user_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {grain}"), F.expr(f"e DIV {grain}")
            )
        ).alias("g"),
    )
    # sid is not needed past the explode: first-grain emission (below)
    # already counts each session pair exactly once, so the join sides
    # carry only what the overlap math reads (guide §2.3, project early)
    a = grains.select(
        F.col("user_id").alias("user_1"),
        F.col("s").alias("s1"), F.col("e").alias("e1"), "g",
    )
    b = grains.select(
        F.col("user_id").alias("user_2"),
        F.col("s").alias("s2"), F.col("e").alias("e2"), "g",
    )
    pairs = (
        a.join(b, "g")
        .filter(F.col("user_1") < F.col("user_2"))
        # a session pair sharing a grain need not overlap; verify exactly
        .filter((F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
        # long sessions span several grains, so an overlapping pair is a
        # candidate in EVERY grain both sessions cover.  Count it exactly
        # once WITHOUT a corpus-wide dropDuplicates exchange (r16, guide
        # §2.4): emit only in the FIRST shared grain, the one containing
        # greatest(s1, s2).  That grain provably carries the pair --
        # overlap means s1 <= greatest(s1,s2) <= min(e1,e2) <= e1 (and
        # symmetrically for side 2), so greatest(s1,s2) lies inside BOTH
        # intervals and its grain is in both explode ranges -- and every
        # other shared grain fails the equality, so the multiset of
        # surviving pairs is identical to the dropDuplicates form (all
        # duplicate copies carried the same s/e payload).
        .filter(
            F.expr(f"greatest(s1, s2) DIV {grain}") == F.col("g")
        )
        .withColumn(
            "ov",
            F.least(F.col("e1"), F.col("e2")) - F.greatest(F.col("s1"), F.col("s2")),
        )
    )
    return (
        pairs.groupBy("user_1", "user_2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_overlaps"),
            F.sum("ov").cast("bigint").alias("overlap_us"),
        )
        .orderBy(F.col("overlap_us").desc(), "user_1", "user_2")
        .limit(100)
    )


ORACLE_SESSION_OVERLAP = f"""
WITH {_SQL_SESSION_IV},
pairs AS (
  SELECT a.user_id AS user_1, b.user_id AS user_2,
         least(a.e, b.e) - greatest(a.s, b.s) AS ov
  FROM iv a JOIN iv b
    ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
)
SELECT user_1, user_2,
       CAST(count(*) AS BIGINT) AS n_overlaps,
       CAST(sum(ov) AS BIGINT) AS overlap_us
FROM pairs
GROUP BY user_1, user_2
ORDER BY overlap_us DESC, user_1, user_2
LIMIT 100
"""


def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day -- the sweep-line companion to
    q_session_overlap_pairs.  Each session interval becomes a +1 point
    at its start and a -1 at its end (starts ordered before ends at
    equal timestamps: closed-interval semantics, and the tie order
    pins the peak deterministically); the running sum of deltas is the
    live-session count and its per-day max is the answer.

    A single global running sum would serialize onto one partition at
    scale, so the sweep is SEGMENTED: (1) per-day delta totals ->
    (2) a cumulative sum over the tiny day spine gives each day's
    carry-in concurrency -> (3) the within-day running sum (window
    PARTITIONED by day, parallel across days) + carry-in.  Only the
    ~O(days) spine ever passes through a single partition."""
    iv = _session_intervals(spark, sf_dir)
    points = iv.select(
        F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionAll(iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta")))
    points = points.withColumn(
        "day", F.to_date(F.timestamp_micros(F.col("t")))
    )
    carry = (
        points.groupBy("day")
        .agg(F.sum("delta").alias("__day_delta"))
        .withColumn(
            "carry_in",
            F.coalesce(
                F.sum("__day_delta").over(
                    Window.orderBy("day").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("day", "carry_in")
    )
    wday = Window.partitionBy("day").orderBy(
        F.col("t"), F.col("delta").desc()
    )
    running = points.withColumn("run", F.sum("delta").over(wday))
    return (
        running.groupBy("day")
        .agg(F.max("run").alias("__day_max"))
        .join(F.broadcast(carry), "day")
        .select(
            "day",
            (F.col("__day_max") + F.col("carry_in"))
            .cast("bigint")
            .alias("max_concurrent"),
        )
        .orderBy("day")
    )


ORACLE_SESSION_CONCURRENCY = f"""
WITH {_SQL_SESSION_IV},
points AS (
  SELECT s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT e AS t, -1 AS delta FROM iv
),
running AS (
  SELECT CAST(make_timestamp(t) AS DATE) AS day,
         sum(delta) OVER (ORDER BY t, delta DESC) AS run
  FROM points
)
SELECT day, CAST(max(run) AS BIGINT) AS max_concurrent
FROM running
GROUP BY day
ORDER BY day
"""


_FUNNEL_WINDOW_S = 86_400  # each step must land within 24 h of the previous


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict ORDERED, WINDOWED funnel analysis (signup -> view ->
    purchase, the fixture's event vocabulary): a user reaches step N
    only via an event strictly after their step-(N-1) timestamp AND
    within the 24 h conversion window -- sequence matching, not mere
    presence (contrast user_sessions' conditional counts and
    purchase_attribution's as-of lookback; without the window every
    step saturates on this fixture, so the window is what makes the
    funnel discriminate: 150 -> 39 -> 15 users at sf0.01).  Emits one
    summary row: per-step user counts and step-to-step conversion
    rates.

    Scale shape: each step is a filtered map-side-combinable MIN per
    user; the step joins are keyed on user_id, so after the first
    shuffle every stage is co-partitioned (Exchange reuse), and each
    step's frame SHRINKS (funnels only narrow).  The final assembly
    cross-joins four 1-row aggregates -- broadcast scalar anchors, the
    same pattern as table_counts_union.  Timestamps compare at
    microsecond precision on both engines (Spark loads micros; the
    oracle compares epoch_us), so strictly-after ties cannot diverge."""
    t = load_tables(spark, sf_dir, ["events"])
    win = F.expr(f"INTERVAL {_FUNNEL_WINDOW_S} SECOND")
    ev = t["events"].select("user_id", "event_type", "ts").where(
        F.col("user_id").isNotNull()
    )
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_any = ev.agg(F.countDistinct("user_id").cast("bigint").alias("users_any"))
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("signed_up"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("viewed_within_window"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("purchased_within_window"))
    return (
        n_any.crossJoin(n1)
        .crossJoin(n2)
        .crossJoin(n3)
        .select(
            "users_any",
            "signed_up",
            "viewed_within_window",
            "purchased_within_window",
            F.round(
                F.col("viewed_within_window").cast("double")
                / F.nullif(F.col("signed_up"), F.lit(0)),
                4,
            ).alias("signup_to_view_rate"),
            F.round(
                F.col("purchased_within_window").cast("double")
                / F.nullif(F.col("viewed_within_window"), F.lit(0)),
                4,
            ).alias("view_to_purchase_rate"),
        )
    )


_FUNNEL_WINDOW_US = _FUNNEL_WINDOW_S * 1_000_000

ORACLE_FUNNEL = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE user_id IS NOT NULL
),
s1 AS (
  SELECT user_id, min(ts_us) AS t1 FROM ev
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view'
    AND e.ts_us > s1.t1 AND e.ts_us <= s1.t1 + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM ev e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND e.ts_us > s2.t2 AND e.ts_us <= s2.t2 + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev) AS users_any,
       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS signed_up,
       (SELECT CAST(count(*) AS BIGINT) FROM s2) AS viewed_within_window,
       (SELECT CAST(count(*) AS BIGINT) FROM s3) AS purchased_within_window,
       round(CAST((SELECT count(*) FROM s2) AS DOUBLE)
             / nullif((SELECT count(*) FROM s1), 0), 4) AS signup_to_view_rate,
       round(CAST((SELECT count(*) FROM s3) AS DOUBLE)
             / nullif((SELECT count(*) FROM s2), 0), 4) AS view_to_purchase_rate
"""


_DAY_US = 86_400_000_000


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis -- the other classic product-analytics
    table (funnel_conversion's sibling): users are cohorted by their
    FIRST-seen day and counted again in each later week they return,
    yielding the (cohort_day x offset_week) retention matrix with
    per-cell retention rates.  All calendar arithmetic happens on
    integer day numbers (epoch-microseconds DIV 86.4e9), so the two
    engines cannot disagree on timezone or date-boundary semantics --
    the same epoch_us trick as funnel_conversion.

    Scale shape: one (user_id, day_num) DISTINCT projection of the
    event stream, a per-user MIN for the cohort day, one join back
    keyed on user_id (co-partitioned with the distinct's exchange),
    and a map-side-combinable count per (cohort_day, offset_week) --
    cells are bounded by days x weeks, never by event volume."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            F.expr(f"CAST(unix_micros(ts) DIV {_DAY_US} AS BIGINT)").alias(
                "day_num"
            ),
        )
        .distinct()
    )
    first = ev.groupBy("user_id").agg(F.min("day_num").alias("cohort_day"))
    retained = (
        ev.join(first, "user_id")
        .withColumn(
            "offset_week",
            # pure integer arithmetic, mirroring the oracle's '// 7'
            # (day_num >= cohort_day by construction, so DIV == floor)
            F.expr("(day_num - cohort_day) DIV 7"),
        )
        .groupBy("cohort_day", "offset_week")
        .agg(F.count_distinct("user_id").cast("bigint").alias("retained_users"))
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    return (
        retained.join(sizes, "cohort_day")
        .select(
            "cohort_day",
            "offset_week",
            "cohort_size",
            "retained_users",
            F.round(
                F.col("retained_users").cast("double") / F.col("cohort_size"), 4
            ).alias("retention_rate"),
        )
        .orderBy("cohort_day", "offset_week")
    )


ORACLE_COHORT_RETENTION = f"""
WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day_num
  FROM events WHERE user_id IS NOT NULL
),
first AS (
  SELECT user_id, min(day_num) AS cohort_day FROM ev GROUP BY user_id
),
retained AS (
  SELECT f.cohort_day,
         CAST((e.day_num - f.cohort_day) // 7 AS BIGINT) AS offset_week,
         CAST(count(DISTINCT e.user_id) AS BIGINT) AS retained_users
  FROM ev e JOIN first f USING (user_id)
  GROUP BY 1, 2
),
sizes AS (
  SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_day
)
SELECT r.cohort_day, r.offset_week, s.cohort_size, r.retained_users,
       round(CAST(r.retained_users AS DOUBLE) / s.cohort_size, 4) AS retention_rate
FROM retained r JOIN sizes s USING (cohort_day)
ORDER BY cohort_day, offset_week
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (the Markov-chain / Sankey
    source): for each user's event stream in (ts, event_id) order,
    count consecutive (from_type -> to_type) pairs and the per-from
    transition probability.  The tiebreak matters twice: event_id
    totals the order under equal timestamps, and the oracle orders by
    epoch_us so the parquet nano-vs-micro precision gap cannot reorder
    two same-microsecond events differently across engines.

    Scale shape: ONE window pass partitioned by user_id (per-user
    state, embarrassingly parallel) emitting slim (from, to) pairs,
    then a map-side-combinable count over the |types|^2-bounded matrix;
    the probability join touches |types| rows.  Event volume crosses
    the wire exactly once, keyed on user_id."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].where(F.col("user_id").isNotNull()).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .where(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").cast("bigint").alias("__from_total")
    )
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double") / F.col("__from_total"), 4
            ).alias("transition_prob"),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_EVENT_TRANSITIONS = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events WHERE user_id IS NOT NULL
),
pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts_us, event_id
         ) AS to_type
  FROM ev
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
totals AS (
  SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS from_total
  FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n_transitions,
       round(CAST(c.n_transitions AS DOUBLE) / t.from_total, 4) AS transition_prob
FROM counts c JOIN totals t USING (from_type)
ORDER BY from_type, to_type
"""


# --- gap-filled time spine (shared by the two time-series detectors) ----------


def _gapfilled_counts(spark: SparkSession, sf_dir: str, bucket_us: int, col: str):
    """(event_type, <col>, cnt) over a DENSE per-type time spine:
    events collapse to per-bucket counts (one map-side-combinable
    groupBy), the spine spans [min, max] bucket ids (clock-sized, not
    event-volume-sized), and missing buckets coalesce to 0.  NULL
    event_type rows are dropped up front -- Spark orders NULLS FIRST
    and DuckDB NULLS LAST, so a NULL type row in the spine would break
    row-order parity even with identical cells.  Shared by
    q_zscore_anomaly_hours (hour grain) and q_forecast_baseline (day
    grain) so the spine discipline cannot drift between them."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("event_type").isNotNull()).select(
        "event_type",
        F.expr(f"unix_micros(ts) div {bucket_us}").alias(col),
    )
    counts = ev.groupBy("event_type", col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    bounds = ev.agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
    spine = bounds.select(
        F.explode(F.sequence("__mn", "__mx")).alias(col)
    ).crossJoin(ev.select("event_type").distinct())
    return spine.join(counts, ["event_type", col], "left").select(
        "event_type", col, F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt")
    )


def _sql_gapfilled_counts(bucket_us: int, col: str) -> str:
    """The identical spine as DuckDB CTEs (ev/counts/bounds/spine/
    dense), ending with dense(event_type, <col>, cnt)."""
    return f"""ev AS (
  SELECT event_type, epoch_us(ts) // {bucket_us} AS {col}
  FROM events WHERE event_type IS NOT NULL
),
counts AS (
  SELECT event_type, {col}, CAST(count(*) AS BIGINT) AS cnt
  FROM ev GROUP BY event_type, {col}
),
bounds AS (SELECT min({col}) AS mn, max({col}) AS mx FROM ev),
spine AS (
  SELECT t.event_type, h.{col}
  FROM (SELECT DISTINCT event_type FROM ev) t,
       (SELECT unnest(generate_series(mn, mx)) AS {col} FROM bounds) h
),
dense AS (
  SELECT s.event_type, s.{col}, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt
  FROM spine s LEFT JOIN counts c USING (event_type, {col})
)"""


# --- discrete rank-selected bounds (shared by IQR + winsorized) ---------------


def _discrete_rank_bounds(ev, lo: tuple, hi: tuple):
    """Per-event_type (``__lo``, ``__hi``) bounds as DISCRETE data
    elements at ranks ceil(lo_num/lo_den * n) / ceil(hi_num/hi_den *
    n) of ``value`` -- THE shared threshold recipe (see the sf1
    interpolation-ulp incident): exact integer rank arithmetic, the
    bound is an actual element, and both engines compare
    bit-identical parquet doubles.  ``+ 0.0`` normalizes a possible
    -0.0 element so the displayed bound cannot repr-split across
    engines.  One window pass: row_number and count(*) share the same
    per-type exchange (no separate counts scan)."""
    wp = Window.partitionBy("event_type")
    ranked = (
        ev.select("event_type", "value")
        .withColumn("__rn", F.row_number().over(wp.orderBy("value")))
        .withColumn("__n", F.count(F.lit(1)).over(wp))
    )
    klo = F.expr(f"({lo[0]} * __n + {lo[1] - 1}) div {lo[1]}")
    khi = F.expr(f"({hi[0]} * __n + {hi[1] - 1}) div {hi[1]}")
    return (
        ranked.filter((F.col("__rn") == klo) | (F.col("__rn") == khi))
        .groupBy("event_type")
        .agg(
            (F.min(F.when(F.col("__rn") == klo, F.col("value"))) + 0.0).alias("__lo"),
            (F.min(F.when(F.col("__rn") == khi, F.col("value"))) + 0.0).alias("__hi"),
        )
    )


def _sql_discrete_rank_bounds(lo: tuple, hi: tuple) -> str:
    """The identical selection as DuckDB CTEs ``ranked`` + ``b``
    (event_type, lo, hi)."""
    return f"""ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT event_type,
         min(CASE WHEN rn = ({lo[0]} * n + {lo[1] - 1}) // {lo[1]}
                  THEN value END) + 0.0 AS lo,
         min(CASE WHEN rn = ({hi[0]} * n + {hi[1] - 1}) // {hi[1]}
                  THEN value END) + 0.0 AS hi
  FROM ranked
  GROUP BY event_type
)"""


# --- Tukey IQR outlier summary -------------------------------------------------


def q_iqr_outlier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection (Tukey fences): per event type, count
    values outside [q1 - 1.5*IQR, q3 + 1.5*IQR] -- the box-plot rule,
    the standard robust alternative to the z-score detector
    (q_zscore_anomaly_hours) when the distribution is skewed, as
    ``value`` is (~5% upper-tail outliers on the fixture).

    Exactness: the quartiles are DISCRETE data elements selected by
    exact integer rank arithmetic (k = ceil(p*n)), not interpolated
    percentiles -- the sf1 sweep proved interpolated thresholds land
    within 1 ulp of duplicated data and flip strict compares across
    engines.  The fence arithmetic then runs on bit-identical parquet
    doubles, so the comparisons agree exactly and the outlier counts
    are integers.  q1/q3 are rounded for display only.

    Scale shape: one per-type rank pass (window partitioned by
    event_type), broadcast fence join back, one conditional-count
    aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("value").isNotNull())
    fences = _discrete_rank_bounds(ev, lo=(1, 4), hi=(3, 4)).select(
        "event_type",
        F.col("__lo").alias("__q1"),
        F.col("__hi").alias("__q3"),
    )
    iqr = F.col("__q3") - F.col("__q1")
    lo, hi = F.col("__q1") - 1.5 * iqr, F.col("__q3") + 1.5 * iqr
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.round(F.first("__q1"), 4).alias("q1"),
            F.round(F.first("__q3"), 4).alias("q3"),
            F.sum((F.col("value") > hi).cast("int")).cast("bigint").alias("n_hi"),
            F.sum((F.col("value") < lo).cast("int")).cast("bigint").alias("n_lo"),
        )
        .withColumn(
            "hi_rate",
            F.round(F.col("n_hi").cast("double") / F.col("n_values"), 4),
        )
        .orderBy("event_type")
    )


ORACLE_IQR_OUTLIERS = f"""
WITH {_sql_discrete_rank_bounds(lo=(1, 4), hi=(3, 4))},
f AS (SELECT event_type, lo AS q1, hi AS q3 FROM b)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_values,
       round(min(f.q1), 4) AS q1,
       round(min(f.q3), 4) AS q3,
       CAST(sum(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
       round(CAST(sum(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                           THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS hi_rate
FROM events e JOIN f ON e.event_type = f.event_type
WHERE e.value IS NOT NULL
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --- winsorized statistics ------------------------------------------------------


def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) statistics -- the robust-mean companion of
    the IQR detector: per event type, clamp ``value`` to the DISCRETE
    1st/99th-percentile elements and report the winsorized mean
    alongside clip counts, so one wild outlier cannot drag the
    reported average.

    Exactness: the clip bounds are ACTUAL DATA VALUES selected by
    exact integer rank arithmetic (k_lo = ceil(0.01*n), k_hi =
    ceil(0.99*n) via integer div), NOT interpolated percentiles --
    at sf1 the interpolated p99 landed within 1 ulp of a
    (10x-duplicated) data value and the engines' last-bit
    interpolation difference flipped a strict compare for the whole
    duplicate group (found by the sf1 correctness sweep).  Discrete
    selection makes the clamp compares bit-identical parquet-double
    comparisons, and the winsorized MEAN uses the money_sum
    fixed-point recipe so the parallel and serial sums agree exactly.

    Scale shape: one rank pass per type (window partitioned by
    event_type -- partition size is the per-type value count; for a
    100 TB single-type skew, swap the exact selection for a
    distributed selection algorithm), broadcast bounds join back, one
    conditional aggregate."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("value").isNotNull())
    bounds = _discrete_rank_bounds(ev, lo=(1, 100), hi=(99, 100)).select(
        "event_type",
        F.col("__lo").alias("__p01"),
        F.col("__hi").alias("__p99"),
    )
    clip = F.least(F.greatest(F.col("value"), F.col("__p01")), F.col("__p99"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.round(F.first("__p01"), 4).alias("p01"),
            F.round(F.first("__p99"), 4).alias("p99"),
            F.sum((F.col("value") < F.col("__p01")).cast("int"))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum((F.col("value") > F.col("__p99")).cast("int"))
            .cast("bigint")
            .alias("n_clip_hi"),
            # THE shared fixed-point recipe (queries/core.money_sum),
            # not an inline copy -- a recipe change propagates here
            money_sum(clip).alias("__wsum"),
        )
        .select(
            "event_type",
            "n_values",
            "p01",
            "p99",
            "n_clip_lo",
            "n_clip_hi",
            F.round(F.col("__wsum") / F.col("n_values"), 4).alias(
                "winsorized_mean"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_WINSORIZED = f"""
WITH {_sql_discrete_rank_bounds(lo=(1, 100), hi=(99, 100))},
w2 AS (SELECT event_type, lo AS p01, hi AS p99 FROM b)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_values,
       round(min(w2.p01), 4) AS p01,
       round(min(w2.p99), 4) AS p99,
       CAST(sum(CASE WHEN e.value < w2.p01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_lo,
       CAST(sum(CASE WHEN e.value > w2.p99 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clip_hi,
       round((CAST(sum(CAST(floor(
                least(greatest(e.value, w2.p01), w2.p99) * 10000 + 0.5
              ) AS BIGINT)) AS DOUBLE) / 10000.0) / count(*), 4)
         AS winsorized_mean
FROM events e JOIN w2 ON e.event_type = w2.event_type
WHERE e.value IS NOT NULL
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --- A/B test significance ------------------------------------------------------


def q_ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test -- the experimentation primitive: users
    split into arms by ``user_id % 2`` (the deterministic stand-in
    for an assignment table), conversion = made >= 1 purchase event;
    one summary row with per-arm counts, rates, the pooled z
    statistic, and a significance flag at alpha = 0.05.

    Exactness: every count is integral; rates and z are rounded for
    the hash, and the flag compares the ROUNDED z against 1.96 -- it
    derives from the exact cell the hash already pins, so it cannot
    diverge independently.  (An all-integer cross-multiplied flag was
    rejected: (c1*n2 - c2*n1)^2 * (n1+n2) overflows BIGINT already at
    sf0.1 user counts.)

    Scale shape: one pass over events collapses to per-user
    (arm, converted) -- map-side combinable -- then a 2-row arm
    aggregate and a 1-row final select."""
    t = load_tables(spark, sf_dir, ["events"])
    per_user = (
        t["events"]
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias("__conv")
        )
        .withColumn("__arm", (F.col("user_id") % 2).cast("int"))
    )
    # ONE conditional aggregate straight to the summary row -- two
    # filtered branches + crossJoin would re-execute the events scan
    # and the per-user aggregate once per arm (the table_profile
    # 38-scans lesson)
    # coalesce: sum() over an empty frame is NULL, not 0 (the GDPR
    # empty-cascade lesson); count-like cells must report 0
    z0 = F.lit(0)
    w = per_user.agg(
        F.coalesce(F.sum((F.col("__arm") == 0).cast("int")), z0)
        .cast("bigint").alias("n_a"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 0, F.col("__conv")).otherwise(0)), z0)
        .cast("bigint").alias("conv_a"),
        F.coalesce(F.sum((F.col("__arm") == 1).cast("int")), z0)
        .cast("bigint").alias("n_b"),
        F.coalesce(F.sum(F.when(F.col("__arm") == 1, F.col("__conv")).otherwise(0)), z0)
        .cast("bigint").alias("conv_b"),
    )
    p1 = F.col("conv_a") / F.col("n_a")
    p2 = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    z = (p1 - p2) / F.sqrt(
        pp * (1 - pp) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    zr = F.round(z, 4)
    return w.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(p1, 4).alias("rate_a"),
        F.round(p2, 4).alias("rate_b"),
        zr.alias("z"),
        F.when(F.abs(zr) >= 1.96, 1).otherwise(0).cast("int").alias("significant"),
    )


ORACLE_AB_TEST = """
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS INTEGER) AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
),
w AS (
  -- single aggregate, mirroring the Spark side: a grouped-arms +
  -- cross-join formulation would emit ZERO rows when an arm is empty
  -- while the one-pass aggregate emits the summary row with n = 0
  SELECT CAST(coalesce(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a,
         CAST(coalesce(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END), 0) AS BIGINT) AS conv_a,
         CAST(coalesce(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b,
         CAST(coalesce(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END), 0) AS BIGINT) AS conv_b
  FROM per_user
),
s AS (
  SELECT *,
         round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
               / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)), 4) AS z
  FROM w
)
SELECT n_a, conv_a, n_b, conv_b,
       round(CAST(conv_a AS DOUBLE) / n_a, 4) AS rate_a,
       round(CAST(conv_b AS DOUBLE) / n_b, 4) AS rate_b,
       z,
       CAST(CASE WHEN abs(z) >= 1.96 THEN 1 ELSE 0 END AS INTEGER) AS significant
FROM s
"""


# --- seasonal-naive forecast baseline ------------------------------------------

_FC_SEASON = 7    # weekly seasonality, in days
_FC_EVAL = 14     # trailing days scored


def q_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-evaluation primitive: per event type, score the two
    standard baselines every forecasting system must beat --
    seasonal-naive (predict count(d-7)) and persistence (predict
    count(d-1)) -- over the last 14 fully-observed days of the daily
    count series.  Absolute errors of integer counts are INTEGERS, so
    sum_abs_err_seasonal / sum_abs_err_persist sit exactly under the
    hash; MAE is display-only.

    Scale shape: the stream collapses to (type, day) counts in one
    map-side-combinable groupBy; the gap-filled spine is clock-sized;
    lag() runs per type over day counts.  Same spine discipline as
    zscore_anomaly_hours."""
    dense = _gapfilled_counts(spark, sf_dir, 86_400_000_000, "day_id")
    w = Window.partitionBy("event_type").orderBy("day_id")
    scored = (
        dense.select(
            "event_type",
            "day_id",
            "cnt",
            F.lag("cnt", _FC_SEASON).over(w).alias("__seasonal"),
            F.lag("cnt", 1).over(w).alias("__persist"),
            F.max("day_id").over(Window.partitionBy("event_type")).alias("__last"),
        )
        .filter(
            (F.col("day_id") > F.col("__last") - _FC_EVAL)
            & F.col("__seasonal").isNotNull()
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("cnt") - F.col("__seasonal")))
            .cast("bigint")
            .alias("sum_abs_err_seasonal"),
            F.sum(F.abs(F.col("cnt") - F.col("__persist")))
            .cast("bigint")
            .alias("sum_abs_err_persist"),
        )
        .withColumn(
            "mae_seasonal",
            F.round(F.col("sum_abs_err_seasonal") / F.col("n_days"), 4),
        )
        .withColumn(
            "mae_persist",
            F.round(F.col("sum_abs_err_persist") / F.col("n_days"), 4),
        )
        .orderBy("event_type")
    )


ORACLE_FORECAST_BASELINE = f"""
WITH {_sql_gapfilled_counts(86_400_000_000, "day_id")},
scored AS (
  SELECT event_type, day_id, cnt,
         lag(cnt, {_FC_SEASON}) OVER tw AS seasonal,
         lag(cnt, 1) OVER tw AS persist,
         max(day_id) OVER (PARTITION BY event_type) AS last_day
  FROM dense
  WINDOW tw AS (PARTITION BY event_type ORDER BY day_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(cnt - seasonal)) AS BIGINT) AS sum_abs_err_seasonal,
       CAST(sum(abs(cnt - persist)) AS BIGINT) AS sum_abs_err_persist,
       round(CAST(sum(abs(cnt - seasonal)) AS DOUBLE) / count(*), 4)
         AS mae_seasonal,
       round(CAST(sum(abs(cnt - persist)) AS DOUBLE) / count(*), 4)
         AS mae_persist
FROM scored
WHERE day_id > last_day - {_FC_EVAL} AND seasonal IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# --- frequent session paths ---------------------------------------------------

_PATH_TOPK = 20


def q_session_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent 3-step event-type paths within sessions
    (frequent-sequence mining, the product-analytics sibling of
    funnel/transition analysis: "what do users actually do", not
    "did they do the path we picked").

    Sessions use the same 30-min-gap rule as q_sessionization; paths
    are consecutive trigrams inside a session, ordered by (ts,
    event_id) -- the oracle orders by (epoch_us, event_id) so the
    parquet nano-vs-micro precision gap cannot reorder equal-micro
    events differently across engines.

    Scale shape: both windows partition by user (then user+session) --
    per-user event counts bound the partition, never corpus size; the
    trigram frame is one groupBy count (map-side combinable, at most
    |types|^3 distinct keys) and the final top-k is
    TakeOrderedAndProject.  All values are strings/BIGINTs -- exact."""
    t = load_tables(spark, sf_dir, ["events"])
    # NULL event_type would diverge between engines (concat_ws skips
    # NULLs, '||' propagates them) -- drop such rows on BOTH sides
    sid = with_session_ids(t["events"].filter(F.col("event_type").isNotNull()))
    sw = Window.partitionBy("user_id", "__sid").orderBy("ts", "event_id")
    paths = (
        sid.select(
            "event_type",
            F.lead("event_type", 1).over(sw).alias("__t1"),
            F.lead("event_type", 2).over(sw).alias("__t2"),
        )
        .filter(F.col("__t1").isNotNull() & F.col("__t2").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "__t1", "__t2").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sequences"))
        .orderBy(F.desc("n_sequences"), F.asc("path"))
        .limit(_PATH_TOPK)
    )


ORACLE_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sid AS (
  SELECT *, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM flagged
),
tri AS (
  SELECT event_type || '>' ||
         lead(event_type, 1) OVER sw || '>' ||
         lead(event_type, 2) OVER sw AS path,
         lead(event_type, 2) OVER sw AS t2
  FROM sid
  WINDOW sw AS (PARTITION BY user_id, sid ORDER BY us, event_id)
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sequences
FROM tri
WHERE t2 IS NOT NULL
GROUP BY path
ORDER BY n_sequences DESC, path
LIMIT {_PATH_TOPK}
"""


# --- trailing-window z-score anomaly detection -------------------------------

_ZS_WINDOW = 24  # trailing hours in the baseline window
_ZS_SIGMA = 3    # anomaly threshold, in population standard deviations


def q_zscore_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly detection: per event type, flag hours whose
    event count deviates >= 3 population-sigma from the TRAILING 24
    fully-gap-filled hours (the monitoring primitive behind "traffic
    for `purchase` just spiked/died").

    Exactness: with S = sum, Q = sum of squares, c = count over the
    trailing window (all BIGINT -- counts are integers), the z test
    |x - S/c| >= 3*sigma_pop rearranges to the INTEGER predicate
      (c*x - S)^2 >= 9*(c*Q - S^2)
    so the anomaly flag involves no float compare at all; the
    reported z = (c*x - S)/sqrt(c*Q - S^2) is display-only (rounded
    4).  A constant baseline (zero variance) flags any deviation.
    Overflow bound: the binding term is dev^2 = (c*x - S)^2, worst
    case ~(2*c*x)^2, so BIGINT exactness holds for hourly counts up
    to ~1.2e8 at the 24-hour window (sqrt(2^63)/(2*24)) -- beyond
    that, pre-aggregate to a coarser grain.

    Scale shape: the raw stream collapses to (type, hour) counts in
    one map-side-combinable groupBy; everything after runs on the
    gap-filled spine whose size is types x hours (clock time, not
    event volume), so the window partitions stay tiny at any data
    scale."""
    dense = _gapfilled_counts(spark, sf_dir, 3_600_000_000, "hour_id")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-_ZS_WINDOW, -1)
    )
    stats = dense.select(
        "event_type",
        "hour_id",
        "cnt",
        F.sum("cnt").over(w).alias("__s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("__q"),
        F.count("cnt").over(w).alias("__c"),
    )
    dev = F.col("__c") * F.col("cnt") - F.col("__s")         # c*x - S
    varn = F.col("__c") * F.col("__q") - F.col("__s") * F.col("__s")  # c*Q - S^2
    return (
        stats.select(
            "event_type",
            "hour_id",
            "cnt",
            F.when(
                (F.col("__c") >= _ZS_WINDOW) & (varn > 0),
                F.round(dev / F.sqrt(varn.cast("double")), 4),
            ).alias("z"),
            F.when(F.col("__c") < _ZS_WINDOW, F.lit(None).cast("int"))
            .when(dev == 0, F.lit(0))
            .when(dev * dev >= _ZS_SIGMA * _ZS_SIGMA * varn, F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_id")
    )


ORACLE_ZSCORE_ANOMALY = f"""
WITH {_sql_gapfilled_counts(3_600_000_000, "hour_id")},
stats AS (
  SELECT event_type, hour_id, cnt,
         sum(cnt) OVER tw AS s,
         sum(cnt * cnt) OVER tw AS q,
         count(cnt) OVER tw AS c
  FROM dense
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour_id
                ROWS BETWEEN {_ZS_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_id, cnt,
       CASE WHEN c >= {_ZS_WINDOW} AND c * q - s * s > 0
            THEN round((c * cnt - s) / sqrt(CAST(c * q - s * s AS DOUBLE)), 4)
       END AS z,
       CASE WHEN c < {_ZS_WINDOW} THEN NULL
            WHEN c * cnt - s = 0 THEN 0
            WHEN (c * cnt - s) * (c * cnt - s)
                 >= {_ZS_SIGMA * _ZS_SIGMA} * (c * q - s * s) THEN 1
            ELSE 0
       END AS is_anomaly
FROM stats
ORDER BY event_type, hour_id
"""


# fixed-point scale for the decayed trending score: 2^20 units per
# count, so 20 halvings of a single event remain representable before
# the integer floor truncates the tail
_TREND_FP_SCALE = 1 << 20


def q_trending_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.anomaly.trending_stream (VERDICT r5
    item 7): per event type, the exponentially-decayed activity score
    score <- score * 0.5 + count over the type's ACTIVE hours in
    order (matching the stream's 'decay only on batches the key
    appears in' semantics, one hour = one micro-batch).

    Exactness: decay 1/2 at a fixed binary scale is pure integer
    arithmetic -- score_fp <- score_fp div 2 + cnt * 2^20 -- so the
    recurrence folds identically on any engine and the driver hash
    pins score_fp; the reported ``score`` is score_fp / 2^20, an exact
    dyadic double both engines derive from the pinned integer.  (The
    streaming op's float recurrence equals this one down to the 2^-20
    quantization floor -- dyadic rationals are exact in float64.)

    Scale shape: the event stream collapses to (type, hour) counts in
    one map-side-combinable groupBy; the per-type fold runs over an
    array bounded by CLOCK hours, not event volume -- the same spine
    discipline as zscore_anomaly_hours.  No corpus-wide window, no
    driver loop."""
    t = load_tables(spark, sf_dir, ["events"])
    hourly = (
        t["events"]
        .filter(F.col("event_type").isNotNull())
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hour_id"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    per_key = hourly.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("hour_id", "cnt"))).alias("__hc")
    )
    return (
        per_key.select(
            "event_type",
            F.size("__hc").cast("long").alias("n_hours"),
            F.expr(
                f"aggregate(__hc, 0L, (acc, x) -> acc div 2 + x.cnt * {_TREND_FP_SCALE}L)"
            ).alias("score_fp"),
        )
        .withColumn(
            "score", F.col("score_fp") / F.lit(float(_TREND_FP_SCALE))
        )
        .orderBy("event_type")
    )


ORACLE_TRENDING_SCORES = f"""
WITH __h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IS NOT NULL
  GROUP BY event_type, hour_id
),
__arr AS (
  SELECT event_type,
         list(cnt ORDER BY hour_id) AS hc,
         CAST(count(*) AS BIGINT) AS n_hours
  FROM __h GROUP BY event_type
),
__folded AS (
  SELECT event_type, n_hours,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), hc),
                          (a, b) -> a // 2 + b * {_TREND_FP_SCALE}) AS BIGINT)
           AS score_fp
  FROM __arr
)
SELECT event_type, n_hours, score_fp,
       CAST(score_fp AS DOUBLE) / {_TREND_FP_SCALE} AS score
FROM __folded
ORDER BY event_type
"""


_TREND_TOPK = 5


def q_trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k trending keys -- the batch twin of the SINK-side
    ranking (streaming/topk.TrendingTopKSink): rank every key's
    decayed score and keep the k best.  Cross-key ranking cannot live
    inside the per-key stateful operator, so in the streaming pipeline
    it happens in foreachBatch; this twin puts the identical ranking
    rule (score_fp DESC, event_type ASC -- deterministic on ties)
    under the driver hash.

    Scale shape: the ranked input is one row per KEY (vocabulary-
    sized, already folded by q_trending_scores' clock-bounded
    recurrence), so the single-partition window ranks a tiny frame --
    never the event stream."""
    scores = q_trending_scores(spark, sf_dir)
    w = Window.orderBy(F.col("score_fp").desc(), F.col("event_type"))
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _TREND_TOPK)
        .select("rank", "event_type", "score_fp", "score")
        .orderBy("rank")
    )


ORACLE_TRENDING_TOPK = f"""
WITH __h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE event_type IS NOT NULL
  GROUP BY event_type, hour_id
),
__arr AS (
  SELECT event_type, list(cnt ORDER BY hour_id) AS hc
  FROM __h GROUP BY event_type
),
__folded AS (
  SELECT event_type,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), hc),
                          (a, b) -> a // 2 + b * {_TREND_FP_SCALE}) AS BIGINT)
           AS score_fp
  FROM __arr
),
__ranked AS (
  SELECT event_type, score_fp,
         CAST(row_number() OVER (ORDER BY score_fp DESC, event_type)
              AS BIGINT) AS rank
  FROM __folded
)
SELECT rank, event_type, score_fp,
       CAST(score_fp AS DOUBLE) / {_TREND_FP_SCALE} AS score
FROM __ranked
WHERE rank <= {_TREND_TOPK}
ORDER BY rank
"""





def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-growth curve: per day, the number of NEW users (first
    ever seen that day) and the cumulative distinct-user count to date
    -- the growth-accounting primitive a naive per-day COUNT(DISTINCT)
    cannot produce (it double-counts returners) and a corpus-wide
    running distinct cannot afford.

    Exactness & scale shape: the stream collapses to one row per USER
    (min first-seen day -- map-side combinable), then to one row per
    DAY; the running sum windows over the clock-sized day spine only.
    All integers under the hash.  Days with no new users still appear
    (gap-filled spine) with new_users = 0 and a flat cumulative."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day_id"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day_id").alias("day_id"))
    daily_new = first_seen.groupBy("day_id").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    bounds = ev.agg(F.min("day_id").alias("__mn"), F.max("day_id").alias("__mx"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"))).alias("day_id")
    )
    dense = spine.join(daily_new, "day_id", "left").select(
        "day_id", F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users")
    )
    w = Window.orderBy("day_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dense.select(
            "day_id",
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("day_id")
    )


ORACLE_CUMULATIVE_USERS = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day_id
  FROM events WHERE user_id IS NOT NULL
),
first_seen AS (SELECT user_id, min(day_id) AS day_id FROM ev GROUP BY user_id),
daily_new AS (
  SELECT day_id, CAST(count(*) AS BIGINT) AS new_users
  FROM first_seen GROUP BY day_id
),
bounds AS (SELECT min(day_id) AS mn, max(day_id) AS mx FROM ev),
spine AS (SELECT unnest(generate_series(mn, mx)) AS day_id FROM bounds),
dense AS (
  SELECT s.day_id, CAST(coalesce(d.new_users, 0) AS BIGINT) AS new_users
  FROM spine s LEFT JOIN daily_new d ON s.day_id = d.day_id
)
SELECT day_id, new_users,
       CAST(sum(new_users) OVER (ORDER BY day_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM dense
ORDER BY day_id
"""


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) report: what share of total
    revenue comes from the top 1% / 5% / 20% of customers -- the
    whale-dependence metric behind pricing and risk reviews.

    Exactness: per-customer revenue uses the money_sum fixed-point
    recipe (exact BIGINT units); the tier cuts are DISCRETE customer
    counts k = ceil(p * n) by exact integer arithmetic, customers
    ranked on the pinned integer revenue with custkey tie-break (a
    revenue tie cannot reorder the cut); tier sums are BIGINT under
    the hash and shares are display-rounded ratios of pinned integers.

    Scale shape: facts collapse to one row per customer (map-side
    combinable); ranking windows over the customer-count table, not
    raw facts; three tier sums come from ONE conditional aggregate
    (the table_profile 38-scans lesson)."""
    t = load_tables(spark, sf_dir, ["orders"])
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("long")
            ).alias("__rev_fp")
        )
    )
    w = Window.orderBy(F.desc("__rev_fp"), "o_custkey")
    ranked = per_cust.select(
        "__rev_fp",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    tiers = [("top_1pct", 1, 100), ("top_5pct", 5, 100), ("top_20pct", 20, 100)]
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("__rev_fp").alias("__total_fp"),
    ]
    for name, num, den in tiers:
        k = F.expr(f"({num} * __n + {den - 1}) div {den}")
        aggs.append(
            F.sum(F.when(F.col("__rn") <= k, F.col("__rev_fp")))
            .alias(f"__{name}_fp")
        )
    totals = ranked.agg(*aggs)
    out_cols = [
        "n_customers",
        F.round(F.col("__total_fp") / 10000.0, 2).alias("total_revenue"),
    ]
    for name, _num, _den in tiers:
        out_cols.append(
            F.round(F.col(f"__{name}_fp") / 10000.0, 2).alias(f"{name}_revenue")
        )
        out_cols.append(
            F.round(
                F.col(f"__{name}_fp").cast("double") / F.col("__total_fp"), 4
            ).alias(f"{name}_share")
        )
    return totals.select(*out_cols)


ORACLE_REVENUE_CONCENTRATION = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_fp
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT rev_fp,
         row_number() OVER (ORDER BY rev_fp DESC, o_custkey) AS rn,
         count(*) OVER () AS n
  FROM per_cust
)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(rev_fp) AS DOUBLE) / 10000.0, 2) AS total_revenue,
       round(CAST(sum(CASE WHEN rn <= (1 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / 10000.0, 2) AS top_1pct_revenue,
       round(CAST(sum(CASE WHEN rn <= (1 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / sum(rev_fp), 4) AS top_1pct_share,
       round(CAST(sum(CASE WHEN rn <= (5 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / 10000.0, 2) AS top_5pct_revenue,
       round(CAST(sum(CASE WHEN rn <= (5 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / sum(rev_fp), 4) AS top_5pct_share,
       round(CAST(sum(CASE WHEN rn <= (20 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / 10000.0, 2) AS top_20pct_revenue,
       round(CAST(sum(CASE WHEN rn <= (20 * n + 99) // 100 THEN rev_fp END) AS DOUBLE) / sum(rev_fp), 4) AS top_20pct_share
FROM ranked
"""


def q_mad_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly flags -- the heavy-tail-tolerant
    twin of q_zscore_anomaly_hours: per event type, flag hours whose
    count deviates more than 3 MAD from the trailing-24h MEDIAN.  One
    wild spike inside the baseline window corrupts a mean/sigma test
    (the spike inflates sigma and masks the next anomaly) but moves a
    median/MAD baseline by at most one rank -- the standard robust
    monitoring upgrade.

    Exactness: counts are integers; the median and MAD are DISCRETE
    rank-selected elements (lower median, (c+1) div 2) of the trailing
    window, so both are integers and the flag |x - med| > 3*MAD is a
    pure integer predicate -- no float anywhere near the hash (the
    discrete-threshold lesson).  A zero-MAD (majority-constant) window
    flags any deviation, like zscore's zero-variance rule; warmup
    hours (< 24 trailing) are NULL.  The robust score
    dev/(1.4826*MAD) is display-only.

    Scale shape: identical to zscore -- one map-side-combinable
    (type, hour) count collapse, then windows over the clock-sized
    spine; the trailing array is 24 elements, and the MAD transform
    uses zip_with(arr, array_repeat(med, c)) so the rank-selected
    median is evaluated once per ROW, not once per element (the r4
    CollapseProject-inlines-into-HOF trap)."""
    dense = _gapfilled_counts(spark, sf_dir, 3_600_000_000, "hour_id")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_id")
        .rowsBetween(-_ZS_WINDOW, -1)
    )
    arr = dense.select(
        "event_type",
        "hour_id",
        "cnt",
        F.collect_list("cnt").over(w).alias("__arr"),
    )
    staged = arr.select(
        "event_type",
        "hour_id",
        "cnt",
        F.size("__arr").alias("__c"),
        # greatest(1, ...): warmup rows have an EMPTY window (c=0),
        # and element_at index 0 is invalid -- index 1 on [] is NULL
        # under the session's non-ANSI mode, which the warmup CASE
        # then ignores
        F.expr(
            "element_at(array_sort(__arr),"
            " greatest(1, CAST((size(__arr) + 1) div 2 AS INT)))"
        ).alias("__med"),
        F.col("__arr"),
    ).select(
        "event_type",
        "hour_id",
        "cnt",
        "__c",
        "__med",
        F.expr(
            "element_at(array_sort(zip_with(__arr, array_repeat(__med, __c),"
            " (x, m) -> abs(x - m))), greatest(1, CAST((__c + 1) div 2 AS INT)))"
        ).alias("__mad"),
    )
    dev = F.abs(F.col("cnt") - F.col("__med"))
    return (
        staged.select(
            "event_type",
            "hour_id",
            "cnt",
            F.col("__med").cast("long").alias("med"),
            F.col("__mad").cast("long").alias("mad"),
            F.when(
                (F.col("__c") >= _ZS_WINDOW) & (F.col("__mad") > 0),
                F.round(dev / (F.col("__mad") * 1.4826), 4),
            ).alias("robust_z"),
            F.when(F.col("__c") < _ZS_WINDOW, F.lit(None).cast("int"))
            .when(dev == 0, F.lit(0))
            .when(dev > 3 * F.col("__mad"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_id")
    )


ORACLE_MAD_ANOMALY = f"""
WITH {_sql_gapfilled_counts(3_600_000_000, "hour_id")},
arr AS (
  SELECT event_type, hour_id, cnt, list(cnt) OVER tw AS l
  FROM dense
  WINDOW tw AS (PARTITION BY event_type ORDER BY hour_id
                ROWS BETWEEN {_ZS_WINDOW} PRECEDING AND 1 PRECEDING)
),
staged AS (
  SELECT event_type, hour_id, cnt,
         coalesce(len(l), 0) AS c,
         list_sort(l)[(len(l) + 1) // 2] AS med,
         l
  FROM arr
),
staged2 AS (
  SELECT event_type, hour_id, cnt, c, med,
         list_sort(list_transform(l, x -> abs(x - med)))[(c + 1) // 2] AS mad
  FROM staged
)
SELECT event_type, hour_id, cnt,
       CAST(med AS BIGINT) AS med,
       CAST(mad AS BIGINT) AS mad,
       CASE WHEN c >= {_ZS_WINDOW} AND mad > 0
            THEN round(abs(cnt - med) / (mad * 1.4826), 4)
       END AS robust_z,
       CASE WHEN c < {_ZS_WINDOW} THEN NULL
            WHEN abs(cnt - med) = 0 THEN 0
            WHEN abs(cnt - med) > 3 * mad THEN 1
            ELSE 0
       END AS is_anomaly
FROM staged2
ORDER BY event_type, hour_id
"""


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue TREND: ordinary-least-squares slope of
    monthly revenue over the nation's observed months -- the
    regression primitive behind 'is this market growing' (the
    statistics-family sibling of forecast_baseline, which scores
    level forecasts; this scores direction).

    Exactness: y is monthly revenue in 1e-4 fixed-point units (the
    money_sum floor recipe per row, exact BIGINT per cell), x is the
    month index relative to the nation's first month (small ints), so
    the normal-equation terms num = n*Sxy - Sx*Sy and den = n*Sxx -
    Sx^2 are pure BIGINT arithmetic under the hash; the dollars/month
    ``slope`` is display-only (derived from the pinned integers the
    same way on both engines).  Overflow bound: |num| <~ 2*n^2*x_max*
    y_max -- exact for monthly revenue up to ~$700M per nation-month
    at n=84 months; beyond that, move num/den to DECIMAL(38,0) (the
    important_parts precedent).  Single-month nations have den = 0 and
    a NULL slope.

    Scale shape: facts collapse to (nation, month) cells in one
    map-side-combinable aggregate behind broadcast dimension joins;
    the regression runs on the cell table (nations x months -- clock-
    sized), never on raw rows."""
    t = load_tables(spark, sf_dir, ["lineitem", "orders", "customer", "nation"])
    rev_fp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    monthly = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("__m"),
        )
        .agg(F.sum(rev_fp).alias("__y"))
    )
    with_x = monthly.withColumn(
        "__x",
        (F.col("__m") - F.min("__m").over(Window.partitionBy("nation"))).cast("long"),
    )
    stats = with_x.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_months"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
    )
    num = F.col("n_months") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    den = F.col("n_months") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return (
        stats.select(
            "nation",
            "n_months",
            num.alias("slope_num"),
            den.alias("slope_den"),
            F.when(
                den > 0,
                F.round(num.cast("double") / den / 10000.0, 4),
            ).alias("slope_per_month"),
        )
        .orderBy("nation")
    )


ORACLE_OLS_TREND = """
WITH monthly AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) AS m,
         sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS y
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY nation, m
),
with_x AS (
  SELECT nation, y,
         CAST(m - min(m) OVER (PARTITION BY nation) AS BIGINT) AS x
  FROM monthly
),
s AS (
  SELECT nation,
         CAST(count(*) AS BIGINT) AS n_months,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM with_x GROUP BY nation
)
SELECT nation, n_months,
       n_months * sxy - sx * sy AS slope_num,
       n_months * sxx - sx * sx AS slope_den,
       CASE WHEN n_months * sxx - sx * sx > 0
            THEN round(CAST(n_months * sxy - sx * sy AS DOUBLE)
                       / (n_months * sxx - sx * sx) / 10000.0, 4)
       END AS slope_per_month
FROM s
ORDER BY nation
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histogram of ``events.value`` (20 bins) -- the
    distribution-profiling primitive behind dashboards and data-drift
    monitors.  Spark's ``histogram_numeric`` is approximate and its
    bin centroids are float accumulations (never hash-comparable);
    this is the exact fixed-width construction.

    Exactness: values move to 1e-2 fixed point (``floor(v*100+0.5)``,
    the money_sum per-row recipe -- identical double math both
    engines), the bin index is pure integer arithmetic
    ``((v_fp - mn) * B) div (mx - mn + 1)``, and bin edges shown are
    derived from the same pinned integers, so no float threshold ever
    decides membership (the discrete-threshold lesson).  Degenerate
    single-value distributions land wholly in bin 0.

    Scale shape: one full-scan min/max agg (map-side combinable), one
    groupBy on the bin id (<= B groups), spine join over the B-row bin
    list -- empty bins still appear.  Nothing is event-volume-sized
    past the first aggregate."""
    n_bins = 20
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("value").isNotNull()).select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("__v_fp")
    )
    bounds = ev.agg(F.min("__v_fp").alias("__mn"), F.max("__v_fp").alias("__mx"))
    binned = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(f"((__v_fp - __mn) * {n_bins}) div (__mx - __mn + 1)")
            .alias("bin_id"),
            "__v_fp",
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("__v_fp").alias("__sum_fp"),
        )
    )
    spine = bounds.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin_id"),
        "__mn",
        "__mx",
    )
    return (
        spine.join(binned, "bin_id", "left")
        .select(
            "bin_id",
            F.round(
                F.expr(f"(__mn + (bin_id * (__mx - __mn + 1)) div {n_bins})")
                / 100.0,
                2,
            ).alias("bin_lo"),
            F.round(
                F.expr(f"(__mn + ((bin_id + 1) * (__mx - __mn + 1)) div {n_bins})")
                / 100.0,
                2,
            ).alias("bin_hi"),
            F.coalesce("n_values", F.lit(0)).cast("long").alias("n_values"),
            F.coalesce("__sum_fp", F.lit(0)).cast("long").alias("sum_value_fp"),
        )
        .orderBy("bin_id")
    )


ORACLE_VALUE_HISTOGRAM = """
WITH ev AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_fp
  FROM events WHERE value IS NOT NULL
),
bounds AS (SELECT min(v_fp) AS mn, max(v_fp) AS mx FROM ev),
binned AS (
  SELECT ((v_fp - mn) * 20) // (mx - mn + 1) AS bin_id,
         CAST(count(*) AS BIGINT) AS n_values,
         CAST(sum(v_fp) AS BIGINT) AS sum_value_fp
  FROM ev, bounds
  GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(0, 19)) AS bin_id, mn, mx FROM bounds
)
SELECT s.bin_id,
       round((s.mn + (s.bin_id * (s.mx - s.mn + 1)) // 20) / 100.0, 2) AS bin_lo,
       round((s.mn + ((s.bin_id + 1) * (s.mx - s.mn + 1)) // 20) / 100.0, 2) AS bin_hi,
       CAST(coalesce(b.n_values, 0) AS BIGINT) AS n_values,
       CAST(coalesce(b.sum_value_fp, 0) AS BIGINT) AS sum_value_fp
FROM spine s LEFT JOIN binned b USING (bin_id)
ORDER BY bin_id
"""


def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over series gaps: hourly purchase revenue
    with missing hours filled by the straight line between the
    neighboring OBSERVED hours -- the time-series repair step between
    plain gap-fill-with-zero (q_hourly_gapfill) and modeling
    (q_forecast_baseline).  Zero would be a lie for a metric that was
    merely unobserved; interpolation is the standard imputation.

    Exactness: observed hourly revenue is fixed-point BIGINT (money_
    sum recipe); the interpolated value is the integer-weighted mean
    ``(pv*(nt-t) + nv*(t-pt)) div (nt-pt)`` whose numerator is a sum
    of two non-negative BIGINT products -- no float and no negative
    division anywhere (Spark div / DuckDB // agree on truncation, but
    non-negative operands make even that moot).  Overflow: pv,nv <
    2^45 fixed-point dollars and gaps < 2^10 hours -- far under 2^63.

    Scale shape: facts collapse to observed (hour, rev_fp) cells
    (map-side combinable); the spine is clock-sized; prev/next carries
    are IGNORE NULLS window functions over the spine, never over raw
    events."""
    t = load_tables(spark, sf_dir, ["events"])
    ev = t["events"].filter(F.col("event_type") == "purchase").select(
        F.expr("unix_micros(ts) div 3600000000").alias("hour_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("__v_fp"),
    )
    hourly = ev.groupBy("hour_id").agg(F.sum("__v_fp").alias("__obs_fp"))
    bounds = ev.agg(F.min("hour_id").alias("__mn"), F.max("hour_id").alias("__mx"))
    spine = bounds.select(
        F.explode(F.sequence("__mn", "__mx")).alias("hour_id")
    )
    dense = spine.join(hourly, "hour_id", "left")
    w_prev = Window.orderBy("hour_id").rowsBetween(Window.unboundedPreceding, -1)
    w_next = Window.orderBy("hour_id").rowsBetween(1, Window.unboundedFollowing)
    # carry (value, hour) pairs so the interpolation knows the gap width;
    # struct wrapper keeps value+hour atomically (the asof NULL-carry trick)
    obs = F.when(
        F.col("__obs_fp").isNotNull(),
        F.struct(F.col("__obs_fp").alias("v"), F.col("hour_id").alias("t")),
    )
    staged = dense.select(
        "hour_id",
        "__obs_fp",
        F.last(obs, ignorenulls=True).over(w_prev).alias("__p"),
        F.first(obs, ignorenulls=True).over(w_next).alias("__nx"),
    )
    interp = F.expr(
        "(__p.v * (__nx.t - hour_id) + __nx.v * (hour_id - __p.t))"
        " div (__nx.t - __p.t)"
    )
    return (
        staged.select(
            "hour_id",
            F.coalesce(F.col("__obs_fp"), interp).cast("long").alias("revenue_fp"),
            F.round(
                F.coalesce(F.col("__obs_fp"), interp) / 100.0, 2
            ).alias("revenue"),
            F.col("__obs_fp").isNull().cast("int").alias("is_interpolated"),
        )
        .orderBy("hour_id")
    )


ORACLE_GAPFILL_INTERPOLATE = """
WITH ev AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_fp
  FROM events WHERE event_type = 'purchase'
),
hourly AS (
  SELECT hour_id, CAST(sum(v_fp) AS BIGINT) AS obs_fp FROM ev GROUP BY hour_id
),
bounds AS (SELECT min(hour_id) AS mn, max(hour_id) AS mx FROM ev),
spine AS (SELECT unnest(generate_series(mn, mx)) AS hour_id FROM bounds),
dense AS (
  SELECT s.hour_id, h.obs_fp
  FROM spine s LEFT JOIN hourly h USING (hour_id)
),
staged AS (
  SELECT hour_id, obs_fp,
         last_value(CASE WHEN obs_fp IS NOT NULL THEN obs_fp END IGNORE NULLS)
           OVER pw AS pv,
         last_value(CASE WHEN obs_fp IS NOT NULL THEN hour_id END IGNORE NULLS)
           OVER pw AS pt,
         first_value(CASE WHEN obs_fp IS NOT NULL THEN obs_fp END IGNORE NULLS)
           OVER nw AS nv,
         first_value(CASE WHEN obs_fp IS NOT NULL THEN hour_id END IGNORE NULLS)
           OVER nw AS nt
  FROM dense
  WINDOW pw AS (ORDER BY hour_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         nw AS (ORDER BY hour_id ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT hour_id,
       CAST(coalesce(obs_fp, (pv * (nt - hour_id) + nv * (hour_id - pt))
                              // (nt - pt)) AS BIGINT) AS revenue_fp,
       round(coalesce(obs_fp, (pv * (nt - hour_id) + nv * (hour_id - pt))
                               // (nt - pt)) / 100.0, 2) AS revenue,
       CAST(obs_fp IS NULL AS INT) AS is_interpolated
FROM staged
ORDER BY hour_id
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("event_transitions", q_event_transitions,
                  ORACLE_EVENT_TRANSITIONS,
                  "per-user event-type transition matrix with probabilities"),
        QuerySpec("zscore_anomaly_hours", q_zscore_anomaly_hours,
                  ORACLE_ZSCORE_ANOMALY,
                  "trailing-24h integer z-score anomaly flags per event type"),
        QuerySpec("trending_scores", q_trending_scores,
                  ORACLE_TRENDING_SCORES,
                  "fixed-point decayed trending score per event type "
                  "(batch twin of trending_stream)"),
        QuerySpec("trending_topk", q_trending_topk,
                  ORACLE_TRENDING_TOPK,
                  "global top-k trending keys (batch twin of the "
                  "sink-side foreachBatch ranking)"),
        QuerySpec("ols_trend", q_ols_trend,
                  ORACLE_OLS_TREND,
                  "per-nation monthly-revenue OLS slope with exact "
                  "integer normal equations"),
        QuerySpec("mad_anomaly_hours", q_mad_anomaly_hours,
                  ORACLE_MAD_ANOMALY,
                  "median/MAD robust anomaly flags over the trailing "
                  "24h window (integer predicate)"),
        QuerySpec("cumulative_unique_users", q_cumulative_unique_users,
                  ORACLE_CUMULATIVE_USERS,
                  "daily new + cumulative distinct users over the "
                  "gap-filled day spine"),
        QuerySpec("revenue_concentration", q_revenue_concentration,
                  ORACLE_REVENUE_CONCENTRATION,
                  "top-1/5/20% customer revenue shares via discrete "
                  "rank cuts on fixed-point revenue"),
        QuerySpec("session_path_mining", q_session_path_mining,
                  ORACLE_SESSION_PATHS,
                  "top-20 frequent 3-step event paths within 30-min sessions"),
        QuerySpec("value_histogram", q_value_histogram,
                  ORACLE_VALUE_HISTOGRAM,
                  "exact 20-bin equi-width histogram via integer bin "
                  "arithmetic on fixed-point values"),
        QuerySpec("gapfill_interpolate", q_gapfill_interpolate,
                  ORACLE_GAPFILL_INTERPOLATE,
                  "linear interpolation of missing hours via integer-"
                  "weighted neighbor mean"),
        QuerySpec("iqr_outlier_summary", q_iqr_outlier_summary,
                  ORACLE_IQR_OUTLIERS,
                  "Tukey-fence robust outlier counts per event type"),
        QuerySpec("winsorized_value_stats", q_winsorized_value_stats,
                  ORACLE_WINSORIZED,
                  "p01/p99-clipped robust mean via fixed-point exact sum"),
        QuerySpec("ab_test_conversion", q_ab_test_conversion,
                  ORACLE_AB_TEST,
                  "two-proportion z-test on purchase conversion by arm"),
        QuerySpec("forecast_baseline", q_forecast_baseline,
                  ORACLE_FORECAST_BASELINE,
                  "seasonal-naive vs persistence forecast error, exact integer AE"),
        QuerySpec("cohort_retention", q_cohort_retention, ORACLE_COHORT_RETENTION,
                  "first-seen cohorts x weekly-offset retention matrix"),
        QuerySpec("funnel_conversion", q_funnel_conversion, ORACLE_FUNNEL,
                  "strict ordered 24h-window funnel (signup -> view -> purchase) with "
                  "step conversion rates"),
        QuerySpec("min_cost_supplier", q_min_cost_supplier, _MIN_COST_SQL,
                  "TPC-H Q2-shaped correlated-min subquery"),
        QuerySpec("nation_profit", q_nation_profit, ORACLE_NATION_PROFIT,
                  "TPC-H Q9-shaped profit per nation x year"),
        QuerySpec("market_share", q_market_share, ORACLE_MARKET_SHARE,
                  "TPC-H Q8-shaped conditional-ratio market share"),
        QuerySpec("top_supplier", q_top_supplier, ORACLE_TOP_SUPPLIER,
                  "TPC-H Q15-shaped HAVING = MAX scalar subquery"),
        QuerySpec("big_orders", q_big_orders, ORACLE_BIG_ORDERS,
                  "TPC-H Q18-shaped HAVING threshold + join-back"),
        QuerySpec("order_window_suite", q_order_window_suite, ORACLE_WINDOW_SUITE,
                  "window suite: rank/ntile/lag/lead/running/percent_rank"),
        QuerySpec("user_set_ops", q_user_set_ops, ORACLE_SET_OPS,
                  "INTERSECT/EXCEPT audience segmentation"),
        QuerySpec("user_set_ops_all", q_user_set_ops_all, ORACLE_SET_OPS_ALL,
                  "INTERSECT ALL/EXCEPT ALL bag semantics"),
        QuerySpec("doc_hof_stats", q_doc_hof_stats, ORACLE_DOC_HOF,
                  "array HOFs: aggregate/exists/filter over tokens"),
        QuerySpec("part_string_funcs", q_part_string_funcs, ORACLE_STRING_FUNCS,
                  "string scalar suite over part"),
        QuerySpec("hourly_gapfill", q_hourly_gapfill, ORACLE_GAPFILL,
                  "time-series gap-fill via sequence spine"),
        QuerySpec("rolling_7d_revenue", q_rolling_7d_revenue, ORACLE_ROLLING_7D,
                  "7-day trailing RANGE window over daily rollup"),
        QuerySpec("latest_event_per_user", q_latest_event_per_user, ORACLE_LATEST_EVENT,
                  "distributed arg-max (struct MAX) vs window oracle"),
        QuerySpec("doc_regex_extract", q_doc_regex_extract, ORACLE_REGEX_EXTRACT,
                  "regex extract/count/replace scalar surface"),
        QuerySpec("parts_never_shipped", q_parts_never_shipped, _NOT_IN_SQL,
                  "NOT IN null-aware anti join per brand"),
        QuerySpec("top_spenders_lateral", q_top_spenders_lateral, _LATERAL_SQL,
                  "LATERAL correlated subquery: top-2 spenders per nation"),
        QuerySpec("user_session_window", q_user_session_window, ORACLE_SESSION_WINDOW,
                  "session_window batch twin vs gaps-and-islands SQL"),
        QuerySpec("order_first_last_nth", q_order_first_last_nth, ORACLE_FIRST_LAST_NTH,
                  "first/last/nth_value unbounded-frame window suite"),
        QuerySpec("user_map_funcs", q_user_map_funcs, _map_oracle(),
                  "map functions: create/filter/keys/values/transform_values"),
        QuerySpec("salted_distinct_users", q_salted_distinct_users, ORACLE_SALTED_DISTINCT,
                  "two-stage salted COUNT(DISTINCT) vs plain oracle"),
        QuerySpec("salted_nation_revenue", q_salted_nation_revenue, ORACLE_SALTED_JOIN,
                  "salted hot-key equi-join vs plain-join oracle"),
        QuerySpec("grouping_sets_events", q_grouping_sets_events, ORACLE_GROUPING_SETS,
                  "explicit GROUPING SETS + grouping_id"),
        QuerySpec("doc_array_ops", q_doc_array_ops, _array_ops_oracle(),
                  "array_intersect/except/union per-row suite"),
        QuerySpec("session_overlap_pairs", q_session_overlap_pairs, ORACLE_SESSION_OVERLAP,
                  "interval-overlap range join via grain-bucketed equi-join"),
        QuerySpec("session_concurrency", q_session_concurrency, ORACLE_SESSION_CONCURRENCY,
                  "segmented sweep-line: peak concurrent sessions per day"),
        QuerySpec("psi_value_drift", q_psi_value_drift, ORACLE_PSI_DRIFT,
                  "population-stability drift: first vs second half of "
                  "the stream, 10 global-width buckets"),
    ]


# --- population-stability drift (round 9) --------------------------------------

_PSI_BUCKETS = 10
_PSI_FLOOR = 0.0001  # standard zero-count smoothing for PSI proportions


def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream: bucket `value` into 10 equal-width bins over the
    GLOBAL min/max, split the stream at the midpoint timestamp, and
    emit per-OBSERVED-bucket counts plus the PSI contribution
    (p_b - p_a) * ln(p_b / p_a) with the standard 1e-4 floor for
    one-side-empty buckets -- the industry drift gate a training
    pipeline runs before trusting a new data window (PSI > 0.2 =
    retrain signal).  A bucket empty in BOTH halves emits no row (its
    contribution is identically 0); NULL measurements are excluded
    before bucketing.

    Exactness: bucket ids and counts are integer-exact under the hash
    (bin arithmetic is the same IEEE double expression both engines);
    the midpoint split is BIGINT epoch-micros arithmetic; only the
    display-rounded psi column involves ln (the tfidf/bm25 precedent:
    sub-ulp libm differences cannot move a 4-decimal rounding).

    Scale shape: one scan -> one global (min/max) aggregate broadcast
    back as scalars -> one map-side-combinable groupBy on the 10
    buckets -> a 10-row window for totals.  Nothing is ever joined on
    event keys; a 100x stream only widens the two scans."""
    t = load_tables(spark, sf_dir, ["events"])
    # NULL measurements carry no distribution information and must not
    # be clamped into a bucket (least(NULL, 9) would silently report
    # every NULL as a top-bucket observation -- r9 review finding)
    ev = t["events"].filter(F.col("value").isNotNull()).select(
        F.unix_micros(F.col("ts")).alias("us"), F.col("value")
    )
    stats = ev.agg(
        F.min("us").alias("us_min"),
        F.max("us").alias("us_max"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("v_min"))
                * _PSI_BUCKETS
                / (F.col("v_max") - F.col("v_min"))
            ),
            F.lit(_PSI_BUCKETS - 1),
        )
        .cast("int")
        .alias("bucket"),
        (F.col("us") <= F.expr("(us_min + us_max) div 2")).alias("__a"),
    )
    counts = binned.groupBy("bucket").agg(
        F.count(F.when(F.col("__a"), 1)).cast("bigint").alias("n_first"),
        F.count(F.when(~F.col("__a"), 1)).cast("bigint").alias("n_second"),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pa = F.greatest(
        F.col("n_first") / F.sum("n_first").over(w), F.lit(_PSI_FLOOR)
    )
    pb = F.greatest(
        F.col("n_second") / F.sum("n_second").over(w), F.lit(_PSI_FLOOR)
    )
    return (
        counts.select(
            "bucket",
            "n_first",
            "n_second",
            F.round((pb - pa) * F.log(pb / pa), 4).alias("psi_contrib"),
        )
        .orderBy("bucket")
    )


ORACLE_PSI_DRIFT = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us, value FROM events WHERE value IS NOT NULL
),
st AS (
  SELECT min(us) AS us_min, max(us) AS us_max,
         min(value) AS v_min, max(value) AS v_max
  FROM ev
),
binned AS (
  SELECT CAST(least(floor((e.value - s.v_min) * {_PSI_BUCKETS}
                          / (s.v_max - s.v_min)),
                    {_PSI_BUCKETS - 1}) AS INTEGER) AS bucket,
         e.us <= (s.us_min + s.us_max) // 2 AS a
  FROM ev e, st s
),
counts AS (
  SELECT bucket,
         CAST(count(CASE WHEN a THEN 1 END) AS BIGINT) AS n_first,
         CAST(count(CASE WHEN NOT a THEN 1 END) AS BIGINT) AS n_second
  FROM binned GROUP BY bucket
)
SELECT bucket, n_first, n_second,
       round((greatest(CAST(n_second AS DOUBLE) / sum(n_second) OVER (), {_PSI_FLOOR})
              - greatest(CAST(n_first AS DOUBLE) / sum(n_first) OVER (), {_PSI_FLOOR}))
             * ln(greatest(CAST(n_second AS DOUBLE) / sum(n_second) OVER (), {_PSI_FLOOR})
                  / greatest(CAST(n_first AS DOUBLE) / sum(n_first) OVER (), {_PSI_FLOOR})), 4)
         AS psi_contrib
FROM counts
ORDER BY bucket
"""
