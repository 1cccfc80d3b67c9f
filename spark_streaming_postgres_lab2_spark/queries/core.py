"""Core query inventory: the reference's analytics surface (SURVEY §2
A4-A8, P5, T2, F1-F9, schema migration) mapped onto the driver fixture
tables, plus TPC-H-style join/aggregation queries that exercise the
same operators at scale.

Every query is declarative DataFrame/SQL -- Catalyst handles pushdown,
partial aggregation, and join strategy.  Small dimensions (part,
customer, query vectors) are explicitly broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.sessions import with_session_ids
from ..operators.dedup import dedup_exact
from ..operators.validate import (
    build_error_column,
    ecommerce_rules,
    events_table_rules,
    validate,
)
from ..schema.registry import SchemaRegistry
from ..sources.tables import load_tables
from . import QuerySpec

# Money sums over big facts: per-row double arithmetic is bit-identical
# across engines, but SUM accumulation order is not -- at 1e7+ magnitudes
# the ~1e-8 difference crosses rounding boundaries (and DuckDB's parallel
# aggregation makes its own order run-dependent).  Even DECIMAL casts
# differ: the engines disagree on double->decimal conversion near the
# last digit and on decimal tie-breaking.  The only fully deterministic
# recipe is explicit fixed-point: floor(x*10000 + 0.5) is the same
# double math and the same integer on both engines, the BIGINT sum is
# exact and order-free, and /10000.0 reproduces identical doubles.


def money_sum(expr) -> "F.Column":  # noqa: F821
    return (F.sum(F.floor(expr * 10000 + F.lit(0.5)).cast("long")) / F.lit(10000.0)).cast(
        "double"
    )


def sql_money_sum(expr: str, alias: str) -> str:
    return (
        f"CAST(sum(CAST(floor(({expr}) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0"
        f" AS {alias}"
    )


# The first-match-wins rule chain as SQL, identical in order and tags to
# operators/validate.events_table_rules (parity: reference
# spark_streaming_to_postgres.py:99-144).
_ERROR_CASE_SQL = """
    CASE
      WHEN event_id IS NULL THEN 'null_event_id'
      WHEN event_type IS NULL THEN 'null_event_type'
      WHEN event_type NOT IN ('view','click','purchase','signup','error')
        THEN 'invalid_event_type'
      WHEN event_type = 'purchase' AND user_id IS NULL THEN 'missing_user_for_purchase'
      WHEN value < 0.0 THEN 'negative_value'
      WHEN value > 10000.0 THEN 'extreme_value'
    END
"""


# --- A4: hourly event summary ------------------------------------------------


def _hourly_summary(events: DataFrame) -> DataFrame:
    """hour bucket x event_type with count / distinct users / revenue,
    over an already-loaded events frame (shared by the parquet and
    format-round-trip variants)."""
    return (
        events
        .groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def q_hourly_event_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_hourly_event_summary (reference postgres_setup.sql:101-110):
    hour bucket x event_type with count / distinct users / revenue."""
    t = load_tables(spark, sf_dir, ["events"])
    return _hourly_summary(t["events"])


def q_hourly_event_summary_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship hourly rollup over a CSV ROUND-TRIP of the events
    fixture (VERDICT r13 item 6: the non-parquet formats path needs
    driver-grade evidence, not just round-trip unit tests).  The
    events table -- micro-precision timestamps, NULLs, an embedded-JSON
    string column -- is written to CSV with the engine's explicit
    dialect (sources/formats.py: RFC-4180 doubled quotes, micros
    timestamp format, sentinel-free NULL encoding) and read back with
    the authoritative schema; the oracle is UNCHANGED from
    hourly_event_summary, so a hash match proves the storage layer is
    transparent to the operator surface.

    Scale shape: one distributed write + one distributed read, both
    splittable (no multiLine), no driver collect; at 100 TB this is
    exactly how a text-format corpus enters the engine -- schema
    pinned, no inference pass over the data."""
    import hashlib
    import os
    import stat
    import tempfile

    from ..sources.formats import read_table, write_table

    t = load_tables(spark, sf_dir, ["events"])
    events = t["events"]
    # scratch path keyed by sf_dir ONLY: mode("overwrite") keeps it
    # fresh per run and bounds the residue to one events-CSV per
    # fixture dir (a per-pid key accumulated one full copy per
    # process with nothing ever reclaiming them -- r14 review
    # finding).  Single-writer assumption: the driver, parity sweep,
    # and bench each run queries sequentially; concurrent
    # same-fixture invocations of THIS query from separate processes
    # are outside the supported harness flows.
    # The scratch ROOT is keyed per-uid and verified 0700-owned-by-us
    # before Spark touches it, so another local user cannot squat the
    # fixed /tmp name with a symlink or a dir we would then write
    # into (r15 review finding).
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_formats_{os.getuid()}"
    )
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.lstat(root)
    if not stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
        raise RuntimeError(
            f"scratch root {root} is not a directory owned by uid "
            f"{os.getuid()} -- refusing to write through it"
        )
    os.chmod(root, 0o700)
    dest = os.path.join(
        root,
        hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12],
        "events_csv",
    )
    write_table(events, dest, "csv")
    back = read_table(spark, dest, "csv", events.schema)
    return _hourly_summary(back)


ORACLE_HOURLY = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       event_type,
       count(*) AS event_count,
       count(DISTINCT user_id) AS unique_users,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


# --- A5: per-user activity rollup -------------------------------------------


def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_user_sessions semantics (postgres_setup.sql:113-125) on the
    events fixture: conditional counts + min/max event time per user."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("view_count"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.unix_micros(F.min("ts")).alias("first_event_us"),
            F.unix_micros(F.max("ts")).alias("last_event_us"),
        )
    )


ORACLE_USER_ACTIVITY = """
SELECT user_id,
       count(*) AS event_count,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view_count,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_count,
       round(sum(value), 2) AS total_value,
       epoch_us(min(ts)) AS first_event_us,
       epoch_us(max(ts)) AS last_event_us
FROM events
GROUP BY user_id
"""


# --- A6 + J1: category performance via broadcast dimension join -------------


def q_category_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_category_performance (postgres_setup.sql:128-137) +
    the dimension-enrichment join the reference precomputes at datagen
    time (J1, data_generator.py:73-78): lineitem x broadcast(part)
    grouped by part type."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("return_count"),
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            ),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail_price"),
        )
    )


ORACLE_CATEGORY_PERF = f"""
SELECT p_type,
       count(*) AS line_count,
       count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS return_count,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "total_revenue")},
       round(avg(p_retailprice), 2) AS avg_retail_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
"""


# --- A7: data-quality hourly rollup over the trailing 24 h ------------------


def q_quality_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_data_quality_summary semantics (postgres_setup.sql:140-151):
    trailing-24h filter (anchored to max(ts), not wall clock, for
    determinism) + hourly validity rollup from the validation chain."""
    t = load_tables(spark, sf_dir, ["events"])
    events = validate(t["events"], events_table_rules())
    anchor = events.agg(F.max("ts").alias("__max_ts"))
    return (
        events.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("__max_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy(F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"))
        .agg(
            F.count(F.lit(1)).alias("total_rows"),
            F.count(F.when(F.col("is_valid"), 1)).alias("valid_rows"),
            F.count(F.when(~F.col("is_valid"), 1)).alias("invalid_rows"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
    )


ORACLE_QUALITY_HOURLY = f"""
WITH v AS (
  SELECT *, {_ERROR_CASE_SQL} AS validation_errors FROM events
)
SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
       count(*) AS total_rows,
       count(CASE WHEN validation_errors IS NULL THEN 1 END) AS valid_rows,
       count(CASE WHEN validation_errors IS NOT NULL THEN 1 END) AS invalid_rows,
       round(avg(value), 2) AS avg_value
FROM v
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
GROUP BY 1
"""


# --- A8: ad-hoc distribution + scalar-count union ---------------------------


def q_event_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README ad-hoc analytics (README.md:368-383): per-type counts,
    rounded revenue, value extremes."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 2).alias("avg_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
    )


ORACLE_EVENT_DIST = """
SELECT event_type,
       count(*) AS event_count,
       round(sum(value), 2) AS total_value,
       round(avg(value), 2) AS avg_value,
       round(min(value), 2) AS min_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
"""


def q_table_counts_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README verification query (docs/user_guide.md:248-250): UNION ALL
    of two labelled scalar counts (valid vs dead-letter split)."""
    t = load_tables(spark, sf_dir, ["events"])
    events = validate(t["events"], events_table_rules())
    valid = events.filter(F.col("is_valid")).agg(F.count(F.lit(1)).alias("row_count")).withColumn(
        "table_name", F.lit("valid_events")
    )
    dlq = events.filter(~F.col("is_valid")).agg(F.count(F.lit(1)).alias("row_count")).withColumn(
        "table_name", F.lit("dead_letter_events")
    )
    return valid.unionByName(dlq).select("table_name", "row_count")


ORACLE_TABLE_COUNTS = f"""
WITH v AS (SELECT {_ERROR_CASE_SQL} AS e FROM events)
SELECT 'valid_events' AS table_name, count(CASE WHEN e IS NULL THEN 1 END) AS row_count FROM v
UNION ALL
SELECT 'dead_letter_events' AS table_name, count(CASE WHEN e IS NOT NULL THEN 1 END) AS row_count FROM v
"""


# --- P5/P6: validation rule chain -------------------------------------------


def q_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins rule-chain tags (reference M:99-144) rolled up
    by tag."""
    t = load_tables(spark, sf_dir, ["events"])
    tagged = t["events"].withColumn(
        "validation_errors", build_error_column(events_table_rules())
    )
    return (
        tagged.groupBy(F.coalesce(F.col("validation_errors"), F.lit("ok")).alias("error_tag"))
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLE_VALIDATION = f"""
SELECT coalesce({_ERROR_CASE_SQL}, 'ok') AS error_tag,
       count(*) AS row_count,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1
"""


# --- T6/P5: dead-letter breakdown with the reference tag vocabulary ----------


def q_dlq_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter rows grouped by the reference's exact 12-tag
    vocabulary (spark_streaming_to_postgres.py:103-135), incl. the four
    per-event-type ``*_without_user`` tags.

    The driver fixture is anomaly-free, so the projection
    deterministically perturbs rows into every reference failure mode
    keyed on ``event_id % 23``; the perturbation is the same arithmetic
    in both engines, so the oracle pins tag-level parity (the trap
    SURVEY.md names: consumers key dashboards/alerts off these exact
    strings)."""
    t = load_tables(spark, sf_dir, ["events"])
    m = F.col("event_id") % 23
    mapped_type = (
        F.when(F.col("event_type") == "click", F.lit("add_to_cart"))
        .when(F.col("event_type") == "signup", F.lit("wishlist"))
        .when(F.col("event_type") == "error", F.lit("remove_from_cart"))
        .otherwise(F.col("event_type"))
    )
    proj = t["events"].select(
        F.when(m == 0, F.lit(None).cast("long"))
        .otherwise(F.col("event_id"))
        .alias("event_id"),
        F.when(m == 1, F.lit(None).cast("long"))
        .otherwise(F.get_json_object("props", "$.k").cast("long"))
        .alias("product_id"),
        F.when(m == 2, F.lit(None).cast("string"))
        .when(m == 3, F.lit("bogus"))
        .otherwise(mapped_type)
        .alias("event_type"),
        F.when((m >= 4) & (m <= 7), F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        F.when(m == 8, F.lit(-5.0))
        .when(m == 9, F.lit(20000.0))
        .when(m == 10, F.lit(0.0))
        .otherwise(F.col("value"))
        .alias("price"),
    )
    dead = validate(proj, ecommerce_rules()).filter(~F.col("is_valid"))
    return dead.groupBy(F.col("validation_errors").alias("error_tag")).agg(
        F.count(F.lit(1)).alias("dead_letter_count")
    )


ORACLE_DLQ_BREAKDOWN = """
WITH proj AS (
  SELECT
    CASE WHEN event_id % 23 = 0 THEN NULL ELSE event_id END AS p_event_id,
    CASE WHEN event_id % 23 = 1 THEN NULL
         ELSE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END AS product_id,
    CASE WHEN event_id % 23 = 2 THEN NULL
         WHEN event_id % 23 = 3 THEN 'bogus'
         ELSE CASE event_type WHEN 'click' THEN 'add_to_cart'
                              WHEN 'signup' THEN 'wishlist'
                              WHEN 'error' THEN 'remove_from_cart'
                              ELSE event_type END
    END AS p_event_type,
    CASE WHEN event_id % 23 BETWEEN 4 AND 7 THEN NULL ELSE user_id END AS p_user_id,
    CASE WHEN event_id % 23 = 8 THEN -5.0
         WHEN event_id % 23 = 9 THEN 20000.0
         WHEN event_id % 23 = 10 THEN 0.0
         ELSE value END AS price
  FROM events
), tagged AS (
  SELECT CASE
    WHEN p_event_id IS NULL THEN 'null_event_id'
    WHEN product_id IS NULL THEN 'null_product_id'
    WHEN p_event_type IS NULL THEN 'null_event_type'
    WHEN p_event_type NOT IN
      ('view','purchase','add_to_cart','remove_from_cart','wishlist','search')
      THEN 'invalid_event_type'
    WHEN p_event_type = 'purchase' AND p_user_id IS NULL THEN 'purchase_without_user'
    WHEN p_event_type = 'add_to_cart' AND p_user_id IS NULL THEN 'cart_without_user'
    WHEN p_event_type = 'wishlist' AND p_user_id IS NULL THEN 'wishlist_without_user'
    WHEN p_event_type = 'remove_from_cart' AND p_user_id IS NULL
      THEN 'remove_cart_without_user'
    WHEN price < 0.0 THEN 'negative_price'
    WHEN price > 10000.0 THEN 'extreme_price'
    WHEN p_event_type = 'purchase' AND price <= 0 THEN 'purchase_zero_price'
    WHEN p_event_type <> 'purchase' AND p_event_type <> 'add_to_cart' AND price > 0
      THEN 'non_purchase_has_price'
  END AS error_tag
  FROM proj
)
SELECT error_tag, count(*) AS dead_letter_count
FROM tagged WHERE error_tag IS NOT NULL
GROUP BY 1
"""


# --- F1-F9: full enrichment chain, row level --------------------------------


def q_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level enrichment parity (reference M:151-233): validation
    tag, time parts (year/month/day/hour/dayofweek, Spark Sunday=1),
    monetary total for purchase events."""
    t = load_tables(spark, sf_dir, ["events"])
    e = t["events"].withColumn(
        "validation_errors", build_error_column(events_table_rules())
    )
    return e.select(
        "event_id",
        F.col("event_type"),
        F.col("validation_errors"),
        F.col("validation_errors").isNull().alias("is_valid"),
        F.year("ts").alias("event_year"),
        F.month("ts").alias("event_month"),
        F.dayofmonth("ts").alias("event_day"),
        F.hour("ts").alias("event_hour"),
        F.dayofweek("ts").alias("event_dayofweek"),
        F.round(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0), 2
        ).alias("monetary_value"),
    )


ORACLE_ENRICHED = f"""
SELECT event_id,
       event_type,
       {_ERROR_CASE_SQL} AS validation_errors,
       ({_ERROR_CASE_SQL}) IS NULL AS is_valid,
       CAST(year(ts) AS INTEGER) AS event_year,
       CAST(month(ts) AS INTEGER) AS event_month,
       CAST(day(ts) AS INTEGER) AS event_day,
       CAST(hour(ts) AS INTEGER) AS event_hour,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS event_dayofweek,
       round(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END, 2) AS monetary_value
FROM events
"""


# --- T2: exact dedup ---------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-style exact dedup (reference M:324-329, made live):
    duplicate the stream, dropDuplicates on the key, aggregate.  The
    dedup is a hash shuffle on event_id with map-side partial dedup."""
    t = load_tables(spark, sf_dir, ["events"])
    doubled = t["events"].unionByName(t["events"])
    # full-row distinct matches the oracle's SELECT DISTINCT * exactly;
    # key-based dropDuplicates would keep an engine-chosen row if an
    # event_id ever repeated with different payloads
    deduped = dedup_exact(doubled)
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("deduped_rows"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


ORACLE_DEDUP = """
SELECT event_type,
       count(*) AS deduped_rows,
       round(sum(value), 2) AS total_value
FROM (
  SELECT DISTINCT * FROM (
    SELECT * FROM events UNION ALL SELECT * FROM events
  )
)
GROUP BY event_type
"""


# --- F5/T5: late-arrival flagging -------------------------------------------


def q_late_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_late_arrival flag-and-count (reference M:206-210, 258),
    anchored to max(ts) - 7 days instead of wall-clock now for
    determinism."""
    t = load_tables(spark, sf_dir, ["events"])
    anchor = t["events"].agg(F.max("ts").alias("__max_ts"))
    return (
        t["events"]
        .crossJoin(F.broadcast(anchor))
        .withColumn(
            "is_late_arrival",
            F.col("ts") < F.col("__max_ts") - F.expr("INTERVAL 7 DAYS"),
        )
        .groupBy("is_late_arrival")
        .agg(F.count(F.lit(1)).alias("row_count"))
    )


ORACLE_LATE = """
SELECT ts < (SELECT max(ts) FROM events) - INTERVAL 7 DAYS AS is_late_arrival,
       count(*) AS row_count
FROM events
GROUP BY 1
"""


# --- Schema registry migration ----------------------------------------------


def q_schema_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry migrate() parity (reference registry.py:190-247): a
    v1-shaped projection of events auto-fills v2's added fields with
    type-based defaults and reorders to target field order."""
    t = load_tables(spark, sf_dir, ["events"])
    reg = SchemaRegistry()
    reg.register(
        "ev1",
        T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("event_type", T.StringType(), False),
            ]
        ),
    )
    reg.register(
        "ev2",
        T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("ts", T.TimestampType(), False),
                T.StructField("event_type", T.StringType(), False),
                T.StructField("user_id", T.LongType(), True),
                T.StructField("value", T.DoubleType(), False),
                T.StructField("props", T.StringType(), True),
            ]
        ),
    )
    v1_df = t["events"].select("event_id", "ts", "event_type")
    migrated = reg.migrate(v1_df, "ev1", "ev2")
    return migrated.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "user_id",
        "value",
        "props",
    )


ORACLE_MIGRATION = """
SELECT event_id,
       epoch_us(ts) AS ts_us,
       event_type,
       CAST(NULL AS BIGINT) AS user_id,
       CAST(0.0 AS DOUBLE) AS value,
       CAST(NULL AS VARCHAR) AS props
FROM events
"""


# --- Sessionization (window functions; SURVEY §2.4 A5 streaming flavor) -----


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap
    from the previous event exceeds 30 minutes (lag window + flag-sum).
    Batch analog of streaming session_window; the reference precomputes
    sessions at datagen time with the same 30-min bucket rule
    (data_generator.py:81-88)."""
    t = load_tables(spark, sf_dir, ["events"])
    flagged = with_session_ids(t["events"])
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum("__new").cast("bigint").alias("session_count"),
    )


ORACLE_SESSIONS = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*) AS event_count,
       CAST(sum(new_session) AS BIGINT) AS session_count
FROM flagged
GROUP BY user_id
"""


# --- TPC-H-style scale queries ----------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-heavy grouped aggregation with
    full map-side partial agg; the shape of A4/A6 at 100 TB."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {sql_money_sum("l_extendedprice", "sum_base_price")},
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {sql_money_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join, filter, grouped revenue, top-10 with
    a deterministic tiebreak.  customer is broadcast (small dim);
    orders x lineitem shuffle on the join key."""
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = f"""
SELECT c_custkey, c_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 5-way star join (region/nation broadcast) with
    grouped revenue per nation."""
    t = load_tables(spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem"])
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


ORACLE_REGIONAL = f"""
SELECT r_name, n_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: left-semi join (EXISTS) from orders into
    lineitem with a correlated condition, then grouped counts."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    li = t["lineitem"]
    return (
        t["orders"]
        .join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue: pure scan + conjunctive pushdown
    filter + single global agg -- the minimal full-scan shape."""
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("line_count"),
    )


ORACLE_TPCH_Q6 = f"""
SELECT {sql_money_sum("l_extendedprice * l_discount", "revenue")},
       count(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, same-frame flavor (operators/asof.asof_join_window):
    attribute each purchase to the user's most recent prior view.
    Rolled up per user: purchases, attributed purchases, attribution
    lag stats."""
    from ..operators.asof import asof_join_window

    t = load_tables(spark, sf_dir, ["events"])
    attributed = asof_join_window(
        t["events"],
        key="user_id",
        ts_col="ts",
        value_col="ts",
        mark_col=F.col("event_type") == "view",
        out_col="last_view_ts",
        tiebreak_cols=["event_id"],  # total order even under ts ties
    ).filter(F.col("event_type") == "purchase")
    return attributed.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("purchases"),
        F.count("last_view_ts").alias("attributed_purchases"),
        F.round(
            F.avg(
                (F.unix_micros("ts") - F.unix_micros("last_view_ts")) / 1_000_000.0
            ),
            2,
        ).alias("avg_lag_seconds"),
    )


ORACLE_ATTRIBUTION = """
WITH attributed AS (
  SELECT user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM events
)
SELECT user_id,
       count(*) AS purchases,
       count(last_view_ts) AS attributed_purchases,
       round(avg((epoch_us(ts) - epoch_us(last_view_ts)) / 1000000.0), 2) AS avg_lag_seconds
FROM attributed
WHERE event_type = 'purchase'
GROUP BY user_id
"""


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17/Q2 shape): orders priced
    above their priority class's average.  Catalyst rewrites the
    correlation into an aggregate + join -- exercised via spark.sql."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS above_avg_orders,
               round(avg(o_totalprice), 2) AS avg_above_price
        FROM orders o
        WHERE o_totalprice > (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_orderpriority = o.o_orderpriority
        )
        GROUP BY o_orderpriority
        """
    )


ORACLE_ABOVE_AVG = """
SELECT o_orderpriority,
       count(*) AS above_avg_orders,
       round(avg(o_totalprice), 2) AS avg_above_price
FROM orders o
WHERE o_totalprice > (
    SELECT avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_orderpriority = o.o_orderpriority
)
GROUP BY o_orderpriority
"""


def q_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: customer-nation x supplier-nation trade volume
    (two independent dimension lineages off the same fact rows)."""
    t = load_tables(spark, sf_dir, ["nation", "customer", "supplier", "orders", "lineitem"])
    cust_nation = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


ORACLE_NATION_PAIRS = f"""
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "volume")},
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name < sn.n_name
GROUP BY 1, 2
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders since 2000,
    per market segment (TPC-H Q22 shape)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    recent = t["orders"].filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return (
        t["customer"]
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("idle_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


ORACLE_NO_ORDERS = """
SELECT c_mktsegment,
       count(*) AS idle_customers,
       round(sum(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
GROUP BY c_mktsegment
"""


# --- Pivot / rollup / per-group top-k (wider OLAP surface) ------------------


def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: hour-of-day x event_type value matrix (absent cells NULL,
    matching SQL conditional-aggregation semantics)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy(F.hour("ts").alias("hour_of_day"))
        .pivot("event_type", ["view", "click", "purchase", "signup", "error"])
        .agg(F.round(F.sum("value"), 2))
    )


ORACLE_EVENT_PIVOT = """
SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
       round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
       round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error
FROM events
GROUP BY 1
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over the region/nation hierarchy, via the
    Spark SQL API (temp views + spark.sql -- same Catalyst plan as the
    DataFrame flavor)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir, ["region", "nation", "customer", "orders", "lineitem"])
    return spark.sql(
        f"""
        SELECT r_name, n_name,
               CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               count(*) AS line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        """
    )


ORACLE_ROLLUP = f"""
SELECT r_name, n_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")},
       count(*) AS line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: every (event_type, year) subtotal combination
    in one pass (4 grouping sets materialized from a single scan)."""
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .cube("event_type", F.year("ts").alias("event_year"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ORACLE_CUBE = """
SELECT event_type,
       CAST(year(ts) AS INTEGER) AS event_year,
       count(*) AS event_count,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE(event_type, year(ts))
"""


def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: top-3 revenue parts per brand via a ranking
    window (partition prune -> shuffle once on p_brand)."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    joined = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "p_partkey", "revenue", "rank")
    )


ORACLE_TOP_PARTS = f"""
WITH per_part AS (
  SELECT p_brand, p_partkey,
         {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
)
SELECT p_brand, p_partkey, revenue,
       CAST(row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS INTEGER) AS rank
FROM per_part
QUALIFY rank <= 3
"""


def q_event_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack): per-type value sums melted back into
    (event_type, total_value) rows -- the inverse of q_event_pivot."""
    t = load_tables(spark, sf_dir, ["events"])
    wide = (
        t["events"]
        .groupBy(F.hour("ts").alias("hour_of_day"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.round(F.sum("value"), 2))
    )
    return wide.selectExpr(
        "hour_of_day",
        "stack(3, 'view', view, 'click', click, 'purchase', purchase) "
        "AS (event_type, total_value)",
    )


ORACLE_UNPIVOT = """
WITH wide AS (
  SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
         round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
         round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
         round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase
  FROM events GROUP BY 1
)
SELECT hour_of_day, 'view' AS event_type, view AS total_value FROM wide
UNION ALL SELECT hour_of_day, 'click', click FROM wide
UNION ALL SELECT hour_of_day, 'purchase', purchase FROM wide
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event_type (Spark
    ``percentile`` == DuckDB ``quantile_cont`` semantics).  The
    approximate twin (percentile_approx / HLL-style sketches) is the
    streaming-side mapping and is not oracle-comparable."""
    t = load_tables(spark, sf_dir, ["events"])
    return t["events"].groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


ORACLE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
"""


def q_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance and correlation of
    value with the JSON k property, per event_type."""
    t = load_tables(spark, sf_dir, ["events"])
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return (
        t["events"]
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
            F.round(F.var_samp("value"), 4).alias("value_var"),
            F.round(F.corr("value", "k"), 4).alias("value_k_corr"),
        )
    )


ORACLE_VALUE_STATS = """
SELECT event_type,
       round(stddev_samp(value), 4) AS value_stddev,
       round(var_samp(value), 4) AS value_var,
       round(corr(value, TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS value_k_corr
FROM events
GROUP BY event_type
"""


def q_user_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event sequences: collect -> sort -> slice ->
    transform -> join into a path string.  collect_list alone is
    shuffle-order-nondeterministic; sorting the collected structs makes
    the result total-ordered and oracle-comparable."""
    t = load_tables(spark, sf_dir, ["events"])
    collected = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("__seq")
        )
    )
    first10 = F.slice(F.col("__seq"), 1, 10)
    return collected.select(
        "user_id",
        F.concat_ws("->", F.transform(first10, lambda s: s["event_type"])).alias(
            "first_10_events"
        ),
        F.size("__seq").alias("total_events"),
    )


ORACLE_EVENT_PATHS = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS total_events
  FROM events
)
SELECT user_id,
       string_agg(CASE WHEN rn <= 10 THEN event_type END, '->' ORDER BY rn) AS first_10_events,
       CAST(any_value(total_events) AS INTEGER) AS total_events
FROM ranked
GROUP BY user_id
"""


def q_order_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: per order-month, ship latency stats
    (datediff), month boundaries (trunc/last_day)."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    joined = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    return (
        joined.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("__m"))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            F.round(
                F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 2
            ).alias("avg_ship_days"),
            F.max(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))).alias(
                "max_ship_days"
            ),
        )
        .select(
            F.unix_micros(F.col("__m")).alias("order_month_us"),
            F.unix_micros(F.to_timestamp(F.last_day(F.col("__m")))).alias(
                "month_end_us"
            ),
            "line_count",
            "avg_ship_days",
            "max_ship_days",
        )
    )


ORACLE_DATE_MATH = """
SELECT epoch_us(date_trunc('month', o_orderdate)) AS order_month_us,
       epoch_us(CAST(last_day(date_trunc('month', o_orderdate)) AS TIMESTAMP)) AS month_end_us,
       count(*) AS line_count,
       round(avg(date_diff('day', o_orderdate, l_shipdate)), 2) AS avg_ship_days,
       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS INTEGER) AS max_ship_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec("hourly_event_summary", q_hourly_event_summary, ORACLE_HOURLY,
                  "A4: hour x type rollup with distinct users"),
        QuerySpec("hourly_event_summary_csv", q_hourly_event_summary_csv,
                  ORACLE_HOURLY,
                  "A4 over a CSV round-trip of events: driver-grade "
                  "evidence for the non-parquet formats path"),
        QuerySpec("user_activity", q_user_activity, ORACLE_USER_ACTIVITY,
                  "A5: per-user conditional counts + first/last event"),
        QuerySpec("category_performance", q_category_performance, ORACLE_CATEGORY_PERF,
                  "A6+J1: broadcast dim join + grouped revenue"),
        QuerySpec("quality_hourly", q_quality_hourly, ORACLE_QUALITY_HOURLY,
                  "A7: trailing-24h hourly validity rollup"),
        QuerySpec("event_distribution", q_event_distribution, ORACLE_EVENT_DIST,
                  "A8: per-type distribution"),
        QuerySpec("table_counts_union", q_table_counts_union, ORACLE_TABLE_COUNTS,
                  "A8: UNION ALL of labelled scalar counts"),
        QuerySpec("validation_summary", q_validation_summary, ORACLE_VALIDATION,
                  "P5: first-match-wins rule-chain tag rollup"),
        QuerySpec("dlq_breakdown", q_dlq_breakdown, ORACLE_DLQ_BREAKDOWN,
                  "T6/P5: dead-letter counts by exact reference tag vocabulary"),
        QuerySpec("enriched_events", q_enriched_events, ORACLE_ENRICHED,
                  "F1-F9: row-level enrichment parity"),
        QuerySpec("dedup_exact", q_dedup_exact, ORACLE_DEDUP,
                  "T2: exact dedup by key after stream duplication"),
        QuerySpec("late_arrivals", q_late_arrivals, ORACLE_LATE,
                  "F5/T5: late-arrival flag + count"),
        QuerySpec("schema_migration", q_schema_migration, ORACLE_MIGRATION,
                  "R: registry migrate with type-based defaults"),
        QuerySpec("sessionization", q_sessionization, ORACLE_SESSIONS,
                  "gap-based sessionization via window functions"),
        QuerySpec("tpch_q1", q_tpch_q1, ORACLE_TPCH_Q1,
                  "TPC-H Q1 pricing summary"),
        QuerySpec("top_customers", q_top_customers, ORACLE_TOP_CUSTOMERS,
                  "TPC-H Q3-shaped top-k revenue"),
        QuerySpec("regional_revenue", q_regional_revenue, ORACLE_REGIONAL,
                  "TPC-H Q5-shaped star join"),
        QuerySpec("order_priority", q_order_priority, ORACLE_ORDER_PRIORITY,
                  "TPC-H Q4-shaped semi join"),
        QuerySpec("tpch_q6", q_tpch_q6, ORACLE_TPCH_Q6,
                  "TPC-H Q6 scan + conjunctive pushdown + global agg"),
        QuerySpec("purchase_attribution", q_purchase_attribution, ORACLE_ATTRIBUTION,
                  "as-of join (window flavor): last view before purchase"),
        QuerySpec("event_pivot", q_event_pivot, ORACLE_EVENT_PIVOT,
                  "pivot: hour x event_type value matrix"),
        QuerySpec("rollup_revenue", q_rollup_revenue, ORACLE_ROLLUP,
                  "ROLLUP grouping sets via spark.sql"),
        QuerySpec("top_parts_per_brand", q_top_parts_per_brand, ORACLE_TOP_PARTS,
                  "per-group top-k via ranking window"),
        QuerySpec("cube_events", q_cube_events, ORACLE_CUBE,
                  "CUBE grouping sets over (type, year)"),
        QuerySpec("above_avg_orders", q_above_avg_orders, ORACLE_ABOVE_AVG,
                  "correlated scalar subquery (rewritten to join)"),
        QuerySpec("nation_pairs", q_nation_pairs, ORACLE_NATION_PAIRS,
                  "TPC-H Q7-shaped dual-dimension volume"),
        QuerySpec("customers_without_orders", q_customers_without_orders, ORACLE_NO_ORDERS,
                  "anti join (NOT EXISTS) per segment"),
        QuerySpec("event_unpivot", q_event_unpivot, ORACLE_UNPIVOT,
                  "unpivot via stack (inverse of event_pivot)"),
        QuerySpec("value_percentiles", q_value_percentiles, ORACLE_PERCENTILES,
                  "exact interpolated percentiles per type"),
        QuerySpec("value_stats", q_value_stats, ORACLE_VALUE_STATS,
                  "stddev/variance/correlation aggregates"),
        QuerySpec("user_event_paths", q_user_event_paths, ORACLE_EVENT_PATHS,
                  "ordered sequence aggregation (collect/sort/slice)"),
        QuerySpec("order_date_math", q_order_date_math, ORACLE_DATE_MATH,
                  "date arithmetic: ship-latency stats per month"),
    ]
