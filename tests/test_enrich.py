"""Enrichment semantics (reference M:151-233): total_amount math and
its null-propagation quirk, coalesced defaults, time parts, late flag
with an injected clock."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.operators.enrich import (
    ENRICHED_EVENT_COLUMNS,
    transform_and_enrich,
)

from conftest import EVENT_V2_DDL


def make(**overrides):
    base = dict(
        event_id="e1",
        user_id=1,
        session_id=None,
        event_type="purchase",
        product_id=10,
        category=None,
        price=10.0,
        quantity=2,
        user_segment=None,
        search_query="Hello, World!",
        event_time="2024-03-15T10:30:00",
        source_system=None,
    )
    base.update(overrides)
    return tuple(base.values())


def fixed_now():
    # built lazily: Column exprs need an active session
    return F.to_timestamp(F.lit("2024-03-15 10:32:00"))


def enrich_one(spark, **overrides):
    df = spark.createDataFrame([make(**overrides)], schema=EVENT_V2_DDL)
    return transform_and_enrich(df, now=fixed_now()).first()


def test_total_amount_purchase(spark):
    row = enrich_one(spark)
    assert row["total_amount"] == 20.0


def test_total_amount_non_monetary_is_zero(spark):
    row = enrich_one(spark, event_type="view", price=0.0, quantity=0)
    assert row["total_amount"] == 0.0


def test_purchase_null_quantity_propagates_null(spark):
    # Reference quirk (M:198-204 vs 213-215): total computed BEFORE the
    # quantity default, so purchase with NULL quantity -> NULL total.
    row = enrich_one(spark, quantity=None)
    assert row["total_amount"] is None
    assert row["quantity"] == 0  # ...but quantity itself is coalesced


def test_defaults_coalesced(spark):
    row = enrich_one(spark)
    assert row["session_id"] == "unknown"
    assert row["category"] == "unknown"
    assert row["user_segment"] == "unknown"
    assert row["source_system"] == "unknown"


def test_string_cleanup(spark):
    row = enrich_one(spark, event_type="  VIEW  ", price=0.0, quantity=0)
    assert row["event_type"] == "view"
    assert row["search_query"] == "hello world"


def test_time_parts(spark):
    row = enrich_one(spark)
    assert (row["event_year"], row["event_month"], row["event_day"]) == (2024, 3, 15)
    assert row["event_hour"] == 10
    assert row["event_dayofweek"] == 6  # 2024-03-15 is a Friday; Spark Sunday=1


def test_late_arrival_flag(spark):
    on_time = enrich_one(spark)  # event 10:30, now 10:32 -> not late
    assert on_time["is_late_arrival"] is False
    late = enrich_one(spark, event_time="2024-03-15T10:20:00")  # 12 min old
    assert late["is_late_arrival"] is True


def test_output_columns_complete(spark):
    df = transform_and_enrich(
        spark.createDataFrame([make()], schema=EVENT_V2_DDL), now=fixed_now()
    )
    assert set(ENRICHED_EVENT_COLUMNS) <= set(df.columns)
