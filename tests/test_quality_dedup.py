"""Single-pass quality metrics + dedup operators."""

from __future__ import annotations

from pyspark.sql import Row

from spark_streaming_postgres_lab2_spark.operators.dedup import (
    dedup_counts,
    dedup_exact,
    dedup_keep_first,
)
from spark_streaming_postgres_lab2_spark.operators.quality import (
    calculate_quality_metrics,
)
from spark_streaming_postgres_lab2_spark.operators.validate import validate


def events_df(spark):
    rows = [
        Row(event_id="a", user_id=1, event_type="view", product_id=1, price=0.0,
            quantity=0, session_id="s", category="books", user_segment="new",
            search_query="", event_time="2024-01-01T00:00:00", source_system="web"),
        Row(event_id="b", user_id=None, event_type="purchase", product_id=2, price=5.0,
            quantity=1, session_id=None, category=None, user_segment=None,
            search_query="", event_time="2024-01-01T00:01:00", source_system="web"),
        Row(event_id="c", user_id=2, event_type="view", product_id=3, price=-1.0,
            quantity=0, session_id="s", category="books", user_segment="new",
            search_query="", event_time="2024-01-01T00:02:00", source_system="web"),
    ]
    return spark.createDataFrame(rows)


def test_quality_metrics_single_pass(spark):
    m = calculate_quality_metrics(validate(events_df(spark)), batch_id=7)
    assert m.batch_id == 7
    assert m.total_rows == 3
    assert m.valid_rows == 1
    assert m.invalid_rows == 2
    assert m.null_counts["user_id"] == 1
    assert m.event_type_distribution == {"view": 2, "purchase": 1}
    assert m.error_distribution == {
        "purchase_without_user": 1,
        "negative_price": 1,
    }
    assert abs(m.validity_rate - 1 / 3) < 1e-9


def test_quality_metrics_empty(spark):
    df = validate(events_df(spark)).filter("event_id = 'zzz'")
    m = calculate_quality_metrics(df, batch_id=1)
    assert m.total_rows == 0 and m.validity_rate == 1.0


def test_dedup_exact_by_key(spark):
    df = events_df(spark)
    doubled = df.unionByName(df)
    assert dedup_exact(doubled, ["event_id"]).count() == 3
    assert dedup_exact(doubled).count() == 3  # full-row distinct


def test_dedup_keep_first_deterministic(spark):
    rows = [
        Row(k="a", ts=2, v="late"),
        Row(k="a", ts=1, v="early"),
        Row(k="b", ts=5, v="only"),
    ]
    df = spark.createDataFrame(rows)
    out = {r["k"]: r["v"] for r in dedup_keep_first(df, ["k"], ["ts"]).collect()}
    assert out == {"a": "early", "b": "only"}


def test_dedup_counts(spark):
    df = events_df(spark)
    doubled = df.unionByName(df)
    rows = {r["event_type"]: r for r in dedup_counts(doubled).collect()}
    assert rows["view"]["total_rows"] == 4
    assert rows["view"]["unique_events"] == 2
