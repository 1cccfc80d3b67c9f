"""Streaming windowed aggregation + custom stateful operator, driven
end-to-end with the memory sink (availableNow processes all pending
rows synchronously)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.schema.registry import get_registry
from spark_streaming_postgres_lab2_spark.sources.csv_stream import csv_stream
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.operators.enrich import transform_and_enrich
from spark_streaming_postgres_lab2_spark.operators.validate import validate
from spark_streaming_postgres_lab2_spark.streaming.stateful import user_profile_stream
from spark_streaming_postgres_lab2_spark.streaming.windows import (
    session_window_rollup,
    windowed_event_counts,
)

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def event_stream(spark, tmp_path_factory):
    input_dir = tmp_path_factory.mktemp("win_in")
    gen = EventGenerator(seed=5, anomaly_rate=0.0, now=NOW)
    gen.write_csv(gen.generate_batch(200), str(input_dir), "a.csv")
    raw = csv_stream(spark, str(input_dir), get_registry().get_schema(), 10)
    return transform_and_enrich(validate(raw)).filter(F.col("is_valid"))


def run_to_memory(stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_windowed_counts_complete_mode(spark, event_stream):
    name = run_to_memory(
        windowed_event_counts(event_stream), "win_counts", "complete"
    )
    out = spark.sql(f"SELECT * FROM {name}")
    rows = out.collect()
    assert sum(r["event_count"] for r in rows) == 200
    for r in rows:
        assert r["window_start"] < r["window_end"]
        assert r["approx_unique_users"] >= 1


def test_session_window_rollup(spark, event_stream):
    name = run_to_memory(
        session_window_rollup(event_stream), "sess_win", "complete"
    )
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sum(r["event_count"] for r in rows) == 200
    # all events are generated inside one 30-min gap -> one session per user
    users = [r["user_id"] for r in rows]
    assert len(users) == len(set(users))


def test_stateful_user_profiles(spark, event_stream):
    name = run_to_memory(user_profile_stream(event_stream), "profiles", "update")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert sum(r["total_events"] for r in rows) == 200
    for r in rows:
        assert 1 <= r["distinct_event_types"] <= 6
        assert r["total_spent"] >= 0.0
