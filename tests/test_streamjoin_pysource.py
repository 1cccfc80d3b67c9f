"""Stream-stream interval join + custom Python DataSource."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.operators.enrich import transform_and_enrich
from spark_streaming_postgres_lab2_spark.operators.validate import validate
from spark_streaming_postgres_lab2_spark.schema.registry import get_registry
from spark_streaming_postgres_lab2_spark.sources.csv_stream import csv_stream
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.sources.pydatasource import register
from spark_streaming_postgres_lab2_spark.streaming.joins import (
    purchases_with_recent_views,
)

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


def test_stream_stream_interval_join(spark, tmp_path):
    gen = EventGenerator(seed=23, anomaly_rate=0.0, late_rate=0.5, now=NOW)
    gen.write_csv(gen.generate_batch(300), str(tmp_path / "in"), "a.csv")
    stream = transform_and_enrich(
        validate(csv_stream(spark, str(tmp_path / "in"), get_registry().get_schema(), 10))
    ).filter(F.col("is_valid"))
    joined = purchases_with_recent_views(stream, lookback="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM ssj").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["view_time"] <= r["purchase_time"]
    # every joined pair belongs to one user's own history
    batch = spark.read.option("header", True).csv(str(tmp_path / "in"))
    purchasers = {
        int(r["user_id"]) for r in batch.filter("event_type = 'purchase'").collect()
    }
    assert {r["user_id"] for r in rows} <= purchasers


def test_pydatasource_batch(spark):
    register(spark)
    df = spark.read.format("events_gen").option("rows", 400).option("partitions", 4).load()
    assert df.count() == 400
    assert df.rdd.getNumPartitions() == 4
    assert set(df.columns) >= {"event_id", "event_type", "price", "event_time"}
    # deterministic under seed
    df2 = spark.read.format("events_gen").option("rows", 400).option("partitions", 4).load()
    assert sorted(r["event_id"] for r in df.collect()) == sorted(
        r["event_id"] for r in df2.collect()
    )
    # feeds the normal pipeline
    validated = validate(df)
    assert validated.filter(F.col("is_valid")).count() > 350


def test_pydatasource_streaming(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("events_gen")
        .option("rows_per_batch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysrc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT count(*) FROM pysrc").first()[0] >= 50:
                break
            time.sleep(1)
        n = spark.sql("SELECT count(*) FROM pysrc").first()[0]
        assert n >= 50 and n % 50 == 0
    finally:
        q.stop()
