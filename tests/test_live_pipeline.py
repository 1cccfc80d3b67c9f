"""Continuous-mode integration: generator writing while the pipeline
runs live micro-batch triggers (the reference's real deployment shape,
docs/test_cases.md continuous-streaming scenario)."""

from __future__ import annotations

import threading
import time
from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.config import StreamingConfig
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.streaming.pipeline import build_pipeline

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


@pytest.mark.slow
def test_live_trigger_with_concurrent_generator(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    gen = EventGenerator(seed=17, anomaly_rate=0.05, now=NOW)
    gen.write_csv(gen.generate_batch(50), input_dir, "events_000000.csv")

    cfg = StreamingConfig(
        input_path=input_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
        trigger_seconds=2,
        max_files_per_trigger=5,
    )
    pipe = build_pipeline(spark, cfg)
    query = pipe.start(trigger_once=False)  # live processingTime trigger

    def produce():
        for i in range(1, 4):
            time.sleep(2)
            gen.write_csv(gen.generate_batch(50), input_dir, f"events_{i:06d}.csv")

    producer = threading.Thread(target=produce)
    producer.start()
    producer.join()

    query.processAllAvailable()  # drain everything the producer wrote
    query.stop()
    ev = spark.read.parquet(f"{tmp_path}/out/ecommerce_events").count()
    dl = spark.read.parquet(f"{tmp_path}/out/dead_letter_events").count()
    total = ev + dl

    assert total == 200  # all four files' events landed exactly once
    events = spark.read.parquet(f"{tmp_path}/out/ecommerce_events")
    assert events.select("event_id").distinct().count() == events.count()
    assert len(pipe.router.monitor.window) >= 2  # multiple live micro-batches
