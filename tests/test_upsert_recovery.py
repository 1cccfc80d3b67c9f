"""Upsert semantics + streaming incremental checkpoint recovery."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.config import StreamingConfig
from spark_streaming_postgres_lab2_spark.operators.upsert import upsert, upsert_parquet
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.streaming.pipeline import build_pipeline

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


def test_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 20.0), (4, "d", 4.0)], "id long, name string, v double"
    )
    got = {r["id"]: (r["name"], r["v"]) for r in upsert(target, updates, ["id"]).collect()}
    assert got == {1: ("a", 1.0), 2: ("b2", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}


def test_upsert_parquet_swap(spark, tmp_path):
    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "id long, v double"
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, 99.0), (3, 3.0)], "id long, v double")
    upsert_parquet(spark, path, updates, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 99.0, 3: 3.0}


def test_upsert_parquet_recovers_stranded_backup(spark, tmp_path):
    """A crash between the two renames leaves the table at path__old;
    the next call must restore it before merging."""
    import os
    import shutil

    import pytest

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 1.0)], "id long, v double").write.parquet(path)
    # simulate the crash window: table moved to backup, nothing at path
    shutil.move(path, path + "__old")
    assert not os.path.exists(path)

    updates = spark.createDataFrame([(2, 2.0)], "id long, v double")
    upsert_parquet(spark, path, updates, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {1: 1.0, 2: 2.0}

    with pytest.raises(ValueError, match="local-filesystem only"):
        upsert_parquet(spark, "s3a://bucket/tbl", updates, ["id"])


def test_checkpoint_incremental_recovery(spark, tmp_path):
    """Restarting with the same checkpoint processes ONLY files that
    arrived after the first run -- offsets recover, nothing reprocesses
    (reference docs/test_cases.md checkpoint-restart scenario)."""
    gen = EventGenerator(seed=21, anomaly_rate=0.0, now=NOW)
    input_dir = str(tmp_path / "in")
    cfg = StreamingConfig(
        input_path=input_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
        max_files_per_trigger=10,
    )

    gen.write_csv(gen.generate_batch(60), input_dir, "a.csv")
    pipe = build_pipeline(spark, cfg)
    q = pipe.start(trigger_once=True)
    q.awaitTermination(120)
    first = spark.read.parquet(f"{tmp_path}/out/ecommerce_events").count()
    assert first == 60

    # second wave of files, same checkpoint
    gen.write_csv(gen.generate_batch(40), input_dir, "b.csv")
    q2 = build_pipeline(spark, cfg).start(trigger_once=True)
    q2.awaitTermination(120)
    events = spark.read.parquet(f"{tmp_path}/out/ecommerce_events")
    assert events.count() == 100
    assert events.select("event_id").distinct().count() == 100
