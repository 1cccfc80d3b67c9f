"""End-to-end streaming pipeline: generator CSVs -> file stream ->
validate/enrich/dedup -> foreachBatch router -> parquet tables,
including replay idempotency and analytics views over the sink output
(reference docs/test_cases.md scenarios)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.config import StreamingConfig
from spark_streaming_postgres_lab2_spark.operators.analytics import (
    event_type_distribution,
    hourly_event_summary,
    register_analytics_views,
    user_sessions,
    verification_counts,
)
from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
from spark_streaming_postgres_lab2_spark.streaming.pipeline import build_pipeline

NOW = datetime(2024, 3, 15, 12, 0, 0, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pipeline_output(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    input_dir, out_dir, ckpt = root / "in", root / "out", root / "ckpt"
    gen = EventGenerator(seed=7, anomaly_rate=0.10, now=NOW)
    for i in range(3):
        gen.write_csv(gen.generate_batch(100), str(input_dir), f"batch_{i:04d}.csv")

    cfg = StreamingConfig(
        input_path=str(input_dir),
        checkpoint_path=str(ckpt),
        output_path=str(out_dir),
        max_files_per_trigger=10,
    )
    pipe = build_pipeline(spark, cfg)
    q = pipe.start(trigger_once=True)
    q.awaitTermination(120)
    return spark, str(out_dir), pipe


def test_stream_writes_three_tables(pipeline_output):
    spark, out_dir, _ = pipeline_output
    events = spark.read.parquet(f"{out_dir}/ecommerce_events")
    dlq = spark.read.parquet(f"{out_dir}/dead_letter_events")
    metrics = spark.read.parquet(f"{out_dir}/data_quality_metrics")
    assert events.count() + dlq.count() == 300
    assert dlq.count() > 0  # 10% anomaly rate must produce dead letters
    m = metrics.agg(
        F.sum("total_rows").alias("t"), F.sum("valid_rows").alias("v"),
        F.sum("invalid_rows").alias("i"),
    ).first()
    assert m["t"] == 300 and m["v"] == events.count() and m["i"] == dlq.count()


def test_valid_rows_have_no_error_and_enrichment(pipeline_output):
    spark, out_dir, _ = pipeline_output
    events = spark.read.parquet(f"{out_dir}/ecommerce_events")
    assert "validation_errors" not in events.columns
    assert {"total_amount", "event_year", "is_late_arrival", "processed_at"} <= set(events.columns)
    assert events.filter(F.col("event_time").isNull()).count() == 0


def test_dead_letters_carry_error_tags(pipeline_output):
    spark, out_dir, _ = pipeline_output
    dlq = spark.read.parquet(f"{out_dir}/dead_letter_events")
    assert dlq.filter(F.col("validation_errors").isNull()).count() == 0


def test_monitor_recorded_batches(pipeline_output):
    _, _, pipe = pipeline_output
    assert len(pipe.router.monitor.window) >= 1
    assert pipe.router.monitor.health_summary()["status"] in ("HEALTHY", "DEGRADED")


def test_replay_is_idempotent(pipeline_output):
    """Re-running an epoch overwrites its own batch_id subdir instead of
    duplicating rows (the reference relied on the Postgres PK for this)."""
    spark, out_dir, pipe = pipeline_output
    events_before = spark.read.parquet(f"{out_dir}/ecommerce_events").count()
    enriched = spark.read.parquet(f"{out_dir}/ecommerce_events")
    # simulate the engine re-delivering batch 0: feed the same rows with
    # the same batch_id through the router again
    from spark_streaming_postgres_lab2_spark.operators.validate import validate

    replay = validate(
        enriched.drop("is_valid").limit(events_before)
        .withColumn("event_time", F.col("event_time").cast("string"))
    )
    pipe.router(replay, batch_id=0)
    events_after = spark.read.parquet(f"{out_dir}/ecommerce_events").count()
    assert events_after <= events_before + 0  # no duplication beyond overwrite


def test_analytics_views_over_sink(pipeline_output):
    spark, out_dir, _ = pipeline_output
    events = spark.read.parquet(f"{out_dir}/ecommerce_events")
    dlq = spark.read.parquet(f"{out_dir}/dead_letter_events")

    hourly = hourly_event_summary(events)
    assert hourly.count() >= 1
    total = hourly.agg(F.sum("event_count")).first()[0]
    assert total == events.count()

    sessions = user_sessions(events)
    assert sessions.filter(F.col("session_start") > F.col("session_end")).count() == 0

    dist = event_type_distribution(events)
    assert dist.agg(F.sum("event_count")).first()[0] == events.count()

    vc = {r["table_name"]: r["row_count"] for r in verification_counts(events, dlq).collect()}
    assert vc["ecommerce_events"] == events.count()
    assert vc["dead_letter_events"] == dlq.count()

    register_analytics_views(spark, events)
    assert spark.sql("SELECT * FROM v_category_performance").count() >= 1


def test_streaming_dedup_drops_replayed_event_ids(spark, tmp_path):
    """The live watermark+dropDuplicates path (dead code in the
    reference, M:324-329): the same event_id in two files survives
    once."""
    gen = EventGenerator(seed=11, anomaly_rate=0.0, now=NOW)
    batch = gen.generate_batch(50)
    input_dir = tmp_path / "in"
    gen.write_csv(batch, str(input_dir), "a.csv")
    gen.write_csv(batch, str(input_dir), "b.csv")  # exact duplicate file

    cfg = StreamingConfig(
        input_path=str(input_dir),
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
        max_files_per_trigger=10,
    )
    pipe = build_pipeline(spark, cfg)
    q = pipe.start(trigger_once=True)
    q.awaitTermination(120)
    events = spark.read.parquet(f"{tmp_path}/out/ecommerce_events")
    assert events.count() == 50
    assert events.select("event_id").distinct().count() == 50


def test_invalid_copy_does_not_consume_dedup_state(spark, tmp_path):
    """A corrupted event followed by a corrected resend with the same
    event_id: the invalid copy must not claim the dedup state and drop
    the valid copy (dedup applies to the valid branch only)."""
    import csv

    cols = ["event_id", "user_id", "session_id", "event_type", "product_id",
            "category", "price", "quantity", "user_segment", "search_query",
            "event_time", "source_system"]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    with open(input_dir / "a.csv", "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(cols)
        # invalid: negative price; then corrected resend, same event_id
        w.writerow(["dup-1", 1, "s", "view", 10, "books", -5.0, 0, "new", "",
                    "2024-03-15T12:00:00", "web"])
        w.writerow(["dup-1", 1, "s", "view", 10, "books", 0.0, 0, "new", "",
                    "2024-03-15T12:00:30", "web"])

    cfg = StreamingConfig(
        input_path=str(input_dir),
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
        max_files_per_trigger=10,
    )
    pipe = build_pipeline(spark, cfg)
    q = pipe.start(trigger_once=True)
    q.awaitTermination(120)
    events = spark.read.parquet(f"{tmp_path}/out/ecommerce_events")
    dlq = spark.read.parquet(f"{tmp_path}/out/dead_letter_events")
    assert events.count() == 1  # corrected copy landed
    assert dlq.count() == 1     # corrupted copy dead-lettered


def test_rocksdb_state_store_dedup(spark, tmp_path):
    """The RocksDB state-store provider (the large-state scale path)
    carries the same dedup semantics as the default provider."""
    input_dir = tmp_path / "in"
    gen = EventGenerator(seed=11, anomaly_rate=0.0, now=NOW)
    batch = gen.generate_batch(40)
    gen.write_csv(batch, str(input_dir), "a.csv")
    gen.write_csv(batch, str(input_dir), "b.csv")  # exact duplicate file

    cfg = StreamingConfig(
        input_path=str(input_dir),
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
        max_files_per_trigger=10,
        state_store_provider="rocksdb",
    )
    try:
        pipe = build_pipeline(spark, cfg)
        q = pipe.start(trigger_once=True)
        q.awaitTermination(120)
        assert "RocksDB" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        events = spark.read.parquet(f"{tmp_path}/out/ecommerce_events")
        assert events.count() == 40
        assert events.select("event_id").distinct().count() == 40
    finally:
        # reset for other tests sharing the session fixture
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_schema_drift_rejected_at_boundary(spark, tmp_path):
    """VERDICT r2 item 8: a source frame whose declared schema
    mismatches the registry (here: event_time as INT, plus an
    undeclared column) must be refused at plan-compose time, before
    any streaming query starts."""
    import pytest as _pytest

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from spark_streaming_postgres_lab2_spark.schema.registry import get_registry
    from spark_streaming_postgres_lab2_spark.streaming.pipeline import (
        SchemaDriftError,
    )

    good = get_registry().get_schema()
    drifted = StructType(
        [
            StructField(f.name, IntegerType() if f.name == "event_time" else f.dataType)
            for f in good.fields
        ]
        + [StructField("rogue_column", StringType())]
    )
    (tmp_path / "in").mkdir()
    cfg = StreamingConfig(
        input_path=str(tmp_path / "in"),
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
    )
    pipe = build_pipeline(spark, cfg)
    bad_source = (
        spark.readStream.schema(drifted)
        .format("csv")
        .option("header", "true")
        .load(str(tmp_path / "in"))
    )
    with _pytest.raises(SchemaDriftError) as exc:
        pipe.transformed_stream(source=bad_source)
    assert "event_time" in exc.value.report["type_mismatches"]
    assert exc.value.report["extra_fields"] == ["rogue_column"]

    # a registry-conformant source composes fine (no query started)
    ok_source = (
        spark.readStream.schema(good)
        .format("csv")
        .option("header", "true")
        .load(str(tmp_path / "in"))
    )
    assert pipe.transformed_stream(source=ok_source).columns
