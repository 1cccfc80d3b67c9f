"""Stream assembly: source -> validate -> enrich -> dedup -> sinks.

Parity target: reference main flow (M:320-332, 506-515) with one
deliberate fix: the reference builds a watermark+dropDuplicates frame
and then *doesn't stream it* (dead code, M:324-329 vs :507), relying
on the Postgres PK instead.  Here the dedup path is LIVE: the started
query streams the deduplicated frame, and the parquet sink's
per-epoch overwrite keeps replays idempotent without a PK backstop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import StreamingConfig
from ..operators.enrich import transform_and_enrich
from ..operators.validate import validate
from ..operators.dedup import streaming_dedup
from ..schema.registry import get_registry
from ..sources.csv_stream import csv_stream
from .sinks import BatchRouter, SinkConfig


class SchemaDriftError(ValueError):
    """A source frame's declared schema does not match the registry's
    current schema (missing required fields, extra fields, or type
    mismatches).  Raised at plan-compose time: schema drift is a
    structural property of the frame, not a per-row data error, so it
    must refuse the whole stream at the boundary rather than leak
    mistyped columns into the validation chain (reference
    documentation section 5's schema-drift stance)."""

    def __init__(self, report: dict):
        self.report = report
        super().__init__(
            "source schema does not match registry schema: "
            f"missing_required={report['missing_required_fields']} "
            f"extra={report['extra_fields']} "
            f"type_mismatches={report['type_mismatches']}"
        )


@dataclass
class StreamingPipeline:
    spark: SparkSession
    config: StreamingConfig
    router: BatchRouter

    def transformed_stream(
        self, dedup: bool = True, source: DataFrame | None = None
    ) -> DataFrame:
        """The full logical plan: explicit-schema CSV stream ->
        registry boundary check -> validation rule chain -> enrichment
        -> watermarked dedup.  ``source`` injects an alternative
        streaming frame (kafka, memory, rate); whatever the source, its
        schema must satisfy the registry or SchemaDriftError is raised
        before any query starts."""
        schema = get_registry().get_schema()
        raw = source if source is not None else csv_stream(
            self.spark,
            self.config.input_path,
            schema,
            self.config.max_files_per_trigger,
        )
        report = get_registry().validate_against_schema(raw)
        if not report["is_valid"]:
            raise SchemaDriftError(report)
        validated = validate(raw)
        enriched = transform_and_enrich(
            validated, late_threshold=f"{self.config.late_arrival_threshold_minutes} minutes"
        )
        if dedup:
            # Dedup state is watermarked on PROCESSING time, not event
            # time: the dedup guarantee is "drop redeliveries arriving
            # within the watermark horizon", which is a property of
            # arrival, not of the data's own timeline.  Watermarking on
            # event_time is poisonable -- one future-timestamped anomaly
            # (or replaying backdated data) advances the watermark past
            # the rest of the stream and silently drops every subsequent
            # valid row.  processed_at always moves with the wall clock,
            # so state is evicted exactly `watermark_delay` after
            # arrival and no data pathology can starve the pipeline.
            #
            # Dedup applies to the VALID branch only (reference intent,
            # M:322-332): an invalid record must not consume the dedup
            # state for its event_id and drop a later corrected resend.
            valid = enriched.filter(F.col("is_valid"))
            invalid = enriched.filter(~F.col("is_valid"))
            deduped_valid = streaming_dedup(
                valid,
                event_time_col="processed_at",
                watermark_delay=self.config.watermark_delay,
                keys=["event_id"],
            )
            enriched = deduped_valid.unionByName(invalid)
        return enriched

    def start(
        self,
        dedup: bool = True,
        trigger_once: bool = False,
        source: DataFrame | None = None,
    ) -> StreamingQuery:
        """Start the pipeline.  ``source`` injects an alternative
        streaming frame (Python DataSource, kafka, memory, rate) in
        place of the CSV directory watch -- the pipeline is
        source-agnostic past the registry boundary check, and the
        Python-DataSource path is executed end-to-end in
        tests/test_streamjoin_pysource.py."""
        # session conf is sticky: set the provider explicitly on BOTH
        # branches, or a rocksdb pipeline would silently reconfigure
        # every later default-provider pipeline in the same session
        if self.config.state_store_provider == "rocksdb":
            # off-heap state + changelog checkpointing: the scale path
            # for watermarked dedup state (millions of in-flight keys
            # per partition would blow the default in-memory provider)
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
                "true",
            )
        else:
            self.spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider",
            )
        writer = (
            self.transformed_stream(dedup, source=source)
            .writeStream.foreachBatch(self.router)
            .outputMode("append")
            .option("checkpointLocation", self.config.checkpoint_path)
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=f"{self.config.trigger_seconds} seconds")
        return writer.start()


def build_pipeline(
    spark: SparkSession, config: StreamingConfig | None = None
) -> StreamingPipeline:
    config = config or StreamingConfig()
    router = BatchRouter(
        SinkConfig(
            events_path=f"{config.output_path}/ecommerce_events",
            dead_letter_path=f"{config.output_path}/dead_letter_events",
            metrics_path=f"{config.output_path}/data_quality_metrics",
        )
    )
    return StreamingPipeline(spark, config, router)
