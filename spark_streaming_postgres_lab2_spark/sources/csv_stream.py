"""Streaming CSV directory source.

Parity target: reference spark_streaming_to_postgres.py:87-94 --
explicit schema (never inferred), header, per-trigger file rate limit,
``cleanSource`` off."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def csv_stream(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("cleanSource", "off")
        .csv(input_path)
    )
