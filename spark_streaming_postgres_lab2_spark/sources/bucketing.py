"""Bucketed table writes for shuffle-free co-located joins.

At 100 TB the fact-fact join (e.g. lineitem x orders) is the dominant
shuffle; bucketing both sides on the join key at write time makes the
join a zero-exchange zip of co-located buckets on every subsequent
query.  This is the batch-layout analog of Kafka partitioning in the
streaming path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.
    Bucket metadata lives in the session catalog; joins/aggregations on
    ``bucket_cols`` between tables with matching bucketing skip the
    shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
