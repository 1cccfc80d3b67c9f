"""Bucketed table writes for shuffle-free co-located joins.

At 100 TB the fact-fact join (e.g. lineitem x orders) is the dominant
shuffle; bucketing both sides on the join key at write time makes the
join a zero-exchange zip of co-located buckets on every subsequent
query.  This is the batch-layout analog of Kafka partitioning in the
streaming path."""

from __future__ import annotations

import os
import re

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


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> DataFrame:
    """Idempotent bucketed copy of a fixture table: write once per
    session (the default in-memory catalog is session-scoped;
    mode=overwrite reclaims stale warehouse files from earlier
    sessions), read bucketed thereafter.  Bucket + sort on the join
    key, so downstream equi-joins between tables bucketed the same way
    need no Exchange -- at 100 TB this one-time layout cost replaces
    the per-query fact-fact shuffle, which is the dominant cost of any
    lineitem x orders query (the batch analog of the reference's
    B-tree indexes, postgres_setup.sql:43-52)."""
    from .tables import load_table

    tag = re.sub(r"[^0-9A-Za-z]+", "_", os.path.basename(os.path.normpath(sf_dir)))
    name = f"{table}_bkt{num_buckets}_{tag}"
    if not spark.catalog.tableExists(name):
        # The default catalog is in-memory (session-scoped) but the
        # warehouse directory is not: a fresh session + leftover files
        # from an earlier one makes saveAsTable refuse with
        # LOCATION_ALREADY_EXISTS.  The files are a cache of driver
        # fixtures -- reclaiming them is always safe.
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        if wh.scheme in ("", "file"):
            shutil.rmtree(os.path.join(wh.path or wh.netloc, name), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, table),
            name,
            [bucket_col],
            num_buckets,
            sort_cols=[bucket_col],
        )
    return spark.table(name)
