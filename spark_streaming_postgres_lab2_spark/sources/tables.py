"""Batch parquet loaders for the driver-supplied test tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings -- one parquet file per table
under ``{sf_dir}/``.  Loading is a metadata-only operation; Catalyst
prunes columns and pushes filters into the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# Benchmark-only DataFrame reuse: keyed on (session id, sf_dir, name).
# Reusing the DataFrame object reuses its InMemoryFileIndex, so parquet
# listing + footer reads happen once per bench run instead of once per
# query (the ~0.4 s per-query floor).  OFF by default -- the driver's
# correctness runs must stay stateless.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _cache_enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_CACHE_TABLES", "0") == "1"


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Normalize every timestamp-ish column to plain TIMESTAMP, whatever
    physical shape the fixture round delivered.

    Driver fixtures have shipped ``events.ts`` three ways so far:
    r1: parquet TIMESTAMP(NANOS) -> read as bigint nanos (legacy conf);
    r2: plain ``timestamp[us]`` with no tz -> Spark 4 TIMESTAMP_NTZ,
    which ``unix_micros``/interval arithmetic reject.  The session tz is
    pinned UTC (load_tables), so casting NTZ -> TIMESTAMP is value-
    preserving and agrees with the UTC-naive DuckDB oracle.  Applying
    the rule to *all* columns (not just events.ts) makes the next silent
    fixture-type change a no-op instead of a per-query analysis error.
    """
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif col == "ts" and dtype == "bigint":
            # nanos-as-long shape: truncate to micros like DuckDB does.
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table.  The events table carries TIMESTAMP(NANOS)
    parquet timestamps, which Spark 4 refuses by default
    (PARQUET_TYPE_ILLEGAL); read nanos as long and truncate to
    microsecond timestamps (same truncation DuckDB applies)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if _cache_enabled() and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = _normalize_timestamps(df)
    if _cache_enabled():
        _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the requested tables and pin the session timezone to UTC so
    timestamp semantics agree with the UTC-naive DuckDB oracle."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Spark-3.5-style permissive arithmetic (reference parity; MinHash
    # relies on wrapping long multiplication).
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLE_NAMES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register each table as a temp view for the SQL entry points."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
