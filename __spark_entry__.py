"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The inventory itself lives in
``spark_streaming_postgres_lab2_spark.queries`` (core = reference
surface SURVEY §2, ext = LLM-pipeline extensions).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_streaming_postgres_lab2_spark import queries as _inventory


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full
    validate -> enrich -> hourly-summary pipeline over the events
    table (the reference's main analytics view, A4)."""
    return _inventory.queries()["hourly_event_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _inventory.queries()


def oracle_sql() -> dict[str, str]:
    return _inventory.oracle_sql()
