"""Judge-checked query inventory.

Each entry pairs a Spark DataFrame query (``fn(spark, sf_dir)``) with
an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for
genuinely non-SQL-expressible operators, which get a rows-only check).

Conventions that make the DuckDB comparison bit-stable:

- session timezone pinned to UTC (sources/tables.load_tables);
- timestamps exported as ``unix_micros`` / ``epoch_us`` BIGINT;
- double aggregates rounded (2 decimals for money, 4 for ratios);
- integer sums cast to BIGINT on the DuckDB side (DuckDB sums ints to
  HUGEINT);
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str


def all_specs() -> list[QuerySpec]:
    from . import advanced, core, ext

    return core.specs() + advanced.specs() + ext.specs()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
