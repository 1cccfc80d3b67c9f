"""Plan-inspection helpers: assert that the physical plan Catalyst
chose is the plan we want at scale (pushdown reached the scan, small
dims broadcast, codegen covers the hot path).

Used by tests and by ``tools/plan_report.py`` to keep plan regressions
visible -- a correct-but-shuffling plan is a bug here."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            inner = line.split("struct<", 1)[-1].rstrip(">")
            cols.extend(f.split(":")[0] for f in inner.split(",") if ":" in f)
    return cols


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("SortMergeJoin")


def shuffle_count(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange")


def wholestage_codegen_spans(df: DataFrame) -> int:
    return physical_plan(df).count("WholeStageCodegen")


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present (HashAggregate appears in partial +
    final pairs)."""
    return physical_plan(df).count("HashAggregate") >= 2
