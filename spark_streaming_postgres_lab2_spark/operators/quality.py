"""Per-batch data-quality metrics in ONE aggregation pass.

Parity target: reference ``calculate_quality_metrics``
(spark_streaming_to_postgres.py:239-276), which issues ~10 separate
actions per batch (count, per-column null counts, late count, groupBy
collect, plus two more counts in the writer M:384-385).  Same observable
metrics here, but computed as a single ``agg`` over ``sum(when(...))``
expressions plus one small groupBy -- two jobs instead of ten, and the
heavy one is a single scan with map-side partial aggregation.  At 100 TB
that difference is 5x fewer full-table scans per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class BatchQualityMetrics:
    batch_id: int
    total_rows: int
    valid_rows: int
    invalid_rows: int
    late_arrival_count: int
    null_counts: dict[str, int] = field(default_factory=dict)
    event_type_distribution: dict[str, int] = field(default_factory=dict)
    error_distribution: dict[str, int] = field(default_factory=dict)

    @property
    def validity_rate(self) -> float:
        return self.valid_rows / self.total_rows if self.total_rows else 1.0

    def to_dict(self) -> dict[str, Any]:
        return {
            "batch_id": self.batch_id,
            "total_rows": self.total_rows,
            "valid_rows": self.valid_rows,
            "invalid_rows": self.invalid_rows,
            "validity_rate": self.validity_rate,
            "late_arrival_count": self.late_arrival_count,
            "null_counts": dict(self.null_counts),
            "event_type_distribution": dict(self.event_type_distribution),
            "error_distribution": dict(self.error_distribution),
        }


def _count_if(cond) -> F.Column:  # type: ignore[name-defined]
    return F.sum(F.when(cond, 1).otherwise(0))


def quality_metrics_agg(df: DataFrame, null_check_columns: list[str]) -> DataFrame:
    """The single-pass aggregation: total / valid / invalid / late /
    per-column nulls as one row. Usable in batch or inside foreachBatch."""
    aggs = [
        F.count(F.lit(1)).alias("total_rows"),
        _count_if(F.col("is_valid")).alias("valid_rows"),
        _count_if(~F.col("is_valid")).alias("invalid_rows"),
    ]
    if "is_late_arrival" in df.columns:
        aggs.append(_count_if(F.col("is_late_arrival")).alias("late_arrival_count"))
    else:
        aggs.append(F.lit(0).cast("bigint").alias("late_arrival_count"))
    for c in null_check_columns:
        aggs.append(_count_if(F.col(c).isNull()).alias(f"null_{c}"))
    return df.agg(*aggs)


def calculate_quality_metrics(
    df: DataFrame,
    batch_id: int = 0,
    null_check_columns: list[str] | None = None,
) -> BatchQualityMetrics:
    """Compute the full reference metric set in two jobs.

    ``df`` must already carry ``is_valid`` (and optionally
    ``is_late_arrival`` / ``validation_errors``).
    """
    null_cols = [
        c
        for c in (null_check_columns or ["user_id", "session_id", "category", "quantity"])
        if c in df.columns
    ]
    row = quality_metrics_agg(df, null_cols).first()
    if row is None or row["total_rows"] in (None, 0):
        return BatchQualityMetrics(batch_id, 0, 0, 0, 0)

    dist_rows = (
        df.groupBy("event_type", "validation_errors")
        .count()
        .collect()
        if "validation_errors" in df.columns
        else df.groupBy("event_type").count().withColumn("validation_errors", F.lit(None)).collect()
    )
    event_dist: dict[str, int] = {}
    error_dist: dict[str, int] = {}
    for r in dist_rows:
        et = r["event_type"] if r["event_type"] is not None else "null"
        event_dist[et] = event_dist.get(et, 0) + r["count"]
        if r["validation_errors"] is not None:
            tag = r["validation_errors"]
            error_dist[tag] = error_dist.get(tag, 0) + r["count"]

    return BatchQualityMetrics(
        batch_id=batch_id,
        total_rows=int(row["total_rows"]),
        valid_rows=int(row["valid_rows"] or 0),
        invalid_rows=int(row["invalid_rows"] or 0),
        late_arrival_count=int(row["late_arrival_count"] or 0),
        null_counts={c: int(row[f"null_{c}"] or 0) for c in null_cols},
        event_type_distribution=event_dist,
        error_distribution=error_dist,
    )


def metrics_row_df(spark, metrics: BatchQualityMetrics) -> DataFrame:
    """One-row DataFrame matching the reference's data_quality_metrics
    sink schema (spark_streaming_to_postgres.py:449-457)."""
    return spark.createDataFrame(
        [
            (
                metrics.batch_id,
                metrics.total_rows,
                metrics.valid_rows,
                metrics.invalid_rows,
                float(metrics.validity_rate),
                metrics.late_arrival_count,
            )
        ],
        "batch_id long, total_rows long, valid_rows long, invalid_rows long, "
        "validity_rate double, late_arrival_count long",
    ).withColumn("recorded_at", F.current_timestamp())
