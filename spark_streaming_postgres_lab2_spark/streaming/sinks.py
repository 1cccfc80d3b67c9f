"""foreachBatch sink router: valid events / dead letter / quality
metrics, with idempotent parquet writes and retry-wrapped IO.

Parity target: reference ``write_to_postgres`` (M:363-441) + the three
JDBC appends (S3-S5).  Differences by design:

- parquet-first: each target table is a directory; JDBC stays
  available via sources/jdbc.py behind the same interface;
- exactly-once: the reference leans on the Postgres primary key to
  absorb replayed micro-batches (SURVEY §2.6 note); with parquet there
  is no PK, so writes go to ``.../batch_id=N`` subdirectories in
  overwrite mode -- a replayed epoch overwrites its own output
  (idempotent), never duplicates it;
- metrics in ONE aggregation pass (operators/quality.py) instead of
  ~10 actions per batch;
- the database retry policy is actually wired around the writes
  (the reference defines C1-C3 but never uses them, SURVEY §2.8).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.enrich import DEAD_LETTER_COLUMNS, ENRICHED_EVENT_COLUMNS
from ..operators.quality import calculate_quality_metrics, metrics_row_df
from ..utils.monitoring import BatchMetrics, BatchTracker, PipelineMonitor
from ..utils.retry import RetryPolicy, database_retry_policy

log = logging.getLogger(__name__)


@dataclass
class SinkConfig:
    events_path: str
    dead_letter_path: str
    metrics_path: str
    partition_batch_subdirs: bool = True


def write_partitioned_events(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Batch-layout twin of the sink: events partitioned by date parts,
    so time-ranged analytics (A4/A7) prune whole directories instead of
    scanning history -- the Spark-side replacement for the reference's
    (event_time, event_type) B-tree indexes (postgres_setup.sql:43-52).

    Rows are sorted within each task before the write: parquet row
    groups then carry tight (event_hour, event_type) min/max stats, so
    hour-ranged scans skip row groups inside each date directory --
    the second index level, for free (no extra shuffle; the sort is
    per-task)."""
    sort_cols = [
        c
        for c in ("event_year", "event_month", "event_day", "event_hour", "event_type")
        if c in df.columns
    ]
    (
        df.sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .partitionBy("event_year", "event_month", "event_day")
        .parquet(path)
    )


@dataclass
class BatchRouter:
    """The foreachBatch callback: metrics -> alerts -> three writes."""

    sink: SinkConfig
    monitor: PipelineMonitor = field(default_factory=PipelineMonitor)
    retry: RetryPolicy = field(default_factory=database_retry_policy)
    write_fn: Callable[[DataFrame, str, int], None] | None = None

    def _write(self, df: DataFrame, path: str, batch_id: int) -> None:
        if self.write_fn is not None:
            self.write_fn(df, path, batch_id)
        elif self.sink.partition_batch_subdirs:
            # 'epoch' (not 'batch_id') so the dir key never shadows the
            # metrics table's batch_id data column on read
            df.write.mode("overwrite").parquet(f"{path}/epoch={batch_id}")
        else:
            # NOTE: append mode is NOT exactly-once -- a retried or
            # replayed epoch appends its rows again.  The default
            # per-epoch overwrite layout is the idempotent path.
            log.warning(
                "append-mode sink writes are not idempotent under retry/replay; "
                "prefer partition_batch_subdirs=True"
            )
            df.write.mode("append").parquet(path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # r15 (guide §2.4): checkpoint BEFORE the empty-guard -- the
        # old order ran the full batch pipeline once for isEmpty()'s
        # head(1) and then AGAIN to materialize the checkpoint; on the
        # checkpointed frame the emptiness probe reads one cached
        # block.  An empty epoch pays one cheap empty materialization
        # instead of a scan, so the guard's purpose (skip the three
        # writes + metrics on empty batches) is unchanged.
        batch_df = batch_df.localCheckpoint(eager=True)  # one lineage for N consumers
        try:
            self._route(batch_df, batch_id)
        finally:
            # r16 (ADVICE r15): checkpointed RDD blocks are only freed on
            # GC of the DataFrame; a long-running stream with many (incl.
            # empty) epochs would otherwise accumulate one cached block
            # set per batch.  Free them explicitly on BOTH exits -- the
            # epoch's consumers have all run by now.
            try:
                batch_df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:  # py4j internals: freeing is best-effort
                log.debug("checkpoint unpersist failed", exc_info=True)

    def _route(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        with BatchTracker(batch_id) as tracker:
            q = calculate_quality_metrics(batch_df, batch_id)

            valid = batch_df.filter(F.col("is_valid")).select(
                *[c for c in ENRICHED_EVENT_COLUMNS if c in batch_df.columns]
            )
            dead = batch_df.filter(~F.col("is_valid")).select(
                *[c for c in DEAD_LETTER_COLUMNS if c in batch_df.columns]
            )
            self.retry.execute(self._write, valid, self.sink.events_path, batch_id)
            if q.invalid_rows:
                self.retry.execute(self._write, dead, self.sink.dead_letter_path, batch_id)
            metrics_df = metrics_row_df(batch_df.sparkSession, q)
            self.retry.execute(self._write, metrics_df, self.sink.metrics_path, batch_id)

        alerts = self.monitor.record(
            BatchMetrics(
                batch_id=batch_id,
                total_rows=q.total_rows,
                valid_rows=q.valid_rows,
                invalid_rows=q.invalid_rows,
                processing_seconds=tracker.elapsed,
                late_arrival_count=q.late_arrival_count,
                error_distribution=q.error_distribution,
            )
        )
        for alert in alerts:
            log.log(
                logging.ERROR if alert.level == "ERROR" else logging.WARNING,
                "batch %s alert [%s]: %s", batch_id, alert.kind, alert.message,
            )
