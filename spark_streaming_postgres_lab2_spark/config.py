"""Environment-driven configuration (reference parity: config/settings.py).

The reference drives every subsystem off env vars with validated
dataclasses (reference config/settings.py:13-230).  Same surface here,
with Spark-native additions (shuffle partitions, AQE) instead of
Postgres connection pools.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict
from typing import Any


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except (TypeError, ValueError):
        return default


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class DatabaseConfig:
    """JDBC sink settings (reference settings.py DB section).

    Secrets never appear in ``to_dict`` output, mirroring the
    reference's secret-free serialization.
    """

    host: str = field(default_factory=lambda: _env("DB_HOST", "localhost"))
    port: int = field(default_factory=lambda: _env_int("DB_PORT", 5432))
    database: str = field(default_factory=lambda: _env("DB_NAME", "ecommerce"))
    user: str = field(default_factory=lambda: _env("DB_USER", "spark"))
    password: str = field(default_factory=lambda: _env("DB_PASSWORD", ""))
    batch_size: int = field(default_factory=lambda: _env_int("DB_BATCH_SIZE", 5000))
    isolation_level: str = field(
        default_factory=lambda: _env("DB_ISOLATION", "READ_COMMITTED")
    )

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"

    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.user,
            "password": self.password,
            "driver": "org.postgresql.Driver",
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation_level,
        }

    def to_dict(self) -> dict[str, Any]:
        d = asdict(self)
        d.pop("password", None)
        return d


@dataclass
class StreamingConfig:
    """Structured Streaming knobs (reference settings.py streaming section)."""

    input_path: str = field(default_factory=lambda: _env("STREAM_INPUT_PATH", "/tmp/stream_input"))
    checkpoint_path: str = field(
        default_factory=lambda: _env("STREAM_CHECKPOINT_PATH", "/tmp/stream_checkpoint")
    )
    output_path: str = field(default_factory=lambda: _env("STREAM_OUTPUT_PATH", "/tmp/stream_output"))
    trigger_seconds: int = field(default_factory=lambda: _env_int("STREAM_TRIGGER_SECONDS", 10))
    max_files_per_trigger: int = field(
        default_factory=lambda: _env_int("STREAM_MAX_FILES_PER_TRIGGER", 1)
    )
    watermark_delay: str = field(
        default_factory=lambda: _env("STREAM_WATERMARK_DELAY", "10 minutes")
    )
    late_arrival_threshold_minutes: int = field(
        default_factory=lambda: _env_int("STREAM_LATE_THRESHOLD_MINUTES", 5)
    )
    # "hdfs" (default in-memory+DFS provider) or "rocksdb": at large
    # dedup/session state the RocksDB provider keeps state off-heap and
    # incremental-checkpoints changelogs instead of full snapshots
    state_store_provider: str = field(
        default_factory=lambda: _env("STREAM_STATE_STORE", "hdfs")
    )

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class QualityConfig:
    """Data-quality thresholds (reference settings.py quality section)."""

    min_validity_rate: float = field(default_factory=lambda: _env_float("QUALITY_MIN_VALIDITY_RATE", 0.95))
    max_latency_seconds: float = field(default_factory=lambda: _env_float("QUALITY_MAX_LATENCY_SECONDS", 10.0))
    error_concentration_threshold: float = field(
        default_factory=lambda: _env_float("QUALITY_ERROR_CONCENTRATION", 0.10)
    )
    consecutive_breaches_for_escalation: int = field(
        default_factory=lambda: _env_int("QUALITY_ESCALATION_BREACHES", 3)
    )
    rolling_window_size: int = field(default_factory=lambda: _env_int("QUALITY_WINDOW_SIZE", 100))

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class RetryConfig:
    """Retry/backoff settings (reference settings.py retry section)."""

    max_retries: int = field(default_factory=lambda: _env_int("RETRY_MAX_RETRIES", 3))
    initial_delay: float = field(default_factory=lambda: _env_float("RETRY_INITIAL_DELAY", 1.0))
    backoff_factor: float = field(default_factory=lambda: _env_float("RETRY_BACKOFF_FACTOR", 2.0))
    max_delay: float = field(default_factory=lambda: _env_float("RETRY_MAX_DELAY", 60.0))
    circuit_failure_threshold: int = field(default_factory=lambda: _env_int("CIRCUIT_FAILURE_THRESHOLD", 5))
    circuit_recovery_seconds: float = field(default_factory=lambda: _env_float("CIRCUIT_RECOVERY_SECONDS", 30.0))
    circuit_success_threshold: int = field(default_factory=lambda: _env_int("CIRCUIT_SUCCESS_THRESHOLD", 3))

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class SparkConfig:
    """Spark session tuning. Sized for local[N]; at cluster scale the
    same knobs are what you would tune per-job (shuffle partitions ~
    2-3x total cores, AQE on for skew/coalesce)."""

    master: str = field(default_factory=lambda: _env("SPARK_MASTER", "local[*]"))
    app_name: str = field(default_factory=lambda: _env("SPARK_APP_NAME", "lab2_spark_engine"))
    shuffle_partitions: int = field(default_factory=lambda: _env_int("SPARK_SHUFFLE_PARTITIONS", 32))
    # scan granularity: partitions this size must fit executor memory
    # comfortably; at 100 TB this knob (with shuffle_partitions) decides
    # spill behaviour
    max_partition_bytes: int = field(
        default_factory=lambda: _env_int("SPARK_MAX_PARTITION_BYTES", 128 * 1024 * 1024)
    )
    adaptive_enabled: bool = field(default_factory=lambda: _env_bool("SPARK_AQE", True))
    # r15 (guide §3.1/§9): let the planner pick shuffled-hash over
    # sort-merge when one side fits a per-partition hash map (skips
    # both sort passes; measured 0.74-0.94x on every SMJ-site query).
    # Scale-safe by construction: the planner's size conditions
    # (canBuildLocalHashMap vs autoBroadcastJoinThreshold x shuffle
    # partitions) fall back to sort-merge when neither side can build,
    # so corpus x corpus joins at 100 TB still plan SMJ.
    # Residual risk (ADVICE r15): those size conditions compare the
    # AVERAGE per-partition estimate, and stats-free lineage (anything
    # downstream of mapInPandas/mapInArrow) estimates badly -- a
    # key-skewed or underestimated build partition can exceed the map
    # and SHJ build maps DO NOT SPILL, so the failure mode is an
    # executor OOM where sort-merge was merely slower.  AQE skew-join
    # splitting applies to SHJ too, but cannot split one giant key.
    # SPARK_PREFER_SMJ=1 is the per-deployment escape hatch; flip it
    # for workloads with known hot keys on estimate-blind plans.
    prefer_sort_merge_join: bool = field(
        default_factory=lambda: _env_bool("SPARK_PREFER_SMJ", False)
    )
    session_timezone: str = field(default_factory=lambda: _env("SPARK_SESSION_TZ", "UTC"))
    arrow_enabled: bool = field(default_factory=lambda: _env_bool("SPARK_ARROW", True))
    # in local[*] mode the executors run INSIDE the driver JVM, so this
    # is the entire engine's heap -- Spark's 1g default starves any
    # broadcast build or wide aggregation once data passes ~sf0.1
    driver_memory: str = field(default_factory=lambda: _env("SPARK_DRIVER_MEMORY", "16g"))
    ui_enabled: bool = field(default_factory=lambda: _env_bool("SPARK_UI", False))

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)


@dataclass
class EngineConfig:
    """Top-level config composing every subsystem."""

    database: DatabaseConfig = field(default_factory=DatabaseConfig)
    streaming: StreamingConfig = field(default_factory=StreamingConfig)
    quality: QualityConfig = field(default_factory=QualityConfig)
    retry: RetryConfig = field(default_factory=RetryConfig)
    spark: SparkConfig = field(default_factory=SparkConfig)

    def validate(self) -> list[str]:
        """Return a list of config problems (empty == valid)."""
        problems: list[str] = []
        if not (0.0 <= self.quality.min_validity_rate <= 1.0):
            problems.append("quality.min_validity_rate must be in [0, 1]")
        if self.quality.max_latency_seconds <= 0:
            problems.append("quality.max_latency_seconds must be positive")
        if self.retry.max_retries < 0:
            problems.append("retry.max_retries must be >= 0")
        if self.retry.backoff_factor < 1.0:
            problems.append("retry.backoff_factor must be >= 1")
        if self.streaming.trigger_seconds <= 0:
            problems.append("streaming.trigger_seconds must be positive")
        if self.database.batch_size <= 0:
            problems.append("database.batch_size must be positive")
        if self.spark.shuffle_partitions <= 0:
            problems.append("spark.shuffle_partitions must be positive")
        return problems

    def to_dict(self) -> dict[str, Any]:
        return {
            "database": self.database.to_dict(),
            "streaming": self.streaming.to_dict(),
            "quality": self.quality.to_dict(),
            "retry": self.retry.to_dict(),
            "spark": self.spark.to_dict(),
        }


def load_config() -> EngineConfig:
    """Build config from the current environment."""
    return EngineConfig()
