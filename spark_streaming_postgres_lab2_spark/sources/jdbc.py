"""JDBC source/sink helpers (reference S2-S5).

Parity target: spark_streaming_to_postgres.py:337-343 (props),
:388-416 (append sinks), :488-500 (subquery-pushdown probe).  The JDBC
driver jar and a live Postgres are not present in this environment, so
everything here is exercised through its parquet-mode twin in
streaming/sinks.py; the JDBC path is the same code with a different
``format``."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..config import DatabaseConfig


def jdbc_read_subquery(
    spark: SparkSession, cfg: DatabaseConfig, subquery: str, alias: str = "sub"
) -> DataFrame:
    """Batch JDBC read with the subquery pushed down into the database
    (the reference's connection probe reads ``(SELECT 1 as test) t``)."""
    return spark.read.jdbc(
        url=cfg.jdbc_url,
        table=f"({subquery}) AS {alias}",
        properties=cfg.jdbc_properties(),
    )


def probe_connection(spark: SparkSession, cfg: DatabaseConfig) -> bool:
    """Fail-fast startup probe (reference M:488-500)."""
    rows = jdbc_read_subquery(spark, cfg, "SELECT 1 AS test", "test_query").collect()
    return len(rows) == 1 and rows[0]["test"] == 1


@dataclass(frozen=True)
class JdbcWriteContract:
    """The full writer configuration as data, so contract tests can
    assert what reaches the JDBC datasource without a database
    (reference props spark_streaming_to_postgres.py:337-343)."""

    format: str
    mode: str
    table: str
    options: dict[str, str]


def jdbc_append_contract(cfg: DatabaseConfig, table: str) -> JdbcWriteContract:
    """Build the append-sink contract: url/credentials/driver plus the
    reference's batching and isolation options (batchsize 5000,
    READ_COMMITTED)."""
    return JdbcWriteContract(
        format="jdbc",
        mode="append",
        table=table,
        options={"url": cfg.jdbc_url, "dbtable": table, **cfg.jdbc_properties()},
    )


def jdbc_append(df: DataFrame, cfg: DatabaseConfig, table: str) -> None:
    """Append write driven entirely by the contract object -- the live
    leg is just format/mode/options/save.  Live verification needs a
    Postgres + driver jar (absent here); see tests/test_jdbc_contract.py
    for the no-connection contract tests and the gated integration
    recipe mirroring reference tests/test_integration.py:45-353."""
    c = jdbc_append_contract(cfg, table)
    df.write.format(c.format).mode(c.mode).options(**c.options).save()
