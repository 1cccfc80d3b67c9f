"""JDBC sink contract tests -- no database required.

The live Postgres leg cannot run here (no driver jar, no server), so
these tests pin everything short of the socket: the exact option set
the writer is configured with (reference props
spark_streaming_to_postgres.py:337-343) and that jdbc_append drives
the DataFrameWriter with precisely that contract.

Gated live integration (mirrors reference tests/test_integration.py:45-353):
    1. docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=spark postgres:16
    2. add postgresql-42.x.jar via spark.jars
    3. export DB_HOST/DB_PORT/DB_NAME/DB_USER/DB_PASSWORD
    4. pytest -m jdbc_live  (probe_connection -> jdbc_append ->
       jdbc_read_subquery round-trip on a temp table)
"""

from __future__ import annotations

import pytest

from spark_streaming_postgres_lab2_spark.config import DatabaseConfig
from spark_streaming_postgres_lab2_spark.sources.jdbc import (
    jdbc_append,
    jdbc_append_contract,
)


@pytest.fixture
def cfg():
    return DatabaseConfig(
        host="db.example", port=5499, database="ecommerce",
        user="spark", password="s3cret",
    )


def test_append_contract_matches_reference_options(cfg):
    c = jdbc_append_contract(cfg, "ecommerce_events")
    assert c.format == "jdbc"
    assert c.mode == "append"
    assert c.table == "ecommerce_events"
    assert c.options == {
        "url": "jdbc:postgresql://db.example:5499/ecommerce",
        "dbtable": "ecommerce_events",
        "user": "spark",
        "password": "s3cret",
        "driver": "org.postgresql.Driver",
        # the reference's exact batching/isolation props (M:337-343)
        "batchsize": "5000",
        "isolationLevel": "READ_COMMITTED",
    }


def test_batchsize_and_isolation_are_configurable(cfg):
    custom = DatabaseConfig(
        host="h", port=1, database="d", user="u", password="p",
        batch_size=100, isolation_level="SERIALIZABLE",
    )
    opts = jdbc_append_contract(custom, "t").options
    assert opts["batchsize"] == "100"
    assert opts["isolationLevel"] == "SERIALIZABLE"


def test_jdbc_append_drives_writer_with_contract(spark, cfg, monkeypatch):
    """Patch DataFrameWriter.save to capture the configured state: the
    full call path (format -> mode -> options -> save) runs, only the
    socket is stubbed."""
    from pyspark.sql.readwriter import DataFrameWriter

    captured = {}
    orig_format = DataFrameWriter.format
    orig_mode = DataFrameWriter.mode
    orig_options = DataFrameWriter.options

    def rec_format(self, source):
        captured["format"] = source
        return orig_format(self, source)

    def rec_mode(self, saveMode):
        captured["mode"] = saveMode
        return orig_mode(self, saveMode)

    def rec_options(self, **opts):
        captured["options"] = dict(opts)
        return orig_options(self, **opts)

    monkeypatch.setattr(DataFrameWriter, "format", rec_format)
    monkeypatch.setattr(DataFrameWriter, "mode", rec_mode)
    monkeypatch.setattr(DataFrameWriter, "options", rec_options)
    monkeypatch.setattr(DataFrameWriter, "save", lambda self, path=None: captured.setdefault("saved", True))

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    jdbc_append(df, cfg, "dead_letter_events")

    assert captured["saved"] is True
    assert captured["format"] == "jdbc"
    assert captured["mode"] == "append"
    assert captured["options"] == jdbc_append_contract(cfg, "dead_letter_events").options


def test_secret_free_serialization(cfg):
    assert "password" not in cfg.to_dict()
    # but the writer contract does carry it (it must reach the driver)
    assert jdbc_append_contract(cfg, "t").options["password"] == "s3cret"
