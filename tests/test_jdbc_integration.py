"""Gated live-Postgres integration tier (VERDICT r3 item 8).

Mirrors the reference's live-database test suite
(tests/test_integration.py:45-353): schema exists, valid inserts land,
PRIMARY KEY rejects duplicate event_ids, CHECK constraints reject bad
event types and negative prices, the dead-letter table accepts rejected
rows, and the analytics view answers queries.  The engine-side twist:
writes go through the SAME jdbc_append contract the streaming sink
uses, and reads come back through jdbc_read_subquery -- so a green run
here certifies the actual production JDBC path end-to-end.

Skips cleanly when no database is reachable (this sandbox has neither
a Postgres nor the driver jar).  To run green:

    docker run -d -p 5432:5432 -e POSTGRES_PASSWORD=spark \
        -e POSTGRES_USER=spark -e POSTGRES_DB=ecommerce postgres:16
    export DB_HOST=localhost DB_PORT=5432 DB_NAME=ecommerce \
        DB_USER=spark DB_PASSWORD=spark SPARK_GRAFT_PG_JAR=/path/to/postgresql-42.7.x.jar
    pytest -m integration tests/test_jdbc_integration.py

DDL is executed over the SAME JVM JDBC driver Spark uses (via
java.sql.DriverManager), so no extra Python database client is needed.
"""

from __future__ import annotations

import datetime
import os
import socket
import uuid

import pytest

from spark_streaming_postgres_lab2_spark.config import DatabaseConfig
from spark_streaming_postgres_lab2_spark.sources.jdbc import (
    jdbc_append,
    jdbc_read_subquery,
    probe_connection,
)

pytestmark = pytest.mark.integration

# Reference docker/postgres/postgres_setup.sql:7-40 (events), :60-73
# (dead letter), :101-110 (hourly view) -- trimmed to the columns the
# constraint tests exercise; the StructType field lists ARE the spec.
DDL = [
    """CREATE TABLE IF NOT EXISTS ecommerce_events (
        event_id VARCHAR(36) PRIMARY KEY,
        user_id INT,
        event_type VARCHAR(20) NOT NULL CHECK (event_type IN
            ('view', 'purchase', 'add_to_cart', 'remove_from_cart',
             'wishlist', 'search')),
        product_id INT NOT NULL,
        price NUMERIC(10,2) NOT NULL CHECK (price >= 0),
        event_time TIMESTAMP NOT NULL,
        CONSTRAINT chk_user_required_for_actions CHECK (
            (event_type IN ('view', 'search')) OR (user_id IS NOT NULL)
        )
    )""",
    """CREATE TABLE IF NOT EXISTS dead_letter_events (
        id SERIAL PRIMARY KEY,
        event_id VARCHAR(36),
        event_type VARCHAR(50),
        price NUMERIC(10,2),
        validation_errors TEXT NOT NULL
    )""",
    """CREATE OR REPLACE VIEW v_hourly_event_summary AS
       SELECT DATE_TRUNC('hour', event_time) AS event_hour, event_type,
              COUNT(*) AS event_count, COUNT(DISTINCT user_id) AS unique_users
       FROM ecommerce_events GROUP BY 1, 2""",
]


def _db_reachable(cfg: DatabaseConfig) -> bool:
    try:
        with socket.create_connection((cfg.host, cfg.port), timeout=2):
            return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def pg(spark):
    """Live-database fixture: env-configured DatabaseConfig + schema
    setup over the JVM's DriverManager; skips at the first missing
    prerequisite (env vars, socket, driver class, connection)."""
    if "DB_HOST" not in os.environ:
        pytest.skip("DB_HOST not set -- no live Postgres in this environment")
    cfg = DatabaseConfig()
    if not _db_reachable(cfg):
        pytest.skip(f"no socket at {cfg.host}:{cfg.port}")
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("org.postgresql.Driver")
    except Exception:
        pytest.skip("postgresql driver jar not on the Spark classpath")
    props = jvm.java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.jdbc_url, props)
    try:
        st = conn.createStatement()
        for ddl in DDL:
            st.execute(ddl)
        st.execute("DELETE FROM ecommerce_events")
        st.execute("DELETE FROM dead_letter_events")
        yield cfg
    finally:
        conn.close()


def _event_df(spark, event_id: str, event_type: str = "purchase",
              price: float = 9.99, user_id: int | None = 7):
    return spark.createDataFrame(
        [(event_id, user_id, event_type, 101, price,
          datetime.datetime(2024, 3, 15, 12, 0, 0))],
        "event_id string, user_id int, event_type string, "
        "product_id int, price double, event_time timestamp",
    )


def test_probe_connection(spark, pg):
    assert probe_connection(spark, pg)


def test_can_insert_valid_event_and_read_back(spark, pg):
    eid = str(uuid.uuid4())
    jdbc_append(_event_df(spark, eid), pg, "ecommerce_events")
    got = jdbc_read_subquery(
        spark, pg,
        f"SELECT event_id, event_type, price FROM ecommerce_events "
        f"WHERE event_id = '{eid}'",
    ).collect()
    assert len(got) == 1 and got[0]["event_type"] == "purchase"
    assert float(got[0]["price"]) == 9.99


def test_duplicate_event_id_rejected(spark, pg):
    eid = str(uuid.uuid4())
    jdbc_append(_event_df(spark, eid), pg, "ecommerce_events")
    with pytest.raises(Exception):  # PK violation surfaces as SparkException
        jdbc_append(_event_df(spark, eid), pg, "ecommerce_events")


def test_invalid_event_type_rejected(spark, pg):
    with pytest.raises(Exception):
        jdbc_append(
            _event_df(spark, str(uuid.uuid4()), event_type="invalid_type"),
            pg, "ecommerce_events",
        )


def test_negative_price_rejected(spark, pg):
    with pytest.raises(Exception):
        jdbc_append(
            _event_df(spark, str(uuid.uuid4()), price=-1.0),
            pg, "ecommerce_events",
        )


def test_dead_letter_accepts_rejected_row(spark, pg):
    eid = str(uuid.uuid4())
    df = spark.createDataFrame(
        [(eid, "invalid_type", -1.0, "INVALID_EVENT_TYPE;NEGATIVE_PRICE")],
        "event_id string, event_type string, price double, validation_errors string",
    )
    jdbc_append(df, pg, "dead_letter_events")
    got = jdbc_read_subquery(
        spark, pg,
        f"SELECT validation_errors FROM dead_letter_events WHERE event_id = '{eid}'",
    ).collect()
    assert len(got) == 1 and "INVALID_EVENT_TYPE" in got[0]["validation_errors"]


def test_hourly_view_queryable(spark, pg):
    jdbc_append(_event_df(spark, str(uuid.uuid4())), pg, "ecommerce_events")
    got = jdbc_read_subquery(
        spark, pg,
        "SELECT event_type, event_count FROM v_hourly_event_summary "
        "WHERE event_type = 'purchase'",
    ).collect()
    assert len(got) >= 1 and got[0]["event_count"] >= 1
