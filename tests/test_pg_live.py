"""LIVE-Postgres integration tier over the pure-Python wire client
(sources/pgwire.py) -- the first environment where the reference's
database semantics (reference tests/test_integration.py:45-353)
actually EXECUTE in this sandbox: Postgres 15 server binaries exist
here, but no JDBC jar and no Python database package, so the gated
JDBC tier (tests/test_jdbc_integration.py) still skips.  This tier
spins up a throwaway trust-auth cluster on a unix socket and drives:

- schema creation from the reference DDL (postgres_setup.sql),
- PRIMARY KEY duplicate rejection (SQLSTATE 23505) AND the
  on-conflict replay absorption the reference's PK comment intends,
- CHECK-constraint rejections (bad event type, negative price,
  user-required-for-actions; 23514) + NOT NULL (23502),
- dead-letter inserts with queryable validation_errors,
- the analytics views answering queries over inserted rows,
- and the FULL production streaming pipeline (validation chain ->
  BatchRouter -> sinks) writing its three outputs into live Postgres
  via the injectable write_fn seam -- generator CSVs in, constraint-
  checked rows + dead letters + quality metrics in the database out.

Cluster mechanics: initdb/pg_ctl refuse to run as root, so under a
root test run the cluster is owned by ``nobody`` via runuser (trust
auth makes the socket usable from any local uid); as a normal user it
runs directly.  Skips cleanly when the binaries are unavailable.
"""

from __future__ import annotations

import datetime
import os
import shutil
import subprocess
import tempfile
import uuid

import pytest

from spark_streaming_postgres_lab2_spark.sources.pgwire import (
    PGConn,
    PGError,
    insert_batch,
    pgwire_write_fn,
)

pytestmark = pytest.mark.integration

# Reference docker/postgres/postgres_setup.sql:7-40 (events table,
# full column list), :60-73 (dead letter), :85-95 (quality metrics),
# :101-147 (views).  The column lists ARE the spec the engine's
# ENRICHED_EVENT_COLUMNS / DEAD_LETTER_COLUMNS mirror.
DDL = [
    """CREATE TABLE IF NOT EXISTS ecommerce_events (
        event_id VARCHAR(36) PRIMARY KEY,
        user_id INT,
        session_id VARCHAR(50),
        event_type VARCHAR(20) NOT NULL CHECK (event_type IN
            ('view', 'purchase', 'add_to_cart', 'remove_from_cart',
             'wishlist', 'search')),
        product_id INT NOT NULL,
        category VARCHAR(50) DEFAULT 'unknown',
        price NUMERIC(10,2) NOT NULL CHECK (price >= 0),
        quantity INT DEFAULT 0,
        total_amount NUMERIC(12,2) DEFAULT 0,
        user_segment VARCHAR(20) DEFAULT 'unknown',
        search_query VARCHAR(255) DEFAULT '',
        event_time TIMESTAMP NOT NULL,
        event_year INT, event_month INT, event_day INT,
        event_hour INT, event_dayofweek INT,
        is_late_arrival BOOLEAN DEFAULT FALSE,
        source_file VARCHAR(500),
        source_system VARCHAR(50) DEFAULT 'unknown',
        processed_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
        CONSTRAINT chk_user_required_for_actions CHECK (
            (event_type IN ('view', 'search')) OR (user_id IS NOT NULL)
        )
    )""",
    """CREATE TABLE IF NOT EXISTS dead_letter_events (
        id SERIAL PRIMARY KEY,
        event_id VARCHAR(36),
        user_id INT,
        event_type VARCHAR(50),
        product_id INT,
        price NUMERIC(10,2),
        event_time TIMESTAMP,
        validation_errors TEXT NOT NULL,
        source_file VARCHAR(500),
        processed_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
    )""",
    """CREATE TABLE IF NOT EXISTS data_quality_metrics (
        id SERIAL PRIMARY KEY,
        batch_id INT NOT NULL,
        total_rows INT NOT NULL,
        valid_rows INT NOT NULL,
        invalid_rows INT NOT NULL,
        validity_rate NUMERIC(5,4),
        late_arrival_count INT DEFAULT 0,
        recorded_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
    )""",
    """CREATE OR REPLACE VIEW v_hourly_event_summary AS
       SELECT DATE_TRUNC('hour', event_time) AS event_hour, event_type,
              COUNT(*) AS event_count, COUNT(DISTINCT user_id) AS unique_users,
              SUM(total_amount) AS total_revenue
       FROM ecommerce_events GROUP BY 1, 2""",
    """CREATE OR REPLACE VIEW v_category_performance AS
       SELECT category, COUNT(*) AS total_events,
              COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
              SUM(total_amount) AS total_revenue
       FROM ecommerce_events GROUP BY category""",
]


def _run_as_pg_owner(args, as_nobody: bool):
    cmd = (["runuser", "-u", "nobody", "--"] if as_nobody else []) + args
    return subprocess.run(cmd, capture_output=True, text=True, cwd="/tmp")


@pytest.fixture(scope="module")
def pg():
    initdb, pg_ctl = shutil.which("initdb"), shutil.which("pg_ctl")
    if not initdb or not pg_ctl:
        pytest.skip("no Postgres server binaries in this environment")
    as_nobody = os.geteuid() == 0
    if as_nobody and not shutil.which("runuser"):
        pytest.skip("root without runuser: cannot drop privileges for postgres")
    base = tempfile.mkdtemp(prefix="pglive-")
    data, sock = f"{base}/data", f"{base}/sock"
    os.makedirs(sock)
    if as_nobody:
        shutil.chown(base, "nobody")
        shutil.chown(sock, "nobody")
    r = _run_as_pg_owner([initdb, "-D", data, "-U", "spark", "--auth=trust"], as_nobody)
    if r.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    started = _run_as_pg_owner(
        [
            pg_ctl, "-D", data, "-l", f"{base}/log", "-w",
            "-o", f"-c listen_addresses='' -k {sock}",
            "start",
        ],
        as_nobody,
    )
    if started.returncode != 0:
        shutil.rmtree(base, ignore_errors=True)
        pytest.skip(f"pg_ctl start failed: {started.stderr[-300:]}")
    try:
        with PGConn(user="spark", database="postgres", unix_socket_dir=sock) as admin:
            admin.query("CREATE DATABASE ecommerce")
        conn_factory = lambda: PGConn(  # noqa: E731
            user="spark", database="ecommerce", unix_socket_dir=sock
        )
        with conn_factory() as c:
            for stmt in DDL:
                c.query(stmt)
        yield conn_factory
    finally:
        _run_as_pg_owner([pg_ctl, "-D", data, "-m", "immediate", "stop"], as_nobody)
        shutil.rmtree(base, ignore_errors=True)


EVENT_COLS = ["event_id", "user_id", "event_type", "product_id", "price", "event_time"]
T0 = datetime.datetime(2024, 3, 15, 12, 0, 0)


def _ev(event_type="purchase", user_id=7, price=19.99, event_id=None):
    return (event_id or str(uuid.uuid4()), user_id, event_type, 101, price, T0)


def test_valid_insert_lands_and_is_queryable(pg):
    with pg() as c:
        eid = str(uuid.uuid4())
        assert insert_batch(c, "ecommerce_events", EVENT_COLS, [_ev(event_id=eid)]) == 1
        got = c.query(
            f"SELECT event_type, price FROM ecommerce_events WHERE event_id = '{eid}'"
        )
        assert got.rows == [("purchase", "19.99")]


def test_primary_key_rejects_duplicates_and_absorbs_replay(pg):
    with pg() as c:
        row = _ev()
        insert_batch(c, "ecommerce_events", EVENT_COLS, [row])
        with pytest.raises(PGError) as e:
            insert_batch(c, "ecommerce_events", EVENT_COLS, [row])
        assert e.value.sqlstate == "23505"  # unique_violation
        # the reference's dedup-by-PK intent: a replayed batch inserts 0
        assert (
            insert_batch(
                c, "ecommerce_events", EVENT_COLS, [row], on_conflict_do_nothing=True
            )
            == 0
        )


@pytest.mark.parametrize(
    "row,state",
    [
        (_ev(event_type="INVALID_TYPE"), "23514"),      # CHECK event_type
        (_ev(price=-5.0), "23514"),                      # CHECK price >= 0
        (_ev(event_type="purchase", user_id=None), "23514"),  # user required
        ((str(uuid.uuid4()), 7, None, 101, 1.0, T0), "23502"),  # NOT NULL
    ],
)
def test_constraints_reject_invalid_rows(pg, row, state):
    with pg() as c:
        before = int(c.query("SELECT count(*) FROM ecommerce_events").scalar())
        with pytest.raises(PGError) as e:
            insert_batch(c, "ecommerce_events", EVENT_COLS, [row])
        assert e.value.sqlstate == state
        after = int(c.query("SELECT count(*) FROM ecommerce_events").scalar())
        assert after == before  # the rejected row did not land


def test_insert_batch_is_atomic_across_chunks(pg):
    """A failure in a later chunk rolls back the whole batch -- no
    partially-committed rows (review finding r6)."""
    with pg() as c:
        before = int(c.query("SELECT count(*) FROM ecommerce_events").scalar())
        good = [_ev() for _ in range(3)]
        bad = _ev(price=-1.0)  # violates CHECK in the second chunk
        with pytest.raises(PGError):
            insert_batch(
                c, "ecommerce_events", EVENT_COLS, good + [bad], chunk_size=2
            )
        after = int(c.query("SELECT count(*) FROM ecommerce_events").scalar())
        assert after == before  # chunk 1's two good rows rolled back too


def test_nan_price_renders_as_valid_sql(pg):
    """float('nan') renders as the QUOTED 'NaN' spelling -- valid SQL
    that reaches the server -- instead of a bare nan token crashing
    the statement as an unresolved column (review finding r6).  Note
    Postgres orders numeric NaN ABOVE all numbers, so 'NaN' >= 0 is
    TRUE and the events CHECK accepts it: keeping NaN out of the
    valid table is (correctly) the in-stream validation chain's job,
    not the DDL's."""
    with pg() as c:
        eid = str(uuid.uuid4())
        n = insert_batch(
            c, "ecommerce_events", EVENT_COLS, [_ev(price=float("nan"), event_id=eid)]
        )
        assert n == 1
        got = c.query(
            f"SELECT price FROM ecommerce_events WHERE event_id = '{eid}'"
        )
        assert got.rows == [("NaN",)]
        # and the dead-letter table takes it too (where such rows
        # actually belong after in-stream validation)
        n = insert_batch(
            c,
            "dead_letter_events",
            ["event_id", "event_type", "price", "validation_errors"],
            [(str(uuid.uuid4()), "purchase", float("nan"), "negative_value")],
        )
        assert n == 1


def test_dead_letter_accepts_rejected_rows(pg):
    with pg() as c:
        n = insert_batch(
            c,
            "dead_letter_events",
            ["event_id", "event_type", "price", "validation_errors"],
            [(str(uuid.uuid4()), "INVALID_TYPE", 5.0, "invalid_event_type")],
        )
        assert n == 1
        tags = c.query(
            "SELECT DISTINCT validation_errors FROM dead_letter_events"
        ).rows
        assert ("invalid_event_type",) in tags


def test_views_answer_queries(pg):
    with pg() as c:
        insert_batch(c, "ecommerce_events", EVENT_COLS, [_ev(), _ev(event_type="view")])
        hourly = c.query(
            "SELECT event_type, event_count FROM v_hourly_event_summary "
            "ORDER BY event_type"
        )
        assert int(dict(hourly.rows)["purchase"]) >= 1
        cats = c.query("SELECT category, total_events FROM v_category_performance")
        assert len(cats.rows) >= 1


@pytest.mark.slow
def test_full_pipeline_writes_into_live_postgres(pg, spark, tmp_path):
    """The production streaming pipeline end-to-end into Postgres: the
    generator's CSVs stream through the validation chain and the
    BatchRouter routes valid rows / dead letters / quality metrics
    into the live database through the wire-client write_fn -- the
    reference's deployment shape (CSV watch -> validate -> Postgres)
    with only the JDBC jar swapped out."""
    from spark_streaming_postgres_lab2_spark.config import StreamingConfig
    from spark_streaming_postgres_lab2_spark.sources.datagen import EventGenerator
    from spark_streaming_postgres_lab2_spark.streaming.pipeline import build_pipeline

    with pg() as c:
        c.query(
            "TRUNCATE ecommerce_events, dead_letter_events, data_quality_metrics"
        )

    input_dir = str(tmp_path / "in")
    now = T0.replace(tzinfo=datetime.timezone.utc)
    gen = EventGenerator(seed=23, anomaly_rate=0.2, now=now)
    gen.write_csv(gen.generate_batch(120), input_dir, "events_000000.csv")

    cfg = StreamingConfig(
        input_path=input_dir,
        checkpoint_path=str(tmp_path / "ckpt"),
        output_path=str(tmp_path / "out"),
    )
    pipe = build_pipeline(spark, cfg)
    pipe.router.write_fn = pgwire_write_fn(
        pg,
        {
            "ecommerce_events": "ecommerce_events",
            "dead_letter_events": "dead_letter_events",
            "quality_metrics": "data_quality_metrics",
        },
        delete_by_batch={"data_quality_metrics": "batch_id"},
    )
    pipe.start(trigger_once=True).awaitTermination(120)

    with pg() as c:
        ev = int(c.query("SELECT count(*) FROM ecommerce_events").scalar())
        dl = int(c.query("SELECT count(*) FROM dead_letter_events").scalar())
        m = c.query(
            "SELECT total_rows, valid_rows, invalid_rows FROM data_quality_metrics"
        ).rows
        # every generated event landed exactly once, on the side the
        # validation chain chose, and the metrics row reconciles
        assert ev + dl == 120
        assert len(m) == 1
        total, valid, invalid = (int(x) for x in m[0])
        assert (total, valid, invalid) == (120, ev, dl)
        assert dl > 0  # anomaly_rate=0.2 guarantees dead letters
        # the database's own constraints agree with the in-stream
        # validation chain: Postgres accepted every routed-valid row
        hourly = c.query("SELECT count(*) FROM v_hourly_event_summary")
        assert int(hourly.scalar()) >= 1
