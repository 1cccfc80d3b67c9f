"""Minimal pure-Python PostgreSQL client (v3 wire protocol, simple
query flow) + a ``BatchRouter.write_fn`` adapter, so the live-Postgres
integration tier can execute against a real server even where neither
the JDBC driver jar nor a Python database package exists (this
sandbox ships Postgres 15 server binaries but no client libraries).

Scope and positioning:

- The PRODUCTION database path remains ``sources/jdbc.py`` --
  distributed, batched, executor-side writes through Spark's JDBC
  sink.  This module is the *test/fallback* tier: driver-side text-
  protocol inserts, right for integration checks and small control
  tables, wrong for bulk fact data (documented, not a limitation to
  fix).
- Implements exactly the subset the integration tier needs: startup
  with trust auth, the simple-query message flow (``Q`` ->
  RowDescription / DataRow / CommandComplete / ErrorResponse /
  ReadyForQuery), text-format results, SQLSTATE-carrying errors.
  No extended protocol, no TLS, no SCRAM -- a local trust-auth
  cluster is the target (tests/test_pg_live.py spins one up).

Protocol reference: the public PostgreSQL Frontend/Backend Protocol
documentation (chapter 55 of the PostgreSQL manual).  Parity target:
the reference's live-database tier (reference
tests/test_integration.py:45-353; docker/postgres/postgres_setup.sql
for the schema), previously executable only with a JDBC jar
(tests/test_jdbc_integration.py, env-gated).
"""

from __future__ import annotations

import datetime as _dt
import socket
import struct
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Iterable, Sequence

PROTOCOL_3_0 = 196608  # 3 << 16


class PGError(Exception):
    """Server ErrorResponse: carries the SQLSTATE so constraint tests
    can assert the exact rejection class (23505 unique_violation,
    23514 check_violation, 23502 not_null_violation...)."""

    def __init__(self, sqlstate: str, message: str):
        super().__init__(f"[{sqlstate}] {message}")
        self.sqlstate = sqlstate
        self.message = message


@dataclass
class PGResult:
    columns: list[str]
    rows: list[tuple]
    command_tag: str

    def scalar(self):
        return self.rows[0][0] if self.rows else None


class PGConn:
    """One backend session over a unix socket or TCP."""

    def __init__(
        self,
        user: str,
        database: str,
        host: str | None = None,
        port: int = 5432,
        unix_socket_dir: str | None = None,
    ):
        if unix_socket_dir is not None:
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.connect(f"{unix_socket_dir}/.s.PGSQL.{port}")
        else:
            self._sock = socket.create_connection((host or "127.0.0.1", port))
        body = b"".join(
            [
                struct.pack("!i", PROTOCOL_3_0),
                b"user\x00" + user.encode() + b"\x00",
                b"database\x00" + database.encode() + b"\x00",
                b"\x00",
            ]
        )
        try:
            self._sock.sendall(struct.pack("!i", len(body) + 4) + body)
            self._drain_until_ready()
        except BaseException:
            # a failed handshake (e.g. SCRAM-configured server) raises
            # from __init__, so no object exists for the caller to
            # close -- don't leak the fd (review finding r6)
            self._sock.close()
            raise

    # --- framing ---------------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("postgres closed the connection")
            buf += chunk
        return buf

    def _read_message(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack("!i", self._recv_exact(4))
        return mtype, self._recv_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        i = 0
        while i < len(payload) and payload[i] != 0:
            code = chr(payload[i])
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1 : end].decode("utf-8", "replace")
            i = end + 1
        return fields

    def _drain_until_ready(self) -> None:
        err: dict[str, str] | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack("!i", payload[:4])
                if code != 0:  # 0 = AuthenticationOk
                    raise PGError(
                        "28000",
                        f"unsupported auth method {code}; this client targets "
                        "trust-auth clusters only",
                    )
            elif mtype == b"E":
                err = self._error_fields(payload)
            elif mtype == b"Z":  # ReadyForQuery
                if err is not None:
                    raise PGError(err.get("C", "?????"), err.get("M", "unknown"))
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' Notice: skip

    # --- queries ---------------------------------------------------------

    def query(self, sql: str) -> PGResult:
        """Run one SQL string via the simple-query protocol; returns the
        LAST statement's result set (text format decoded to str; NULL
        -> None).  Raises PGError with the server's SQLSTATE after the
        backend re-settles on ReadyForQuery, so the connection stays
        usable across rejected statements (what the constraint tests
        do repeatedly)."""
        payload = sql.encode() + b"\x00"
        self._sock.sendall(b"Q" + struct.pack("!i", len(payload) + 4) + payload)
        columns: list[str] = []
        rows: list[tuple] = []
        tag = ""
        err: dict[str, str] | None = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack("!h", payload[:2])
                columns, rows = [], []
                i = 2
                for _ in range(nfields):
                    end = payload.index(b"\x00", i)
                    columns.append(payload[i:end].decode())
                    i = end + 1 + 18  # tableoid+attnum+typoid+typlen+typmod+fmt
            elif mtype == b"D":  # DataRow
                (ncols,) = struct.unpack("!h", payload[:2])
                i = 2
                vals: list[str | None] = []
                for _ in range(ncols):
                    (ln,) = struct.unpack("!i", payload[i : i + 4])
                    i += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[i : i + ln].decode("utf-8", "replace"))
                        i += ln
                rows.append(tuple(vals))
            elif mtype == b"C":  # CommandComplete
                tag = payload.rstrip(b"\x00").decode()
            elif mtype == b"E":
                err = self._error_fields(payload)
            elif mtype == b"Z":
                if err is not None:
                    raise PGError(err.get("C", "?????"), err.get("M", "unknown"))
                return PGResult(columns, rows, tag)
            # 'I' EmptyQueryResponse / 'N' Notice / 'S' Status: skip

    def close(self) -> None:
        try:
            self._sock.sendall(b"X" + struct.pack("!i", 4))  # Terminate
        finally:
            self._sock.close()

    def __enter__(self) -> "PGConn":
        return self

    def __exit__(self, *_exc) -> None:
        self.close()


# --- literal rendering -------------------------------------------------------


def pg_literal(v: Any) -> str:
    """Render a Python value as a SQL literal.  Standard-conforming
    strings (the PG15 default) make quote-doubling sufficient; NUL
    bytes are rejected (Postgres text cannot hold them)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # NaN/Infinity stringify to bare tokens that SQL would read as
        # column references (review finding r6: a CSV 'NaN' price that
        # routes to the DLQ must not crash the DLQ write) -- Postgres
        # accepts them as QUOTED spellings for float/numeric input
        # (numeric takes 'NaN' only; an Infinity reaching a NUMERIC
        # column is a legitimate server-side rejection)
        if v != v:
            return "'NaN'"
        if v in (float("inf"), float("-inf")):
            return "'Infinity'" if v > 0 else "'-Infinity'"
        return str(v)
    if isinstance(v, (int, Decimal)):
        return str(v)
    if isinstance(v, _dt.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, _dt.date):
        return "'" + v.isoformat() + "'"
    s = str(v)
    if "\x00" in s:
        raise ValueError("NUL byte in SQL literal")
    return "'" + s.replace("'", "''") + "'"


def insert_batch(
    conn: PGConn,
    table: str,
    columns: Sequence[str],
    rows: Iterable[Sequence[Any]],
    on_conflict_do_nothing: bool = False,
    chunk_size: int = 500,
    txn: bool = True,
) -> int:
    """Multi-row INSERT in chunks; returns rows inserted.  With
    ``on_conflict_do_nothing`` a replayed micro-batch is absorbed by
    the PRIMARY KEY exactly like the reference's dedup-by-PK intent
    (reference postgres_setup.sql:8 comment); without it a duplicate
    raises PGError 23505, which the constraint tests assert.

    With ``txn`` (default) the chunks run in ONE transaction, so a
    mid-batch failure rolls back cleanly instead of leaving a
    partially-committed batch visible (review finding r6); pass
    txn=False when the caller manages a wider transaction."""
    rows = list(rows)
    if not rows:
        return 0
    cols = ", ".join(columns)
    suffix = " ON CONFLICT DO NOTHING" if on_conflict_do_nothing else ""
    inserted = 0
    if txn:
        conn.query("BEGIN")
    try:
        for i in range(0, len(rows), chunk_size):
            chunk = rows[i : i + chunk_size]
            values = ", ".join(
                "(" + ", ".join(pg_literal(v) for v in r) + ")" for r in chunk
            )
            res = conn.query(
                f"INSERT INTO {table} ({cols}) VALUES {values}{suffix}"
            )
            # tag is "INSERT 0 <n>"
            inserted += int(res.command_tag.rsplit(" ", 1)[-1] or 0)
    except BaseException:
        if txn:
            conn.query("ROLLBACK")
        raise
    if txn:
        conn.query("COMMIT")
    return inserted


# --- BatchRouter adapter -----------------------------------------------------


def pgwire_write_fn(
    conn_factory,
    table_for_path: dict[str, str],
    on_conflict_do_nothing: bool = True,
    delete_by_batch: dict[str, str] | None = None,
):
    """A ``BatchRouter.write_fn`` that routes each sink path to a
    Postgres table over the wire client -- the no-jar stand-in for the
    JDBC appends (S3-S5), letting the FULL production pipeline
    (validation chain -> routing -> metrics, streaming/sinks.py) run
    end-to-end against a live database.

    Idempotency under retry/replay (review finding r6): each write is
    ONE transaction (delete + inserts), so a mid-write failure rolls
    back and the RetryPolicy re-runs against clean state.  Replay of a
    COMMITTED epoch is absorbed per table: the events table by its
    PRIMARY KEY (``on_conflict_do_nothing``), and any table named in
    ``delete_by_batch`` (table -> batch-id column, e.g.
    data_quality_metrics -> batch_id) by a batch-scoped delete-then-
    insert.  A table with neither -- the reference's dead-letter
    table has no PK or batch column -- retains the reference's own
    JDBC-append replay semantics (duplicates possible only when a
    commit succeeds but its confirmation is lost).

    Driver-side by design: rows cross ``toLocalIterator`` in insert
    chunks.  Right for the integration tier and control-table volumes;
    the 100 TB path is the executor-side JDBC sink.  Timestamps arrive
    as naive datetimes in the session timezone (UTC); ``processed_at``
    and friends are passed through as literals."""
    delete_by_batch = delete_by_batch or {}

    def write(df, path: str, batch_id: int) -> None:
        table = None
        for key, t in table_for_path.items():
            if key in path:
                table = t
                break
        if table is None:
            raise ValueError(f"no table mapping for sink path {path!r}")
        cols = df.columns
        conn = conn_factory()
        try:
            conn.query("BEGIN")
            try:
                batch_col = delete_by_batch.get(table)
                if batch_col is not None:
                    conn.query(
                        f"DELETE FROM {table} WHERE {batch_col} = {int(batch_id)}"
                    )
                insert_batch(
                    conn,
                    table,
                    cols,
                    ([row[c] for c in cols] for row in df.toLocalIterator()),
                    on_conflict_do_nothing=on_conflict_do_nothing,
                    txn=False,  # this function owns the transaction
                )
            except BaseException:
                conn.query("ROLLBACK")
                raise
            conn.query("COMMIT")
        finally:
            conn.close()

    return write
