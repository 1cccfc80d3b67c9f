"""Round-trip equivalence for the non-parquet batch formats
(sources/formats.py): the SAME rows, types, and query results must
come back from ORC, JSON-lines, and CSV as from the parquet fixture.

Tables chosen to cover the hostile column classes: ``events`` has
micro-precision timestamps, NULLs, and an embedded-JSON string column
(quotes + commas inside CSV fields); ``lineitem`` has dates, doubles,
and multi-char strings.
"""

from __future__ import annotations

import pytest

from spark_streaming_postgres_lab2_spark.sources.formats import (
    FORMATS,
    read_table,
    write_table,
)
from spark_streaming_postgres_lab2_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple("NULL" if v is None else repr(v) for v in (row[c] for c in cols))
        for row in df.collect()
    )


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("table", ["events", "lineitem"])
def test_round_trip_preserves_rows_and_types(spark, tmp_path, fmt, table):
    orig = load_table(spark, SF_DIR, table)
    path = str(tmp_path / f"{table}.{fmt}")
    write_table(orig, path, fmt)
    back = read_table(spark, path, fmt, orig.schema)
    assert back.schema == orig.schema
    assert _canon(back) == _canon(orig)


@pytest.mark.parametrize("fmt", FORMATS)
def test_query_results_are_format_independent(spark, tmp_path, fmt):
    """The flagship hourly rollup must produce identical results when
    the events table arrives in any format: operators must never
    depend on the storage layer."""
    import spark_streaming_postgres_lab2_spark.queries.core as core
    from spark_streaming_postgres_lab2_spark.queries.core import (
        q_hourly_event_summary,
    )

    orig = load_table(spark, SF_DIR, "events")
    path = str(tmp_path / f"events.{fmt}")
    write_table(orig, path, fmt)
    back = read_table(spark, path, fmt, orig.schema)

    expected = _canon(q_hourly_event_summary(spark, SF_DIR))
    orig_load = core.load_tables
    try:
        core.load_tables = lambda _s, _d, _t: {"events": back}
        got = _canon(q_hourly_event_summary(spark, "unused"))
    finally:
        core.load_tables = orig_load
    assert got == expected


def test_csv_hostile_string_values_survive_round_trip(spark, tmp_path):
    """r13 advice: the old CSV dialect used the MySQL-dump sentinel
    ``\\N`` for NULL, so a field whose DATA is that literal string was
    written unquoted and read back as NULL -- silent corruption on
    arbitrary production corpora.  The dialect now distinguishes NULL
    (zero-width unquoted field) from empty string (quoted \"\") and
    every printable string value -- including a literal backslash-N
    and whitespace-significant strings -- survives byte-identically."""
    rows = [
        (1, "\\N"),             # the old sentinel as DATA
        (2, None),              # genuine NULL
        (3, ""),                # empty string (must NOT become NULL)
        (4, ' json {"a": 1}, "b" '),  # quotes, commas, edge whitespace
        (5, "__SPARK_GRAFT_NULL__"),  # any plausible textual sentinel
        (6, "\\\\N"),           # escaped-sentinel lookalike
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    path = str(tmp_path / "hostile.csv")
    write_table(df, path, "csv")
    back = read_table(spark, path, "csv", df.schema)
    assert sorted((r.id, r.s) for r in back.collect()) == sorted(rows)
