"""Type-awareness of the local parity replica (VERDICT r9 item 2).

The r9 compaction_plan driver hash-fail was TYPE-ONLY: DuckDB's
windowed ``sum()`` returns HUGEINT, the un-cast ``// target`` kept it
HUGEINT, values were row-identical, yet the driver's type-sensitive
hash failed -- while the local replica's ``canon()`` stringifies
cells and so hashed both sides identically.  These tests pin the
sibling type check that closes that blind spot, plus a full-inventory
sweep so no other oracle can ship an un-cast HUGEINT/DECIMAL column.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from parity_check import (  # noqa: E402
    _norm_duck_type,
    _norm_spark_type,
    register_fixture_views,
    type_problems,
)


def test_hugeint_oracle_column_is_flagged():
    """The exact r9 bug class: a HUGEINT-typed oracle column against a
    Spark BIGINT column must FAIL the type check even though every
    stringified value matches."""
    con = duckdb.connect()
    rel = con.sql("SELECT sum(x) AS bin_id FROM (VALUES (1), (2)) t(x)")
    assert str(rel.types[0]).upper() == "HUGEINT"  # DuckDB's sum(int) shape
    problems = type_problems([("bin_id", "bigint")], rel.columns, rel.types)
    assert problems and "HUGEINT" in problems[0]
    # ...and the documented fix (CAST ... AS BIGINT) clears it
    fixed = con.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS bin_id FROM (VALUES (1), (2)) t(x)"
    )
    assert type_problems([("bin_id", "bigint")], fixed.columns, fixed.types) == []


def test_decimal_vs_double_is_flagged_but_matching_families_pass():
    assert type_problems(
        [("r", "double")], ["r"], ["DECIMAL(18,2)"]
    ), "DECIMAL against Spark double must be flagged"
    # matching families and nested ('other') types pass
    assert type_problems(
        [("a", "bigint"), ("b", "double"), ("c", "string"),
         ("d", "boolean"), ("e", "timestamp"), ("f", "array<bigint>")],
        ["a", "b", "c", "d", "e", "f"],
        ["BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "TIMESTAMP", "BIGINT[]"],
    ) == []
    # int width differences are NOT divergences (both hash as ints)
    assert type_problems([("a", "int")], ["a"], ["BIGINT"]) == []


def test_normalizers_cover_the_driver_sensitive_families():
    assert _norm_duck_type("HUGEINT") == "hugeint"
    assert _norm_duck_type("DECIMAL(38,9)") == "decimal"
    assert _norm_spark_type("decimal(10,2)") == "decimal"
    # decimal-vs-decimal is fine (same family on both sides)
    assert type_problems([("x", "decimal(10,2)")], ["x"], ["DECIMAL(10,2)"]) == []


def test_every_oracle_is_free_of_hugeint_and_decimal(sf_dir):
    """Inventory-wide sweep: run all 167 oracles on DuckDB at sf0.001
    and assert no result column is HUGEINT or DECIMAL -- the repo
    convention (queries/__init__.py: integer sums CAST to BIGINT)
    enforced as a test instead of a review step."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    register_fixture_views(con, sf_dir)

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            (c, str(t)) for c, t in zip(rel.columns, rel.types)
            if _norm_duck_type(str(t)) in ("hugeint", "decimal")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"un-cast driver-hash-sensitive columns: {offenders}"


def test_compaction_plan_oracle_bin_id_is_bigint():
    """Regression pin for the r9 red specifically."""
    from spark_streaming_postgres_lab2_spark.queries.ext import (
        ORACLE_COMPACTION_PLAN,
    )

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    rel = con.sql(ORACLE_COMPACTION_PLAN)
    types = dict(zip(rel.columns, (str(t).upper() for t in rel.types)))
    assert types["bin_id"] == "BIGINT", types


@pytest.mark.parametrize("col_exprs, spark_dtypes, n_problems", [
    # window-sum-derived integer division -- the compaction_plan shape
    ("sum(x) OVER () // 10 AS b", [("b", "bigint")], 1),
    ("CAST(sum(x) OVER () // 10 AS BIGINT) AS b", [("b", "bigint")], 0),
])
def test_windowed_division_shapes(col_exprs, spark_dtypes, n_problems):
    con = duckdb.connect()
    rel = con.sql(f"SELECT {col_exprs} FROM (VALUES (1), (2)) t(x)")
    assert len(type_problems(spark_dtypes, rel.columns, rel.types)) == n_problems


def test_every_oracle_is_free_of_nan_and_inf(sf_dir):
    """Companion sweep to the HUGEINT audit: a NaN/Infinity cell
    stringifies identically in the local canon() on both engines yet
    can serialize differently in the driver's type-sensitive hash
    (float('nan') vs None vs 'Infinity'), so no oracle may emit one --
    degenerate denominators must be nullif-guarded (the
    substring_dedup_cut retained_ratio convention)."""
    import math

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    register_fixture_views(con, sf_dir)

    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        cols = rel.columns
        hits = [
            (c, v)
            for r in rel.fetchall()
            for c, v in zip(cols, r)
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v))
        ]
        if hits:
            offenders[name] = hits[:3]
    assert not offenders, f"non-finite oracle values: {offenders}"
