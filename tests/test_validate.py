"""Validation rule-chain semantics (reference
tests/test_transformations.py tier-1 mirror: first-match-wins ordering,
tag equality, valid/invalid routing)."""

from __future__ import annotations

from spark_streaming_postgres_lab2_spark.operators.validate import (
    ecommerce_rules,
    split_valid_invalid,
    validate,
)

from conftest import EVENT_V2_DDL


def make_event(**overrides):
    base = dict(
        event_id="e1",
        user_id=1,
        session_id="s",
        event_type="view",
        product_id=10,
        category="books",
        price=0.0,
        quantity=0,
        user_segment="new",
        search_query="",
        event_time="2024-01-01T00:00:00",
        source_system="web",
    )
    base.update(overrides)
    return tuple(base.values())


def tag_of(spark, **overrides):
    df = spark.createDataFrame([make_event(**overrides)], schema=EVENT_V2_DDL)
    row = validate(df).select("validation_errors", "is_valid").first()
    return row["validation_errors"], row["is_valid"]


def test_clean_event_is_valid(spark):
    tag, ok = tag_of(spark)
    assert tag is None and ok


def test_null_event_id(spark):
    tag, ok = tag_of(spark, event_id=None)
    assert tag == "null_event_id" and not ok


def test_invalid_event_type(spark):
    tag, _ = tag_of(spark, event_type="INVALID_TYPE")
    assert tag == "invalid_event_type"


def test_purchase_without_user(spark):
    tag, _ = tag_of(spark, event_type="purchase", user_id=None, price=10.0)
    assert tag == "purchase_without_user"


def test_per_type_without_user_tags(spark):
    # Reference emits one tag per user-required event type
    # (spark_streaming_to_postgres.py:107-123), not a collapsed tag.
    for etype, want in [
        ("add_to_cart", "cart_without_user"),
        ("wishlist", "wishlist_without_user"),
        ("remove_from_cart", "remove_cart_without_user"),
    ]:
        tag, _ = tag_of(spark, event_type=etype, user_id=None, price=0.0)
        assert tag == want, (etype, tag)


def test_negative_price(spark):
    tag, _ = tag_of(spark, price=-5.0)
    assert tag == "negative_price"


def test_extreme_price(spark):
    tag, _ = tag_of(spark, event_type="purchase", price=99999.99)
    assert tag == "extreme_price"


def test_purchase_with_zero_price(spark):
    tag, _ = tag_of(spark, event_type="purchase", price=0.0)
    assert tag == "purchase_zero_price"


def test_price_on_non_purchase(spark):
    tag, _ = tag_of(spark, event_type="view", price=10.0)
    assert tag == "non_purchase_has_price"


def test_first_match_wins_order(spark):
    # null event_id AND negative price: the earlier rule's tag wins
    tag, _ = tag_of(spark, event_id=None, price=-5.0)
    assert tag == "null_event_id"


def test_rule_order_is_stable():
    tags = [r.tag for r in ecommerce_rules()]
    # Exact reference vocabulary in reference order
    # (spark_streaming_to_postgres.py:103-135).
    assert tags == [
        "null_event_id",
        "null_product_id",
        "null_event_type",
        "invalid_event_type",
        "purchase_without_user",
        "cart_without_user",
        "wishlist_without_user",
        "remove_cart_without_user",
        "negative_price",
        "extreme_price",
        "purchase_zero_price",
        "non_purchase_has_price",
    ]


def test_split_valid_invalid(spark):
    df = spark.createDataFrame(
        [make_event(), make_event(event_id=None), make_event(price=-1.0)],
        schema=EVENT_V2_DDL,
    )
    valid, invalid = split_valid_invalid(validate(df))
    assert valid.count() == 1
    assert invalid.count() == 2


def test_load_table_normalizes_drifted_fixture_dtypes(spark, tmp_path):
    """The r2 incident class: the driver re-generates fixtures with a
    different physical type (TIMESTAMP_NTZ events.ts broke 5 queries +
    the whole bench).  load_table must cast any drifted column back to
    CANONICAL_DTYPES at load, so queries never see the drift."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_streaming_postgres_lab2_spark.sources.tables import load_table

    # events with tz-naive us timestamps (-> Spark TIMESTAMP_NTZ) and
    # value as float32 (canonical: double)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1700000000000000, 1700000001000000], pa.timestamp("us")),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["view", "purchase"]),
            "value": pa.array([1.5, 2.5], pa.float32()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp", dtypes
    assert dtypes["value"] == "double", dtypes
    # unix_micros -- the exact call that failed in r2 -- must resolve
    from pyspark.sql import functions as F

    assert df.select(F.unix_micros("ts")).count() == 2


def test_load_table_raises_on_incompatible_drift(spark, tmp_path):
    """ADVICE r3: compatible drift casts silently; INCOMPATIBLE drift
    (a value the canonical dtype cannot represent) must fail loudly at
    the load boundary, not become an all-NULL column."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from spark_streaming_postgres_lab2_spark.sources.tables import load_table

    # customer with a string-typed c_acctbal: "12.5" casts fine,
    # "not-a-number" must raise, not go NULL
    table = pa.table(
        {
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_name": pa.array(["a", "b"]),
            "c_nationkey": pa.array([0, 1], pa.int32()),
            "c_acctbal": pa.array(["12.5", "not-a-number"]),
            "c_mktsegment": pa.array(["x", "y"]),
        }
    )
    pq.write_table(table, str(tmp_path / "customer.parquet"))
    df = load_table(spark, str(tmp_path), "customer")
    with _pytest.raises(Exception, match="incompatible fixture drift"):
        df.collect()

    # the compatible row alone passes through with the cast applied
    ok = pa.table(
        {
            "c_custkey": pa.array([1], pa.int64()),
            "c_name": pa.array(["a"]),
            "c_nationkey": pa.array([0], pa.int32()),
            "c_acctbal": pa.array(["12.5"]),
            "c_mktsegment": pa.array(["x"]),
        }
    )
    pq.write_table(ok, str(tmp_path / "customer.parquet"))
    got = load_table(spark, str(tmp_path), "customer").collect()
    assert got[0]["c_acctbal"] == 12.5
