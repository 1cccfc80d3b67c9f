"""Kafka source contract tests -- the jar-independent half.

The connector jar is absent in this environment (re-checked every
round), so ``kafka_stream``'s ``readStream.format("kafka")`` load
cannot execute here.  Everything AFTER the load -- the wire-frame
parse (binary ``value`` payload -> ``from_csv`` against the explicit
registry schema, broker ``timestamp`` carried as lineage) -- is plain
column logic, and these tests pin it on a static frame shaped exactly
like Kafka's (key/value binary, topic/partition/offset, timestamp),
mirroring how test_jdbc_contract.py pins the writer options without a
database.  When a jar appears, only the connector load itself remains
unexecuted (sources/kafka.py recipe).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from spark_streaming_postgres_lab2_spark.schema.registry import SCHEMA_V2
from spark_streaming_postgres_lab2_spark.sources.kafka import parse_kafka_frame


def _kafka_frame(spark, payloads: list[str | None]):
    """A static DataFrame with the exact column set Kafka's reader
    emits (Spark docs: key/value binary, topic string, partition int,
    offset long, timestamp, timestampType)."""
    ts = datetime(2026, 8, 15, 12, 0, 0)
    rows = [
        (None, p.encode() if p is not None else None, "events", 0, i, ts, 0)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )


_GOOD = (
    "e-1,42,s-9,purchase,7,electronics,19.99,2,premium,,"
    "2026-08-15 11:59:58,web"
)


def test_parse_matches_registry_schema_and_values(spark):
    out = parse_kafka_frame(_kafka_frame(spark, [_GOOD]), SCHEMA_V2)
    # column contract: every registry field, in order, plus the broker
    # timestamp as lineage
    assert out.columns == [f.name for f in SCHEMA_V2.fields] + ["kafka_timestamp"]
    got = dict(zip(SCHEMA_V2.fieldNames(), out.collect()[0]))
    assert got["event_id"] == "e-1"
    assert got["user_id"] == 42
    assert got["event_type"] == "purchase"
    assert got["product_id"] == 7
    assert got["price"] == 19.99
    assert got["quantity"] == 2
    assert got["search_query"] is None  # empty CSV cell -> NULL
    assert got["event_time"] == "2026-08-15 11:59:58"


def test_parse_types_match_registry_exactly(spark):
    out = parse_kafka_frame(_kafka_frame(spark, [_GOOD]), SCHEMA_V2)
    got = {f.name: f.dataType for f in out.schema.fields if f.name != "kafka_timestamp"}
    want = {f.name: f.dataType for f in SCHEMA_V2.fields}
    assert got == want


def test_malformed_payloads_become_nulls_not_errors(spark):
    """Kafka delivers whatever producers wrote: a short row, a
    type-mismatched cell, and a NULL payload must parse to NULL cells
    (the downstream validation chain's dead-letter rules then tag
    them), never throw -- the same contract the CSV file source gives
    malformed rows."""
    bad = [
        "e-2,notanint,s,view,1,cat,bad,1,seg,q,2026-08-15 12:00:00,web",
        "e-3,1",  # truncated row
        None,  # tombstone / null payload
    ]
    rows = parse_kafka_frame(_kafka_frame(spark, bad), SCHEMA_V2).collect()
    assert len(rows) == 3
    r0, r1, r2 = rows
    assert r0.event_id == "e-2" and r0.user_id is None and r0.price is None
    assert r1.event_id == "e-3" and r1.user_id == 1 and r1.event_type is None
    assert all(r2[f.name] is None for f in SCHEMA_V2.fields)
    # broker timestamp lineage survives even a null payload
    assert all(r.kafka_timestamp is not None for r in rows)


def test_parsed_frame_flows_through_the_validation_chain(spark):
    """End-to-end seam check: the parsed Kafka frame plugs into the
    SAME validation entrypoint the file source feeds (the pipeline
    seam the pydatasource stream-join test proves live), and the
    dead-letter rules tag Kafka-borne malformed rows exactly like
    file-borne ones."""
    from spark_streaming_postgres_lab2_spark.operators.validate import validate

    frame = parse_kafka_frame(
        _kafka_frame(spark, [_GOOD, "e-4,5,s,view,,cat,1.0,1,seg,q,t,web"]),
        SCHEMA_V2,
    )
    tagged = validate(frame.drop("kafka_timestamp"))
    got = {r.event_id: (r.is_valid, r.validation_errors) for r in tagged.collect()}
    assert got["e-1"] == (True, None)
    assert got["e-4"][0] is False  # null product_id -> dead letter
    assert got["e-4"][1] == "null_product_id"


def test_from_csv_ddl_roundtrips_schema_fields(spark):
    """The DDL string handed to from_csv must cover every field of
    whatever schema version is passed (v1 and v3 too, not just v2) --
    a silently dropped field would surface as a hole in the parsed
    frame, not an error."""
    from spark_streaming_postgres_lab2_spark.schema.registry import (
        SCHEMA_V1,
        SCHEMA_V3,
    )

    for schema in (SCHEMA_V1, SCHEMA_V2, SCHEMA_V3):
        out = parse_kafka_frame(_kafka_frame(spark, ["x"]), schema)
        assert out.columns == [f.name for f in schema.fields] + ["kafka_timestamp"]
