"""Schema registry: versions, migration defaults, auto-detect,
validation (reference tests/test_schema_registry.py tier-3)."""

from __future__ import annotations

from pyspark.sql import Row

from spark_streaming_postgres_lab2_spark.schema.registry import (
    SCHEMA_V1,
    SCHEMA_V2,
    SCHEMA_V3,
    SchemaRegistry,
    get_registry,
)


def v1_df(spark):
    return spark.createDataFrame(
        [Row(event_id="e1", user_id=1, event_type="view", product_id=5,
             price=1.0, event_time="2024-01-01T00:00:00")],
        schema=SCHEMA_V1,
    )


def test_versions_registered():
    reg = SchemaRegistry()
    assert reg.versions() == ["v1", "v2", "v3"]
    assert reg.current_version == "v2"
    assert len(SCHEMA_V1.fields) == 6
    assert len(SCHEMA_V2.fields) == 12
    assert len(SCHEMA_V3.fields) == 19


def test_migrate_v1_to_v2_adds_defaults(spark):
    reg = SchemaRegistry()
    out = reg.migrate(v1_df(spark), "v1", "v2")
    assert out.columns == [f.name for f in SCHEMA_V2.fields]
    row = out.first()
    assert row["session_id"] is None  # nullable -> NULL
    assert row["quantity"] is None
    assert row["event_id"] == "e1"  # existing data preserved


def test_migrate_to_v3_stamps_version(spark):
    reg = SchemaRegistry()
    out = reg.migrate(v1_df(spark), "v1", "v3")
    assert out.first()["schema_version"] == "v3"
    assert out.columns == [f.name for f in SCHEMA_V3.fields]


def test_auto_migrate_detects_v1(spark):
    reg = SchemaRegistry()
    out = reg.auto_migrate(v1_df(spark))
    assert set(out.columns) == {f.name for f in SCHEMA_V2.fields}


def test_detect_via_schema_version_column(spark):
    reg = SchemaRegistry()
    df = reg.migrate(v1_df(spark), "v1", "v3")
    assert reg.detect_version(df) == "v3"


def test_validate_missing_and_extra(spark):
    reg = SchemaRegistry()
    from pyspark.sql import functions as F

    df = v1_df(spark).drop("price").withColumn("bogus", F.lit(1.0))
    report = reg.validate_against_schema(df, "v1")
    assert "price" in report["missing_required_fields"]
    assert "bogus" in report["extra_fields"]
    assert not report["is_valid"]


def test_validate_type_mismatch(spark):
    # the reference left this check unimplemented (registry.py:262-266)
    reg = SchemaRegistry()
    base = v1_df(spark)
    df = base.withColumn("price", base["price"].cast("string"))
    report = reg.validate_against_schema(df, "v1")
    assert "price" in report["type_mismatches"]
    assert not report["is_valid"]


def test_singleton():
    assert get_registry() is get_registry()


def test_detect_version_prefers_smallest_superset(spark):
    reg = SchemaRegistry()
    assert reg.detect_version(v1_df(spark)) == "v1"
    v2 = reg.migrate(v1_df(spark), "v1", "v2")
    assert reg.detect_version(v2) == "v2"
