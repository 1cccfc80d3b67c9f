"""Versioned schema registry with migration.

Parity target: reference spark/schema/registry.py (v1 registry.py:56-70,
v2 :73-93, v3 :96-124, migrate :190-247, auto_migrate :284-321,
validate_against_schema :249-282).  Semantics reproduced:

- three registered versions of the e-commerce event schema; v2 is
  current;
- ``migrate`` adds target fields missing from the source with
  type-based defaults (NULL when nullable, else ""/0/0.0/False),
  projects to target field order, and stamps ``schema_version`` when
  the target schema carries that field;
- ``auto_migrate`` detects the source version from an explicit
  ``schema_version`` column, else newest-to-oldest by "all required
  (non-nullable) fields present";
- ``validate_against_schema`` reports missing required fields and
  extra fields -- and (fixing a reference gap: the type_mismatches key
  existed but was never populated, registry.py:262-266) actual type
  mismatches.

This is pure StructType bookkeeping + ``withColumn(lit(default))`` +
``select`` -- it composes with Parquet schema evolution and costs
nothing at scale (no shuffle, no action).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SCHEMA_V1 = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("user_id", IntegerType(), True),
        StructField("event_type", StringType(), False),
        StructField("product_id", IntegerType(), False),
        StructField("price", DoubleType(), False),
        StructField("event_time", StringType(), False),
    ]
)

SCHEMA_V2 = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("user_id", IntegerType(), True),
        StructField("session_id", StringType(), True),
        StructField("event_type", StringType(), False),
        StructField("product_id", IntegerType(), False),
        StructField("category", StringType(), True),
        StructField("price", DoubleType(), False),
        StructField("quantity", IntegerType(), True),
        StructField("user_segment", StringType(), True),
        StructField("search_query", StringType(), True),
        StructField("event_time", StringType(), False),
        StructField("source_system", StringType(), True),
    ]
)

SCHEMA_V3 = StructType(
    list(SCHEMA_V2.fields)
    + [
        StructField("device_type", StringType(), True),
        StructField("browser", StringType(), True),
        StructField("geo_country", StringType(), True),
        StructField("geo_city", StringType(), True),
        StructField("referrer", StringType(), True),
        StructField("campaign_id", StringType(), True),
        StructField("schema_version", StringType(), True),
    ]
)

CURRENT_VERSION = "v2"


def _default_for(dtype: DataType, nullable: bool) -> Any:
    """Type-based default for a field added during migration."""
    if nullable:
        return None
    if isinstance(dtype, StringType):
        return ""
    if isinstance(dtype, IntegerType):
        return 0
    if isinstance(dtype, DoubleType):
        return 0.0
    if isinstance(dtype, BooleanType):
        return False
    return None


class SchemaRegistry:
    """Registry of named, ordered schema versions with migration."""

    def __init__(self) -> None:
        self._versions: dict[str, StructType] = {}
        self._order: list[str] = []
        self.current_version = CURRENT_VERSION
        for name, schema in (("v1", SCHEMA_V1), ("v2", SCHEMA_V2), ("v3", SCHEMA_V3)):
            self.register(name, schema)

    def register(self, version: str, schema: StructType) -> None:
        if version not in self._versions:
            self._order.append(version)
        self._versions[version] = schema

    def get_schema(self, version: str | None = None) -> StructType:
        return self._versions[version or self.current_version]

    def versions(self) -> list[str]:
        return list(self._order)

    def required_fields(self, version: str) -> list[str]:
        return [f.name for f in self.get_schema(version).fields if not f.nullable]

    # -- migration ---------------------------------------------------------

    def migrate(self, df: DataFrame, from_version: str, to_version: str) -> DataFrame:
        """Project ``df`` onto ``to_version``: add missing fields with
        type-based defaults, reorder to target field order, stamp
        ``schema_version`` if the target carries it."""
        target = self.get_schema(to_version)
        existing = set(df.columns)
        out = df
        for field in target.fields:
            if field.name == "schema_version":
                out = out.withColumn("schema_version", F.lit(to_version))
            elif field.name not in existing:
                default = _default_for(field.dataType, field.nullable)
                out = out.withColumn(field.name, F.lit(default).cast(field.dataType))
        return out.select(*[f.name for f in target.fields])

    def detect_version(self, df: DataFrame) -> str | None:
        """Explicit ``schema_version`` column wins.  Otherwise pick the
        OLDEST version whose field set covers the frame's columns (the
        smallest superset): since versions are nested supersets with the
        same required core, a newest-first scan would claim every v1/v2
        frame as v3.  Falls back to the reference's newest-first
        'required fields present' heuristic (registry.py:284-321) when
        no version fully covers the columns."""
        if "schema_version" in df.columns:
            row = df.select("schema_version").first()
            if row is not None and row[0] in self._versions:
                return str(row[0])
        cols = set(df.columns)
        for version in self._order:  # oldest first: smallest superset wins
            required = set(self.required_fields(version))
            all_fields = {f.name for f in self.get_schema(version).fields}
            if required <= cols and cols <= all_fields:
                return version
        for version in reversed(self._order):
            if set(self.required_fields(version)) <= cols:
                return version
        return None

    def auto_migrate(self, df: DataFrame) -> DataFrame:
        detected = self.detect_version(df)
        if detected is None:
            raise ValueError(
                f"cannot detect schema version for columns {sorted(df.columns)}"
            )
        if detected == self.current_version:
            return df
        return self.migrate(df, detected, self.current_version)

    # -- validation --------------------------------------------------------

    def validate_against_schema(
        self, df: DataFrame, version: str | None = None
    ) -> dict[str, Any]:
        schema = self.get_schema(version)
        df_types = {f.name: f.dataType for f in df.schema.fields}
        target_fields = {f.name: f for f in schema.fields}
        missing_required = [
            f.name
            for f in schema.fields
            if not f.nullable and f.name not in df_types
        ]
        extra = [c for c in df.columns if c not in target_fields]
        mismatches = {
            name: {"expected": str(target_fields[name].dataType), "actual": str(dt)}
            for name, dt in df_types.items()
            if name in target_fields and dt != target_fields[name].dataType
        }
        return {
            "is_valid": not missing_required and not extra and not mismatches,
            "missing_required_fields": missing_required,
            "extra_fields": extra,
            "type_mismatches": mismatches,
        }


_registry: SchemaRegistry | None = None


def get_registry() -> SchemaRegistry:
    """Process-global singleton, as in the reference (registry.py:324-330)."""
    global _registry
    if _registry is None:
        _registry = SchemaRegistry()
    return _registry
