"""Keyed upsert (MERGE INTO emulation) for parquet-backed tables.

Without Delta/Iceberg (jars absent in this environment), MERGE is
emulated the classic way: ``target ANTI JOIN updates`` (rows the merge
doesn't touch) ``UNION ALL updates`` -- one shuffle on the key, then an
atomic directory swap on write.  This is also the staged-upsert shape
the JDBC sink would use (stage table + INSERT ... ON CONFLICT)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Rows of ``updates`` win over same-keyed rows of ``target``;
    unmatched target rows pass through.  Column sets must match."""
    untouched = target.join(updates.select(*keys), keys, "left_anti")
    return untouched.unionByName(updates.select(*target.columns))


def upsert_parquet(
    spark, path: str, updates: DataFrame, keys: list[str], staging_suffix: str = "__staging"
) -> None:
    """Upsert into a parquet directory via write-then-swap.

    Limitations (by design of plain parquet dirs): the two-rename swap
    is local-filesystem only and leaves a brief window where a
    concurrent reader sees no table (and a crash inside the window
    strands data at ``path__old``).  Readers never see a *half-written*
    table, but true atomic MERGE needs a table format with a commit
    protocol (Delta/Iceberg) or the staged-JDBC upsert path."""
    import shutil

    target = spark.read.parquet(path)
    merged = upsert(target, updates, keys)
    staging = path + staging_suffix
    merged.write.mode("overwrite").parquet(staging)
    backup = path + "__old"
    shutil.rmtree(backup, ignore_errors=True)
    shutil.move(path, backup)
    shutil.move(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
