"""Batch source formats beyond parquet: ORC, JSON-lines, and CSV
round-trips with EXPLICIT schemas.

The engine's fixtures are parquet, but a production corpus arrives in
whatever its producers emit; these helpers make the other three
mainstream batch formats first-class without changing any query --
``read_table`` returns a frame with the exact schema the parquet
loader would have produced, so every operator runs unchanged on any
format.

Scale rules encoded here:

- **Never infer schemas.**  CSV/JSON inference is a full extra pass
  over the data (and JSON inference widens integers that happen to
  look float); both readers take the authoritative StructType.
- **Timestamps round-trip via an explicit micros format.**  Spark's
  CSV default drops sub-second precision on some JVM locales;
  pinning ``yyyy-MM-dd HH:mm:ss.SSSSSS`` keeps event times
  micro-exact in both directions.
- **CSV quoting set for embedded JSON.**  The events table carries a
  JSON ``props`` string (commas, quotes); the writer escapes with
  doubled quotes, the reader is told the same dialect, so the column
  survives byte-identically.
- **NULL vs empty string without a textual sentinel.**  A sentinel
  like the MySQL-dump ``\\N`` convention collides with data that IS
  that literal string: the writer emits it unquoted and the reader
  nulls it (quoting does not help -- the reader's nullValue match
  happens AFTER unquoting, verified empirically).  Instead the dialect
  relies on the structural distinction CSV already has: the writer
  emits NULL as a zero-width unquoted field and empty string as a
  quoted ``""`` (Spark writer defaults), and the reader's ``nullValue``
  is pinned to a NUL byte -- a value no text corpus field can contain
  -- so ONLY the zero-width field maps back to NULL.  Writer-side
  whitespace trimming is disabled (Spark write default trims, which
  corrupts whitespace-significant corpora).  Limitation: fields with
  embedded NEWLINES need ``multiLine=true`` on read, which makes the
  scan non-splittable -- deliberately not the default; at 100 TB a
  splittable scan matters more, and newline-bearing corpora belong in
  parquet/ORC.
- ORC needs none of this: like parquet it is typed, splittable, and
  predicate-pushdown-capable -- the preferred interchange when the
  producer supports it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_CSV_SHARED = {
    "header": "true",
    "timestampFormat": TIMESTAMP_FMT,
    "timestampNTZFormat": TIMESTAMP_FMT,
    "quote": '"',
    "escape": '"',  # RFC-4180 doubled-quote dialect, both directions
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}

# Writer: Spark defaults already distinguish NULL (zero-width field)
# from empty string (quoted "") -- no sentinel needed.
_CSV_WRITE_OPTIONS = dict(_CSV_SHARED)

# Reader: univocity natively yields NULL for the zero-width unquoted
# field; nullValue is pinned to a NUL byte so no legitimate unquoted
# string value (including a literal backslash-N) can ever be
# mistaken for NULL.
_CSV_READ_OPTIONS = dict(_CSV_SHARED, nullValue="\x00", emptyValue="")

FORMATS = ("orc", "json", "csv")


def write_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (orc | json | csv)."""
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        for k, v in _CSV_WRITE_OPTIONS.items():
            w = w.option(k, v)
    elif fmt == "json":
        w = w.option("timestampFormat", TIMESTAMP_FMT)
        w = w.option("timestampNTZFormat", TIMESTAMP_FMT)
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType
) -> DataFrame:
    """Read ``path`` as ``fmt`` with the authoritative ``schema``
    (no inference pass, exact types on every format)."""
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        for k, v in _CSV_READ_OPTIONS.items():
            r = r.option(k, v)
    elif fmt == "json":
        r = r.option("timestampFormat", TIMESTAMP_FMT)
        r = r.option("timestampNTZFormat", TIMESTAMP_FMT)
    return r.load(path)
