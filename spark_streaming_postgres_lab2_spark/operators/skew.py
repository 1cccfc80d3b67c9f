"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the static fallback for pathological hot
keys -- e.g. the 'anonymous user' key holding 10% of a 100 TB events
table, or a null-heavy dimension key.

``salted_join`` replicates the small side ``salt_n`` times and spreads
the big side's hot keys across ``salt_n`` shuffle partitions via a
deterministic hash-salt, so one executor no longer receives an entire
hot key's rows."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(unique_col: Column | str, salt_n: int) -> Column:
    """Stable salt in [0, salt_n): hash of a per-row unique column (NOT
    rand() -- replays and retries must produce identical partitioning)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(salt_n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    big_unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` x ``small`` on ``key`` with the shuffle spread
    over ``salt_n`` sub-keys.

    The small side is exploded ``salt_n``-fold (acceptable: it is
    small); the big side computes one deterministic salt per row.  The
    join key becomes (key, salt) -- same result set, ``salt_n``-way
    finer shuffle granularity on hot keys.

    Restricted to join types where the exploded small side cannot leak
    duplicates: inner/left/left_semi/left_anti (a right/full outer join
    would emit every unmatched small-side row ``salt_n`` times).
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} join types; {how!r} would "
            "duplicate unmatched small-side rows salt_n times"
        )
    unique = big_unique_col or big.columns[0]
    if unique == key:
        raise ValueError(
            "big_unique_col must differ from the join key: salting by the key "
            "itself gives every row of a hot key the same salt (no mitigation)"
        )
    big_salted = big.withColumn("__salt", deterministic_salt(unique, salt_n))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return big_salted.join(small_salted, [key, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, distinct_col: str, salt_n: int = 8
) -> DataFrame:
    """Two-stage COUNT(DISTINCT) for skewed groups: stage 1 dedups
    (key, salt, value) partially, stage 2 merges per key.  Avoids one
    giant reducer for a hot group key."""
    stage1 = (
        df.withColumn("__salt", deterministic_salt(distinct_col, salt_n))
        .groupBy(group_key, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial"))
    )
    return stage1.groupBy(group_key).agg(
        F.sum("__partial").alias(f"distinct_{distinct_col}")
    )
