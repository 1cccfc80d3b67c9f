"""Skewed-key stress for the r15 shuffled-hash-join preference
(VERDICT r15 item 3 / What's-wrong #3): ``preferSortMergeJoin=false``
lets the planner build per-partition hash maps; SHJ build maps do not
spill, so a hot key that concentrates a build partition far past the
average is the advertised OOM risk.  This script manufactures exactly
that shape and reports whether the join completes and how it compares
to the sort-merge form of the same join -- the survival evidence the
global preference needs.

Skew shape: the BUILD side is the full lineitem with HALF its rows
collapsed onto ONE key, so one post-shuffle partition's hash map holds
>= half the table (hot map ~3M entries per sf1, ~30M at sf10) while
every other partition holds ~1/64th of that.  The PROBE side is
lineitem keyed over a DISJOINT key range, so the join output is empty:
the stress isolates shuffle + build-map memory, not output volume.
The SHUFFLE_HASH / MERGE hints pin the strategy per run (the planner
would otherwise broadcast the slim build projection at sf1 -- the
first run of this script proved exactly that), with the skewed side as
the build: at 64 MB x 32 partitions the planner's canBuildLocalHashMap
would admit this build side from its AVERAGE estimate, which is the
underestimate being stressed.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 python tools/shj_skew_stress.py
Prints one JSON object per strategy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

HOT_MOD = 2        # every 2nd build row -> the single hot key
KEYSPACE = 100_000


def main() -> None:
    from spark_streaming_postgres_lab2_spark.session import build_session
    from spark_streaming_postgres_lab2_spark.sources.tables import load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    spark = build_session()
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]

    # probe keys live in [1, KEYSPACE); build keys are 0 (hot) or
    # >= KEYSPACE -- disjoint, so the join output is empty by design
    probe = li.select(
        (F.col("l_orderkey") % (KEYSPACE - 1) + 1).alias("k"),
        F.col("l_extendedprice").alias("pv"),
    )
    build = li.select(
        F.when(F.col("l_orderkey") % HOT_MOD == 0, F.lit(0))
        .otherwise(F.col("l_orderkey") % KEYSPACE + KEYSPACE)
        .alias("k"),
        F.col("l_quantity").alias("bv"),
    )

    n_build = build.count()
    hot = int(n_build // HOT_MOD)
    for hint, label in (("shuffle_hash", "shuffled_hash"), ("merge", "sort_merge")):
        joined = (
            probe.join(build.hint(hint), "k")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        planned = (
            "shuffled_hash"
            if "ShuffledHashJoin" in plan
            else "sort_merge"
            if "SortMergeJoin" in plan
            else "other"
        )
        t0 = time.time()
        try:
            row = joined.collect()[0]
            out = {
                "completed": True,
                "rows_joined": int(row["n"]),
                "wall_sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # OOM / fetch failure: the advertised risk
            out = {
                "completed": False,
                "error": f"{type(exc).__name__}: {str(exc)[:300]}",
                "wall_sec": round(time.time() - t0, 2),
            }
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "strategy": label,
                    "planned": planned,
                    "build_rows": n_build,
                    "hot_key_build_rows": hot,
                    **out,
                }
            )
        )


if __name__ == "__main__":
    main()
