"""Synthesize a larger scale factor from an existing one by unioning
K key-remapped copies of the fact tables (dimensions stay fixed, like
TPC-H refresh streams).  Produces scale evidence beyond the driver's
sf0.1 fixtures without touching /root/testdata.

Usage: python tools/make_sfN.py [K] [SRC_DIR] [DST_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=/tmp/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# fact -> {column: key_space}.  Columns sharing a key space (the
# lineitem/orders orderkey FK) must shift by the SAME offset per copy,
# or copied lineitems point at wrong-copy orders and every join-based
# scaling measurement silently runs on a corrupted dataset.
FACTS = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey"},
    "events": {"event_id": "event_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"

    from spark_streaming_postgres_lab2_spark.session import build_session
    from spark_streaming_postgres_lab2_spark.sources.tables import load_table

    spark = build_session()
    os.makedirs(dst, exist_ok=True)

    for name in DIMS:
        df = load_table(spark, src, name)
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: copied dim")

    # one offset per key SPACE (max over every column mapped to it),
    # so FK pairs like l_orderkey/o_orderkey shift in lockstep
    space_offsets: dict[str, int] = {}
    for name, key_cols in FACTS.items():
        df = load_table(spark, src, name)
        for col, space in key_cols.items():
            m = df.agg(F.max(col)).first()[0] + 1
            space_offsets[space] = max(space_offsets.get(space, 0), m)

    for name, key_cols in FACTS.items():
        df = load_table(spark, src, name)
        copies = []
        for i in range(k):
            c = df
            for col, space in key_cols.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * space_offsets[space]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        n = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"{name}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
