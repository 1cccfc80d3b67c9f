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

FACTS = {
    # table -> columns whose key space must shift per copy (so joins
    # and distinct counts scale honestly instead of collapsing)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
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

    for name, key_cols in FACTS.items():
        df = load_table(spark, src, name)
        offsets = {
            c: df.agg(F.max(c)).first()[0] + 1 for c in key_cols
        }
        copies = []
        for i in range(k):
            c = df
            for col, off in offsets.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * off))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        n = spark.read.parquet(f"{dst}/{name}.parquet").count()
        print(f"{name}: {n} rows ({k}x)")


if __name__ == "__main__":
    main()
