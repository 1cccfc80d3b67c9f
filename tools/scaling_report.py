"""Scaling evidence: time key queries at sf0.001/0.01/0.1 and print
the runtime ratio per 10x data growth.  A well-planned query grows
sub-linearly-to-linearly (fixed overhead amortizes; shuffles stay
partial-aggregated); anything super-linear is a plan bug.

Usage: python tools/scaling_report.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_QUERIES = [
    "tpch_q1",
    "hourly_event_summary",
    "category_performance",
    "top_customers",
    "sessionization",
    "minhash_near_dup",
    "similarity_topk",
    "doc_fingerprints",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    only = sys.argv[1:] or DEFAULT_QUERIES

    import __spark_entry__ as entrymod
    from spark_streaming_postgres_lab2_spark.session import build_session

    spark = build_session()
    qs = entrymod.queries()
    qs["tpch_q1"](spark, SFS[0]).write.format("noop").mode("overwrite").save()  # warm

    print(f"{'query':26s} {'sf0.001':>9s} {'sf0.01':>9s} {'sf0.1':>9s} {'x10 ratio':>10s} {'x100 ratio':>10s}")
    for name in only:
        times = []
        for sf in SFS:
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        r10 = times[1] / times[0] if times[0] else float("nan")
        r100 = times[2] / times[0] if times[0] else float("nan")
        print(
            f"{name:26s} {times[0]:8.2f}s {times[1]:8.2f}s {times[2]:8.2f}s "
            f"{r10:9.1f}x {r100:9.1f}x"
        )


if __name__ == "__main__":
    main()
