"""Capture `.explain("formatted")` output for named queries to
plans/<tag>/<query>_<suffix>.txt WITHOUT executing them (driver-only
planning).  Usage:

    python tools/capture_plans.py <tag> <suffix> <name> [name ...]

e.g. python tools/capture_plans.py r15 before semantic_dedup market_basket
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entrymod
    from spark_streaming_postgres_lab2_spark.session import build_session

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} @ {sf_dir} ==\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
