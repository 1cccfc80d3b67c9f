"""CLI entry point: run any inventory query against a table directory.

    python -m spark_streaming_postgres_lab2_spark.run_query \
        --sf-dir /root/testdata/sf0.01 --query hourly_event_summary [--limit 20]

    python -m spark_streaming_postgres_lab2_spark.run_query --list
"""

from __future__ import annotations

import argparse

from . import queries as inventory
from .session import build_session


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Run an inventory query")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--query", help="query name (see --list)")
    parser.add_argument("--limit", type=int, default=20)
    parser.add_argument("--explain", action="store_true", help="print the physical plan")
    parser.add_argument("--list", action="store_true", help="list available queries")
    args = parser.parse_args(argv)

    specs = {s.name: s for s in inventory.all_specs()}
    if args.list or not args.query:
        for name, spec in specs.items():
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:28s} [{oracle}] {spec.description}")
        return 0

    if args.query not in specs:
        parser.error(f"unknown query {args.query!r}; use --list")
    spark = build_session()
    df = specs[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
