"""CLI entry point: continuous event generation.

Parity target: the reference's generator main loop
(data_generator/data_generator.py:222-291): emit one CSV batch every
``--interval`` seconds with atomic temp+rename writes, forever (or
``--batches N`` for a bounded run).

    python -m spark_streaming_postgres_lab2_spark.run_generator \
        --out /data/incoming --interval 5 --batch-size 100 [--batches 10]
"""

from __future__ import annotations

import argparse
import logging
import time

from .sources.datagen import EventGenerator


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Continuous event CSV generator")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--interval", type=float, default=5.0, help="seconds between batches")
    parser.add_argument("--batch-size", type=int, default=100)
    parser.add_argument("--batches", type=int, default=0, help="stop after N batches (0 = forever)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--anomaly-rate", type=float, default=0.02)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    gen = EventGenerator(seed=args.seed, anomaly_rate=args.anomaly_rate)
    i = 0
    try:
        while True:
            path = gen.write_csv(
                gen.generate_batch(args.batch_size), args.out, f"events_{i:06d}.csv"
            )
            logging.info("wrote %s (%d events)", path, args.batch_size)
            i += 1
            if args.batches and i >= args.batches:
                break
            time.sleep(args.interval)
    except KeyboardInterrupt:
        logging.info("generator stopped after %d batches", i)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
