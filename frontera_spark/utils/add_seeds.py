"""Seed-injection CLI — S1 parity with ``python -m frontera.utils.add_seeds``
(frontera/utils/add_seeds.py: read a seeds file, push each URL through the
middleware chain into the frontier).

    python -m frontera_spark.utils.add_seeds \\
        --seeds-file seeds.txt --workdir /path/to/engine \\
        [--strategy bfs] [--partitions 32]

One URL per line; blank lines ignored. Line order is discovery order (seq).
Idempotent: re-running with the same file dedups to zero fresh URLs.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description="Inject seed URLs into a frontier.")
    ap.add_argument("--seeds-file", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--strategy", default="bfs")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from frontera_spark.core.frontier import FrontierEngine
    from frontera_spark.session import get_spark

    spark = get_spark("add_seeds", master=args.master)
    engine = FrontierEngine(
        spark, args.workdir, n_partitions=args.partitions, strategy=args.strategy
    )
    n = engine.add_seeds_file(args.seeds_file)
    print(f"SEEDS_ADDED fresh={n} frontier_size={engine.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
