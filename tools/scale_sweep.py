#!/usr/bin/env python3
"""One-decade-up scaling sweep: time the bench query set at a bigger SF
and report wall ratios vs a reference SF run in the same session.

Usage:
    python tools/scale_sweep.py --big /root/sf1 --small /root/testdata/sf0.1
Prints one JSON line: {"ratios": {...}, "big": {...}, "small": {...}}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_1_8_sourcecode_spark.queries import load_all  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", default="/root/sf1")
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--names", default="")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from flink_1_8_sourcecode_spark.session import get_spark

    registry = load_all()
    if args.names:
        names = [n for n in args.names.split(",") if n]
    else:
        import bench

        names = [n for n, q in registry.items() if q.bench] + [
            n for n in bench.SECONDARY if n in registry
        ]

    spark = get_spark(app_name="scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def wall(name: str, sf_dir: str) -> float:
        q = registry[name]
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 4)

    small, big, ratios = {}, {}, {}
    for name in names:
        try:
            small[name] = wall(name, args.small)
            big[name] = wall(name, args.big)
            ratios[name] = round(big[name] / small[name], 2) if small[name] else None
            print(f"{name}: {small[name]} -> {big[name]}  x{ratios[name]}",
                  file=sys.stderr)
        except Exception as e:  # keep sweeping, record the failure
            ratios[name] = f"ERROR {type(e).__name__}: {e}"
            print(f"{name}: {ratios[name]}", file=sys.stderr)

    out = {"big_dir": args.big, "small_dir": args.small,
           "small": small, "big": big, "ratios": ratios,
           "superlinear": sorted(
               n for n, r in ratios.items()
               if isinstance(r, float) and r > 15
           )}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
