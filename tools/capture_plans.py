#!/usr/bin/env python3
"""Capture .explain("formatted") for bench queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r16 --suffix before [--names a,b,c]

Writes plans/<tag>/<query>_<suffix>.txt for every headline (bench=True)
query plus bench.py's SECONDARY set, or just --names when given.
Plan capture is pure planning (no execution), so it is safe to run
while other work shares the box.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_1_8_sourcecode_spark.queries import load_all  # noqa: E402
from flink_1_8_sourcecode_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--names", default="")
    args = ap.parse_args()

    registry = load_all()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        import bench

        names = [n for n, q in registry.items() if q.bench] + [
            n for n in bench.SECONDARY if n in registry
        ]

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        q = registry[name]
        try:
            import contextlib
            import io

            df = q.spark(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
