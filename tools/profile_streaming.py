#!/usr/bin/env python3
"""Profile a streaming registry query: per-micro-batch duration breakdown.

Monkey-patches DataStreamWriter.start to capture every StreamingQuery the
query function launches, then dumps recentProgress durationMs /
stateOperators metrics after the run.

Usage: python tools/profile_streaming.py <query_name> [--sf DIR] [--cpus N]
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
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = args.cpus
    from flink_1_8_sourcecode_spark.session import get_spark

    reg = load_all()
    q = reg[args.name]
    spark = get_spark(app_name=f"profile-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql.streaming import readwriter as srw

    captured = []
    orig_start = srw.DataStreamWriter.start

    def start(self, *a, **kw):
        sq = orig_start(self, *a, **kw)
        captured.append(sq)
        return sq

    srw.DataStreamWriter.start = start
    try:
        t0 = time.perf_counter()
        df = q.spark(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
    finally:
        srw.DataStreamWriter.start = orig_start

    print(f"\n=== {args.name}: wall {wall:.2f}s, {len(captured)} streaming queries ===")
    for sq in captured:
        progs = [
            p if isinstance(p, dict) else json.loads(str(p.json) if hasattr(p, "json") else str(p))
            for p in sq.recentProgress
        ]
        print(f"\n-- query {sq.name or sq.id}: {len(progs)} batches --")
        for p in progs:
            d = p.get("durationMs", {})
            rows = p.get("numInputRows")
            state = p.get("stateOperators", [])
            st = "; ".join(
                f"op{idx}: commit={so.get('commitTimeMs')}ms rows={so.get('numRowsTotal')}"
                for idx, so in enumerate(state)
            )
            print(
                f"batch {p.get('batchId')}: rows={rows} "
                f"total={d.get('triggerExecution')}ms "
                f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
                f"latestOffset={d.get('latestOffset')}ms "
                f"queryPlanning={d.get('queryPlanning')}ms "
                f"walCommit={d.get('walCommit')}ms "
                f"commitOffsets={d.get('commitOffsets')}ms | {st}"
            )


if __name__ == "__main__":
    main()
