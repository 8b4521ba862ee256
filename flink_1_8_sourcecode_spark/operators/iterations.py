"""Batch iterations — DataSet.iterate / iterateDelta parity.

Reference: bulk BSP iterations (flink-java/.../DataSet.java:1156) and
delta/workset iterations (:1206).  Spark has no native iteration
operator; the idiomatic equivalent is a driver-side loop over DataFrames
with periodic lineage truncation — each step is still a fully
distributed Catalyst plan.

Scale notes: ``localCheckpoint`` every few steps keeps the plan from
growing unboundedly (the classic iterative-join lineage blowup);
convergence checks are aggregates (a count), never collects of the
working set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int,
    has_converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Bulk iteration: repeatedly apply ``step`` until max_iterations or
    ``has_converged(prev, cur)`` (an aggregate-based predicate)."""
    cur = initial
    for i in range(max_iterations):
        nxt = step(cur, i)
        if (i + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if has_converged is not None and has_converged(cur, nxt):
            return nxt
        cur = nxt
    return cur
