"""Batch iterations — DataSet.iterate / iterateDelta parity.

Reference: bulk BSP iterations (flink-java/.../DataSet.java:1156) and
delta/workset iterations (:1206).  Spark has no native iteration
operator; the idiomatic equivalent is a driver-side loop over DataFrames
with periodic lineage truncation — each step is still a fully
distributed Catalyst plan.

Scale notes: lineage is truncated every few steps to keep the plan from
growing unboundedly (the classic iterative-join lineage blowup);
convergence checks are aggregates (a count), never collects of the
working set.  ``checkpoint_dir`` switches the truncation from
executor-local blocks to reliable checkpoints (operators/lineage.py) —
the fault-tolerance knob for 100 TB iterative runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from flink_1_8_sourcecode_spark.operators.lineage import truncate_lineage


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iterations: int,
    has_converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    checkpoint_every: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bulk iteration: repeatedly apply ``step`` until max_iterations or
    ``has_converged(prev, cur)`` (an aggregate-based predicate).

    Lineage/action fusion (r16, guide §1.2/§5): truncation is LAZY
    (``eager=False`` — localCheckpoint marks the RDD; the first action
    that computes it finalizes the checkpoint as a side effect).  With a
    convergence predicate, every round truncates and the predicate's own
    aggregate is the finalizing action — each round executes exactly
    once, where the old eager-truncate-then-aggregate shape ran two jobs
    per round AND re-executed untruncated rounds inside each check.
    Without a predicate there is no per-round action at all: plans are
    cut every ``checkpoint_every`` rounds (bounding planning time) and
    the whole loop executes in the caller's single final action.
    """
    cur = initial
    for i in range(max_iterations):
        nxt = step(cur, i)
        if has_converged is not None:
            nxt = truncate_lineage(nxt, eager=False, checkpoint_dir=checkpoint_dir)
            if has_converged(cur, nxt):
                return nxt
        elif (i + 1) % checkpoint_every == 0:
            nxt = truncate_lineage(nxt, eager=False, checkpoint_dir=checkpoint_dir)
        cur = nxt
    return cur


def iterate_delta(
    initial_solution: DataFrame,
    initial_workset: DataFrame,
    step: Callable[[DataFrame, DataFrame, int], tuple[DataFrame, DataFrame]],
    max_iterations: int,
    key: str | list[str] = "id",
    checkpoint_every: int = 3,
    on_progress: Callable[[int, int], None] | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Delta/workset iteration — DataSet.iterateDelta parity
    (flink-java/.../DataSet.java:1206).

    ``step(solution, workset, i)`` returns ``(delta, next_workset)``:
    ``delta`` is upserted into the solution set on ``key``; the
    iteration ends when the workset is empty or max_iterations hit.

    Why this beats bulk iteration at scale: only CHANGED elements flow
    through the per-iteration shuffle.  On a converging computation the
    workset shrinks every superstep, so late iterations touch a tiny
    fraction of the solution set instead of re-shuffling all of it —
    the same asymptotic win Flink's workset optimization delivers.

    ``on_progress(iteration, workset_count)`` observes the (already
    computed) per-iteration workset size — counts come from the
    empty-workset termination check, so observing them is free.

    Cost note: the workset is eagerly materialized every iteration (it is
    the SMALL, shrinking side — exactly the cheap thing to cache), so
    the termination count reads cached blocks and ``step`` does not
    recompute the workset lineage a second time; without this every
    iteration's workset DAG would execute twice (once for the count,
    once inside the step's join).  The big solution set is only
    lineage-truncated every ``checkpoint_every`` rounds.
    """
    keys = [key] if isinstance(key, str) else list(key)
    solution, workset = initial_solution, initial_workset
    for i in range(max_iterations):
        if i % checkpoint_every == checkpoint_every - 1:
            solution = truncate_lineage(
                solution, eager=False, checkpoint_dir=checkpoint_dir
            )
        # lazy truncation + count: the count is the finalizing action, so
        # ONE job materializes the workset blocks that the step then reads
        # (the old eager=True shape ran a materialization job AND a count)
        workset = truncate_lineage(workset, eager=False, checkpoint_dir=checkpoint_dir)
        n = workset.count()
        if on_progress is not None:
            on_progress(i, n)
        if n == 0:
            break
        delta, workset = step(solution, workset, i)
        # upsert: keep solution rows not superseded, add the delta rows
        solution = solution.join(delta, keys, "left_anti").unionByName(delta)
    return solution
