"""Lineage truncation for iterative / partition-pinned operators.

Driver-side iteration (iterations.py, k-means in similarity.py, the
two-pass index in partitioning.py) must cut the growing Catalyst plan
every few steps.  Two grades:

- ``localCheckpoint`` (default): executor-local blocks, no I/O beyond
  the block manager — fast, but NOT fault-tolerant (losing an executor
  loses the blocks and the truncated lineage cannot recompute them).
  Right for bench/interactive runs.
- ``checkpoint`` to a ``checkpoint_dir``: writes to reliable storage
  (HDFS/S3 at cluster scale), so a 100 TB iterative job survives
  executor loss mid-iteration — the knob a production run flips on.

Same contract as Flink's iteration state living in checkpointed
operator state (flink-runtime checkpointing) vs. purely in-memory
supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# SparkContext.setCheckpointDir stores an FS-qualified, UUID-suffixed
# subpath, so getCheckpointDir() never equals the caller's raw string —
# remember what WE installed per context instead of comparing against it
_INSTALLED: dict[int, str] = {}


def truncate_lineage(
    df: DataFrame, eager: bool = True, checkpoint_dir: str | None = None
) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when
    ``checkpoint_dir`` is set (the directory is installed on the
    SparkContext once per distinct value), else ``localCheckpoint``."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if _INSTALLED.get(id(sc)) != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        _INSTALLED[id(sc)] = checkpoint_dir
    return df.checkpoint(eager=eager)
