"""Distributed cache — ExecutionEnvironment.registerCachedFile parity
(flink-java/.../ExecutionEnvironment.java:859; read back on workers via
RuntimeContext.getDistributedCache().getFile(name),
flink-core/.../cache/DistributedCache.java).

Spark-first lowering: ``SparkContext.addFile`` ships the file to every
executor; ``SparkFiles.get`` resolves it worker-side.  SparkFiles keys
by BASENAME, so the logical Flink name is made the physical name: the
registered file is copied to a scratch file named exactly ``name`` and
that copy is shipped.  ``get_cached_file(name)`` then works identically
on the driver and inside any pandas UDF / mapInPandas worker with zero
shared state — no registry object needs to ride the closure.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

_NAME_RE = re.compile(r"[A-Za-z0-9._-]+\Z")


def register_cached_file(spark, file_path: str, name: str) -> None:
    """registerCachedFile (ExecutionEnvironment.java:859): make a local
    file available on every worker under the logical ``name``.

    The reference's ``executable`` flag is not mapped — Spark ships
    files read-only; run-a-binary workflows belong in ``addPyFile`` /
    cluster images.
    """
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"cached-file name {name!r} must be a plain filename "
            "(letters, digits, '.', '_', '-')"
        )
    if not os.path.isfile(file_path):
        raise FileNotFoundError(f"registerCachedFile: no such file {file_path!r}")
    staging = os.path.join(
        tempfile.gettempdir(), f"spark_graft_dcache_{os.getpid()}"
    )
    os.makedirs(staging, exist_ok=True)
    staged = os.path.join(staging, name)
    shutil.copyfile(file_path, staged)
    spark.sparkContext.addFile(staged)


def get_cached_file(name: str) -> str:
    """RuntimeContext.getDistributedCache().getFile(name): the local
    path of a registered file — valid on the driver and inside any
    Python worker (pandas UDF, mapInPandas, mapPartitions)."""
    from pyspark import SparkFiles

    path = SparkFiles.get(name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"distributed cache: {name!r} was never registered "
            "(register_cached_file ships it)"
        )
    return path
