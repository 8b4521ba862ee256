"""Physical distribution operators — SURVEY.md §2.10.

Reference parity: DataSet.partitionByHash/partitionByRange/rebalance/
sortPartition (flink-java/.../DataSet.java:1257,1297,1385,1401), stream
shuffle/rebalance/rescale/broadcast (DataStream.java:355-499), ship
strategies (OutputEmitter.java).

In Spark these are explicit Exchange requests; Catalyst/AQE normally
decides — use these only to pre-shape data (e.g. co-locate before
repeated joins) or to fix skew (``salted_keys``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_by_hash(df: DataFrame, cols: list[str], n: int | None = None) -> DataFrame:
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def partition_by_range(df: DataFrame, cols: list[str], n: int | None = None) -> DataFrame:
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


def rebalance(df: DataFrame, n: int) -> DataFrame:
    """Round-robin redistribution (DataSet.rebalance)."""
    return df.repartition(n)


def rescale_down(df: DataFrame, n: int) -> DataFrame:
    """Shuffle-free partition merge (closest analogue of rescale)."""
    return df.coalesce(n)


def sort_partition(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """Per-partition local sort (DataSet.sortPartition:1401)."""
    return df.sortWithinPartitions(*cols)


def partition_custom(
    df: DataFrame, partition_fn, key_col: str, n: int
) -> DataFrame:
    """DataSet.partitionCustom(partitioner, key) parity
    (DataSet.java:1340): rows are placed in EXACTLY the partition the
    user function returns for their key — not a hash of it.

    Spark's DataFrame API cannot request direct partition placement
    (repartition hashes expressions), so this is the documented
    RDD-boundary compat shim: key the rows, ``rdd.partitionBy`` with
    the user partitioner, rebuild the DataFrame with the same schema.
    It pays a serialization round-trip — use it ONLY when an algorithm
    genuinely needs placement (e.g. locality-aligned writes); for
    everything else ``repartition``/``repartitionByRange`` keep the
    plan inside Catalyst.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    schema = df.schema
    spark = df.sparkSession

    def clamp(k):
        p = int(partition_fn(k))
        if not 0 <= p < n:
            raise ValueError(f"partitioner returned {p} for key {k!r}, not in [0, {n})")
        return p

    keyed = df.rdd.map(lambda row: (row[key_col], row))
    placed = keyed.partitionBy(n, clamp).values()
    return spark.createDataFrame(placed, schema)


def salted_keys(df: DataFrame, key: str, buckets: int) -> DataFrame:
    """Skew mitigation: append a salt column; join the other side against
    an exploded (key, salt) dimension.  AQE's skew-join handles most
    cases automatically — this is the manual escape hatch."""
    return df.withColumn("__salt", (F.rand(seed=42) * buckets).cast("int"))


def detect_hot_keys(
    df: DataFrame,
    on: str | list[str],
    sample_fraction: float = 0.05,
    hot_factor: float = 4.0,
    max_salt: int = 32,
    seed: int = 42,
    time_expr=None,
) -> DataFrame:
    """Sample-driven hot-key detection: estimate per-key row counts from
    a ``sample_fraction`` sample and return the keys whose estimated
    count exceeds ``hot_factor`` x the mean, each with a per-key salt
    factor ``__factor`` (2..max_salt, proportional to how far above the
    mean the key sits).  The result is a SMALL DataFrame (hot keys only)
    meant to be broadcast — nothing is collected to the driver.

    ``time_expr`` (a numeric Column) additionally returns each hot
    key's sampled time span as ``__tmin``/``__tmax`` — the input
    ``asof_join(time_buckets="auto")`` derives per-key bucket widths
    from (span / __factor).

    Reference parity: Flink has no automatic skew handling — its answer
    is the ship-strategy choice (OutputEmitter.java) plus manual
    pre-aggregation; the sample-plan-rewrite here is the Spark-idiomatic
    equivalent of what its optimizer could not do.
    """
    keys = [on] if isinstance(on, str) else list(on)
    aggs = [F.count(F.lit(1)).alias("__cnt")]
    span_cols = []
    if time_expr is not None:
        aggs += [F.min(time_expr).alias("__tmin"), F.max(time_expr).alias("__tmax")]
        span_cols = [F.col("__tmin"), F.col("__tmax")]
    stats = (
        df.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .agg(*aggs)
    )
    mean = stats.agg(F.avg("__cnt").alias("__mean"))
    return (
        stats.join(F.broadcast(mean))
        .filter(F.col("__cnt") > F.col("__mean") * hot_factor)
        .select(
            *keys,
            F.least(
                F.lit(max_salt),
                F.greatest(F.lit(2), F.ceil(F.col("__cnt") / F.col("__mean")).cast("int")),
            ).alias("__factor"),
            *span_cols,
        )
    )


def skew_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    sample_fraction: float = 0.05,
    hot_factor: float = 4.0,
    max_salt: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Join with automatic skew salting: hot keys (detected by sampling
    the LEFT/probe side) get their left rows scattered across a per-key
    salt range and their right rows replicated once per salt value, so
    no single reducer owns a hot key's whole partition.  Cold keys join
    on salt 0 with no replication — zero overhead for the common case.

    Results are identical to ``left.join(right, on, how)``; only the
    physical distribution changes.  Supported ``how``: inner/left —
    right/full would null-pad each replicated right row once per salt,
    so they are rejected rather than silently wrong.

    Scale: one extra sample+agg job over the probe side's key column
    (column-pruned scan), a broadcast of the tiny hot-key table to both
    sides, and build-side replication bounded by ``max_salt`` x hot-key
    row count.  At 100 TB this is the difference between a straggler
    task owning 10^9 rows of one key and ``max_salt`` even slices.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"skew_salted_join supports inner/left joins, got {how!r}: "
            "replicated right rows would duplicate null-padding"
        )
    keys = [on] if isinstance(on, str) else list(on)
    hot = detect_hot_keys(left, keys, sample_fraction, hot_factor, max_salt, seed)

    lf = left.join(F.broadcast(hot), keys, "left").withColumn(
        "__salt",
        F.when(F.col("__factor").isNull(), F.lit(0)).otherwise(
            (F.rand(seed=seed) * F.col("__factor")).cast("int")
        ),
    ).drop("__factor")
    rf = (
        right.join(F.broadcast(hot), keys, "left")
        .withColumn(
            "__salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("__factor"), F.lit(1)) - 1)),
        )
        .drop("__factor")
    )
    return lf.join(rf, keys + ["__salt"], how).drop("__salt")


def zorder_value(cols: list[Column], bits: int = 10) -> Column:
    """Morton (Z-order) code: interleave the low ``bits`` bits of each
    already-quantized integer column into one long.  Pure Column bit
    arithmetic — the expression tree is built once at plan time
    (bits * n_cols shift-mask-or terms), evaluated JVM-side per row.
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 10,
) -> DataFrame:
    """Cluster rows by Z-order over ``cols`` so multi-dimensional range
    predicates prune files: each column is quantized to ``bits`` bits
    against its global min/max (one broadcast bounds row), the Morton
    codes are range-partitioned into ``n_partitions`` slices, and rows
    sort by code within each slice.

    A single-column sort layout answers ranges on THAT column with few
    files but scatters every other dimension across all of them;
    Z-order gives every interleaved dimension locality ~bits/n_cols
    deep — the standard data-layout lever (Delta/Iceberg OPTIMIZE
    ZORDER) re-expressed as plain repartitionByRange +
    sortWithinPartitions, so a parquet write of the result carries the
    clustering.  Cost: one bounds aggregate + one range shuffle; the
    quantization itself is map-only.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    )
    out = df.join(F.broadcast(bounds), F.lit(True))
    scale = float(2**bits - 1)
    quant = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        q = F.floor((F.col(c).cast("double") - lo) / span * scale).cast("long")
        quant.append(F.greatest(F.lit(0), F.least(F.lit(int(scale)), q)))
    out = out.withColumn("__z", zorder_value(quant, bits))
    out = out.drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    # __z stays in the output: the write path can partition/inspect on it
    return out.repartitionByRange(n_partitions, "__z").sortWithinPartitions("__z")


def zip_with_unique_id(df: DataFrame, id_col: str = "unique_id") -> DataFrame:
    """DataSetUtils.zipWithUniqueId (flink-java/.../utils/DataSetUtils.java:149)
    parity: a unique (NOT consecutive) long per row, assigned without
    any counting pass — Spark's monotonically_increasing_id is the same
    partition-id-in-the-high-bits scheme Flink uses (taskId + i * #tasks).
    """
    return df.withColumn(id_col, F.monotonically_increasing_id())


def zip_with_index(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "index",
    n_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DataSetUtils.zipWithIndex (DataSetUtils.java:89) parity:
    CONSECUTIVE indices 0..n-1, in ``order_cols`` order, with the same
    two-pass shape as the reference (count elements per partition,
    broadcast the per-partition offsets, then label locally).

    Pass 1 range-partitions on the order columns and counts rows per
    partition (a #partitions-row aggregate).  Pass 2 joins the
    broadcast cumulative offsets and adds the partition-local running
    index from an Arrow-batched counter — no global single-reducer
    sort, no window over one partition.  Include a unique tiebreaker in
    ``order_cols`` for a fully deterministic assignment.

    The pinned partitioning is a lineage truncation; ``checkpoint_dir``
    upgrades it to a reliable checkpoint so an executor loss between
    the two passes cannot re-randomize partition contents on a 100 TB
    run (operators/lineage.py).
    """
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    from flink_1_8_sourcecode_spark.operators.lineage import truncate_lineage

    # pin partitioning across both passes
    part = truncate_lineage(part, eager=False, checkpoint_dir=checkpoint_dir)
    from pyspark.sql import Window

    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w), F.lit(0)).alias("__offset")
    )

    def label(batches):
        import pandas as pd  # noqa: F401

        i = 0  # partition-local running index: one worker per partition
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__local"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    # NOT part.schema.add(...): PySpark's StructType.add MUTATES the
    # DataFrame's cached schema object, which corrupts part.columns
    from pyspark.sql import types as T

    schema = T.StructType(
        list(part.schema.fields) + [T.StructField("__local", T.LongType())]
    )
    labeled = part.mapInPandas(label, schema)
    return (
        labeled.join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__offset") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )


def dataset_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """DataSetUtils.checksumHashCode (DataSetUtils.java:347) parity: a
    single-row (n_rows, checksum) integrity summary of a dataset.

    The checksum is the bit-XOR of a 60-bit md5-derived hash of each
    row's ``cols`` rendering — order-insensitive (XOR commutes, like
    the reference's sum of hashCodes), partial-aggregable map-side, and
    engine-portable (the DuckDB oracle computes the identical value).
    Use string/int/date columns; float renderings are not portable
    across engines and belong behind an explicit round/cast.
    """
    row_repr = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(h).alias("checksum"),
    )


def prefix_sum_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[Column | str],
    value_col: str | None = None,
    out_col: str = "__prefix",
    n_partitions: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Per-key EXCLUSIVE prefix sum (of ``value_col``, or of 1 — i.e. a
    0-based dense rank) in ``order_cols`` order, at FULL cluster
    parallelism even when there are only a handful of keys.

    ``Window.partitionBy(key).orderBy(...)`` funnels every row of a key
    through ONE task — a training corpus has 5-20 sources at 100 TB, so
    "parallel across sources" is parallelism <= 20.  This is the same
    two-pass scheme as ``zip_with_index`` (DataSetUtils.java:89's
    count-then-label), generalized per key:

    1. range-partition on (key, order...) and sort within partitions —
       each key's rows occupy a CONTIGUOUS run of partitions, split
       across as many partitions as its share of the data demands;
    2. aggregate per (partition, key) value sums — a bounded table
       (<= n_partitions + n_keys rows, since each key spans a
       contiguous pid range);
    3. per-key cumulative offsets over pid order (window over the
       bounded table only);
    4. Arrow-batched local exclusive prefix per (partition, key) run,
       plus the broadcast offset.

    Include a unique tiebreaker in ``order_cols`` for a deterministic
    assignment.  NULL keys form their own group (null-safe join).
    """
    from flink_1_8_sourcecode_spark.operators.lineage import truncate_lineage
    from pyspark.sql import Window
    from pyspark.sql import types as T

    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    # order expressions (may be .desc() SortOrders — not materializable
    # via withColumn) go straight to the range partitioner + local sort;
    # that sort is their single evaluation site, so no cross-pass drift
    ords = [c if isinstance(c, Column) else F.col(c) for c in order_cols]
    val = F.lit(1).cast("long") if value_col is None else F.col(value_col).cast("long")
    work = df.withColumn("__psval", val)
    part = (
        work.repartitionByRange(n, F.col(key_col), *ords)
        .sortWithinPartitions(F.col(key_col), *ords)
        .withColumn("__pid", F.spark_partition_id())
    )
    # pin partitioning across both passes (lineage truncation; reliable
    # checkpoint when checkpoint_dir is given — an executor loss between
    # passes must not re-randomize partition contents)
    part = truncate_lineage(part, eager=False, checkpoint_dir=checkpoint_dir)

    counts = part.groupBy("__pid", key_col).agg(F.sum("__psval").alias("__psn"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.col(key_col).alias("__psk"),
        F.coalesce(F.sum("__psn").over(w), F.lit(0)).alias("__psoffset"),
    )

    def label(batches):
        import numpy as np
        import pandas as pd

        prev_key = None
        have_prev = False
        acc = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(__pslocal=pd.Series([], dtype="int64"))
                continue
            ks = pdf[key_col]
            vs = pdf["__psval"].to_numpy(dtype="int64")
            # key-change mask, NULL-run-safe (NaN != NaN under .eq)
            same = ks.eq(ks.shift()) | (ks.isna() & ks.shift().isna())
            new = ~same.to_numpy()
            k0 = ks.iloc[0]
            cont = have_prev and (
                (pd.isna(k0) and pd.isna(prev_key))
                or (not pd.isna(k0) and not pd.isna(prev_key) and k0 == prev_key)
            )
            new[0] = not cont
            grp = np.cumsum(new)
            # within-group exclusive prefix, vectorized
            excl = (
                pd.Series(vs).groupby(grp, sort=False).cumsum().to_numpy() - vs
            )
            if cont:
                excl = np.where(grp == grp[0], excl + acc, excl)
            out = pdf.copy()
            out["__pslocal"] = excl
            prev_key = ks.iloc[-1]
            have_prev = True
            acc = int(excl[-1] + vs[-1])
            yield out

    schema = T.StructType(
        list(part.schema.fields) + [T.StructField("__pslocal", T.LongType())]
    )
    labeled = part.mapInPandas(label, schema)
    return (
        labeled.join(
            F.broadcast(offsets),
            (labeled["__pid"] == offsets["__pid"])
            & labeled[key_col].eqNullSafe(offsets["__psk"]),
        )
        .drop(offsets["__pid"])
        .withColumn(out_col, (F.col("__psoffset") + F.col("__pslocal")).cast("long"))
        .drop("__pid", "__psk", "__psoffset", "__pslocal", "__psval")
    )
