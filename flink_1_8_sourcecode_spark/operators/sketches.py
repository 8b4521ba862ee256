"""KMV (k-minimum-values) distinct-count sketches.

The one corpus-statistics shape the engine lacked next to the
Misra-Gries heavy hitters (``operators/text.certified_heavy_hitters``):
estimating per-group distinct cardinality — and set overlap between two
groups — without ever shuffling the key space.  At 100 TB a
``COUNT(DISTINCT url)`` per domain moves every (domain, url) pair
through the exchange; a KMV sketch moves at most ``partitions x groups
x k`` 12-byte rows and answers within ~1/sqrt(k) relative error
(Bar-Yossef et al. 2002; the union/intersection estimators follow
Beyer et al. 2007, both public).

Engine-portable by construction: values hash through the repo-standard
28-bit md5 prefix (``operators/text.md5_base28``), so the k minimum
hash values — and therefore every estimate — are bit-identical between
Spark and the DuckDB oracle.  No RNG, no engine hash functions.

Reference parity target: Flink ships no sketch library; this extends
the reference's aggregation surface (flink-java
``AggregateOperator.java:60``) with the mergeable-summary shape its
users build by hand, the same stance as ``certified_heavy_hitters``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.operators.text import md5_base28

#: hash domain size: md5_base28 yields values in [0, 2**28)
_HASH_SPACE = float(1 << 28)


def _check_k(k: int) -> None:
    if k < 2:
        raise ValueError(f"kmv sketch needs k >= 2, got {k}")


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: Column | str,
    k: int = 64,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct 28-bit hash
    values of ``value_col``, as a sorted ascending array.

    Scale shape: pass 1 is map-only — every input partition keeps at
    most ``k`` smallest distinct hashes per group (vectorized pandas
    ``drop_duplicates + nsmallest`` per Arrow batch stream), so the one
    exchange carries <= partitions x groups x k rows regardless of the
    value-column key space.  Pass 2 merges the per-partition candidate
    sets with a single groupBy (collect_list is bounded by the same
    product).  A plain ``groupBy(group).agg(countDistinct(value))``
    would shuffle every distinct (group, value) pair instead.
    """
    _check_k(k)
    import pandas as pd

    value = F.col(value_col) if isinstance(value_col, str) else value_col
    # NULL values don't count as a distinct value (COUNT(DISTINCT)
    # convention) — and a NaN hash must never occupy a k-min slot
    pairs = df.select(
        F.col(group_col).alias("__g"),
        md5_base28(value.cast("string")).alias("__hv"),
    ).filter(F.col("__hv").isNotNull())
    gtype = pairs.schema["__g"].dataType.simpleString()

    def local_kmv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition running k-minimum set per group; merging the
        # per-batch candidates keeps the frame <= 2k rows per group
        acc: pd.DataFrame | None = None
        for pdf in batches:
            cand = pdf.drop_duplicates()
            acc = cand if acc is None else pd.concat([acc, cand]).drop_duplicates()
            acc = (
                acc.sort_values(["__g", "__hv"])
                .groupby("__g", sort=False, dropna=False)
                .head(k)
                .reset_index(drop=True)
            )
        if acc is not None and len(acc):
            yield acc

    cands = pairs.mapInPandas(local_kmv, f"__g {gtype}, __hv long")
    merged = cands.groupBy("__g").agg(
        F.slice(F.array_sort(F.array_distinct(F.collect_list("__hv"))), 1, k).alias(
            sketch_col
        )
    )
    return merged.withColumnRenamed("__g", group_col)


def _estimate_expr(sketch: Column, k: int) -> Column:
    """(k-1)/u_k with u_k = h_k / 2**28; exact size when the sketch
    holds fewer than k hashes (the whole value set fit)."""
    size = F.size(sketch)
    hk = F.element_at(sketch, k).cast("double")
    return F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / hk
    )


def kmv_estimate(
    sketches: DataFrame,
    k: int,
    sketch_col: str = "kmv",
    out_col: str = "est_distinct",
) -> DataFrame:
    """Distinct-cardinality estimate per sketch row: adds
    (kmv_size, ``out_col``) and drops the hash array.  Pure Column
    math over the bounded sketch arrays — map-only."""
    _check_k(k)
    return sketches.select(
        *[c for c in sketches.columns if c != sketch_col],
        F.size(F.col(sketch_col)).alias("kmv_size"),
        F.round(_estimate_expr(F.col(sketch_col), k), 6).alias(out_col),
    )


def kmv_overlap(
    sketches: DataFrame,
    group_col: str,
    left_key,
    right_key,
    k: int,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Union / Jaccard / intersection estimates between two groups'
    sketches (Beyer et al. 2007): pool the two hash arrays, keep the k
    smallest of the union as the combined sketch S, then

        est_union    = (k-1)/u_k(S)        (exact size if |S| < k)
        est_jaccard  = |S ∩ A ∩ B| / |S|
        est_intersection = est_union * est_jaccard

    Returns one row (left_key, right_key, est_union, est_jaccard,
    est_intersection).  The two sketch rows are collected into a
    2-row cross of bounded arrays — driver-free, map-only after the
    self-join of two single rows.
    """
    _check_k(k)
    a = sketches.filter(F.col(group_col) == F.lit(left_key)).select(
        F.col(sketch_col).alias("__a")
    )
    b = sketches.filter(F.col(group_col) == F.lit(right_key)).select(
        F.col(sketch_col).alias("__b")
    )
    both = a.crossJoin(F.broadcast(b))
    pooled = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__a"), F.col("__b")))), 1, k
    )
    both = both.withColumn("__s", pooled)
    in_both = F.size(
        F.array_intersect(F.array_intersect(F.col("__s"), F.col("__a")), F.col("__b"))
    )
    est_union = _estimate_expr(F.col("__s"), k)
    jac = in_both.cast("double") / F.size(F.col("__s")).cast("double")
    return both.select(
        F.lit(left_key).alias("left_key"),
        F.lit(right_key).alias("right_key"),
        F.round(est_union, 6).alias("est_union"),
        F.round(jac, 6).alias("est_jaccard"),
        F.round(est_union * jac, 6).alias("est_intersection"),
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    broadcast_totals: bool = True,
) -> DataFrame:
    """EXACT per-group discrete quantiles at full cluster parallelism —
    the companion to the sketch family for when the answer must be
    exact: (group, q, value at 1-based rank ``max(1, ceil(q*n))`` in
    ascending value order — the SQL ``percentile_disc`` convention,
    verified identical to DuckDB's ``quantile_disc``).

    Why not ``Window.partitionBy(group).orderBy(value)``: a two-class
    corpus funnels everything through 2 tasks.  Why not
    ``F.percentile``: exact but one aggregation buffer per group holds
    ALL values.  Here the rank comes from the two-pass distributed rank
    of ``prefix_sum_per_key`` (range-shuffle on (group, value), bounded
    offsets table), the per-group totals broadcast back, and each row
    checks whether its rank hits any requested quantile's target —
    map-only after the one range exchange.
    """
    from fractions import Fraction

    fracs = []
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
        fracs.append((float(q), Fraction(q).limit_denominator(1_000_000)))
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )

    src = df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
    ranked = prefix_sum_per_key(src, "__g", [F.col("__v")], out_col="__rn0")
    totals = src.groupBy("__g").agg(F.count(F.lit(1)).alias("__n")).select(
        F.col("__g").alias("__gt"), "__n"
    )
    # totals is one row per group — broadcast for any realistic group
    # count; broadcast_totals=False is the escape hatch for a group
    # cardinality that exceeds executor memory (shuffled equi-join)
    if broadcast_totals:
        totals = F.broadcast(totals)
    j = ranked.join(totals, F.col("__g").eqNullSafe(F.col("__gt")))
    # target rank ceil(q*n) in exact integer arithmetic (q as a
    # num/den fraction) — a float q*n can land a hair above an exact
    # multiple and ceil() to the wrong rank
    targets = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("q"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.floor(
                            (
                                F.lit(int(fr.numerator)) * F.col("__n")
                                + F.lit(int(fr.denominator) - 1)
                            )
                            / F.lit(int(fr.denominator))
                        ),
                    ).alias("r"),
                )
                for q, fr in fracs
            ]
        ),
        lambda t: t["r"] == F.col("__rn0") + 1,
    )
    return (
        j.select("__g", "__v", F.explode(targets).alias("__t"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__t.q").alias("q"),
            F.col("__v").alias(value_col),
        )
    )


def _cms_bucket(item: Column, d: int, width: int) -> Column:
    """Row-``d`` CMS bucket of an item: the repo-standard 28-bit md5
    hash of ``item + '#' + d``, mod ``width`` — independent rows come
    from the salt, portability from md5_base28."""
    return md5_base28(F.concat(item, F.lit(f"#{d}"))) % width


def cms_build(
    df: DataFrame,
    item_col: Column | str,
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005, public) over an
    item column: ``depth`` independent hash rows of ``width`` counters
    each; returns the counter table (d, bucket, cnt).

    The frequency-estimation companion to the KMV distinct sketch and
    the Misra-Gries heavy hitters: point-frequency queries over an
    open-domain column with a FIXED-size summary.  The exchange is
    bounded by ``depth x width`` counter rows after map-side combine —
    a plain groupBy-count on the item would shuffle the key space.
    Estimates are upper bounds: true_count <= est <= true_count +
    eps*N with eps = e/width at the usual guarantees.  Deterministic
    (md5-salted rows), so two engines build identical tables.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"cms needs width, depth >= 1, got {width}, {depth}")
    item = (F.col(item_col) if isinstance(item_col, str) else item_col).cast(
        "string"
    )
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__e")
    )
    return rows.groupBy(
        F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_query(
    counters: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 3,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates for ``probes[item_col]`` against a
    ``cms_build`` counter table: est = min over rows of the item's
    bucket counter (0 when a bucket was never touched).  The counter
    table is depth x width rows — broadcast, so probing any number of
    items is one map-side join + a (item, depth-rows) min."""
    if width < 1 or depth < 1:
        raise ValueError(f"cms needs width, depth >= 1, got {width}, {depth}")
    item = F.col(item_col).cast("string")
    ph = probes.select(
        F.col(item_col).alias("__item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cms_bucket(item, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__e"),
    ).select("__item", F.col("__e.d").alias("d"), F.col("__e.bucket").alias("bucket"))
    j = ph.join(F.broadcast(counters), ["d", "bucket"], "left")
    return (
        j.groupBy("__item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
        .withColumnRenamed("__item", item_col)
    )


def kmv_overlap_matrix(
    sketches: DataFrame,
    group_col: str,
    k: int,
    sketch_col: str = "kmv",
    broadcast_sketches: bool = True,
) -> DataFrame:
    """Pairwise overlap estimates between EVERY pair of groups — the
    source-similarity matrix of corpus curation (which domains /
    event types share an audience or document population).  Same
    estimators as :func:`kmv_overlap`, applied to the upper triangle
    of the sketch self-join: with G groups the join is G^2/2 rows of
    bounded k-arrays (the sketches, never the raw populations — the
    exact computation is a G^2 distinct self-join of the full key
    space).  Returns (left_key, right_key, est_union, est_jaccard,
    est_intersection), left_key < right_key.
    """
    _check_k(k)
    a = sketches.select(
        F.col(group_col).alias("left_key"), F.col(sketch_col).alias("__a")
    )
    b = sketches.select(
        F.col(group_col).alias("right_key"), F.col(sketch_col).alias("__b")
    )
    # the sketch table is G rows of k-arrays — broadcast for any
    # realistic group count; broadcast_sketches=False is the escape
    # hatch when G x k exceeds executor memory (theta-join falls back
    # to BroadcastNestedLoop-free cartesian planning)
    if broadcast_sketches:
        b = F.broadcast(b)
    both = a.join(b, F.col("left_key") < F.col("right_key"))
    pooled = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("__a"), F.col("__b")))), 1, k
    )
    both = both.withColumn("__s", pooled)
    in_both = F.size(
        F.array_intersect(F.array_intersect(F.col("__s"), F.col("__a")), F.col("__b"))
    )
    est_union = _estimate_expr(F.col("__s"), k)
    jac = in_both.cast("double") / F.size(F.col("__s")).cast("double")
    return both.select(
        "left_key",
        "right_key",
        F.round(est_union, 6).alias("est_union"),
        F.round(jac, 6).alias("est_jaccard"),
        F.round(est_union * jac, 6).alias("est_intersection"),
    )


def approx_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    qs: list[float],
    k: int = 256,
    salt: str = "",
    broadcast_totals: bool = True,
) -> DataFrame:
    """APPROXIMATE per-group quantiles with MERGEABLE bounded state:
    the exact quantiles of the deterministic bottom-k-by-hash uniform
    sample (operators/sampling.uniform_sample_bottomk).  The sample is
    a mergeable summary — partition-wise bottom-k sets merge to the
    global sample, and the ONLINE face
    (streaming/stateful.streaming_uniform_sample) converges to the
    identical k rows — so this is the quantile sketch whose streaming
    snapshot provably equals its batch value, unlike error-bound
    sketches whose merge order matters.

    Standard order-statistics bound: with a uniform k-sample the
    sampled q-quantile's TRUE rank concentrates within
    O(sqrt(q(1-q)/k)) of q — k=256 gives ~3% rank error at the median.
    Deterministic given (salt, k): the same rows are sampled on every
    engine, which is why a DuckDB oracle can re-derive the answer
    bit-for-bit (no other engine's APPROX_PERCENTILE can be
    cross-checked this way).

    Scale shape: the sampler's map-only hash + two-pass rank, then
    exact quantiles over k rows per group.
    """
    from flink_1_8_sourcecode_spark.operators.sampling import (
        uniform_sample_bottomk,
    )

    sample = uniform_sample_bottomk(df, group_col, id_col, k, salt)
    return exact_group_quantiles(
        sample, group_col, value_col, qs, broadcast_totals
    )


def weighted_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: list[float],
    broadcast_totals: bool = True,
) -> DataFrame:
    """EXACT per-group WEIGHTED discrete quantiles: the smallest value
    whose cumulative weight reaches ``ceil(q * W)`` (ascending value
    order, ``W`` = the group's total weight) — token-weighted corpus
    statistics ("the doc length below which half the TOKENS sit" is a
    different number than the median doc length, and the one a
    training-budget planner needs).  Integer weights only, enforced:
    a float weight would re-open the cross-engine float-sum ordering
    problem the integer num/den rank targets exist to avoid.

    Scale shape: identical to :func:`exact_group_quantiles` — the
    cumulative weight comes from the two-pass distributed prefix sum
    (range exchange + bounded offsets, full parallelism with few
    groups), totals broadcast back (``broadcast_totals=False`` is the
    escape hatch), target hit is a map-only predicate: the row where
    ``cum_before < target <= cum_before + w``.
    """
    from fractions import Fraction

    fracs = []
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
        fracs.append((float(q), Fraction(q).limit_denominator(1_000_000)))
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )

    w = F.col(weight_col)
    guard = F.when(
        w.isNull() | (w < 1) | (w != w.cast("long")),
        F.raise_error(F.lit(
            "weighted_group_quantiles: weights must be integers >= 1"
        )),
    ).otherwise(w.cast("long"))
    src = df.select(
        F.col(group_col).alias("__g"),
        F.col(value_col).alias("__v"),
        guard.alias("__w"),
    )
    pref = prefix_sum_per_key(
        src, "__g", [F.col("__v")], value_col="__w", out_col="__cumb"
    )
    # NB Spark resolves names case-INSENSITIVELY: the total must not
    # be spelled "__W" next to "__w"
    totals = src.groupBy("__g").agg(F.sum("__w").alias("__tw")).select(
        F.col("__g").alias("__gt"), "__tw"
    )
    if broadcast_totals:
        totals = F.broadcast(totals)
    j = pref.join(totals, F.col("__g").eqNullSafe(F.col("__gt")))
    targets = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(q).alias("q"),
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.floor(
                            (
                                F.lit(int(fr.numerator)) * F.col("__tw")
                                + F.lit(int(fr.denominator) - 1)
                            )
                            / F.lit(int(fr.denominator))
                        ),
                    ).alias("r"),
                )
                for q, fr in fracs
            ]
        ),
        lambda t: (F.col("__cumb") < t["r"])
        & (t["r"] <= F.col("__cumb") + F.col("__w")),
    )
    return (
        j.select("__g", "__v", F.explode(targets).alias("__t"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__t.q").alias("q"),
            F.col("__v").alias(value_col),
        )
    )
