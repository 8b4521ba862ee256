"""Deterministic sampling / split / mixture operators for training-data
pipelines (SURVEY.md §2.16 north-star).

A 100 TB corpus is never sampled with ``rand()``: the split must be
STABLE (re-running the pipeline, or running it on two engines, yields
the same rows) and MAP-ONLY where possible.  The standard trick is a
content hash interpreted as a uniform draw — here the lexicographic
value of an md5 hex prefix, which means the exact same predicate runs
on any engine with an md5() function (the DuckDB oracles run it
verbatim).

- ``hash_split``            : map-only deterministic train/holdout
  assignment — zero shuffles, linear scan, the only sane split at scale.
- ``stratified_sample_exact``: exact per-stratum row counts via one
  shuffle on the stratum key + a window rank over the hash order.
  Exactness costs a per-stratum sort; when approximate fractions are
  fine, ``hash_split``'s predicate per-stratum is the cheaper path.
- ``token_budget_mix``      : per-source token-budget mixing (the
  "data mixture" step of LLM corpus prep): docs are taken in hash
  order until the source's token budget is exhausted, so the mixture
  is deterministic and engine-reproducible.

No Flink analogue — the reference stops at DataSet.sample / partition
ops (flink-java/.../operators/DataSetUtils.java:sample*); these are the
corpus-prep extensions the brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_key(col: Column, salt: str = "") -> Column:
    """Deterministic uniform draw in hex: md5 of the stringified key
    (optionally salted so independent decisions de-correlate)."""
    return F.md5(F.concat(col.cast("string"), F.lit(salt)))


def hex_threshold(fraction: float, digits: int = 8) -> str:
    """Hex string h such that P[md5_prefix < h] == fraction (exactly, in
    units of 16^-digits).

    The comparison downstream is LEXICOGRAPHIC against a ``digits``-char
    hex prefix, so the fraction>=1.0 threshold must be a string that
    sorts above every hex prefix — "g" (hex digits are 0-9a-f < 'g'),
    not the 9-char "1" + zeros form whose second character '0' loses to
    any prefix with a nonzero tail.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * 16**digits))
    if n >= 16**digits:
        return "g"
    return format(n, f"0{digits}x")


def hash_split(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
    label_col: str = "split",
    labels: tuple[str, str] = ("holdout", "train"),
) -> DataFrame:
    """Deterministic two-way split: rows whose salted md5(id) prefix
    falls below the fraction threshold get ``labels[0]``, the rest
    ``labels[1]``.  Map-only (no shuffle, no rand()); the same id lands
    on the same side on every engine, every run — which is exactly what
    a train/eval contamination guarantee needs.
    """
    h = F.substring(hash_key(F.col(id_col), salt), 1, 8)
    lab = F.when(h < F.lit(hex_threshold(fraction)), F.lit(labels[0])).otherwise(
        F.lit(labels[1])
    )
    return df.withColumn(label_col, lab)


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fraction: float,
    salt: str = "",
    broadcast_totals: bool = True,
) -> DataFrame:
    """Exact stratified sample: ceil(fraction * n_s) rows from every
    stratum s, chosen deterministically as the lowest md5-hash ids.

    One range-shuffle on (stratum, hash order) via the two-pass
    distributed rank of ``prefix_sum_per_key`` — full cluster
    parallelism even with FEW strata (a two-class 100 TB corpus under
    ``Window.partitionBy(stratum)`` would rank everything in 2 tasks);
    the per-stratum total joins back from a broadcast-sized aggregate.
    For approximate fractions at extreme scale, the map-only
    ``hash_split`` predicate is still cheaper.  Exact counts are what
    eval-set construction and class-balanced subsampling need.
    """
    from flink_1_8_sourcecode_spark.operators.partitioning import prefix_sum_per_key

    h = hash_key(F.col(id_col), salt)
    ranked = prefix_sum_per_key(
        df, stratum_col, [h, F.col(id_col)], out_col="__rn0"
    )
    totals = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n")).select(
        F.col(stratum_col).alias("__strk"), "__n"
    )
    # one row per stratum — broadcast for any realistic stratum count;
    # broadcast_totals=False is the escape hatch for a stratum
    # cardinality that exceeds executor memory (shuffled equi-join)
    if broadcast_totals:
        totals = F.broadcast(totals)
    return (
        ranked.join(
            totals,
            F.col(stratum_col).eqNullSafe(F.col("__strk")),
        )
        .filter(F.col("__rn0") + 1 <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn0", "__n", "__strk")
    )


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count_col: Column,
    budgets: dict[str, int],
    default_budget: int = 0,
) -> DataFrame:
    """Token-budget data mixing: per source, take documents in
    deterministic (md5-hash, id) order until the source's token budget
    is reached; the first document that crosses the budget is the last
    one kept (budgets are met, never silently undershot by a huge doc).

    ``budgets`` maps source -> token budget; unlisted sources get
    ``default_budget`` (0 = excluded).  The budget table is a literal
    map (broadcast-sized by construction: one entry per corpus source).

    One range-shuffle on (source, hash order); the running token sum is
    the two-pass distributed prefix sum of ``prefix_sum_per_key`` —
    per-source SEQUENTIAL only in the bounded offsets table (the cutoff
    depends on every prior doc), full cluster parallelism over the rows
    themselves.  Returns the kept rows plus ``cum_tokens``.
    """
    from flink_1_8_sourcecode_spark.operators.partitioning import prefix_sum_per_key

    budget_map = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in (kv[0], int(kv[1]))]
    )
    h = hash_key(F.col(id_col))
    budget = F.coalesce(budget_map[F.col(source_col)], F.lit(int(default_budget)))
    pref = prefix_sum_per_key(
        df.withColumn("__tok", token_count_col),
        source_col,
        [h, F.col(id_col)],
        value_col="__tok",
        out_col="__pretok",
    )
    return (
        pref.withColumn("cum_tokens", F.col("__pretok") + F.col("__tok"))
        .filter(F.col("__pretok") < budget)
        .drop("__tok", "__pretok")
    )


def _waterfill(
    counts: "dict[str, int]", total: float, caps: "dict[str, float]"
) -> "dict[str, float]":
    """Proportional water-filling: distribute ``total`` over keys
    proportionally to ``counts``; any key that would exceed its cap is
    pinned AT the cap and its overflow re-distributes over the rest.
    Invariants (property-tested): alloc_i <= cap_i; sum(alloc) ==
    min(total, sum(caps)); uncapped keys stay proportional to size."""
    alloc = {s: 0.0 for s in counts}
    active = {s for s, t in counts.items() if t > 0}
    rem = float(total)
    while rem > 1e-6 and active:
        w = sum(counts[s] for s in active)
        capped = {
            s for s in active
            if alloc[s] + rem * counts[s] / w >= caps[s] - 1e-6
        }
        if not capped:
            for s in active:
                alloc[s] += rem * counts[s] / w
            rem = 0.0
        else:
            for s in capped:
                rem -= caps[s] - alloc[s]
                alloc[s] = caps[s]
            active -= capped
    return alloc


def epoch_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count_col: Column,
    total_budget: int,
    max_epochs: int = 4,
    salt: str = "",
) -> "tuple[DataFrame, dict[str, dict]]":
    """Epoch-capped repeat-budget mixing — the data-constrained-scaling
    recipe (public: Muennighoff et al. 2023, "Scaling Data-Constrained
    Language Models": repeating data up to ~4 epochs is near-free,
    beyond that returns decay): fill a TOTAL token budget by allocating
    to sources proportionally to their size, water-filling past sources
    that hit their ``max_epochs * tokens`` repeat cap, then realize the
    allocation as an integer ``n_copies`` per document — full epochs
    repeat every doc, the fractional epoch takes the deterministic
    lowest-salted-md5 prefix of docs until the residual token target is
    crossed (same first-doc-crosses-keeps rule as token_budget_mix).

    Returns ``(kept_rows_with_n_copies, targets)``:
    ``targets[source] = {"tokens": T, "alloc": A, "epochs": e,
    "frac_tokens": f}`` — the float water-filling happens ONCE in
    Python over the source-bounded count table (temperature_mix's
    documented contract; no cross-engine float boundary can flip a
    target), and the map is returned for conditioning/logging.

    Scale shape: one map-side-combined count aggregate (collect is
    source-bounded), then the map-only hash key + one two-pass
    distributed prefix sum; ``n_copies`` is a broadcast-literal map
    lookup plus a prefix comparison.  Physically materializing the
    repeats is the consumer's explode — the plan here never
    multiplies rows.
    """
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )

    counts = {
        r["__s"]: int(r["__t"])
        for r in df.groupBy(F.col(source_col).alias("__s"))
        .agg(F.sum(token_count_col).alias("__t"))
        .collect()
    }
    caps = {s: float(max_epochs) * t for s, t in counts.items()}
    alloc = _waterfill(counts, float(total_budget), caps)
    targets = {}
    for s, t in counts.items():
        a = alloc[s]
        epochs = min(int(a // t), max_epochs) if t > 0 else 0
        frac = a - epochs * t if epochs < max_epochs else 0.0
        targets[s] = {
            "tokens": t, "alloc": round(a, 6), "epochs": epochs,
            "frac_tokens": round(frac, 6),
        }
    emap = F.create_map(
        *[F.lit(x) for s, v in targets.items() for x in (s, int(v["epochs"]))]
    )
    fmap = F.create_map(
        *[F.lit(x) for s, v in targets.items()
          for x in (s, float(v["frac_tokens"]))]
    )
    h = hash_key(F.col(id_col), salt)
    pref = prefix_sum_per_key(
        df.withColumn("__tok", token_count_col),
        source_col,
        [h, F.col(id_col)],
        value_col="__tok",
        out_col="__pretok",
    )
    epochs_c = F.coalesce(emap[F.col(source_col)], F.lit(0))
    frac_c = F.coalesce(fmap[F.col(source_col)], F.lit(0.0))
    n_copies = epochs_c + F.when(F.col("__pretok") < frac_c, 1).otherwise(0)
    kept = (
        pref.withColumn("n_copies", n_copies.cast("int"))
        .filter(F.col("n_copies") >= 1)
        .drop("__tok", "__pretok")
    )
    return kept, targets


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
) -> DataFrame:
    """Deterministic shard id in [0, n_shards): the md5-prefix value of
    the (salted) id, mod n_shards.  Map-only, uniform, stable — the
    write-layout step that turns a curated corpus into N equal-ish
    output shards without a global sort or a rand() that re-draws on
    task retry.  (To physically produce the shards, repartition on the
    shard column or partitionBy it at write time.)
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    val = F.conv(F.substring(hash_key(F.col(id_col), salt), 1, 8), 16, 10).cast("long")
    return df.withColumn(shard_col, (val % n_shards).cast("int"))


def pack_sequences(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count_col: Column,
    seq_len: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic (md5-hash, id) stream per source and chunked into
    fixed ``seq_len``-token training sequences — the GPT-style packing
    step that turns a document corpus into equal-length training rows.

    A document whose stream offset is ``o`` starts in sequence
    ``floor(o / seq_len)`` at in-sequence offset ``o % seq_len`` (a doc
    may straddle a boundary and continue into the next sequence — the
    standard concat-and-chunk semantics; downstream tokenization splits
    it there).  Returns ``df`` + (seq_id, seq_offset, n_tokens).

    ``order_by`` overrides the stream order (e.g. a quality score for
    curriculum layouts); the default md5-hash order is the shuffled-
    corpus layout.  The id column is always the final tiebreak.

    One range-shuffle on (source, order); the layout is the two-pass
    distributed per-source prefix sum of ``prefix_sum_per_key`` — full
    cluster parallelism even with a handful of sources (a
    ``Window.partitionBy(source)`` cumsum would funnel every row of a
    source through one task), reproducible across engines.
    """
    from flink_1_8_sourcecode_spark.operators.partitioning import prefix_sum_per_key

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    order = list(order_by) if order_by is not None else [hash_key(F.col(id_col))]
    pref = prefix_sum_per_key(
        df.withColumn("n_tokens", token_count_col),
        source_col,
        [*order, F.col(id_col)],
        value_col="n_tokens",
        out_col="__start",
    )
    return (
        pref.withColumn("seq_id", F.floor(F.col("__start") / seq_len))
        .withColumn("seq_offset", F.col("__start") % seq_len)
        .drop("__start")
    )


def temperature_resample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    temperature: float,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source re-weighting (the multilingual-mixing
    rule of Lample & Conneau 2019 / mT5, Xue et al. 2021): source s with
    share p_s is sampled proportionally to ``p_s ** (1/temperature)``,
    flattening the source distribution as temperature grows.

    This is the SUBSAMPLING form: per-source acceptance fraction
    ``f_s = (q_s * N_total) / n_s`` capped at 1 (down-samples
    over-represented sources toward the tempered mixture; never
    up-samples), applied as the deterministic md5-prefix draw of
    ``hash_split`` — so the result is engine-reproducible, and the
    accepted set for a source is a SUBSET of the accepted set for any
    smaller temperature (nested draws, same hash order).  For EXACT
    per-source counts against a global document budget, use
    :func:`temperature_mix` (two-pass rank instead of a map-only
    draw).

    Scale: one aggregate over the source column (k rows, broadcast back
    as a literal-free join of a tiny table) + a map-only filter; the
    corpus itself never shuffles.  Returns the accepted rows plus
    ``accept_frac``.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    inv_t = 1.0 / float(temperature)
    tot = Window.partitionBy()
    # NB: Spark resolves column names case-INSENSITIVELY by default, so
    # the total must not be spelled "__N" next to "__n"
    stats = (
        counts.withColumn("__total", F.sum("__n").over(tot))
        .withColumn("__w", F.pow(F.col("__n") / F.col("__total"), F.lit(inv_t)))
        .withColumn("__q", F.col("__w") / F.sum("__w").over(tot))
        .select(
            source_col,
            F.least(
                F.col("__q") * F.col("__total") / F.col("__n"), F.lit(1.0)
            ).alias("accept_frac"),
        )
    )
    # the md5-prefix draw compared NUMERICALLY (conv of the 8-hex prefix)
    # so the threshold can be a computed column, not a precomputed literal
    draw = F.conv(F.substring(hash_key(F.col(id_col), salt), 1, 8), 16, 10).cast(
        "double"
    )
    # null-safe join: a NULL source is a legitimate stratum (it was
    # counted in the aggregate) and must keep its tempered fraction,
    # not silently vanish to null-rejecting equality
    stats = stats.select(
        F.col(source_col).alias("__src_key"), "accept_frac"
    )
    return (
        df.join(
            F.broadcast(stats), F.col(source_col).eqNullSafe(F.col("__src_key"))
        )
        .drop("__src_key")
        .filter(draw < F.col("accept_frac") * F.lit(float(16**8)))
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_filter: Column,
    add_k: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023 — public paper): score every document by how much more likely
    its tokens are under the TARGET distribution than under the raw
    corpus, ``log w(doc) = sum_t [ln p_target(t) - ln p_raw(t)]`` with
    add-k-smoothed unigram bag models (the paper's hashed-ngram
    features at unigram granularity).  ``target_filter`` selects the
    in-domain rows (e.g. a trusted source or language); downstream
    resampling keeps the top-weight documents to shift the corpus
    toward the target domain.

    Returns (id, n_tokens, log_weight) for every document —
    zero-token documents keep a row with n_tokens=0, log_weight=0.0.

    Scale shape: both unigram tables are vocabulary-bounded groupBys
    with map-side partial aggregation (hot tokens collapse before the
    shuffle); the three normalizers (raw/target token totals and vocab
    size) are scalars off bounded aggregates (documented driver-side
    bounded contract); scoring joins exploded tokens to the
    vocab-bounded LM — broadcast when it fits, AQE-skew-split
    otherwise — then one per-document sum.
    """
    from flink_1_8_sourcecode_spark.operators.text import tokens

    ex = df.select(
        F.col(id_col).alias("__id"),
        target_filter.alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("__t"),
    )
    lm = ex.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.count_if(F.col("__tgt")).alias("__ct"),
    )
    tot = lm.agg(
        F.sum("__cr").alias("nr"), F.sum("__ct").alias("nt"), F.count(F.lit(1)).alias("v")
    ).first()  # three scalars off a bounded aggregate (bounded contract)
    nr, nt, v = float(tot["nr"]), float(tot["nt"]), float(tot["v"])
    logratio = F.log((F.col("__ct") + add_k) / F.lit(nt + add_k * v)) - F.log(
        (F.col("__cr") + add_k) / F.lit(nr + add_k * v)
    )
    scored = (
        ex.join(lm, "__t")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(logratio).alias("log_weight"),
        )
    )
    # keep zero-token documents (no exploded rows -> absent from scored):
    # weight 0 = "no evidence either way", not "silently dropped"
    base = df.select(F.col(id_col))
    return base.join(scored, base[id_col] == scored["__id"], "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def weighted_upsample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted up/down-sampling: each row is emitted
    ``floor(w)`` times plus one more with probability ``frac(w)``
    (a hash draw, not an RNG) — the epoch-mixing primitive
    temperature_resample deliberately lacks (that one only
    down-samples; domain mixtures like "2.7 epochs of wiki, 0.4 of
    web" need fractional REPETITION, cf. the mixture tables of
    Brown et al. 2020 / Rae et al. 2021).

    Returns the surviving rows with a 1-based ``copy`` index (so
    downstream shuffles can decorrelate copies by (id, copy)).
    Expectation of emitted copies is exactly ``w``; the draw reuses the
    md5-prefix scheme so the oracle reproduces it bit-for-bit.

    Scale: map-only — a filter plus an explode over a per-row bounded
    sequence; no shuffle, no aggregate, no RNG state.
    """
    draw = F.conv(F.substring(hash_key(F.col(id_col), salt), 1, 8), 16, 10).cast(
        "double"
    )
    n_copies = (
        F.floor(weight) + (draw < (weight - F.floor(weight)) * F.lit(float(16**8))).cast("long")
    )
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("__n_copies"))))
        .drop("__n_copies")
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-key CAP: keep at most ``k`` rows per key, the
    k lowest salted-md5 ids — a distributed reservoir sample whose
    "reservoir" is the hash order, so the same rows win on every run,
    every engine, and every retry (a true random reservoir is
    order-dependent and irreproducible under Spark task retries).

    The standard over-represented-source guard in training-data mixing
    (cap each domain / source / user at k documents).  One shuffle
    (hash partition on the key) + a per-key window rank; rank stops
    scanning at k per key under whole-stage codegen, and a skewed key
    bounds one task only — for billions-per-key pathologies, pre-filter
    with a coarse ``hash_split`` predicate first (map-only) and cap the
    survivors.
    """
    h = hash_key(F.col(id_col), salt)
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic round-robin interleave across sources: row i of the
    output cycles source1, source2, ... so no window of the training
    stream is dominated by one source — the order-mixing step that
    follows budget mixing (a corpus written source-by-source trains
    with catastrophic distribution shift between file boundaries).

    Each row gets ``mix_rank``: its global position in the interleaved
    order, computed as (per-source round, source, per-source draw) —
    all rows of round r across all sources precede round r+1.  Within a
    source the order is the salted-md5 draw (reproducible, retry-safe);
    sources with fewer rows simply drop out of later rounds, exactly
    like dealing cards.

    One range-exchange (the two-pass distributed per-source rank of
    ``prefix_sum_per_key`` — no single-task-per-source window sort);
    the global rank is arithmetic, not a global sort — consumers write
    with ``orderBy(mix_rank)`` (range partitioner) or bucket by
    ``mix_rank % n_shards``.
    """
    from flink_1_8_sourcecode_spark.operators.partitioning import prefix_sum_per_key

    h = hash_key(F.col(id_col), salt)
    per_round = prefix_sum_per_key(
        df, source_col, [h, F.col(id_col)], out_col="__rnd"
    )
    # rank sources deterministically once (alphabetical), broadcast back
    srcs = (
        df.select(F.col(source_col).alias("__s")).distinct()
    )
    wsrc = Window.orderBy("__s")  # tiny: one row per source
    srcs = srcs.withColumn("__sidx", F.row_number().over(wsrc) - 1)
    n_sources = srcs.count()
    return (
        per_round.join(
            F.broadcast(srcs), per_round[source_col] == srcs["__s"]
        )
        .withColumn(
            "mix_rank", F.col("__rnd") * n_sources + F.col("__sidx")
        )
        .drop("__s", "__sidx", "__rnd")
    )


def rate_limit(
    df: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    k: int,
    window_seconds: int,
) -> DataFrame:
    """Deterministic per-key RATE LIMIT: keep at most ``k`` rows per
    (key, tumbling ``window_seconds`` bucket), the earliest by
    (time, id) — the ingestion throttle of a crawl/event pipeline (cap
    each user/domain at k events per hour) in its batch/backfill form.

    Unlike ``cap_per_key`` (one global cap per key, hash order), the
    cap here renews per time bucket and keeps FIRST-arrived rows, so
    replaying a backfill reproduces exactly what a compliant online
    throttle would have admitted.

    One shuffle on (key, bucket) + a per-bucket rank — a skewed key
    bounds one task per bucket, not its whole history.  Returns the
    admitted rows plus the bucket start epoch ``window_start``.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    epoch = F.col(time_col).cast("timestamp_ltz").cast("long")
    bucket = (F.floor(epoch / window_seconds) * window_seconds).cast("long")
    w = Window.partitionBy(F.col(key_col), bucket).orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("window_start", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_sample_no_replacement(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: Column,
    k: int,
    salt: str = "",
    max_weight: int = 64,
) -> DataFrame:
    """Exact probability-proportional-to-size sampling WITHOUT
    replacement: ``k`` rows per group, each successive pick taken with
    probability weight/(remaining total weight) — the quality-weighted
    subset selection of corpus curation (pick the best k docs per
    source, high-quality docs favoured but not guaranteed).

    Deterministic successive-sampling construction (the integer-only
    equivalent of the Efraimidis-Spirakis exponential race, public):
    a row of integer weight w gets w iid md5-prefix draws
    ``md5(id || '#' || c || salt)[:8]`` for c in 1..w and keeps the
    MINIMUM; ordering rows by that min ascending yields exact
    w-proportional picks (conditioned on any prefix of picks, each of
    the remaining draws is equally likely to be the smallest, so a row
    holding w of them wins with w / remaining-total).  No floats, no
    pow() — the same hex strings sort identically on every engine.

    Scale shape: the min-of-w key is ONE pure-Column expression
    (``array_min(transform(sequence(1, w), ...))`` — map-only, no
    explode, no pre-shuffle); the per-group top-k is the two-pass
    distributed rank of ``prefix_sum_per_key`` (full parallelism with
    few groups).  ``weight_col`` must be integral and >= 1; it is
    capped at ``max_weight`` (the per-row key costs w md5 calls).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_weight < 1:
        raise ValueError(f"max_weight must be >= 1, got {max_weight}")
    from flink_1_8_sourcecode_spark.operators.partitioning import prefix_sum_per_key

    # NULL must raise as loudly as w < 1 — and the check must happen
    # BEFORE least(): Spark's least() SKIPS nulls, so least(NULL, max)
    # is max, which would silently sample the row at full weight
    raw = weight_col.cast("int")
    w = F.when(
        raw.isNull(),
        F.raise_error(F.lit("weighted_sample_no_replacement: NULL weight")),
    ).when(
        raw < 1, F.raise_error(F.lit("weighted_sample_no_replacement: weight < 1"))
    ).otherwise(F.least(raw, F.lit(int(max_weight))))
    idc = F.col(id_col).cast("string")
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda c: F.substring(
                F.md5(F.concat(idc, F.lit("#"), c.cast("string"), F.lit(salt))), 1, 8
            ),
        )
    )
    ranked = prefix_sum_per_key(
        df.withColumn("__wk", key), group_col, [F.col("__wk"), F.col(id_col)],
        out_col="__rn0",
    )
    return ranked.filter(F.col("__rn0") < k).drop("__wk", "__rn0")


def uniform_sample_bottomk(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform k-sample WITHOUT replacement per group:
    the k rows whose salted md5(id) sorts lowest — "bottom-k by hash",
    the mergeable-summary formulation of reservoir sampling (any
    partition's bottom-k sets merge to the global bottom-k, which a
    classic random reservoir cannot do distributed).  The same ids win
    on every engine and every run, which is what holdout construction
    and debugging need; and the ONLINE face
    (streaming/stateful.streaming_uniform_sample) converges to this
    exact set in any arrival order.

    Scale shape: the hash key is map-only; the per-group top-k is the
    two-pass distributed rank of ``prefix_sum_per_key`` (no per-group
    Window funnel — full parallelism with few groups).

    NULL ids are excluded (ADVICE r14: ``hash_key(NULL)`` is NULL and
    Spark sorts NULLs FIRST ascending, so they would preferentially
    occupy sample slots) — matching the streaming face's non-null
    hash filter and DuckDB's NULLS-LAST default.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )

    h = hash_key(F.col(id_col), salt)
    ranked = prefix_sum_per_key(
        df.filter(F.col(id_col).isNotNull()), group_col,
        [h, F.col(id_col)], out_col="__rn0",
    )
    return ranked.filter(F.col("__rn0") < k).drop("__rn0")


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float,
    total_budget: int,
    salt: str = "",
) -> "tuple[DataFrame, dict[str, int]]":
    """Temperature-based mixture sampling — the multilingual
    rebalancing of XLM-R / mT5 (public: sample source i with
    probability proportional to ``n_i ** alpha``; ``alpha < 1`` lifts
    low-resource sources, ``alpha = 1`` keeps natural proportions):
    deterministically take ``round(total_budget * p_i)`` docs per
    source (capped at ``n_i``), chosen as the lowest salted md5(id)
    hashes so the same docs win on every engine and every run.  The
    EXACT-count companion to :func:`temperature_resample` (which
    applies tempered ACCEPTANCE FRACTIONS map-only, with no global
    budget and no rank pass — the cheaper form when approximate
    shares suffice).

    Returns ``(kept_rows, targets)`` — the per-source target map is
    computed driver-side from the per-source COUNT table (one bounded
    aggregate: one row per corpus source, the same documented contract
    as token_budget_mix's budget map) and returned for conditioning /
    logging; the float ``n ** alpha`` math happens ONCE in Python, so
    no cross-engine pow()-boundary divergence can flip a target.

    Scale shape: one map-side-combined count aggregate (collect is
    source-bounded), then the map-only hash key + two-pass distributed
    rank, filtered against the broadcast-literal target map.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if total_budget <= 0:
        raise ValueError(f"total_budget must be positive, got {total_budget}")
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )

    counts = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(source_col).alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    }
    weights = {s: float(n) ** float(alpha) for s, n in counts.items()}
    wsum = sum(weights.values()) or 1.0
    targets = {
        s: min(counts[s], int(round(total_budget * w / wsum)))
        for s, w in weights.items()
    }
    tmap = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in (kv[0], int(kv[1]))]
    )
    h = hash_key(F.col(id_col), salt)
    ranked = prefix_sum_per_key(
        df, source_col, [h, F.col(id_col)], out_col="__rn0"
    )
    kept = ranked.filter(
        F.col("__rn0") < F.coalesce(tmap[F.col(source_col)], F.lit(0))
    ).drop("__rn0")
    return kept, targets
