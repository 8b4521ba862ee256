"""End-to-end corpus curation: the composition the individual §2.16
operators exist for — scrub -> language filter -> quality filter ->
exact dedup -> deterministic split -> token-budget mixing, as ONE
declarative DataFrame plan.

Catalyst fuses the scrub/lang/quality stages into a single map-only
scan (they are all Column expressions over the text); the whole
pipeline then costs exactly two shuffles — one on the content
fingerprint (dedup keeper) and one on the source (mixing window) —
regardless of corpus size.  That is the 100 TB shape: a curation pass
over the full corpus is 2 shuffle stages, not a chain of 6 jobs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.operators import sampling as smp
from flink_1_8_sourcecode_spark.operators import text as tx


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    scrub_pattern: str | None = None,
    lang: str | None = "en",
    min_quality: float = 0.0,
    holdout_fraction: float = 0.1,
    budgets: dict[str, int] | None = None,
    default_budget: int = 0,
    neardup: bool = False,
    neardup_min_jaccard: float | None = None,
    neardup_shuffle_partitions: int | None = None,
) -> DataFrame:
    """Curate a document corpus into a training mixture + fixed holdout.

    Stages (each optional-by-argument, all deterministic):

    1. **Scrub** — redact ``scrub_pattern`` matches from the text
       (map-only regexp).
    2. **Language filter** — keep docs whose ``lang_id`` heuristic
       predicts ``lang`` (None = keep all).
    3. **Quality filter** — keep docs with ``quality_score >=
       min_quality`` (scored on the scrubbed text).
    4. **Exact dedup** — one keeper (min id) per content fingerprint
       (md5 over the normalized token stream), so spacing/case
       duplicates collapse.  Shuffle #1.
    4b. **Near-dup dedup** (``neardup=True``) — MinHash-LSH candidate
       pairs (16 hashes, 8 bands, hot-bucket star guard) over the
       exact-deduped survivors, resolved into clusters by the
       alternating-star transitive closure; only cluster keepers (min
       id) continue.  Real corpus prep chains this after the exact
       pass: boilerplate variants that differ by a few tokens collapse
       too.  ``neardup_min_jaccard`` additionally refines the candidate
       pairs with the MinHash Jaccard estimate (Broder 1997 —
       agreeing-signature fraction) and keeps only pairs at or above
       the threshold, killing banding's false positives BEFORE the
       closure merges clusters.  Cost: the LSH banded shuffle (whose
       two self-join branches reuse ONE signature exchange, as the
       standalone op does), optionally one signature join per pair
       side for the estimate, the O(log n) closure rounds over the
       PAIR set (tiny relative to the corpus), and a keeper semi-join
       on the id.
    5. **Split** — md5-prefix draw: ``holdout_fraction`` of surviving
       docs become the fixed eval side; map-only.
    6. **Mix** — TRAIN docs only: per-source token budgets in
       deterministic hash order (``budgets``/``default_budget`` as in
       ``token_budget_mix``); holdout docs are never budget-dropped
       (the eval set must not depend on mixture weights).  Shuffle #2.
       Skipped entirely when ``budgets`` is None (then the output has
       no ``cum_tokens`` column).

    Returns (id, source, split, n_tokens, cum_tokens) — ``cum_tokens``
    is the running token total within (source, split); for holdout
    rows it is informational only (never filtered on).
    """
    t = F.col(text_col)
    out = docs
    if scrub_pattern is not None:
        out = out.withColumn(text_col, tx.scrub(t, scrub_pattern))
    if lang is not None:
        out = out.filter(tx.lang_id(t) == lang)
    if min_quality > 0.0:
        out = out.filter(tx.quality_score(t) >= min_quality)

    # exact dedup: deterministic keeper (min id) per fingerprint
    fp_w = Window.partitionBy(tx.fingerprint(t)).orderBy(F.col(id_col))
    out = out.withColumn("__rn", F.row_number().over(fp_w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")

    if neardup:
        from flink_1_8_sourcecode_spark.operators.dedup import (
            dedup_clusters,
            minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(out, id_col, text_col, num_hashes=16, bands=8)
        if neardup_min_jaccard is not None:
            from flink_1_8_sourcecode_spark.operators.dedup import (
                minhash_jaccard_estimate,
            )

            pairs = minhash_jaccard_estimate(
                out, pairs, id_col, text_col
            ).filter(
                F.col("est_jaccard") >= float(neardup_min_jaccard)
            ).select("id_a", "id_b")
        keepers = (
            dedup_clusters(
                out, pairs, id_col=id_col,
                shuffle_partitions=neardup_shuffle_partitions,
            )
            .filter(F.col("is_keeper"))
            .select(F.col(id_col).alias("__keeper_id"))
        )
        out = out.join(
            keepers, F.col(id_col) == F.col("__keeper_id"), "inner"
        ).drop("__keeper_id")

    out = smp.hash_split(out, id_col, holdout_fraction)
    out = out.withColumn("n_tokens", tx.subword_count(t))

    if budgets is None:
        return out.select(id_col, source_col, "split", "n_tokens")

    # single-branch mixing: window over (source, split) so train rows
    # accumulate among themselves and holdout rows ride along untouched
    # — a union of filtered branches would recompute the dedup stage
    # per branch (observed: no exchange reuse across union arms)
    budget_map = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in (kv[0], int(kv[1]))]
    )
    budget = F.coalesce(budget_map[F.col(source_col)], F.lit(int(default_budget)))
    w = (
        Window.partitionBy(source_col, "split")
        .orderBy(smp.hash_key(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    is_hold = F.col("split") == "holdout"
    return out.filter(
        is_hold | ((F.col("cum_tokens") - F.col("n_tokens")) < budget)
    ).select(id_col, source_col, "split", "n_tokens", "cum_tokens")


def validate_expectations(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Data-quality expectations in ONE aggregate pass (the Deequ-style
    pre-ingestion gate): each rule is (name, boolean Column that must
    hold per row); the report has one row per rule — (rule, checked,
    violations, passed).  ``unique_cols`` adds a uniqueness expectation
    per listed column (count == distinct count), evaluated inside the
    SAME aggregate.

    Scale: one scan, one partial-aggregated reduce — every rule is a
    conditional count in the same HashAggregate, so adding rules costs
    columns, not passes.  The row-rule violation count is exact;
    uniqueness uses exact countDistinct (swap for approx_count_distinct
    upstream if the column is corpus-scale-unique and a 2% error gate
    suffices).  The report is a DataFrame, not an exception — gating
    (fail the job, quarantine the batch) is the caller's policy.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules:
        aggs.append(
            F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)).alias(
                f"__v_{name}"
            )
        )
    for c in unique_cols or []:
        aggs.append(F.countDistinct(F.col(c)).alias(f"__d_{c}"))
    row = df.agg(*aggs)
    # ONE plan: explode a struct per rule out of the single agg row —
    # a union of per-rule selects would re-execute the aggregate (and
    # the scan) once per rule
    structs = []
    for name, _ in rules:
        structs.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").alias("checked"),
                F.col(f"__v_{name}").alias("violations"),
                (F.col(f"__v_{name}") == 0).alias("passed"),
            )
        )
    for c in unique_cols or []:
        structs.append(
            F.struct(
                F.lit(f"unique({c})").alias("rule"),
                F.col("__n").alias("checked"),
                (F.col("__n") - F.col(f"__d_{c}")).alias("violations"),
                (F.col("__n") == F.col(f"__d_{c}")).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def curate_gate(
    df: DataFrame,
    url_col: str,
    text_col: str,
    blocked_domains: DataFrame,
    badwords: list[str],
    max_badword_ratio: float = 0.1,
    weights: list[float] | None = None,
    bias: float = 0.0,
    n_buckets: int = 4096,
    threshold: float = 0.5,
) -> DataFrame:
    """STREAMING-SAFE corpus curation gate: blocklist + bad-word ratio +
    quality-classifier score in one fully STATELESS pass — the
    ingestion-time twin of running ``text.blocklist_gate`` then
    ``text.quality_classifier_score`` over a batch corpus.

    Every step is map-only or a stream-static broadcast join, so the
    identical plan runs on a batch frame AND on a live ingestion stream
    (no stateful operator, no watermark, append mode):

    - blocklist: broadcast LEFT-ANTI on the extracted domain
      (``text.blocklist_gate`` — the corpus never reshuffles);
    - bad-word ratio: map-only array filter over the token array;
    - classifier margin: per-row array HOFs with the coefficient
      vector as a PLAN LITERAL — ``transform`` maps each token to its
      bucket weight, ``aggregate`` folds the sum.  This trades the
      batch path's explode + partial-agg shuffle (which a stream would
      pay for with per-doc state) for interpreted per-element eval:
      the right trade at ingestion, where statelessness is the point;
      re-score the landed corpus with ``quality_classifier_score`` if
      you need the vectorized path.

    Scoring matches ``quality_classifier_score`` exactly: trained
    ``weights`` give ``sigmoid(mean_token_weight + bias)``; without
    them the deterministic hash stand-in (x4 spread) applies.  Docs
    with zero tokens score 0.0 and are dropped by any threshold > 0 —
    the same outcome as the batch scorer, where they never survive
    ``keep``.

    Output: survivors with (domain, badword_ratio, n_tokens, score).
    """
    gated = tx.blocklist_gate(
        df, url_col, text_col, blocked_domains, badwords, max_badword_ratio
    )
    toks = tx.tokens(F.col(text_col))
    bucket_of = lambda t: tx.md5_base28(t) % n_buckets  # noqa: E731
    if weights is not None:
        if len(weights) != n_buckets:
            # element_at past the array end would null the token weight
            # and silently zero every score — refuse loudly instead
            raise ValueError(
                f"curate_gate: len(weights)={len(weights)} must equal "
                f"n_buckets={n_buckets}"
            )
        warr = F.array(*[F.lit(float(w)) for w in weights])
        tw = F.transform(
            toks,
            lambda t: F.element_at(warr, (bucket_of(t) + 1).cast("int")),
        )
        scale = 1.0
    else:
        tw = F.transform(
            toks,
            lambda t: (
                (bucket_of(t) * F.lit(2654435761)) % F.lit(2147483648)
            )
            / 2147483648.0
            * 2
            - 1,
        )
        scale = 4.0
    n_tok = F.size(toks)
    sw = F.aggregate(tw, F.lit(0.0), lambda acc, x: acc + x)
    score = 1.0 / (1.0 + F.exp(-(F.lit(scale) * sw / n_tok + F.lit(bias))))
    score = F.when(n_tok > 0, score).otherwise(F.lit(0.0))
    return (
        gated.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("score", F.round(score, 6))
        .filter(F.col("score") > threshold)
    )


def content_digest(content_cols: list[str]) -> Column:
    """One md5 over the listed columns with per-field framing: ``N;``
    for NULL, ``V<len>:<value>`` otherwise — NULL can never collide
    with a sentinel-looking VALUE, and length prefixes block concat
    smearing across fields.  The shared digest of the snapshot-diff
    family (batch ``snapshot_diff`` and the streaming status gate)."""
    parts = []
    for c in content_cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("N;")).otherwise(
                F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat(*parts))


def snapshot_status_stream(
    incoming: DataFrame,
    baseline: DataFrame,
    id_col: str,
    content_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """STREAMING snapshot status: classify each arriving row against a
    FROZEN baseline snapshot as ``added`` (id unseen), ``changed``
    (content digest differs) or ``unchanged`` — the live-ingestion
    face of :func:`snapshot_diff` (``removed`` is unobservable online;
    the batch diff covers it).  Drives the reprocess/skip decision at
    ingestion: only added+changed rows continue down the pipeline.

    Stateless by construction — one stream-static LEFT join on the id
    against the baseline's (id, digest) projection (digests computed
    map-side on both sides, so the static build side is 40 B/row
    however large the documents are), plus a map-only CASE.  The same
    plan runs on a batch frame (stream == batch).
    """
    if not content_cols:
        raise ValueError("snapshot_status_stream needs at least one content column")
    base = baseline.select(
        F.col(id_col).alias("__bid"),
        content_digest(content_cols).alias("__bdig"),
    )
    inc = incoming.withColumn("__dig", content_digest(content_cols))
    j = inc.join(base, inc[id_col] == base["__bid"], "left")
    status = (
        F.when(F.col("__bdig").isNull(), F.lit("added"))
        .when(F.col("__dig") == F.col("__bdig"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias(status_col))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
    status_col: str = "status",
) -> DataFrame:
    """Corpus snapshot delta: classify every id across two crawl/corpus
    snapshots as ``added`` (only in new), ``removed`` (only in old),
    ``changed`` (present in both, any content column differs) or
    ``unchanged`` — the incremental-ingestion planning step (re-process
    only added+changed; retire removed).

    Content comparison goes through ONE md5 over the concatenated
    content columns per side (length-prefixed fields, so ("ab","c") /
    ("a","bc") cannot collide), computed map-side BEFORE the join —
    the exchange carries (id, 32-byte digest), never document payloads,
    and the join itself is a single id-equi full outer (co-partitioned
    and shuffle-free when both snapshots are bucketed by id, the
    recommended layout for repeated diffs).  Returns
    (id, ``status_col``, old_digest, new_digest).
    """
    if not content_cols:
        raise ValueError("snapshot_diff needs at least one content column")

    o = old.select(
        F.col(id_col).alias("__id"),
        content_digest(content_cols).alias("old_digest"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        content_digest(content_cols).alias("new_digest"),
    )
    j = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("__id").alias(id_col),
        status.alias(status_col),
        "old_digest",
        "new_digest",
    )


def bucketize(value: Column, edges: list[float]) -> Column:
    """Explicit-edge bucket index: the number of edges <= value (bucket
    0 = below the first edge, bucket len(edges) = above the last) —
    one map-only Column, NULL for NULL values."""
    if not edges or sorted(edges) != list(edges):
        raise ValueError(f"edges must be a non-empty ascending list, got {edges}")
    arr = F.array(*[F.lit(float(e)) for e in edges])
    return F.when(
        value.isNull(), F.lit(None)
    ).otherwise(
        F.size(F.filter(arr, lambda e: value >= e))
    ).cast("int")


def histogram(df: DataFrame, value_col, edges: list[float]) -> DataFrame:
    """(bucket, cnt) histogram over explicit edges — one map-side
    combined groupBy whose exchange is at most len(edges)+1 rows."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        df.select(bucketize(value, edges).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_from_histograms(
    ref_hist: DataFrame, live_hist: DataFrame, n_buckets: int
) -> DataFrame:
    """Population Stability Index from two (bucket, cnt) histograms:
    per bucket ``(p_live - p_ref) * ln(p_live / p_ref)`` with
    Laplace-style smoothing ``p = (cnt + 0.5) / (total + 0.5 * nb)``
    so empty buckets contribute finitely (the standard PSI epsilon,
    made deterministic and oracle-portable).

    Everything after the two histogram exchanges is broadcast-sized:
    the bucket spine is a literal range, totals are scalar cross
    products of 1-row aggregates.  Rule of thumb: PSI < 0.1 stable,
    0.1-0.25 moderate drift, > 0.25 population shift.
    """
    spark = ref_hist.sparkSession
    nb = int(n_buckets)
    spine = spark.range(nb).select(F.col("id").cast("int").alias("bucket"))
    ref_t = ref_hist.agg(F.sum("cnt").alias("__rt"))
    live_t = live_hist.agg(F.sum("cnt").alias("__lt"))
    j = (
        spine.join(F.broadcast(ref_hist.withColumnRenamed("cnt", "n_ref")),
                   "bucket", "left")
        .join(F.broadcast(live_hist.withColumnRenamed("cnt", "n_live")),
              "bucket", "left")
        .crossJoin(F.broadcast(ref_t))
        .crossJoin(F.broadcast(live_t))
        .na.fill({"n_ref": 0, "n_live": 0})
    )
    p_ref = (F.col("n_ref") + F.lit(0.5)) / (F.coalesce(F.col("__rt"), F.lit(0)) + F.lit(0.5 * nb))
    p_live = (F.col("n_live") + F.lit(0.5)) / (F.coalesce(F.col("__lt"), F.lit(0)) + F.lit(0.5 * nb))
    return j.select(
        "bucket",
        "n_ref",
        "n_live",
        F.round((p_live - p_ref) * F.log(p_live / p_ref), 8).alias("psi_contrib"),
    )


def psi_drift(
    ref: DataFrame, live: DataFrame, value_col, edges: list[float]
) -> DataFrame:
    """PSI drift between a frozen reference snapshot and a live
    population over explicit bucket edges — the standard
    is-my-ingest-distribution-still-the-one-I-trained-on gate.  Two
    map-side-combined histogram exchanges (<= len(edges)+1 rows each),
    broadcast-only afterwards; the STREAMING face builds the live
    histogram as a native streaming aggregation with the same bounded
    state (queries/streaming_windows.streaming_psi_drift)."""
    nb = len(edges) + 1
    return psi_from_histograms(
        histogram(ref, value_col, edges), histogram(live, value_col, edges), nb
    )
