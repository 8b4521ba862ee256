"""Corpus-pipeline operator inventory — SURVEY.md §2.16 north-star,
round-6 additions: deterministic splits/sampling, token-budget data
mixing, PII-shaped scrubbing, and int8 embedding quantization.

All deterministic and engine-portable by construction (md5-prefix
draws, portable regexes, ordered list folds), so every query here has a
full value-hash DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import sampling as smp
from flink_1_8_sourcecode_spark.operators import text as tx
from flink_1_8_sourcecode_spark.operators.similarity import quantization_error
from flink_1_8_sourcecode_spark.queries import export_path, register

# hex_threshold(0.1) — pinned in the oracle as a literal so the SQL is
# self-contained; the operator computes the same constant.
_T10 = smp.hex_threshold(0.1)
assert _T10 == "1999999a", _T10

_SUBWORD_SQL = "len(regexp_extract_all(lower(trim(text)), '[a-z]+|[0-9]+|[^a-z0-9\\s]+'))"


@register(
    "sample_split_deterministic",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                THEN 'holdout' ELSE 'train' END AS split
    FROM documents
    """,
    doc="Deterministic 10% holdout split (md5-prefix draw): map-only, "
    "zero shuffles, stable across runs and engines — the train/eval "
    "contamination guarantee (operators/sampling.py:hash_split).",
)
def sample_split_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.hash_split(d, "doc_id", 0.1).select("doc_id", "split")


@register(
    "sample_stratified_exact",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ) WHERE rn <= ceil(n * 0.2)
    """,
    doc="Exact 20% stratified sample per source: ceil(0.2*n_s) rows per "
    "stratum, chosen as the lowest md5-hash doc ids (two-pass "
    "distributed per-stratum rank via prefix_sum_per_key — full "
    "parallelism even with few strata — joined to broadcast stratum "
    "totals; operators/sampling.py:stratified_sample_exact).",
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.stratified_sample_exact(d, "source", "doc_id", 0.2).select(
        "source", "doc_id"
    )


@register(
    "mix_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SUBWORD_SQL} AS tok FROM documents
    ), w AS (
      SELECT doc_id, source, tok,
             sum(tok) OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, cum_tokens FROM w
    WHERE cum_tokens - tok < CASE source WHEN 'src0' THEN 5000
                                         WHEN 'src1' THEN 0
                                         ELSE 1000 END
    """,
    doc="Token-budget data mixing: per source, keep docs in "
    "deterministic hash order until the source's subword-token budget "
    "is crossed (src0: 5000, src1: excluded, default 1000) — the "
    "mixture-weights step of LLM corpus prep "
    "(operators/sampling.py:token_budget_mix).",
)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    out = smp.token_budget_mix(
        d,
        "source",
        "doc_id",
        tx.subword_count(F.col("text")),
        budgets={"src0": 5000, "src1": 0},
        default_budget=1000,
    )
    return out.select("doc_id", "source", "cum_tokens")


_SCRUB_PAT = r"\b(spark|customer|vector)\b"


@register(
    "text_scrub_blocklist",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_SCRUB_PAT}')) AS n_hits,
           md5(regexp_replace(text, '{_SCRUB_PAT}', '[TERM]', 'g')) AS scrubbed_fp
    FROM documents
    """,
    doc="Blocklist/PII-shaped scrub pass: count + redact every "
    "occurrence of blocklisted terms, fingerprint the scrubbed text "
    "(operators/text.py:scrub — same code path as the email/ipv4/phone "
    "PII_PATTERNS; map-only regexp_replace).",
)
def text_scrub_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        tx.scrub_count(t, _SCRUB_PAT).alias("n_hits"),
        F.md5(tx.scrub(t, _SCRUB_PAT, "[TERM]")).alias("scrubbed_fp"),
    )


@register(
    "sim_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         s AS (SELECT vec_id, e,
                      list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
               FROM v),
         q AS (SELECT vec_id, e, scale,
                      CASE WHEN scale > 0
                           THEN list_transform(e, x -> round(x / scale)::INT)
                           ELSE list_transform(e, x -> 0) END AS qv
               FROM s),
         r AS (SELECT vec_id, e, scale,
                      list_transform(qv, x -> x * scale) AS rec
               FROM q),
         err AS (SELECT vec_id, e, scale, rec,
                        list_transform(range(1, len(e) + 1),
                                       i -> abs(e[i] - rec[i])) AS d
                 FROM r)
    SELECT vec_id, scale,
           list_max(d) AS max_abs_err,
           list_sum(list_transform(d, x -> x * x)) / len(d) AS mse,
           list_dot_product(e, rec)
             / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(rec, rec)))
             AS cos_sim
    FROM err
    """,
    doc="Symmetric per-vector int8 quantization quality gate: scale, "
    "max |err|, MSE, and reconstructed-vs-original cosine per embedding "
    "(operators/similarity.py:quantize_int8 — the 4x memory cut an ANN "
    "index takes before it fits at 100 TB).",
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return quantization_error(emb, "vec_id", "embedding")


_Q = """((CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1.0
               WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END)
       + (CASE WHEN len(toks) > 0
               THEN len(list_distinct(toks))::DOUBLE / len(toks)
               ELSE 0.0 END)
       + (CASE WHEN len(toks) > 0
                AND len(list_filter(toks, t -> t IN
                    ('the','a','of','and','to','in','is','it')))::DOUBLE
                    / len(toks) BETWEEN 0.05 AND 0.6
               THEN 1.0 ELSE 0.5 END)) / 3.0"""

_STOP = """CASE WHEN len(toks) > 0
                THEN len(list_filter(toks, t -> t IN
                    ('the','a','of','and','to','in','is','it')))::DOUBLE / len(toks)
                ELSE 0.0 END"""


@register(
    "pipeline_curate_corpus",
    bench=True,
    oracle=f"""
    WITH scrubbed AS (
      SELECT doc_id, source,
             regexp_replace(text, '{_SCRUB_PAT}', '[REDACTED]', 'g') AS text
      FROM documents
    ), tok AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM scrubbed
    ), kept AS (
      SELECT * FROM tok
      WHERE {_STOP} >= 0.08         -- lang_id heuristic predicts 'en'
        AND {_Q} >= 0.55            -- quality gate
    ), dedup AS (
      SELECT *, row_number() OVER (
               PARTITION BY md5(array_to_string(toks, ' '))
               ORDER BY doc_id) AS rn
      FROM kept
    ), split AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                  THEN 'holdout' ELSE 'train' END AS split,
             {_SUBWORD_SQL} AS n_tokens
      FROM dedup WHERE rn = 1
    ), win AS (
      SELECT doc_id, source, split, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source, split
                                 ORDER BY md5(doc_id::VARCHAR), doc_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM split
    )
    SELECT doc_id, source, split, n_tokens, cum_tokens FROM win
    WHERE split = 'holdout'
       OR cum_tokens - n_tokens < CASE source WHEN 'src0' THEN 4000 ELSE 800 END
    """,
    doc="End-to-end corpus curation in ONE declarative plan "
    "(operators/pipeline.py:curate_corpus): scrub -> lang filter -> "
    "quality gate -> exact dedup (min-id keeper per fingerprint) -> "
    "deterministic 10% holdout -> per-source token-budget train mixing "
    "(src0: 4000, default 800).  Two shuffles total at any scale "
    "(fingerprint window + mixing window); everything else fuses into "
    "the scan.",
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus

    # r17 (VERDICT item 1): spread=True REVERTED here.  The driver
    # measured 0.86 -> 2.32 s MIN (2.7x, vs a <=1.35x noise band) and 8
    # cores beat 32 (scaling ratio 0.75): Catalyst pushed the heavy
    # quality-gate filter BELOW the spread Exchange down to the
    # single-task scan, so the per-row compute stayed serial while the
    # full-text shuffle was pure added cost — no downstream exchange
    # shares the doc_id key (they hash on _w0/(source, split)), unlike
    # text_quality_classifier where the spread exchange REPLACES the
    # downstream one.
    d = table(spark, sf_dir, "documents")
    return curate_corpus(
        d,
        scrub_pattern=_SCRUB_PAT,
        lang="en",
        min_quality=0.55,
        holdout_fraction=0.1,
        budgets={"src0": 4000},
        default_budget=800,
    )


def _fuzzy_curate_oracle() -> str:
    """pipeline_curate_corpus + the near-dup stage: MinHash-LSH pairs
    over the CURATED corpus (scrubbed text), resolved to clusters by a
    recursive-CTE transitive closure, keepers only into split/mix."""
    from flink_1_8_sourcecode_spark.queries.dedup import _minhash_oracle

    return f"""
    WITH RECURSIVE scrubbed AS (
      SELECT doc_id, source,
             regexp_replace(text, '{_SCRUB_PAT}', '[REDACTED]', 'g') AS text
      FROM documents
    ), tk AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM scrubbed
    ), kept AS (
      SELECT * FROM tk
      WHERE {_STOP} >= 0.08
        AND {_Q} >= 0.55
    ), dd AS (
      SELECT *, row_number() OVER (
               PARTITION BY md5(array_to_string(toks, ' '))
               ORDER BY doc_id) AS rn
      FROM kept
    ), curated AS (
      SELECT doc_id, source, text FROM dd WHERE rn = 1
    ), pairs AS (
      {_minhash_oracle("curated")}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM curated
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ), keepers AS (
      SELECT id FROM reach GROUP BY id HAVING min(r) = id
    ), split AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                  THEN 'holdout' ELSE 'train' END AS split,
             {_SUBWORD_SQL} AS n_tokens
      FROM curated JOIN keepers ON curated.doc_id = keepers.id
    ), win AS (
      SELECT doc_id, source, split, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source, split
                                 ORDER BY md5(doc_id::VARCHAR), doc_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM split
    )
    SELECT doc_id, source, split, n_tokens, cum_tokens FROM win
    WHERE split = 'holdout'
       OR cum_tokens - n_tokens < CASE source WHEN 'src0' THEN 4000 ELSE 800 END
    """


@register(
    "pipeline_curate_corpus_fuzzy",
    oracle=_fuzzy_curate_oracle(),
    doc="curate_corpus with the near-dup stage on (neardup=True): after "
    "the exact fingerprint dedup, MinHash-LSH candidate pairs (16 "
    "hashes / 8 bands / hot-bucket star guard) over the surviving docs "
    "resolve into clusters via the alternating-star transitive closure; "
    "only cluster keepers (min id) enter the split/mix stages.  The "
    "full chain real corpus prep runs (operators/pipeline.py:"
    "curate_corpus).  The LSH stage's two self-join branches reuse ONE "
    "signature exchange (plan-pinned in tests/test_pipeline_ops.py).",
)
def pipeline_curate_corpus_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus

    d = table(spark, sf_dir, "documents")
    return curate_corpus(
        d,
        scrub_pattern=_SCRUB_PAT,
        lang="en",
        min_quality=0.55,
        holdout_fraction=0.1,
        budgets={"src0": 4000},
        default_budget=800,
        neardup=True,
        # closure parallelism tracks the tiny near-dup pair set
        # (setParallelism parity; measured -30% on the closure rounds)
        neardup_shuffle_partitions=4,
    )


@register(
    "sample_shard_assignment",
    oracle="""
    SELECT doc_id,
           ((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT) % 16)::INT
             AS shard
    FROM documents
    """,
    doc="Deterministic 16-way shard assignment (md5-prefix value mod "
    "n): map-only, uniform, stable on task retry — the write-layout "
    "step before repartition/partitionBy "
    "(operators/sampling.py:shard_assignment).",
)
def sample_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.shard_assignment(d, "doc_id", 16).select("doc_id", "shard")


@register(
    "pipeline_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_SUBWORD_SQL} AS n_tokens FROM documents
    ), w AS (
      SELECT doc_id, source, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY md5(doc_id::VARCHAR), doc_id
                                  ROWS UNBOUNDED PRECEDING)
              - n_tokens)::BIGINT AS st
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           (st // 512) AS seq_id, (st % 512) AS seq_offset
    FROM w
    """,
    doc="Concat-and-chunk sequence packing: per-source deterministic "
    "token stream chunked into 512-token training sequences; each doc "
    "gets (seq_id, seq_offset) — the GPT-style packing step "
    "(operators/sampling.py:pack_sequences; one shuffle on source).",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.pack_sequences(
        d, "source", "doc_id", tx.subword_count(F.col("text")), seq_len=512
    ).select("doc_id", "source", "n_tokens", "seq_id", "seq_offset")


@register(
    "pipeline_contamination_check",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, text,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                  THEN 'holdout' ELSE 'train' END AS split
      FROM documents
    ), tok AS (
      SELECT doc_id, source, split,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS t
      FROM s
    ), g AS (
      SELECT doc_id, source, split,
             unnest(list_distinct(list_transform(range(1, len(t) - 1), i ->
               t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM tok WHERE len(t) >= 3
    ), hg AS (SELECT DISTINCT gram FROM g WHERE split = 'holdout'),
    hits AS (SELECT DISTINCT g.doc_id FROM g JOIN hg USING (gram)
             WHERE g.split = 'train')
    SELECT t.source, count(*) AS n_train,
           sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated
    FROM (SELECT doc_id, source FROM s WHERE split = 'train') t
    LEFT JOIN hits h ON t.doc_id = h.doc_id
    GROUP BY t.source
    """,
    doc="Train/holdout contamination report: after the deterministic "
    "10% split, count train docs per source sharing any word 3-gram "
    "with the holdout side (operators/text.py:decontaminate over "
    "operators/sampling.py:hash_split) — the eval-leakage audit every "
    "corpus release needs.",
)
def pipeline_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import decontaminate

    d = table(spark, sf_dir, "documents")
    split = smp.hash_split(d, "doc_id", 0.1)
    train = split.filter(F.col("split") == "train")
    holdout = split.filter(F.col("split") == "holdout")
    flagged = decontaminate(train, holdout, "doc_id", "text", n=3)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.col("contaminated").cast("long")).alias("n_contaminated"),
    )


def _fuzzy_decontam_oracle() -> str:
    """MinHash-LSH cross-set decontamination SQL: the affine-family band
    relation (bit-for-bit portable, see queries/dedup.py:_minhash_oracle)
    computed over BOTH sides of the deterministic split; a train doc is
    fuzzy-contaminated when any of its 8 bands matches a holdout band."""
    from flink_1_8_sourcecode_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )
    from flink_1_8_sourcecode_spark.queries.dedup import _SHINGLE_DUCK

    base = " + ".join(
        f"(strpos('0123456789abcdef', md5(s)[{i + 1}]) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    )
    sig_cols = ", ".join(
        f"min(({MINHASH_A[i]} * b + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}"
        for i in range(16)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, split, {j} AS band_id, "
        f"h{2 * j}::VARCHAR || '#' || h{2 * j + 1}::VARCHAR AS band_hash FROM sig"
        for j in range(8)
    )
    return f"""
    WITH sp AS (
      SELECT doc_id, source, text,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                  THEN 'holdout' ELSE 'train' END AS split
      FROM documents
    ), tok AS (
      SELECT doc_id, split,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM sp
    ), shi AS (
      SELECT doc_id, split, {_SHINGLE_DUCK} AS sh FROM tok
    ), srow AS (
      SELECT doc_id, split, unnest(sh) AS s FROM shi
    ), basev AS (
      SELECT doc_id, split, {base} AS b FROM srow
    ), sig AS (
      SELECT doc_id, split, {sig_cols} FROM basev GROUP BY doc_id, split
    ), bands AS (
      {band_rows}
    ), hb AS (
      SELECT DISTINCT band_id, band_hash FROM bands WHERE split = 'holdout'
    ), hits AS (
      SELECT DISTINCT b.doc_id FROM bands b
      JOIN hb USING (band_id, band_hash) WHERE b.split = 'train'
    )
    SELECT t.source, count(*) AS n_train,
           sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_fuzzy_contaminated
    FROM (SELECT doc_id, source FROM sp WHERE split = 'train') t
    LEFT JOIN hits h ON t.doc_id = h.doc_id
    GROUP BY t.source
    """


@register(
    "pipeline_decontaminate_fuzzy",
    oracle=_fuzzy_decontam_oracle(),
    doc="NEAR-duplicate decontamination audit: train docs whose MinHash "
    "signature shares an LSH band with any holdout doc, per source "
    "(operators/dedup.py:decontaminate_fuzzy) — catches lightly-edited "
    "eval leakage that exact n-gram overlap (pipeline_contamination_"
    "check) misses.  Holdout band hashes broadcast; the corpus is "
    "never shuffled for the probe.",
)
def pipeline_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import decontaminate_fuzzy

    d = table(spark, sf_dir, "documents")
    split = smp.hash_split(d, "doc_id", 0.1)
    train = split.filter(F.col("split") == "train")
    holdout = split.filter(F.col("split") == "holdout")
    flagged = decontaminate_fuzzy(train, holdout, "doc_id", "text")
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.col("contaminated_fuzzy").cast("long")).alias("n_fuzzy_contaminated"),
    )


_ZBITS = 8
_Z_SQL = " | ".join(
    f"(((qa >> {i}) & 1) << {2 * i}) | (((qb >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)


@register(
    "layout_zorder_code",
    oracle=f"""
    WITH b AS (
      SELECT min(o_totalprice)::DOUBLE AS lo_a, max(o_totalprice)::DOUBLE AS hi_a,
             min(o_custkey)::DOUBLE    AS lo_b, max(o_custkey)::DOUBLE    AS hi_b
      FROM orders
    ), q AS (
      SELECT o_orderkey,
             greatest(0, least({2**_ZBITS - 1}, floor(
               (o_totalprice::DOUBLE - lo_a)
               / (CASE WHEN hi_a > lo_a THEN hi_a - lo_a ELSE 1.0 END)
               * {float(2**_ZBITS - 1)})::BIGINT)) AS qa,
             greatest(0, least({2**_ZBITS - 1}, floor(
               (o_custkey::DOUBLE - lo_b)
               / (CASE WHEN hi_b > lo_b THEN hi_b - lo_b ELSE 1.0 END)
               * {float(2**_ZBITS - 1)})::BIGINT)) AS qb
      FROM orders, b
    )
    SELECT o_orderkey, ({_Z_SQL})::BIGINT AS zcode FROM q
    """,
    doc="Z-order (Morton) clustering code over (o_totalprice, "
    "o_custkey): per-column min/max quantization to 8 bits + bit "
    "interleave — the data-layout lever that lets multi-dimensional "
    "range predicates prune files "
    "(operators/partitioning.py:zorder_value/zorder_layout; locality "
    "property pinned by tests/test_pipeline_ops.py).",
)
def layout_zorder_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.partitioning import zorder_layout

    o = table(spark, sf_dir, "orders")
    out = zorder_layout(o, ["o_totalprice", "o_custkey"], n_partitions=8, bits=_ZBITS)
    return out.select("o_orderkey", F.col("__z").alias("zcode"))


@register(
    "rowop_zip_with_index",
    oracle="""
    SELECT c_custkey,
           row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS index
    FROM customer
    """,
    doc="DataSetUtils.zipWithIndex parity (DataSetUtils.java:89): "
    "consecutive global indices in (c_acctbal, c_custkey) order via the "
    "reference's own two-pass shape — per-partition counts, broadcast "
    "cumulative offsets, partition-local labeling — no single-reducer "
    "global sort (operators/partitioning.py:zip_with_index).",
)
def rowop_zip_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.partitioning import zip_with_index

    c = table(spark, sf_dir, "customer")
    out = zip_with_index(c, ["c_acctbal", "c_custkey"], n_partitions=8)
    return out.select("c_custkey", "index")


@register(
    "rowop_dataset_checksum",
    oracle="""
    SELECT count(*) AS n_rows,
           bit_xor(('0x' || substr(md5(concat_ws('|',
             l_orderkey::VARCHAR, l_linenumber::VARCHAR,
             l_returnflag, l_shipdate::VARCHAR)), 1, 15))::BIGINT)
             AS checksum
    FROM lineitem
    """,
    doc="Distributed dataset checksum (DataSetUtils.checksumHashCode "
    "parity): bit-XOR of 60-bit md5 row hashes + row count in one "
    "map-side-combinable aggregate — the cheap cross-engine integrity "
    "check a corpus migration runs on both sides "
    "(operators/partitioning.py:dataset_checksum).",
)
def rowop_dataset_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.partitioning import dataset_checksum

    li = table(spark, sf_dir, "lineitem")
    return dataset_checksum(
        li, ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"]
    )


@register(
    "rowop_summarize",
    oracle="""
    SELECT 'o_totalprice' AS col,
           count(*) AS n_rows,
           count(o_totalprice) AS n_non_null,
           min(o_totalprice) AS min_v, max(o_totalprice) AS max_v,
           avg(o_totalprice) AS mean_v, stddev_samp(o_totalprice) AS std_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           count(*), count(o_custkey),
           min(o_custkey)::DOUBLE, max(o_custkey)::DOUBLE,
           avg(o_custkey), stddev_samp(o_custkey)
    FROM orders
    """,
    doc="DataSetUtils.summarize parity (DataSetUtils.java:311 — "
    "per-column aggregate statistics in one pass): count / non-null / "
    "min / max / mean / stddev per selected column, all "
    "partial-aggregable (one map-side-combined job regardless of "
    "column count).",
)
def rowop_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_col = []
    for c in ("o_totalprice", "o_custkey"):
        per_col.append(
            F.struct(
                F.lit(c).alias("col"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(c).alias("n_non_null"),
                F.min(c).cast("double").alias("min_v"),
                F.max(c).cast("double").alias("max_v"),
                F.avg(c).alias("mean_v"),
                F.stddev_samp(c).alias("std_v"),
            )
        )
    # ONE aggregate job: every column's stats in the same pass, then
    # unpivot the struct row into one output row per column
    agg = o.agg(F.array(*per_col).alias("stats"))
    return agg.select(F.explode("stats").alias("s")).select("s.*")


@register(
    "sample_exact_size",
    oracle="""
    SELECT doc_id, source FROM documents
    ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 50
    """,
    doc="Exact-size deterministic sample (DataSetUtils.sampleWithSize:"
    "232 parity, without-replacement): the 50 lowest md5-hash docs — "
    "Spark executes ORDER BY hash LIMIT n as TakeOrderedAndProject "
    "(per-partition top-n, then a driver merge of P*n rows), never a "
    "global sort; stable across runs/engines unlike the reference's "
    "RNG-based reservoir.",
)
def sample_exact_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.orderBy(smp.hash_key(F.col("doc_id")), F.col("doc_id"))
        .limit(50)
        .select("doc_id", "source")
    )


@register(
    "sample_temperature_resample",
    oracle="""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         tot AS (SELECT sum(n)::DOUBLE AS total_n FROM counts),
         wt AS (SELECT source, n, (n / tot.total_n) ** (1.0 / 2.0) AS w,
                       tot.total_n AS total_n
               FROM counts, tot),
         fr AS (SELECT source,
                       least((w / sum(w) OVER ()) * total_n / n, 1.0) AS accept_frac
                FROM wt)
    SELECT d.doc_id, d.source, f.accept_frac
    FROM documents d JOIN fr f USING (source)
    WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
          < f.accept_frac * 4294967296.0
    """,
    doc="Temperature-based source re-weighting at T=2 (the multilingual "
    "mixing rule of mT5/XLM: sample source s prop. to p_s^(1/T)) as "
    "deterministic subsampling: per-source acceptance fraction "
    "(q_s*N/n_s capped at 1) applied through the md5-prefix draw — one "
    "tiny source aggregate + a broadcast join + a map-only filter; the "
    "corpus never shuffles (operators/sampling.py:temperature_resample).",
)
def sample_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.temperature_resample(d, "source", "doc_id", temperature=2.0).select(
        "doc_id", "source", "accept_frac"
    )


@register(
    "text_dedup_lines",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, '\n'), s -> trim(s)),
                         s -> s != '') AS ls
      FROM documents
    )
    SELECT doc_id,
           len(ls) AS n_lines,
           len(list_filter(ls, (x, i) -> list_position(ls, x) = i)) AS n_kept,
           md5(array_to_string(list_filter(ls, (x, i) -> list_position(ls, x) = i),
               chr(10))) AS dedup_fp
    FROM l
    """,
    doc="Within-document line dedup (removal counterpart of the Gopher "
    "dup_line_frac signal): keep each line's first occurrence, drop "
    "later repeats — map-only Column math, the boilerplate-collapse "
    "scrub step (operators/text.py:dedup_lines).",
)
def text_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    deduped = tx.dedup_lines(t)
    return d.select(
        "doc_id",
        F.size(tx.lines(t)).alias("n_lines"),
        F.size(tx.lines(deduped)).alias("n_kept"),
        F.md5(deduped).alias("dedup_fp"),
    )


@register(
    "sample_dsir",
    oracle="""
    WITH ex AS (
      SELECT doc_id, (lang = 'en') AS tgt,
             unnest(list_filter(string_split(lower(trim(text)), ' '),
                                s -> s != '')) AS t
      FROM documents
    ),
    lm AS (
      SELECT t, count(*) AS cr, count(*) FILTER (WHERE tgt) AS ct
      FROM ex GROUP BY t
    ),
    tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM lm),
    scored AS (
      SELECT ex.doc_id,
             count(*) AS n_tokens,
             sum(ln((lm.ct + 1.0) / (tot.nt + 1.0 * tot.v))
                 - ln((lm.cr + 1.0) / (tot.nr + 1.0 * tot.v))) AS log_weight
      FROM ex JOIN lm USING (t) CROSS JOIN tot
      GROUP BY ex.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_tokens, 0) AS n_tokens,
           coalesce(s.log_weight, 0.0) AS log_weight
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    doc="DSIR importance weighting (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling'): per-document "
    "log w = sum_t [ln p_target(t) - ln p_raw(t)] under add-1-smoothed "
    "unigram models, target = English documents — resample by weight "
    "to shift the corpus toward the target domain.  Vocab-bounded LM "
    "groupBy (partial-agg), three scalar normalizers, one "
    "token-to-LM join + per-doc sum "
    "(operators/sampling.py:dsir_importance).",
)
def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return smp.dsir_importance(d, "doc_id", "text", F.col("lang") == "en", add_k=1.0)


def _bloom_decontam_oracle() -> str:
    """Bloom-filter decontamination SQL: the seed-prefixed 28-bit md5
    bit positions (mirror of operators/text.py:bloom_bit_positions)
    computed over BOTH sides of the deterministic split; a train doc is
    flagged when any of its 3-grams has all 3 bits in the holdout's
    bit-set (false positives by design, identical in both engines)."""
    from flink_1_8_sourcecode_spark.queries.dedup import _duck_gram_base

    def bit(seed: int) -> str:
        expr = f"'bloom{seed}|' || gram"
        return f"({_duck_gram_base(expr)}) % 262144"

    return f"""
    WITH s AS (
      SELECT doc_id, source, text,
             CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '{_T10}'
                  THEN 'holdout' ELSE 'train' END AS split
      FROM documents
    ), tok AS (
      SELECT doc_id, source, split,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS t
      FROM s
    ), g AS (
      SELECT doc_id, source, split,
             unnest(list_distinct(list_transform(range(1, len(t) - 1), i ->
               t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
      FROM tok WHERE len(t) >= 3
    ), bits AS (
      SELECT doc_id, source, split,
             {bit(0)} AS b0, {bit(1)} AS b1, {bit(2)} AS b2
      FROM g
    ), bloom AS (
      SELECT DISTINCT b FROM (
        SELECT unnest([b0, b1, b2]) AS b FROM bits WHERE split = 'holdout')
    ), hits AS (
      SELECT DISTINCT doc_id FROM bits
      WHERE split = 'train'
        AND b0 IN (SELECT b FROM bloom)
        AND b1 IN (SELECT b FROM bloom)
        AND b2 IN (SELECT b FROM bloom)
    )
    SELECT t.source, count(*) AS n_train,
           sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_flagged
    FROM (SELECT doc_id, source FROM s WHERE split = 'train') t
    LEFT JOIN hits h ON t.doc_id = h.doc_id
    GROUP BY t.source
    """


@register(
    "pipeline_decontaminate_bloom",
    oracle=_bloom_decontam_oracle(),
    doc="Bloom-filter decontamination (Bloom 1970): the holdout corpus "
    "compresses to a deterministic <=2^18-long bit-set (3 seed-prefixed "
    "md5 positions per distinct 3-gram) broadcast into a chain of 3 "
    "LEFT SEMI probes over the exploded train grams — the broadcast "
    "side is bounded by the filter width no matter how large the "
    "holdout grows, unlike the exact gram-set filter "
    "(operators/text.py:decontaminate_bloom over hash_split).",
)
def pipeline_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import decontaminate_bloom

    d = table(spark, sf_dir, "documents")
    split = smp.hash_split(d, "doc_id", 0.1)
    train = split.filter(F.col("split") == "train")
    holdout = split.filter(F.col("split") == "holdout")
    flagged = decontaminate_bloom(train, holdout, "doc_id", "text", n=3)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.col("bloom_contaminated").cast("long")).alias("n_flagged"),
    )


@register(
    "sample_weighted_upsample",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 2.5 ELSE 0.8 END AS wt,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE AS draw
      FROM documents
    ),
    n AS (
      SELECT doc_id, lang,
             (floor(wt)::BIGINT
              + CASE WHEN draw < (wt - floor(wt)) * 4294967296.0
                     THEN 1 ELSE 0 END) AS n_copies
      FROM w
    )
    SELECT doc_id, lang, u.copy
    FROM n, UNNEST(range(1, n_copies + 1)) AS u(copy)
    WHERE n_copies > 0
    """,
    doc="Deterministic weighted up/down-sampling (fractional epoch "
    "mixing, Brown et al. 2020 Table 2.2 shape): English docs repeat "
    "~2.5x, others survive at ~0.8 — floor(w) copies plus a "
    "deterministic md5-draw for the fractional remainder; map-only, "
    "no shuffle, no RNG (operators/sampling.py:weighted_upsample).",
)
def sample_weighted_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    wt = F.when(F.col("lang") == "en", F.lit(2.5)).otherwise(F.lit(0.8))
    out = smp.weighted_upsample(d, "doc_id", wt)
    return out.select("doc_id", "lang", F.col("copy").cast("long").alias("copy"))


@register(
    "sample_cap_per_key",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR || 'cap'), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 25
    """,
    doc="Per-key cap / deterministic reservoir (operators/sampling.py:"
    "cap_per_key): at most 25 docs per source, winners = lowest salted "
    "md5(doc_id) — reproducible under retries and across engines.  One "
    "key-hash shuffle + per-key window rank; the over-represented-"
    "source guard in corpus mixing.",
)
def sample_cap_per_key(spark, sf_dir: str):
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.sampling import cap_per_key

    d = table(spark, sf_dir, "documents")
    return cap_per_key(d, "source", "doc_id", k=25, salt="cap").select(
        "source", "doc_id"
    )


@register(
    "pipeline_curriculum_pack",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             {_SUBWORD_SQL} AS n_tokens,
             ((CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1.0
                    WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END)
            + (CASE WHEN len(toks) > 0
                    THEN len(list_distinct(toks))::DOUBLE / len(toks)
                    ELSE 0.0 END)
            + (CASE WHEN len(toks) > 0
                     AND len(list_filter(toks, t -> t IN
                         ('the','a','of','and','to','in','is','it')))::DOUBLE
                         / len(toks) BETWEEN 0.05 AND 0.6
                    THEN 1.0 ELSE 0.5 END)) / 3.0 AS quality
      FROM tok
    ), w AS (
      SELECT doc_id, source, quality, n_tokens,
             (sum(n_tokens) OVER (PARTITION BY source
                                  ORDER BY quality DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING)
              - n_tokens)::BIGINT AS st
      FROM scored
    )
    SELECT doc_id, source, quality, n_tokens,
           (st // 512) AS seq_id, (st % 512) AS seq_offset
    FROM w
    """,
    doc="Curriculum packing: per-source docs laid out HIGH-quality-first "
    "(quality_score desc, doc_id tiebreak) and concat-chunked into "
    "512-token sequences — the curriculum-ordered variant of "
    "pipeline_pack_sequences (operators/sampling.py:pack_sequences "
    "with order_by).  Same single source-keyed exchange; the ordering "
    "is one extra window sort key, no extra pass.",
)
def pipeline_curriculum_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scored = d.withColumn("quality", tx.quality_score(F.col("text")))
    return smp.pack_sequences(
        scored,
        "source",
        "doc_id",
        tx.subword_count(F.col("text")),
        seq_len=512,
        order_by=[F.col("quality").desc()],
    ).select("doc_id", "source", "quality", "n_tokens", "seq_id", "seq_offset")


@register(
    "sample_interleave_sources",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) - 1
               AS rnd
      FROM documents
    ), s AS (
      SELECT source AS s2,
             row_number() OVER (ORDER BY source) - 1 AS sidx
      FROM (SELECT DISTINCT source FROM documents)
    ), n AS (SELECT count(*) AS ns FROM s)
    SELECT doc_id, source, (rnd * n.ns + s.sidx)::BIGINT AS mix_rank
    FROM r JOIN s ON r.source = s.s2 CROSS JOIN n
    """,
    doc="Round-robin source interleave (operators/sampling.py:"
    "interleave_sources): deterministic training-order mixing — rows "
    "cycle sources card-dealing style so no stream window is "
    "single-source; per-source order is the salted-md5 draw.  One "
    "source-keyed window exchange; the global rank is arithmetic "
    "(round * n_sources + source_index), never a global sort.",
)
def sample_interleave_sources(spark, sf_dir: str):
    d = table(spark, sf_dir, "documents")
    return smp.interleave_sources(d, "source", "doc_id").select(
        "doc_id", "source", "mix_rank"
    )


def _capped_baskets(li, max_basket: int = 64):
    """Distinct (order, part) basket lines with a deterministic per-
    basket CAP (operators/sampling.py:cap_per_key): the pair self-join
    below is quadratic PER ORDER, so one degenerate 100k-item basket
    would contribute 5e9 pairs at 100 TB — the cap bounds any order's
    contribution at C(max_basket, 2).  TPC-H baskets hold <= 7 lines,
    so at bench scale the cap drops nothing and the oracles stay
    exact; the guard exists for open-domain basket data."""
    from flink_1_8_sourcecode_spark.operators.sampling import cap_per_key

    b = li.select("l_orderkey", "l_partkey").distinct()
    return cap_per_key(b, "l_orderkey", "l_partkey", k=max_basket)


@register(
    "agg_copurchase_pairs",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (
           SELECT a.l_partkey AS part_a, c.l_partkey AS part_b
           FROM b a JOIN b c
             ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
         )
    SELECT part_a, part_b, count(*) AS n_orders
    FROM p GROUP BY part_a, part_b HAVING count(*) >= 2
    """,
    doc="Market-basket co-occurrence (frequent pair mining, support "
    ">= 2): parts bought together in the same order, via a basket "
    "self-join on the order key.  Scale: the pair explode is bounded "
    "by basket size squared PER ORDER (never corpus-wide); the "
    "distinct pre-pass collapses duplicate (order, part) lines "
    "map-side; the pair count partial-aggregates.  A support "
    "threshold this low is the worst case — real mining raises it "
    "and AQE prunes post-aggregate.",
)
def agg_copurchase_pairs(spark, sf_dir: str):
    li = table(spark, sf_dir, "lineitem")
    b = _capped_baskets(li)
    a = b.alias("a")
    c = b.alias("c")
    pairs = a.join(
        c,
        (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("c.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("c.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "agg_association_rules",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
         item AS (SELECT l_partkey, count(*) AS n_item FROM b GROUP BY l_partkey),
         p AS (
           SELECT a.l_partkey AS part_a, c.l_partkey AS part_b, count(*) AS n_ab
           FROM b a JOIN b c
             ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2
         )
    SELECT p.part_a, p.part_b, p.n_ab,
           p.n_ab::DOUBLE / ia.n_item AS confidence,
           p.n_ab::DOUBLE * n.n_orders / (ia.n_item * ib.n_item) AS lift
    FROM p
    JOIN item ia ON ia.l_partkey = p.part_a
    JOIN item ib ON ib.l_partkey = p.part_b
    CROSS JOIN n
    """,
    doc="Association rules over the co-purchase pairs (support >= 2): "
    "confidence(A -> B) = n(AB)/n(A) and lift = n(AB)*N/(n(A)*n(B)).  "
    "Scale: item supports partial-aggregate; the basket count is a "
    "single-row broadcast; rule scoring joins the (already thresholded) "
    "pair relation against the bounded item-support table.",
)
def agg_association_rules(spark, sf_dir: str):
    li = table(spark, sf_dir, "lineitem")
    b = _capped_baskets(li)
    n_orders = b.select(F.countDistinct("l_orderkey").alias("n_orders"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = b.alias("a")
    c = b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("c.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("__na"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("__nb"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            (F.col("n_ab") / F.col("__na")).alias("confidence"),
            (F.col("n_ab") * F.col("n_orders") / (F.col("__na") * F.col("__nb"))).alias(
                "lift"
            ),
        )
    )


@register(
    "ml_quantile_bucketize",
    oracle="""
    WITH q AS (
      SELECT round(quantile_cont(c_acctbal, 0.25), 6) AS q1,
             round(quantile_cont(c_acctbal, 0.50), 6) AS q2,
             round(quantile_cont(c_acctbal, 0.75), 6) AS q3
      FROM customer
    )
    SELECT c_custkey, c_acctbal,
           ((c_acctbal > q.q1)::INT + (c_acctbal > q.q2)::INT
            + (c_acctbal > q.q3)::INT) AS bucket
    FROM customer CROSS JOIN q
    """,
    doc="Equi-depth feature discretization (ml/wrappers.py:"
    "quantile_bucketizer — the QuantileDiscretizer pattern with EXACT "
    "percentile cuts): customer balances into quartile buckets.  Cuts "
    "rounded to 6 dp before comparison so cross-engine interpolation "
    "ULPs cannot flip a boundary row; one percentile aggregate + a "
    "map-only comparison chain.",
)
def ml_quantile_bucketize(spark, sf_dir: str):
    from flink_1_8_sourcecode_spark.ml.wrappers import quantile_bucketizer

    c = table(spark, sf_dir, "customer")
    out, _cuts = quantile_bucketizer(c, "c_acctbal", n_buckets=4)
    return out.select("c_custkey", "c_acctbal", "bucket")


@register(
    "pipeline_data_quality",
    oracle="""
    WITH stats AS (
      SELECT count(*) AS n,
             sum(CASE WHEN NOT coalesce(c_acctbal BETWEEN -1000 AND 10000, FALSE)
                      THEN 1 ELSE 0 END) AS v_bal,
             sum(CASE WHEN NOT coalesce(c_mktsegment IS NOT NULL, FALSE)
                      THEN 1 ELSE 0 END) AS v_seg,
             sum(CASE WHEN NOT coalesce(c_nationkey BETWEEN 0 AND 24, FALSE)
                      THEN 1 ELSE 0 END) AS v_nat,
             count(DISTINCT c_custkey) AS d_key
      FROM customer
    )
    SELECT 'acctbal_range' AS rule, n AS checked, v_bal::BIGINT AS violations,
           v_bal = 0 AS passed FROM stats
    UNION ALL
    SELECT 'segment_not_null', n, v_seg::BIGINT, v_seg = 0 FROM stats
    UNION ALL
    SELECT 'nationkey_range', n, v_nat::BIGINT, v_nat = 0 FROM stats
    UNION ALL
    SELECT 'unique(c_custkey)', n, (n - d_key)::BIGINT, n = d_key FROM stats
    """,
    doc="Data-quality expectations gate (operators/pipeline.py:"
    "validate_expectations — the Deequ-style pre-ingestion check): "
    "range / not-null / uniqueness rules over customer, ALL evaluated "
    "in one partial-aggregated pass (adding rules adds agg columns, "
    "not scans); the report is one row per rule.",
)
def pipeline_data_quality(spark, sf_dir: str):
    from flink_1_8_sourcecode_spark.operators.pipeline import validate_expectations

    c = table(spark, sf_dir, "customer")
    return validate_expectations(
        c,
        rules=[
            ("acctbal_range", F.col("c_acctbal").between(-1000, 10000)),
            ("segment_not_null", F.col("c_mktsegment").isNotNull()),
            ("nationkey_range", F.col("c_nationkey").between(0, 24)),
        ],
        unique_cols=["c_custkey"],
    )


@register(
    "sample_rate_limit",
    oracle="""
    SELECT user_id, event_id, window_start FROM (
      SELECT user_id, event_id,
             ((floor(epoch(ts::TIMESTAMP))::BIGINT // 86400) * 86400)
               AS window_start,
             row_number() OVER (
               PARTITION BY user_id, floor(epoch(ts::TIMESTAMP))::BIGINT // 86400
               ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
    doc="Deterministic per-key rate limit (operators/sampling.py:"
    "rate_limit): at most 3 events per user per DAY, earliest-first — "
    "the batch/backfill form of an ingestion throttle, reproducing "
    "exactly what a compliant online throttle admits.  One shuffle on "
    "(key, bucket) + a per-bucket rank; a skewed key bounds one task "
    "per bucket, never its whole history.",
)
def sample_rate_limit(spark, sf_dir: str):
    from flink_1_8_sourcecode_spark.operators.sampling import rate_limit

    e = table(spark, sf_dir, "events")
    return rate_limit(
        e, key_col="user_id", time_col="ts", id_col="event_id",
        k=3, window_seconds=86400,
    ).select("user_id", "event_id", "window_start")


_SCG_WEIGHTS_EXPORT = export_path("streaming_gate_weights")
_DOC_CHUNK_CACHE: dict[str, str] = {}

from flink_1_8_sourcecode_spark.queries.dedup import (  # noqa: E402
    _duck_gram_base,
    _minhash_bands_cte,
)

_HEX_T = _duck_gram_base("t")


@register(
    "streaming_curate_gate",
    oracle=f"""
    WITH wt AS (
      SELECT bucket, weight
      FROM read_parquet('{_SCG_WEIGHTS_EXPORT}/*.parquet') WHERE bucket >= 0
    ), bias AS (
      SELECT weight
      FROM read_parquet('{_SCG_WEIGHTS_EXPORT}/*.parquet') WHERE bucket = -1
    ), built AS (
      SELECT doc_id, text,
             'http://' || source || '.example.com/doc/' || doc_id::VARCHAR
               AS url
      FROM documents
    ), flt AS (
      SELECT doc_id, text,
             regexp_extract(url, '^[^/]*//([^/:?]+)', 1) AS domain,
             CASE WHEN len(list_filter(string_split_regex(lower(trim(text)),
                        '\\s+'), x -> x != '')) > 0
                  THEN len(list_filter(list_filter(
                         string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != ''),
                       x -> list_contains(['slow', 'big'], x)))
                       / len(list_filter(string_split_regex(lower(trim(text)),
                             '\\s+'), x -> x != ''))::DOUBLE
                  ELSE 0.0 END AS badword_ratio
      FROM built
    ), gated AS (
      SELECT * FROM flt
      WHERE domain NOT IN ('src0.example.com', 'src7.example.com')
        AND badword_ratio <= 0.07
    ), tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS t
      FROM gated
    ), b AS (
      SELECT doc_id, ({_HEX_T}) % 4096 AS bucket FROM tok
    ), agg AS (
      SELECT doc_id, count(*) AS n_tokens,
             sum(coalesce(wt.weight, 0.0)) AS sw
      FROM b LEFT JOIN wt USING (bucket) GROUP BY 1
    )
    SELECT g.doc_id, g.domain, round(g.badword_ratio, 4) AS badword_ratio,
           a.n_tokens,
           round(1.0 / (1.0 + exp(-(a.sw / a.n_tokens
                 + (SELECT weight FROM bias)))), 6) AS score
    FROM gated g JOIN agg a USING (doc_id)
    WHERE round(1.0 / (1.0 + exp(-(a.sw / a.n_tokens
          + (SELECT weight FROM bias)))), 6) > 0.5
    """,
    doc="End-to-end LLM-corpus curation ON LIVE INGESTION "
    "(operators/pipeline.py:curate_gate): the blocklist gate and the "
    "in-engine-TRAINED quality classifier run inside the streaming "
    "path — documents replayed as micro-batches, every gate stage "
    "stateless (broadcast anti-join + map-only array HOFs, the "
    "coefficient vector a plan literal), append-mode memory sink.  "
    "Weights come from a quality_classifier_train fit on the batch "
    "corpus (the historical-corpus -> live-ingestion deployment "
    "shape); the oracle is WEIGHTS-CONDITIONED — DuckDB independently "
    "re-runs blocklist + ratio + logistic scoring from the exported "
    "(bucket, weight) table.  Stream == batch because no stage keeps "
    "state across micro-batches.",
)
def streaming_curate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from flink_1_8_sourcecode_spark.operators.pipeline import curate_gate
    from flink_1_8_sourcecode_spark.operators.text import (
        GOPHER_STOPWORDS,
        quality_classifier_train,
        tokens,
    )
    from flink_1_8_sourcecode_spark.streaming import sources

    # 1. train on the batch corpus (Gopher stopword-density weak labels
    #    — same supervision as text_quality_classifier_trained)
    d = table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    label = (F.size(t) > 0) & ((n_stop / F.size(t)) >= 0.02)
    weights, bias = quality_classifier_train(
        d.select("doc_id", "text", label.cast("int").alias("label")),
        "doc_id", "text", "label", n_iters=8,
    )
    spark.createDataFrame(
        list(enumerate(weights)) + [(-1, bias)], "bucket int, weight double"
    ).coalesce(1).write.mode("overwrite").parquet(_SCG_WEIGHTS_EXPORT)

    # 2. gate the live replay with the fitted coefficients
    import os
    import tempfile

    chunks = _DOC_CHUNK_CACHE.get(sf_dir)
    if chunks is None or not os.path.isdir(chunks):
        chunks = tempfile.mkdtemp(prefix="scg_docs_")
        sources.write_document_chunks(spark, sf_dir, chunks, n_chunks=4)
        _DOC_CHUNK_CACHE[sf_dir] = chunks
    src = sources.read_document_stream(spark, chunks).withColumn(
        "url",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    blocked = spark.createDataFrame(
        [("src0.example.com",), ("src7.example.com",)], "domain string"
    )
    out = curate_gate(
        src, "url", "text", blocked, badwords=["slow", "big"],
        max_badword_ratio=0.07, weights=weights, bias=bias,
    ).select(
        "doc_id", "domain", F.round("badword_ratio", 4).alias("badword_ratio"),
        "n_tokens", "score",
    )
    name = f"q_scg_{uuid.uuid4().hex[:8]}"
    sources.run_bounded_to_memory(out, name)
    return spark.table(name)


@register(
    "streaming_ingest_pipeline",
    oracle=f"""
    WITH built AS (
      SELECT doc_id, text,
             'http://' || source || '.example.com/doc/' || doc_id::VARCHAR
               AS url
      FROM documents
    ), flt AS (
      SELECT doc_id, text,
             regexp_extract(url, '^[^/]*//([^/:?]+)', 1) AS domain,
             CASE WHEN len(list_filter(string_split_regex(lower(trim(text)),
                        '\\s+'), x -> x != '')) > 0
                  THEN len(list_filter(list_filter(
                         string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x != ''),
                       x -> list_contains(['slow', 'big'], x)))
                       / len(list_filter(string_split_regex(lower(trim(text)),
                             '\\s+'), x -> x != ''))::DOUBLE
                  ELSE 0.0 END AS badword_ratio
      FROM built
    ), g1 AS (
      SELECT doc_id, text FROM flt
      WHERE domain NOT IN ('src0.example.com', 'src7.example.com')
        AND badword_ratio <= 0.07
    ), tokq AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS t
      FROM g1
    ), wq AS (
      SELECT doc_id,
             ((((({_HEX_T}) % 4096) * 2654435761)
               % 2147483648) / 2147483648.0) * 2 - 1 AS wt
      FROM tokq
    ), scq AS (
      SELECT doc_id, count(*) AS n, sum(wt) AS sw FROM wq GROUP BY 1
    ), gated AS (
      SELECT g1.doc_id, g1.text FROM g1 JOIN scq USING (doc_id)
      WHERE round(1.0 / (1.0 + exp(-4.0 * sw / n)), 6) > 0.5
    ), {_minhash_bands_cte('gated')}, owners AS (
      SELECT band_id, band_hash, min(doc_id) AS owner
      FROM bands GROUP BY 1, 2
    )
    SELECT b.doc_id, min(o.owner) AS dup_of
    FROM bands b JOIN owners o USING (band_id, band_hash)
    WHERE o.owner < b.doc_id
    GROUP BY 1
    """,
    doc="END-TO-END LLM-corpus ingestion in ONE streaming query: the "
    "curation gates (blocklist broadcast-anti + bad-word ratio + "
    "hash-stand-in quality classifier, all stateless — "
    "operators/pipeline.py:curate_gate) feed the ONLINE MinHash-LSH "
    "near-dup detector (streaming/stateful.py:streaming_lsh_dedup, "
    "the one stateful operator) over documents replayed in id order.  "
    "Output: each gated-surviving document flagged as a near-dup of "
    "an earlier gated survivor, with its earliest owner.  The oracle "
    "recomputes the whole pipeline in SQL — gates, band signatures, "
    "min-owner rule — with no conditioning; arrival order == id order "
    "makes the online first-owner equal the batch min-owner.",
)
def streaming_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from flink_1_8_sourcecode_spark.operators.pipeline import curate_gate
    from flink_1_8_sourcecode_spark.streaming import sources
    from flink_1_8_sourcecode_spark.streaming.stateful import (
        streaming_lsh_dedup,
    )

    import os
    import tempfile

    chunks = _DOC_CHUNK_CACHE.get(sf_dir)
    if chunks is None or not os.path.isdir(chunks):
        chunks = tempfile.mkdtemp(prefix="scg_docs_")
        sources.write_document_chunks(spark, sf_dir, chunks, n_chunks=4)
        _DOC_CHUNK_CACHE[sf_dir] = chunks
    src = sources.read_document_stream(spark, chunks).withColumn(
        "url",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    blocked = spark.createDataFrame(
        [("src0.example.com",), ("src7.example.com",)], "domain string"
    )
    gated = curate_gate(
        src, "url", "text", blocked, badwords=["slow", "big"],
        max_badword_ratio=0.07,  # stand-in classifier: weights=None
    )
    flagged = streaming_lsh_dedup(gated, "doc_id", "text")
    name = f"q_sip_{uuid.uuid4().hex[:8]}"
    sources.run_bounded_to_memory(flagged, name, shuffle_partitions=8)
    return (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of"))
    )


# 28-bit md5-prefix hash of a SQL expression — the DuckDB mirror of
# operators/text.md5_base28 (same convention as queries/dedup's
# MinHash base; change in lockstep with md5_base28).
def _duck_b28(e: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', md5({e})[{i + 1}]) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    )


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, ({_duck_b28('user_id::VARCHAR')}) AS hv
      FROM events
    ), r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
             count(*) OVER (PARTITION BY event_type) AS nd
      FROM h
    )
    SELECT event_type,
           count(*)::INT AS kmv_size,
           round(CASE WHEN max(nd) < 64 THEN max(nd)::DOUBLE
                      ELSE 63.0 * 268435456.0 / max(hv) END, 6) AS est_distinct
    FROM r WHERE rn <= 64
    GROUP BY event_type
    """,
    doc="Per-event-type distinct-user estimate via a k=64 KMV sketch "
    "(Bar-Yossef et al. 2002): pass 1 keeps the k smallest distinct "
    "28-bit md5 hashes PER PARTITION (map-only), so the single "
    "exchange moves <= partitions x groups x k 12-byte rows instead "
    "of the full (group, user) key space a COUNT(DISTINCT) shuffles "
    "at 100 TB (operators/sketches.py:kmv_sketch).  Exact when a "
    "group has fewer than k distinct values.",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators import sketches as sk

    ev = table(spark, sf_dir, "events")
    s = sk.kmv_sketch(ev, "event_type", "user_id", k=64)
    return sk.kmv_estimate(s, 64).select("event_type", "kmv_size", "est_distinct")


@register(
    "sketch_kmv_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, ({_duck_b28('user_id::VARCHAR')}) AS hv
      FROM events WHERE event_type IN ('click', 'purchase')
    ), r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ), a AS (SELECT hv FROM r WHERE event_type = 'click' AND rn <= 64),
    b AS (SELECT hv FROM r WHERE event_type = 'purchase' AND rn <= 64),
    u AS (
      SELECT hv FROM (SELECT hv FROM a UNION SELECT hv FROM b)
      ORDER BY hv LIMIT 64
    ), s AS (SELECT count(*) AS ks, max(hv) AS hk FROM u),
    i AS (
      SELECT count(*) AS ki FROM u
      WHERE hv IN (SELECT hv FROM a) AND hv IN (SELECT hv FROM b)
    )
    SELECT 'click' AS left_key, 'purchase' AS right_key,
           round(CASE WHEN ks < 64 THEN ks::DOUBLE
                      ELSE 63.0 * 268435456.0 / hk END, 6) AS est_union,
           round(ki::DOUBLE / ks, 6) AS est_jaccard,
           round((CASE WHEN ks < 64 THEN ks::DOUBLE
                       ELSE 63.0 * 268435456.0 / hk END)
                 * (ki::DOUBLE / ks), 6) AS est_intersection
    FROM s, i
    """,
    doc="Set-overlap estimate between two groups' user populations "
    "from their KMV sketches (Beyer et al. 2007): pool the two "
    "k-minimum hash sets, keep the k smallest as the union sketch S, "
    "then est_jaccard = |S∩A∩B|/|S| and est_intersection = "
    "est_union * est_jaccard — audience overlap without a distinct "
    "self-join (operators/sketches.py:kmv_overlap).  The combine is "
    "Column array math over two bounded sketch rows.",
)
def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators import sketches as sk

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    s = sk.kmv_sketch(ev, "event_type", "user_id", k=64)
    return sk.kmv_overlap(s, "event_type", "click", "purchase", k=64)


@register(
    "sample_weighted_noreplace",
    oracle="""
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY mh, doc_id) AS rn
      FROM (
        SELECT source, doc_id,
               list_min(list_transform(
                 range(1, least(greatest(floor(n_chars / 250)::INT, 1), 8) + 1),
                 c -> substr(md5(doc_id::VARCHAR || '#' || c::VARCHAR), 1, 8)
               )) AS mh
        FROM documents
      )
    ) WHERE rn <= 5
    """,
    doc="Exact PPS-without-replacement: 5 docs per source, picked with "
    "probability proportional to a length-derived integer weight "
    "(successive sampling) — the quality-weighted subset step of "
    "corpus curation.  Integer-only Efraimidis-Spirakis equivalent: "
    "each row keeps the MIN of w iid md5-prefix draws (one map-only "
    "Column expression, no explode), then the per-group top-k is the "
    "two-pass distributed rank — no floats, no pow(), bit-portable "
    "(operators/sampling.py:weighted_sample_no_replacement).",
)
def sample_weighted_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    wt = F.greatest(F.floor(F.col("n_chars") / F.lit(250)).cast("int"), F.lit(1))
    return smp.weighted_sample_no_replacement(
        d, "source", "doc_id", wt, k=5, max_weight=8
    ).select("source", "doc_id")


@register(
    "pipeline_snapshot_diff",
    oracle="""
    WITH o AS (
      SELECT doc_id,
             md5('V' || len(CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END)::VARCHAR
                 || ':' || CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END
                 || 'V' || len(lang)::VARCHAR || ':' || lang) AS old_digest
      FROM documents WHERE doc_id % 7 != 0
    ), n AS (
      SELECT doc_id,
             md5('V' || len(text)::VARCHAR || ':' || text
                 || 'V' || len(lang)::VARCHAR || ':' || lang) AS new_digest
      FROM documents
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_digest IS NULL THEN 'added'
                WHEN n.new_digest IS NULL THEN 'removed'
                WHEN o.old_digest = n.new_digest THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_digest, n.new_digest
    FROM o FULL OUTER JOIN n USING (doc_id)
    """,
    doc="Crawl-to-crawl corpus delta (operators/pipeline.py:"
    "snapshot_diff): the old snapshot drops every 7th doc and "
    "uppercases every 5th (a simulated recrawl), the diff classifies "
    "each id added/removed/changed/unchanged.  Content compares via "
    "ONE map-side md5 of length-prefixed columns, so the full-outer "
    "exchange carries (id, 32-byte digest) — never payload — and "
    "bucketed-by-id snapshots diff shuffle-free.",
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.pipeline import snapshot_diff

    d = table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    return snapshot_diff(old, d, "doc_id", ["text", "lang"])


@register(
    "sketch_exact_quantiles",
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ), qs AS (
      SELECT * FROM (VALUES (0.1, 1, 10), (0.25, 1, 4), (0.5, 1, 2),
                            (0.75, 3, 4), (0.9, 9, 10)) t(q, num, den)
    )
    SELECT r.lang, qs.q AS q, r.n_chars AS n_chars
    FROM r JOIN qs
      ON r.rn = greatest(1, (qs.num * r.n + qs.den - 1) // qs.den)
    """,
    doc="EXACT doc-length quantiles per language at full parallelism "
    "(operators/sketches.py:exact_group_quantiles): value at 1-based "
    "rank ceil(q*n) — the percentile_disc convention — via the "
    "two-pass distributed rank (a Window.partitionBy(lang) would "
    "funnel each language through one task; F.percentile buffers "
    "every value per group).  Target ranks in exact integer num/den "
    "arithmetic, identical in the SQL.",
)
def sketch_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sketches import exact_group_quantiles

    d = table(spark, sf_dir, "documents")
    return exact_group_quantiles(d, "lang", "n_chars", [0.1, 0.25, 0.5, 0.75, 0.9])


_CMS_PROBES = ("join", "hash", "batch", "no_such_token")


@register(
    "sketch_cms_frequency",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                t -> t != '')) AS tok
      FROM documents
    ), ds AS (SELECT unnest([0, 1, 2]) AS d),
    h AS (
      SELECT d, ({_duck_b28("tok || '#' || d::VARCHAR")}) % 1024 AS bucket
      FROM toks, ds
    ), counters AS (
      SELECT d, bucket, count(*) AS cnt FROM h GROUP BY 1, 2
    ), probes AS (
      SELECT unnest(['join', 'hash', 'batch', 'no_such_token']) AS item
    ), ph AS (
      SELECT item, d,
             ({_duck_b28("item || '#' || d::VARCHAR")}) % 1024 AS bucket
      FROM probes, ds
    )
    SELECT item, min(coalesce(cnt, 0))::BIGINT AS est_count
    FROM ph LEFT JOIN counters USING (d, bucket)
    GROUP BY item
    """,
    doc="Count-Min point-frequency estimates (Cormode & Muthukrishnan "
    "2005) for probe tokens over the whole corpus token stream "
    "(operators/sketches.py:cms_build/cms_query): 3 md5-salted hash "
    "rows x 1024 counters — the exchange is bounded by depth x width "
    "after map-side combine, never the token key space; the probe "
    "join broadcasts the 3072-row counter table.  Deterministic "
    "hashing makes the whole sketch bit-identical to the SQL rebuild.",
)
def sketch_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sketches import cms_build, cms_query

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
    counters = cms_build(toks, "tok", width=1024, depth=3)
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "item string")
    return cms_query(counters, probes, "item", width=1024, depth=3)


@register(
    "sketch_kmv_overlap_matrix",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, ({_duck_b28('user_id::VARCHAR')}) AS hv
      FROM events
    ), r AS (
      SELECT event_type, hv,
             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h
    ), sk AS (
      SELECT event_type, list_sort(list(hv)) AS kmv
      FROM r WHERE rn <= 64 GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS left_key, b.event_type AS right_key,
             list_sort(list_distinct(a.kmv || b.kmv))[:64] AS s,
             len(list_intersect(list_intersect(
               list_sort(list_distinct(a.kmv || b.kmv))[:64], a.kmv), b.kmv))
               AS ki
      FROM sk a JOIN sk b ON a.event_type < b.event_type
    )
    SELECT left_key, right_key,
           round(CASE WHEN len(s) < 64 THEN len(s)::DOUBLE
                      ELSE 63.0 * 268435456.0 / s[64] END, 6) AS est_union,
           round(ki::DOUBLE / len(s), 6) AS est_jaccard,
           round((CASE WHEN len(s) < 64 THEN len(s)::DOUBLE
                       ELSE 63.0 * 268435456.0 / s[64] END)
                 * (ki::DOUBLE / len(s)), 6) AS est_intersection
    FROM pairs
    """,
    doc="The full pairwise audience-overlap matrix between event "
    "types from their KMV sketches (operators/sketches.py:"
    "kmv_overlap_matrix): G^2/2 pairs of bounded 64-hash arrays — "
    "source-similarity analysis without a distinct self-join of the "
    "raw key space.  The oracle rebuilds every pair's union sketch "
    "and estimators in SQL list functions.",
)
def sketch_kmv_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators import sketches as sk

    ev = table(spark, sf_dir, "events")
    s = sk.kmv_sketch(ev, "event_type", "user_id", k=64)
    return sk.kmv_overlap_matrix(s, "event_type", k=64)


@register(
    "streaming_snapshot_status",
    oracle="""
    WITH o AS (
      SELECT doc_id,
             md5('V' || len(CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END)::VARCHAR
                 || ':' || CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END
                 || 'V' || len(lang)::VARCHAR || ':' || lang) AS bdig
      FROM documents WHERE doc_id % 7 != 0
    )
    SELECT d.doc_id,
           CASE WHEN o.bdig IS NULL THEN 'added'
                WHEN o.bdig = md5('V' || len(d.text)::VARCHAR || ':' || d.text
                                  || 'V' || len(d.lang)::VARCHAR || ':' || d.lang)
                     THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM documents d LEFT JOIN o USING (doc_id)
    """,
    doc="LIVE snapshot status gating: documents replayed as "
    "micro-batches are classified added/changed/unchanged against the "
    "frozen baseline (the pipeline_snapshot_diff fixture) by ONE "
    "stateless stream-static LEFT join on (id, 32-byte digest) — the "
    "reprocess/skip decision at ingestion with zero state "
    "(operators/pipeline.py:snapshot_status_stream); removed ids are "
    "the batch diff's job.  stream == batch by construction.",
)
def streaming_snapshot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from flink_1_8_sourcecode_spark.operators.pipeline import (
        snapshot_status_stream,
    )
    from flink_1_8_sourcecode_spark.streaming import sources

    chunks = _DOC_CHUNK_CACHE.get(sf_dir)
    if chunks is None or not os.path.isdir(chunks):
        chunks = tempfile.mkdtemp(prefix="scg_docs_")
        sources.write_document_chunks(spark, sf_dir, chunks, n_chunks=4)
        _DOC_CHUNK_CACHE[sf_dir] = chunks
    src = sources.read_document_stream(spark, chunks)
    baseline = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 != 0)
        .withColumn(
            "text",
            F.when(F.col("doc_id") % 5 == 0, F.upper(F.col("text"))).otherwise(
                F.col("text")
            ),
        )
    )
    out = snapshot_status_stream(src, baseline, "doc_id", ["text", "lang"])
    name = f"q_sss_{uuid.uuid4().hex[:8]}"
    sources.run_bounded_to_memory(out, name)
    return spark.table(name)


@register(
    "sketch_approx_quantiles",
    oracle="""
    WITH s AS (
      SELECT lang, n_chars, doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS srn
      FROM documents
    ), samp AS (
      SELECT lang, n_chars, doc_id FROM s WHERE srn <= 64
    ), r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM samp
    ), qs AS (
      SELECT * FROM (VALUES (0.1, 1, 10), (0.5, 1, 2), (0.9, 9, 10))
        t(q, num, den)
    )
    SELECT r.lang, qs.q AS q, r.n_chars AS n_chars
    FROM r JOIN qs
      ON r.rn = greatest(1, (qs.num * r.n + qs.den - 1) // qs.den)
    """,
    doc="APPROXIMATE doc-length quantiles per language from the "
    "MERGEABLE bottom-k-by-hash uniform sample "
    "(operators/sketches.py:approx_group_quantiles): exact quantiles "
    "of the deterministic k=64 sample — rank error O(sqrt(q(1-q)/k)), "
    "and unlike error-bound sketches the DuckDB oracle re-derives the "
    "answer BIT-FOR-BIT because the sample is hash-deterministic.  "
    "The online sampler (streaming_uniform_sample) converges to the "
    "same k rows, so the streaming snapshot of this sketch equals the "
    "batch value exactly.",
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sketches import (
        approx_group_quantiles,
    )

    d = table(spark, sf_dir, "documents")
    return approx_group_quantiles(
        d, "lang", "n_chars", "doc_id", [0.1, 0.5, 0.9], k=64
    )


_TMIX_TARGETS_EXPORT = export_path("temperature_mix_targets")


@register(
    "sample_temperature_mix",
    oracle=f"""
    WITH t AS (
      SELECT source, target
      FROM read_parquet('{_TMIX_TARGETS_EXPORT}/*.parquet')
    ), r AS (
      SELECT d.source, d.doc_id,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY md5(d.doc_id::VARCHAR), d.doc_id)
               AS rn
      FROM documents d
    )
    SELECT r.source, r.doc_id
    FROM r JOIN t ON r.source = t.source AND r.rn <= t.target
    """,
    doc="Temperature-based mixture sampling "
    "(operators/sampling.py:temperature_mix — the XLM-R/mT5 "
    "multilingual rebalancing, alpha=0.5): per-source targets "
    "proportional to n^alpha (computed ONCE driver-side from the "
    "source-bounded count table, exported for conditioning), docs "
    "chosen as the lowest md5(id) hashes via the two-pass distributed "
    "rank.  TARGET-CONDITIONED oracle: DuckDB re-derives the exact "
    "sample from the exported (source, target) table.",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sampling import temperature_mix

    d = table(spark, sf_dir, "documents")
    kept, targets = temperature_mix(
        d, "source", "doc_id", alpha=0.5, total_budget=200
    )
    spark.createDataFrame(
        list(targets.items()), "source string, target long"
    ).coalesce(1).write.mode("overwrite").parquet(_TMIX_TARGETS_EXPORT)
    return kept.select("source", "doc_id")


@register(
    "sketch_weighted_quantiles",
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             sum(n_chars) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cuma,
             n_chars AS w,
             sum(n_chars) OVER (PARTITION BY lang) AS tw
      FROM documents
    ), qs AS (
      SELECT * FROM (VALUES (0.25, 1, 4), (0.5, 1, 2), (0.75, 3, 4))
        t(q, num, den)
    )
    SELECT r.lang, qs.q AS q, r.n_chars AS n_chars
    FROM r JOIN qs
      ON (r.cuma - r.w) < greatest(1, (qs.num * r.tw + qs.den - 1) // qs.den)
     AND greatest(1, (qs.num * r.tw + qs.den - 1) // qs.den) <= r.cuma
    """,
    doc="EXACT char-WEIGHTED doc-length quantiles per language "
    "(operators/sketches.py:weighted_group_quantiles): the length "
    "below which a q-share of the CHARACTERS sits — the "
    "training-budget planner's number, distinct from the median doc "
    "length.  Same two-pass distributed prefix-sum shape as the "
    "unweighted exact quantiles (no per-group Window funnel), integer "
    "num/den targets, map-only target-hit predicate.",
)
def sketch_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sketches import (
        weighted_group_quantiles,
    )

    d = table(spark, sf_dir, "documents")
    return weighted_group_quantiles(
        d, "lang", "n_chars", "n_chars", [0.25, 0.5, 0.75]
    )


_EPOCH_MIX_TARGETS_EXPORT = export_path("epoch_budget_mix_targets")


@register(
    "mix_epoch_budget",
    oracle=f"""
    WITH t AS (
      SELECT source, epochs, frac_tokens
      FROM read_parquet('{_EPOCH_MIX_TARGETS_EXPORT}/*.parquet')
    ), r AS (
      SELECT source, doc_id,
             coalesce(sum(n_chars) OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pretok
      FROM documents
    )
    SELECT r.source, r.doc_id,
           (t.epochs + CASE WHEN r.pretok < t.frac_tokens
                            THEN 1 ELSE 0 END)::INT AS n_copies
    FROM r JOIN t ON r.source = t.source
    WHERE t.epochs + CASE WHEN r.pretok < t.frac_tokens
                          THEN 1 ELSE 0 END >= 1
    """,
    doc="Epoch-capped repeat-budget mixing "
    "(operators/sampling.py:epoch_budget_mix — the data-constrained-"
    "scaling recipe, Muennighoff et al. 2023: repeat sources up to "
    "max_epochs to fill a total token budget, water-filling past "
    "capped sources): full epochs repeat every doc, the fractional "
    "epoch takes the deterministic lowest-md5 doc prefix until the "
    "residual target is crossed; n_copies is a broadcast map lookup + "
    "prefix comparison over ONE distributed prefix sum — the plan "
    "never multiplies rows.  TARGET-CONDITIONED oracle "
    "(temperature_mix pattern): DuckDB re-derives every doc's "
    "n_copies from the exported (source, epochs, frac_tokens) table.",
)
def mix_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.sampling import (
        epoch_budget_mix,
    )

    d = table(spark, sf_dir, "documents")
    total = d.agg(F.sum("n_chars")).first()[0]
    kept, targets = epoch_budget_mix(
        d, "source", "doc_id", F.col("n_chars"),
        total_budget=int(total * 1.4), max_epochs=3,
    )
    spark.createDataFrame(
        [(s, v["epochs"], v["frac_tokens"]) for s, v in targets.items()],
        "source string, epochs int, frac_tokens double",
    ).coalesce(1).write.mode("overwrite").parquet(_EPOCH_MIX_TARGETS_EXPORT)
    return kept.select("source", "doc_id", "n_copies")
