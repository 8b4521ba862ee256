"""Deduplication inventory — SURVEY.md §2.16 north-star + §2.13 dedup-by-key.

Exact dedup parities Flink's first-row-per-key pattern
(GroupAggProcessFunction min/max-row; Spark dropDuplicates analogue) —
implemented deterministically (min tie-break) so oracles hash-match.
MinHash/SimHash/n-gram-Jaccard/embedding-cosine are the LLM-pipeline
operators over the documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash32,
)
from flink_1_8_sourcecode_spark.queries import register


@register(
    "dedup_exact_text",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup on content hash: keep min doc_id per identical text.",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
        .select("doc_id", "n_copies")
    )


@register(
    "dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="Keep-first-row-per-key (streaming dedup analogue: "
    "dropDuplicates(['user_id','event_type']) with deterministic order).",
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    kept = exact_dedup(e.withColumn("__ord", F.struct("ts", "event_id")),
                       keys=["user_id", "event_type"], keep_by="__ord")
    return kept.select("user_id", "event_type", "event_id", "value")


_SHINGLE_DUCK = """
      list_distinct(list_transform(
        range(1, greatest(len(toks) - 2, 0) + 1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
"""


def _minhash_bands_cte(doc_rel: str = "documents") -> str:
    """The shared MinHash band CTE chain (tok -> sh -> srow -> basev ->
    sig -> bands) over ``doc_rel``'s (doc_id, text) — bit-for-bit
    portable (affine family over an exact int64 base).  Callers append
    their own final SELECT against ``bands``; compose after a WITH
    (the string starts mid-CTE-list, without the WITH keyword)."""
    from flink_1_8_sourcecode_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    base = " + ".join(
        f"(strpos('0123456789abcdef', md5(s)[{i + 1}]) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    )
    sig_cols = ", ".join(
        f"min(({MINHASH_A[i]} * b + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}"
        for i in range(16)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_id, "
        f"h{2 * j}::VARCHAR || '#' || h{2 * j + 1}::VARCHAR AS band_hash FROM sig"
        for j in range(8)
    )
    return f"""tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM {doc_rel}
    ), sh AS (
      SELECT doc_id, {_SHINGLE_DUCK} AS sh FROM tok
    ), srow AS (
      SELECT doc_id, unnest(sh) AS s FROM sh
    ), basev AS (
      SELECT doc_id, {base} AS b FROM srow
    ), sig AS (
      SELECT doc_id, {sig_cols} FROM basev GROUP BY doc_id
    ), bands AS (
      {band_rows}
    )"""


def _minhash_oracle(doc_rel: str = "documents") -> str:
    """The MinHash+LSH candidate-PAIR SQL over ``doc_rel`` — the band
    CTEs plus the hot-bucket-guarded self-join."""
    return f"""
    WITH {_minhash_bands_cte(doc_rel)}, stats AS (
      SELECT band_id, band_hash, count(*) AS n, min(doc_id) AS anchor
      FROM bands GROUP BY band_id, band_hash
    ), br AS (
      SELECT bands.*, n, anchor FROM bands
      JOIN stats USING (band_id, band_hash)
    )
    -- hot-bucket guard mirrors minhash_lsh_pairs: buckets > 64 docs are
    -- star-linked to the min-id anchor instead of expanded all-pairs
    SELECT DISTINCT id_a, id_b FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM br a JOIN br b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
      WHERE a.n <= 64
      UNION ALL
      SELECT anchor AS id_a, doc_id AS id_b FROM br
      WHERE n > 64 AND doc_id != anchor
    )
    """


@register(
    "dedup_minhash_lsh",
    oracle=_minhash_oracle(),
    doc="MinHash+LSH near-dup candidates: word-3-shingles -> 16 md5-family "
    "min-hashes -> 8 bands of 2 rows -> bucket self-join (map-only "
    "signatures, shuffle only on band hash).",
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents", spread=True)
    return minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=8).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )


_SIMHASH_FP_DUCK = """
    WITH tok AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')) AS toks
      FROM documents
    ), hashes AS (
      SELECT doc_id, len(toks) AS n,
             list_transform(toks, t ->
               -- first 8 hex chars of md5 -> 32-bit int via digit arithmetic
               (strpos('0123456789abcdef', md5(t)[1]) - 1) * 268435456
             + (strpos('0123456789abcdef', md5(t)[2]) - 1) * 16777216
             + (strpos('0123456789abcdef', md5(t)[3]) - 1) * 1048576
             + (strpos('0123456789abcdef', md5(t)[4]) - 1) * 65536
             + (strpos('0123456789abcdef', md5(t)[5]) - 1) * 4096
             + (strpos('0123456789abcdef', md5(t)[6]) - 1) * 256
             + (strpos('0123456789abcdef', md5(t)[7]) - 1) * 16
             + (strpos('0123456789abcdef', md5(t)[8]) - 1)) AS hs
      FROM tok
    ), fp AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 32), j ->
               CASE WHEN 2 * list_sum(list_transform(hs,
                           h -> (h // (2**j)::BIGINT) % 2)) > n
                    THEN (2**j)::BIGINT ELSE 0 END))::BIGINT AS simhash
      FROM hashes
    )
"""


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'), t -> t != '')) AS toks
      FROM documents
    ), hashes AS (
      SELECT doc_id, len(toks) AS n,
             list_transform(toks, t ->
               -- first 8 hex chars of md5 -> 32-bit int via digit arithmetic
               (strpos('0123456789abcdef', md5(t)[1]) - 1) * 268435456
             + (strpos('0123456789abcdef', md5(t)[2]) - 1) * 16777216
             + (strpos('0123456789abcdef', md5(t)[3]) - 1) * 1048576
             + (strpos('0123456789abcdef', md5(t)[4]) - 1) * 65536
             + (strpos('0123456789abcdef', md5(t)[5]) - 1) * 4096
             + (strpos('0123456789abcdef', md5(t)[6]) - 1) * 256
             + (strpos('0123456789abcdef', md5(t)[7]) - 1) * 16
             + (strpos('0123456789abcdef', md5(t)[8]) - 1)) AS hs
      FROM tok
    )
    SELECT doc_id,
           list_sum(list_transform(range(0, 32), j ->
             CASE WHEN 2 * list_sum(list_transform(hs,
                         h -> (h // (2**j)::BIGINT) % 2)) > n
                  THEN (2**j)::BIGINT ELSE 0 END))::BIGINT AS simhash
    FROM hashes
    """,
    doc="SimHash 32-bit document fingerprint (per-token md5 bit votes).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", simhash32(F.col("text")).alias("simhash"))


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, lang, {_SHINGLE_DUCK} AS sh FROM tok
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)) AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(a.sh || b.sh)) >= 0.12
    """,
    doc="Exact n-gram Jaccard near-dup pairs, blocked by lang (threshold 0.12).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", block_col="lang", threshold=0.12)


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
             AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
          >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs, blocked by label.  Threshold "
    "0.4: the synthetic embeddings' max within-label cosine is "
    "~0.45-0.51, so the old 0.8 threshold matched nothing at any SF "
    "(vacuous oracle, r11 audit); 0.4 yields 5/5/86 real pairs.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, "vec_id", "embedding", block_col="label", threshold=0.4)


@register(
    "dedup_simhash_pairs",
    oracle=_SIMHASH_FP_DUCK + """
    , bands AS (
      SELECT doc_id, simhash, j AS band_id,
             (simhash >> (8 * j)) & 255 AS band_val
      FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(j)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::INT AS hamming
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup PAIRS: 4 byte-bands block candidates "
    "(pigeonhole: hamming <= 3 forces an equal band), exact "
    "bit_count(xor) verification inside buckets.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import simhash_neardup_pairs

    d = table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(d, "doc_id", "text", max_hamming=3)


@register(
    "dedup_skew_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, d.n_events
    FROM events e
    JOIN (SELECT user_id, count(*) AS n_events
          FROM events GROUP BY user_id) d
      ON e.user_id = d.user_id
    """,
    doc="Auto-skew salted join (operators/partitioning.py:skew_salted_join): "
    "hot user_ids detected by sampling get per-key salt factors; the "
    "enrichment side replicates per salt so no reducer owns a hot key "
    "whole.  Result is identical to the plain join — the oracle IS the "
    "plain join.",
)
def dedup_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.partitioning import skew_salted_join

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return skew_salted_join(
        e.select("event_id", "user_id", "event_type"), dim, on="user_id"
    ).select("event_id", "user_id", "event_type", "n_events")


def _cluster_oracle() -> str:
    # transitive closure over the SAME pair set as dedup_minhash_lsh:
    # reach = every node reachable from id over undirected pair edges;
    # cluster = min reachable id (incl. self)
    return f"""
    WITH RECURSIVE pairs AS (
      {_minhash_oracle()}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS doc_id, min(r) AS cluster_id, min(r) = id AS is_keeper
    FROM reach GROUP BY id
    """


@register(
    "dedup_cluster_resolution",
    oracle=_cluster_oracle(),
    doc="Near-dup cluster resolution (operators/dedup.py:dedup_clusters): "
    "MinHash-LSH pairs -> undirected transitive closure (alternating "
    "large-star/small-star components, Kiveris et al. SoCC'14) -> one "
    "keeper per cluster.  The pipeline step that turns candidate pairs "
    "into an actual dedup decision.",
)
def dedup_cluster_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import dedup_clusters

    d = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=8).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
    return dedup_clusters(d, pairs, id_col="doc_id", shuffle_partitions=4)


@register(
    "dedup_decontaminate",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3), i ->
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
             ))) AS gram
      FROM tok WHERE len(t) >= 5
    ), bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 5),
    hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram))
    SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc="Benchmark decontamination (operators/text.py:decontaminate): "
    "flag training docs sharing any word 5-gram with the doc_id<5 "
    "'benchmark' corpus — the published GPT-3-style n-gram overlap "
    "filter (Brown et al. 2020), as a broadcast semi-join of exploded "
    "n-grams (the corpus side never shuffles).",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import decontaminate

    d = table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5)
    return decontaminate(d, bench, "doc_id", "text", n=5).select(
        "doc_id", "contaminated"
    )


def _jaccard_estimate_oracle() -> str:
    from flink_1_8_sourcecode_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    return f"""
    WITH pairs AS (
      {_minhash_oracle()}
    ), tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, {_SHINGLE_DUCK} AS sh FROM tok
    ), srow AS (
      SELECT doc_id, unnest(sh) AS s FROM sh
    ), basev AS (
      SELECT doc_id, {" + ".join(f"(strpos('0123456789abcdef', md5(s)[{i + 1}]) - 1) * {16 ** (6 - i)}" for i in range(7))} AS b FROM srow
    ), sig AS (
      SELECT doc_id, {", ".join(f"min(({MINHASH_A[i]} * b + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}" for i in range(16))}
      FROM basev GROUP BY doc_id
    )
    SELECT p.id_a, p.id_b, ({agree}) / 16.0 AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.id_a
    JOIN sig b ON b.doc_id = p.id_b
    """


@register(
    "dedup_minhash_jaccard_estimate",
    oracle=_jaccard_estimate_oracle(),
    doc="MinHash Jaccard estimation on the LSH candidate pairs (Broder "
    "1997: agreeing-component fraction is an unbiased Jaccard "
    "estimator) — the thresholding refinement between candidate "
    "generation and cluster resolution that kills banding's false "
    "positives without any text-pair comparison "
    "(operators/dedup.py:minhash_jaccard_estimate).",
)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import minhash_jaccard_estimate

    d = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", num_hashes=16, bands=8).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
    return minhash_jaccard_estimate(d, pairs, "doc_id", "text")


@register(
    "dedup_paragraphs_global",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(ts[(i*20+1):(i*20+20)], ' ') AS chunk
      FROM toks, UNNEST(range(0, CAST(ceil(len(ts)/20.0) AS BIGINT))) AS u(i)
    ),
    winners AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY md5(chunk)
                                ORDER BY doc_id, pos) AS rn
      FROM chunks
    ),
    kept AS (
      SELECT doc_id, count(*) AS n_kept,
             array_to_string(list(chunk ORDER BY pos), ' ') AS clean_text
      FROM winners WHERE rn = 1 GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(CAST(ceil(len(t.ts)/20.0) AS BIGINT), 0) AS n_chunks,
           coalesce(k.n_kept, 0) AS n_kept,
           coalesce(k.clean_text, '') AS clean_text
    FROM toks t LEFT JOIN kept k USING (doc_id)
    """,
    doc="CORPUS-WIDE paragraph dedup (CCNet, Wenzek et al. 2019): every "
    "20-token paragraph keeps one copy across the whole corpus (keeper "
    "= smallest (doc_id, pos)), documents reconstructed from surviving "
    "paragraphs — the cross-document boilerplate remover that "
    "within-document line dedup cannot see.  groupBy(md5) with "
    "map-side partial aggregation, NOT a row_number window, so a "
    "paragraph repeated 10^9 times ships one row per input partition "
    "(operators/dedup.py:paragraph_dedup_global).",
)
def dedup_paragraphs_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import paragraph_dedup_global

    d = table(spark, sf_dir, "documents")
    return paragraph_dedup_global(d, "doc_id", "text", chunk_tokens=20)


def _duck_gram_base(expr: str) -> str:
    """DuckDB expression for the repo-standard 28-bit md5 base of ``expr``."""
    return " + ".join(
        f"(strpos('0123456789abcdef', md5({expr})[{i + 1}]) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    )


@register(
    "dedup_winnowing_fingerprints",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ts) - 3, 0) + 1),
                i -> {_duck_gram_base("array_to_string(ts[i:i+3], ' ')")}) AS grams
      FROM toks
    ),
    f AS (
      SELECT doc_id,
             CASE WHEN len(grams) >= 5 THEN
               list_distinct(list_transform(range(1, len(grams) - 3),
                  j -> list_min(grams[j:j+4])))
             WHEN len(grams) > 0 THEN [list_min(grams)]
             ELSE [] END AS fps
      FROM g
    )
    SELECT doc_id, unnest(fps) AS fp FROM f
    """,
    doc="Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — "
    "the MOSS algorithm): min gram-hash per sliding 5-window over "
    "4-token gram hashes, distinct per doc; any shared run of >= 8 "
    "tokens between two docs yields a shared fingerprint at ~1/3 "
    "density.  Entirely MAP-ONLY Column math — zero shuffles; "
    "bind_once prevents Catalyst's lambda-inlining from re-splitting "
    "tokens per gram / re-hashing grams per window (measured 2.4x; "
    "operators/dedup.py:winnowing_fingerprints).",
)
def dedup_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_fingerprints

    d = table(spark, sf_dir, "documents", spread=True)
    return winnowing_fingerprints(d, "doc_id", "text", k=4, window=5)


def _winnowing_pairs_oracle() -> str:
    """Winnowing candidate-pair SQL (shared by the pair query and the
    cluster-resolution closure), mirroring winnowing_pairs exactly."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(lower(trim(text)), ' '), s -> s != '') AS ts
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(ts) - 3, 0) + 1),
                i -> {_duck_gram_base("array_to_string(ts[i:i+3], ' ')")}) AS grams
      FROM toks
    ),
    f AS (
      SELECT doc_id,
             CASE WHEN len(grams) >= 5 THEN
               list_distinct(list_transform(range(1, len(grams) - 3),
                  j -> list_min(grams[j:j+4])))
             WHEN len(grams) > 0 THEN [list_min(grams)]
             ELSE [] END AS fps
      FROM g
    ),
    fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
    stats AS (SELECT fp, count(*) AS n, min(doc_id) AS anchor FROM fp GROUP BY fp),
    fr AS (SELECT fp.*, n, anchor FROM fp JOIN stats USING (fp))
    SELECT id_a, id_b, max(n_shared) AS n_shared FROM (
      SELECT id_a, id_b, count(*) AS n_shared FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM fr a JOIN fr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        WHERE a.n <= 64
      ) GROUP BY id_a, id_b HAVING count(*) >= 2
      UNION ALL
      SELECT DISTINCT anchor AS id_a, doc_id AS id_b, 0 AS n_shared
      FROM fr WHERE n > 64 AND doc_id != anchor
    ) GROUP BY id_a, id_b
    """


@register(
    "dedup_winnowing_pairs",
    oracle=_winnowing_pairs_oracle(),
    doc="The MOSS match step (Schleimer et al. 2003) over winnowing "
    "fingerprints: pairs sharing >= 2 fingerprints with the shared "
    "count (substring-level overlap, vs MinHash's whole-doc set "
    "similarity); hot fingerprints (> 64 docs) star-link to the min-id "
    "anchor with n_shared=0 sentinel — same n^2-bucket guard as LSH "
    "(operators/dedup.py:winnowing_pairs).",
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_pairs

    d = table(spark, sf_dir, "documents", spread=True)
    return winnowing_pairs(d, "doc_id", "text", k=4, window=5, min_shared=2)


@register(
    "dedup_winnowing_resolution",
    oracle=f"""
    WITH RECURSIVE wpairs AS (
      {_winnowing_pairs_oracle()}
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM wpairs
      UNION ALL
      SELECT id_b, id_a FROM wpairs
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS doc_id, min(r) AS cluster_id, min(r) = id AS is_keeper
    FROM reach GROUP BY id
    """,
    doc="The full MOSS dedup decision: winnowing pairs (substring-level "
    "overlap witnesses) -> undirected transitive closure (alternating "
    "large-star/small-star components) -> one keeper per cluster — the "
    "same resolution machinery as the MinHash family over a "
    "substring-overlap edge set (operators/dedup.py:winnowing_pairs + "
    "dedup_clusters).",
)
def dedup_winnowing_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import (
        dedup_clusters,
        winnowing_pairs,
    )

    d = table(spark, sf_dir, "documents", spread=True)
    pairs = winnowing_pairs(d, "doc_id", "text", k=4, window=5, min_shared=2).select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long")
    )
    return dedup_clusters(d, pairs, id_col="doc_id", shuffle_partitions=4)


@register(
    "dedup_incremental",
    oracle="""
    WITH f AS (
      SELECT doc_id, source,
             md5(array_to_string(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t != '')[1:4], ' ')) AS fp
      FROM documents
    ),
    b AS (SELECT doc_id, fp FROM f WHERE source = 'src0'),
    c AS (SELECT DISTINCT fp FROM f WHERE source != 'src0'),
    first AS (SELECT fp, min(doc_id) AS first_id FROM b GROUP BY fp)
    SELECT b.doc_id, b.fp,
           CASE WHEN c.fp IS NOT NULL THEN 'dup_corpus'
                WHEN b.doc_id != first.first_id THEN 'dup_batch'
                ELSE 'kept' END AS decision
    FROM b LEFT JOIN c USING (fp) JOIN first USING (fp)
    """,
    doc="Incremental ingestion dedup: classify each src0 (new-batch) "
    "doc against the frozen rest-of-corpus by 4-token head fingerprint "
    "— dup_corpus / dup_batch / kept, first-copy-wins within the batch. "
    "The corpus side reduces to distinct fingerprints (column-pruned, "
    "partial-aggregated); only fingerprints shuffle "
    "(operators/dedup.py:incremental_dedup).",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import incremental_dedup

    d = table(spark, sf_dir, "documents")
    batch = d.filter(F.col("source") == "src0")
    corpus = d.filter(F.col("source") != "src0")
    return incremental_dedup(batch, corpus, "doc_id", "text", prefix_tokens=4)
