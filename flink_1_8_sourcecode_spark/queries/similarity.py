"""Similarity-search inventory — SURVEY.md §2.16 north-star.

Brute-force exact cosine top-k (baseline) and IVF-style ANN (scale path)
over the embeddings table.  See operators/similarity.py for the 100 TB
design notes (broadcast query side, cluster-pruned corpus join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators.similarity import cosine_topk, ivf_topk
from flink_1_8_sourcecode_spark.queries import export_path, register

_COS = """list_dot_product(q.e, c.e)
        / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))"""


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  {_COS} AS cosine
           FROM q JOIN v c ON c.vec_id != q.vec_id
         )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact brute-force cosine top-10 for query vectors 0-4.",
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "vec_id", "embedding", "vec_id", k=10)


_IVF_ORACLE = """
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         cent AS (
           SELECT label AS cluster,
                  list_transform(range(1, 65),
                    i -> list_sum(list_transform(list(e), x -> x[i]))
                         / count(*)) AS ce
           FROM v GROUP BY label
         ),
         probes AS (
           SELECT query_id, cluster FROM (
             SELECT q.vec_id AS query_id, cent.cluster,
                    row_number() OVER (
                      PARTITION BY q.vec_id
                      ORDER BY list_dot_product(q.e, cent.ce)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(cent.ce, cent.ce))) DESC,
                        cent.cluster) AS pr
             FROM q CROSS JOIN cent
           ) WHERE pr <= 3
         ),
         scored AS (
           SELECT p.query_id, c.vec_id AS neighbor_id,
                  list_dot_product(q.e, c.e)
                    / (sqrt(list_dot_product(q.e, q.e))
                       * sqrt(list_dot_product(c.e, c.e))) AS cosine
           FROM probes p
           JOIN v c ON c.label = p.cluster
           JOIN q ON q.vec_id = p.query_id
           WHERE c.vec_id != p.query_id
         )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """


@register(
    "sim_topk_ivf",
    oracle=_IVF_ORACLE,
    doc="IVF ANN top-10: label-cluster centroids, nprobe=3 — the corpus "
    "join prunes to 3/10 of the data (the 100 TB scale path).",
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id", cluster_col="label", k=10, nprobe=3
    )


# The trained centroids are exported here so the oracle can recompute
# the assignment step independently (centroid-conditioned check).  The
# Spark query always writes before returning; the oracle runs after it
# in every sweep, so the file it reads is the centroids of the same run.
_IVF_CENTROID_EXPORT = export_path("ivf_centroids")


@register(
    "sim_ivf_train_assign",
    oracle=f"""
    WITH c AS (SELECT cluster, centroid::DOUBLE[] AS cv
               FROM read_parquet('{_IVF_CENTROID_EXPORT}/*.parquet')),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         d AS (SELECT v.vec_id, c.cluster,
                      list_sum(list_transform(range(1, len(e) + 1),
                               i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
               FROM v CROSS JOIN c)
    SELECT vec_id, cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
      FROM d
    ) WHERE rn = 1
    """,
    doc="K-means coarse-quantizer training (operators/similarity.py:"
    "ivf_train) over the embeddings table: deterministic hash-seeded "
    "init, 3 Lloyd iterations, returns (vec_id, cluster).  The oracle "
    "is CENTROID-CONDITIONED: the query exports the final centroids to "
    "parquet and DuckDB independently recomputes every vector's "
    "nearest-centroid assignment (squared L2, cluster-id tiebreak) — "
    "the assignment step is hash-checked exactly; the float centroid "
    "ITERATION itself is pinned by the recall/invariant property tests "
    "(tests/test_operators.py::TestIvfTrain).",
)
def sim_ivf_train_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_train

    emb = table(spark, sf_dir, "embeddings")
    assignment, centroids = ivf_train(
        emb, "vec_id", "embedding", k=8, iterations=3, return_centroids=True
    )
    centroids.select("cluster", F.col("__centroid").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(_IVF_CENTROID_EXPORT)
    return assignment


@register(
    "sim_topk_gemm",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  {_COS} AS cosine
           FROM q JOIN v c ON c.vec_id != q.vec_id
         )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact brute-force cosine top-10 via the numpy GEMM kernel "
    "(operators/similarity.py:cosine_topk_gemm): broadcast normalized "
    "query matrix, one BLAS matmul per corpus Arrow batch, local top-k "
    "per partition, final rank over P*k survivors — the vectorized "
    "many-queries scale path (same oracle as sim_topk_bruteforce).",
)
def sim_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import cosine_topk_gemm

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return cosine_topk_gemm(emb, queries, "vec_id", "embedding", "vec_id", k=10)


@register(
    "sim_topk_ivf_gemm",
    oracle=_IVF_ORACLE,
    doc="IVF pruning + BLAS batch kernel (operators/similarity.py:"
    "ivf_topk_gemm): probe assignment happens driver-side over the "
    "collected k x dim centroid table, probed cluster ids become a "
    "literal IN filter on the scan (partition-prunable on a cluster-"
    "partitioned layout), and each probed cluster's Arrow batches are "
    "scored against all its probing queries with one matmul — the "
    "many-queries x big-corpus regime.  Same semantics (and oracle) as "
    "sim_topk_ivf.",
    bench=True,
)
def sim_topk_ivf_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_topk_gemm

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk_gemm(
        emb, queries, "vec_id", "embedding", "vec_id", cluster_col="label",
        k=10, nprobe=3,
    )


_PQ_CODEBOOK_EXPORT = export_path("pq_codebooks")

# Trained PQ index cached per (session, sf_dir): training is the INDEX
# BUILD step (benchmarked on its own by sim_pq_train_encode); the ADC /
# IVFADC serving queries measure QUERY cost against a built index, the
# way ANN systems separate build from serve.  Training is deterministic,
# so a cache hit is bit-identical to a rebuild; codebooks re-export on
# every call so the oracle always reads the artifacts of this sf.
_PQ_CACHE: dict = {}


def _pq_index(spark: SparkSession, sf_dir: str):
    from flink_1_8_sourcecode_spark.operators.similarity import pq_train

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PQ_CACHE.get(key)
    if got is None:
        emb = table(spark, sf_dir, "embeddings")
        codes, codebooks = pq_train(
            emb, "vec_id", "embedding", m=8, k=16, iterations=2
        )
        codes = codes.localCheckpoint(eager=True)
        codebooks = codebooks.localCheckpoint(eager=True)
        got = _PQ_CACHE[key] = (codes, codebooks)
    codes, codebooks = got
    codebooks.write.mode("overwrite").parquet(_PQ_CODEBOOK_EXPORT)
    return codes, codebooks

# Shared oracle fragment: recompute every vector's PQ codes from the
# exported codebooks (nearest centroid per subspace, squared L2,
# cluster-id tiebreak) — the same conditioning pattern as the IVF
# centroid oracle: training floats are exported, the ASSIGNMENT step is
# recomputed independently and hash-checked.
_PQ_CODES_CTE = f"""
    cb AS (SELECT subspace, cluster, centroid::DOUBLE[] AS cv
           FROM read_parquet('{_PQ_CODEBOOK_EXPORT}/*.parquet')),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sub AS (SELECT v.vec_id, cb.subspace, cb.cluster,
                   list_sum(list_transform(range(1, 9),
                     i -> (e[cb.subspace * 8 + i] - cv[i])
                        * (e[cb.subspace * 8 + i] - cv[i]))) AS d2
            FROM v CROSS JOIN cb),
    best AS (SELECT vec_id, subspace, cluster FROM (
               SELECT vec_id, subspace, cluster,
                      row_number() OVER (PARTITION BY vec_id, subspace
                                         ORDER BY d2, cluster) AS rn
               FROM sub) WHERE rn = 1),
    codes AS (SELECT vec_id,
                     string_agg(cluster::VARCHAR, '-' ORDER BY subspace) AS code
              FROM best GROUP BY vec_id)
"""


@register(
    "sim_pq_train_encode",
    oracle=f"""
    WITH {_PQ_CODES_CTE}
    SELECT vec_id, code FROM codes
    """,
    doc="Product-quantization training + encoding (Jegou et al. 2011; "
    "operators/similarity.py:pq_train): 8 subspaces x 16 centroids over "
    "the 64-d embeddings, all subspaces trained in ONE Spark plan "
    "(explode -> broadcast-assign -> partial-agg means per iteration).  "
    "CODEBOOK-CONDITIONED oracle: the trained codebooks export to "
    "parquet and DuckDB independently recomputes every vector's nearest "
    "sub-centroid code string — the encoding step is hash-checked "
    "exactly, mirroring sim_ivf_train_assign.",
)
def sim_pq_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import pq_train

    emb = table(spark, sf_dir, "embeddings")
    codes, codebooks = pq_train(emb, "vec_id", "embedding", m=8, k=16, iterations=2)
    codebooks.write.mode("overwrite").parquet(_PQ_CODEBOOK_EXPORT)
    return codes.select(
        "vec_id", F.concat_ws("-", F.col("codes")).alias("code")
    )


@register(
    "sim_pq_topk_adc",
    oracle=f"""
    WITH {_PQ_CODES_CTE},
    q AS (SELECT vec_id AS query_id, e FROM v WHERE vec_id < 5),
    lut AS (SELECT q.query_id, cb.subspace, cb.cluster,
                   list_sum(list_transform(range(1, 9),
                     i -> (q.e[cb.subspace * 8 + i] - cv[i])
                        * (q.e[cb.subspace * 8 + i] - cv[i]))) AS d2
            FROM q CROSS JOIN cb),
    cand AS (SELECT l.query_id, b.vec_id AS neighbor_id, sum(l.d2) AS adc_dist
             FROM best b
             JOIN lut l ON l.subspace = b.subspace AND l.cluster = b.cluster
             WHERE b.vec_id != l.query_id
             GROUP BY l.query_id, b.vec_id)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rank
      FROM cand
    ) WHERE rank <= 10
    """,
    doc="Asymmetric-distance top-10 over PQ codes (Jegou et al. 2011 "
    "SIV; operators/similarity.py:pq_topk_adc): per query an 8x16 "
    "LUT of subvector-to-centroid distances broadcasts, each code "
    "row's distance is 8 numpy gathers + a sum — the RAM-resident ANN "
    "serving path at 100 TB (4-byte codes).  Oracle: given the "
    "exported codebooks, DuckDB recomputes codes AND the exact ADC "
    "ranking.",
    bench=True,
)
def sim_pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import pq_topk_adc

    emb = table(spark, sf_dir, "embeddings")
    codes, codebooks = _pq_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return pq_topk_adc(
        codes, codebooks, queries, "vec_id", "embedding", "vec_id", k=10
    )


@register(
    "sim_topk_ivfpq",
    oracle=f"""
    WITH {_PQ_CODES_CTE},
    vl AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT label AS cluster,
                    list_transform(range(1, 65),
                      i -> list_sum(list_transform(list(e), x -> x[i]))
                           / count(*)) AS ce
             FROM vl GROUP BY label),
    q AS (SELECT vec_id AS query_id, e FROM vl WHERE vec_id < 5),
    probes AS (SELECT query_id, cluster FROM (
        SELECT q.query_id, cent.cluster,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_sum(list_transform(range(1, 65),
                            i -> (q.e[i] - ce[i]) * (q.e[i] - ce[i]))),
                          cent.cluster) AS pr
        FROM q CROSS JOIN cent) WHERE pr <= 3),
    lut AS (SELECT q.query_id, cb.subspace, cb.cluster,
                   list_sum(list_transform(range(1, 9),
                     i -> (q.e[cb.subspace * 8 + i] - cv[i])
                        * (q.e[cb.subspace * 8 + i] - cv[i]))) AS d2
            FROM q CROSS JOIN cb),
    cand AS (SELECT l.query_id, b.vec_id AS neighbor_id, sum(l.d2) AS adc_dist
             FROM best b
             JOIN vl ON vl.vec_id = b.vec_id
             JOIN probes p ON p.cluster = vl.label
             JOIN lut l ON l.query_id = p.query_id
                       AND l.subspace = b.subspace AND l.cluster = b.cluster
             WHERE b.vec_id != l.query_id
             GROUP BY l.query_id, b.vec_id)
    SELECT query_id, neighbor_id, adc_dist, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist, neighbor_id) AS rank
      FROM cand
    ) WHERE rank <= 10
    """,
    doc="IVFADC (Jegou et al. 2011 SV — the FAISS IVF+PQ workhorse; "
    "operators/similarity.py:ivfpq_topk): coarse label-centroid probes "
    "(squared L2, nprobe=3) prune the scan to a literal IN filter, PQ "
    "asymmetric distance scores candidates inside probed clusters — "
    "coarse pruning bounds I/O, 4-byte codes bound memory, LUT "
    "gathers bound CPU.  Oracle recomputes probes, codes, and the "
    "exact ADC ranking from the exported codebooks.",
)
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import ivfpq_topk

    emb = table(spark, sf_dir, "embeddings")
    codes, codebooks = _pq_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5)
    return ivfpq_topk(
        emb, queries, "vec_id", "embedding", "vec_id", cluster_col="label",
        codes=codes, codebooks=codebooks, k=10, nprobe=3,
    )


_SEMDD_CENTROID_EXPORT = export_path("semdd_centroids")


@register(
    "dedup_semantic",
    oracle=f"""
    WITH c AS (SELECT cluster, centroid::DOUBLE[] AS cv
               FROM read_parquet('{_SEMDD_CENTROID_EXPORT}/*.parquet')),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         d AS (SELECT v.vec_id, v.e, c.cluster,
                      list_sum(list_transform(range(1, len(e) + 1),
                               i -> (e[i] - cv[i]) * (e[i] - cv[i]))) AS d2
               FROM v CROSS JOIN c),
         assigned AS (
           SELECT vec_id, e, cluster FROM (
             SELECT vec_id, e, cluster,
                    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
             FROM d
           ) WHERE rn = 1
         ),
         dropped AS (
           SELECT DISTINCT a.vec_id
           FROM assigned a JOIN assigned b
             ON a.cluster = b.cluster AND b.vec_id < a.vec_id
            AND list_dot_product(a.e, b.e)
                / (sqrt(list_dot_product(a.e, a.e))
                   * sqrt(list_dot_product(b.e, b.e))) > 0.3
         )
    SELECT vec_id, cluster FROM assigned
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
    doc="SEMANTIC deduplication (SemDeDup, Abbas et al. 2023): k-means "
    "cluster the embedding space (ivf_train, deterministic hash-seeded "
    "init), then within each cluster drop every vector with a "
    "same-cluster neighbor above cosine 0.3 and a smaller id "
    "(keep-lowest-id representative rule) — the paper's "
    "cluster-then-pairwise cost model, run as one groupBy(cluster) "
    "shuffle + per-cluster normalized GEMM.  The oracle is "
    "CENTROID-CONDITIONED: the query exports the trained centroids and "
    "DuckDB independently recomputes assignment, every within-cluster "
    "pairwise cosine, and the drop rule (threshold sits in a 7.8e-5 "
    "gap of the pair-cosine distribution, so float association order "
    "cannot flip a decision).",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.dedup import semantic_dedup

    emb = table(spark, sf_dir, "embeddings")
    kept, cents = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.3, k=8, iterations=3,
        return_centroids=True,
    )
    cents.select("cluster", F.col("__centroid").alias("centroid")).write.mode(
        "overwrite"
    ).parquet(_SEMDD_CENTROID_EXPORT)
    return kept


@register(
    "sim_range_search",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5)
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine
    FROM q JOIN v c ON c.vec_id != q.vec_id
    WHERE {_COS} >= 0.3
    """,
    doc="Exact cosine RANGE search (FAISS range_search counterpart): "
    "every corpus vector within cosine >= 0.3 of query vectors 0-4 — "
    "broadcast normalized query matrix, one BLAS matmul per Arrow "
    "batch, boolean-mask emit.  Unlike top-k there is no global rank, "
    "so the operator is MAP-ONLY (zero shuffles); output is bounded by "
    "the matches, never |Q| x |C| "
    "(operators/similarity.py:range_search_gemm).",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import range_search_gemm

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return range_search_gemm(emb, queries, "vec_id", "embedding", "vec_id", threshold=0.3)


@register(
    "sim_range_search_ivf",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         cent AS (
           SELECT label AS cluster,
                  list_transform(range(1, 65),
                    i -> list_sum(list_transform(list(e), x -> x[i]))
                         / count(*)) AS ce
           FROM v GROUP BY label
         ),
         probes AS (
           SELECT query_id, cluster FROM (
             SELECT q.vec_id AS query_id, cent.cluster,
                    row_number() OVER (
                      PARTITION BY q.vec_id
                      ORDER BY list_dot_product(q.e, cent.ce)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(cent.ce, cent.ce))) DESC,
                        cent.cluster) AS pr
             FROM q CROSS JOIN cent
           ) WHERE pr <= 3
         )
    SELECT p.query_id, c.vec_id AS neighbor_id,
           list_dot_product(q.e, c.e)
             / (sqrt(list_dot_product(q.e, q.e))
                * sqrt(list_dot_product(c.e, c.e))) AS cosine
    FROM probes p
    JOIN v c ON c.label = p.cluster
    JOIN q ON q.vec_id = p.query_id
    WHERE c.vec_id != p.query_id
      AND list_dot_product(q.e, c.e)
            / (sqrt(list_dot_product(q.e, q.e))
               * sqrt(list_dot_product(c.e, c.e))) >= 0.25
    """,
    doc="IVF-pruned cosine RANGE search (FAISS range_search on an IVF "
    "index): all corpus vectors with cosine >= 0.25 inside each "
    "query's 3 probed clusters — no per-query rank window, just the "
    "cluster-pruned probe join + a filter; probed cluster ids "
    "partition-prune a cluster-partitioned layout at 100 TB "
    "(operators/similarity.py:ivf_range_search).",
)
def sim_range_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_range_search

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_range_search(
        emb, queries, "vec_id", "embedding", "vec_id",
        cluster_col="label", threshold=0.25, nprobe=3,
    )


_BIN_CODE = """list_sum(list_transform(range(1, 33),
                 j -> CASE WHEN e[j + {off}] > 0
                           THEN (2**(j-1))::BIGINT ELSE 0 END))"""


@register(
    "sim_topk_hamming",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         sk AS (
           SELECT vec_id,
                  {_BIN_CODE.format(off=0)} AS lo,
                  {_BIN_CODE.format(off=32)} AS hi
           FROM v
         ),
         q AS (SELECT vec_id, lo, hi FROM sk WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  bit_count(xor(q.lo, c.lo)) + bit_count(xor(q.hi, c.hi))
                    AS hamming
           FROM q JOIN sk c ON c.vec_id != q.vec_id
         )
    SELECT query_id, neighbor_id, hamming, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY hamming, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="1-bit binary-sketch top-10 by Hamming distance (Charikar 2002 "
    "sign sketch; FAISS IndexBinaryFlat shape): 64 float dims compress "
    "to two 32-bit words (exact int64 on both engines), XOR + popcount "
    "per pair, two-phase exact top-k — the coarse pass that serves a "
    "100 TB embedding corpus from ~0.4 TB of codes "
    "(operators/similarity.py:binary_sketch, hamming_topk).",
)
def sim_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import hamming_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return hamming_topk(emb, queries, "vec_id", "embedding", "vec_id", k=10)


@register(
    "sim_topk_mips",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                  round(list_dot_product(q.e, c.e), 6) AS dot
           FROM q JOIN v c ON c.vec_id != q.vec_id
         )
    SELECT query_id, neighbor_id, dot, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    doc="Exact maximum-inner-product top-10 for query vectors 0-4 "
    "(FAISS METRIC_INNER_PRODUCT — the unnormalized-embedding metric "
    "cosine deliberately discards; the exact baseline for norm-"
    "augmented MIPS-on-cosine-ANN reductions, Bachrach et al. 2014). "
    "Two-phase exact top-k, 6dp pre-rank rounding "
    "(operators/similarity.py:mips_topk).",
)
def sim_topk_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import mips_topk

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return mips_topk(emb, queries, "vec_id", "embedding", "vec_id", k=10)


_KNN_GRAPH_EXPORT = export_path("knn_graph")


@register(
    "sim_knn_graph",
    oracle=f"""
    WITH g AS (SELECT vec_id, neighbor_id
               FROM read_parquet('{_KNN_GRAPH_EXPORT}/*.parquet')),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid, {_COS} AS cosine
           FROM v q JOIN v c ON c.vec_id != q.vec_id
         ),
         exact AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY cosine DESC, nid) AS rk
             FROM scored
           ) WHERE rk <= 10
         ),
         h AS (
           SELECT g.vec_id, count(*) AS hits
           FROM g JOIN exact ON exact.qid = g.vec_id AND exact.nid = g.neighbor_id
           GROUP BY g.vec_id
         )
    SELECT v.vec_id, coalesce(h.hits, 0) AS hits,
           coalesce(h.hits, 0) / 10.0 AS recall
    FROM v LEFT JOIN h USING (vec_id)
    """,
    doc="k-NN GRAPH construction via NN-Descent (Dong et al. 2011; "
    "operators/similarity.py:nn_descent_knn_graph) — the graph-based "
    "ANN substrate (HNSW/NSG build on it).  Deterministic modular-"
    "stride seeding + hash-ordered candidate sampling make the graph "
    "reproducible; the oracle is GRAPH-CONDITIONED: the query exports "
    "the final edges to parquet, then BOTH engines independently "
    "compute exact brute-force top-10 and the per-node hit count of "
    "the exported edges against it — per-node recall is hash-checked "
    "exactly (recall floor pinned by tests/test_operators.py::"
    "TestNNDescent).",
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import (
        nn_descent_knn_graph,
    )

    emb = table(spark, sf_dir, "embeddings")
    g = nn_descent_knn_graph(emb, "vec_id", "embedding", k=10, max_iterations=6)
    g.write.mode("overwrite").parquet(_KNN_GRAPH_EXPORT)
    gread = spark.read.parquet(_KNN_GRAPH_EXPORT).select("vec_id", "neighbor_id")
    exact = cosine_topk(emb, emb, "vec_id", "embedding", "vec_id", k=10).select(
        F.col("query_id").alias("vec_id"), "neighbor_id"
    )
    hits = (
        gread.join(exact, ["vec_id", "neighbor_id"])
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        emb.select("vec_id")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / 10.0).alias("recall"),
        )
    )


_KNN_SEARCH_EXPORT = export_path("knn_search")


@register(
    "sim_knn_graph_search",
    oracle=f"""
    WITH g AS (SELECT query_id, neighbor_id
               FROM read_parquet('{_KNN_SEARCH_EXPORT}/*.parquet')),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         scored AS (
           SELECT q.vec_id AS qid, c.vec_id AS nid, {_COS} AS cosine
           FROM q JOIN v c ON c.vec_id != q.vec_id
         ),
         exact AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (
               PARTITION BY qid ORDER BY cosine DESC, nid) AS rk
             FROM scored
           ) WHERE rk <= 10
         ),
         h AS (
           SELECT g.query_id, count(*) AS hits
           FROM g JOIN exact ON exact.qid = g.query_id AND exact.nid = g.neighbor_id
           GROUP BY g.query_id
         )
    SELECT q.vec_id AS query_id, coalesce(h.hits, 0) AS hits,
           coalesce(h.hits, 0) / 10.0 AS recall
    FROM q LEFT JOIN h ON h.query_id = q.vec_id
    """,
    doc="Graph-ANN QUERY path: greedy beam search over the NN-Descent "
    "k-NN graph (operators/similarity.py:knn_graph_search — the "
    "HNSW/NSG search procedure on a flat graph).  Deterministic entry "
    "points + id tie-breaks; per hop the beam joins the edge list, "
    "scores only fresh candidates, and re-ranks inside a per-query "
    "window — I/O ~ beam x degree x hops, never |C|.  Oracle is "
    "RESULT-CONDITIONED: the query exports the search answers, both "
    "engines independently compute exact brute-force top-10 and the "
    "per-query hit count of the exported answers is hash-checked.",
)
def sim_knn_graph_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import (
        knn_graph_search,
        nn_descent_knn_graph,
    )

    emb = table(spark, sf_dir, "embeddings")
    g = nn_descent_knn_graph(emb, "vec_id", "embedding", k=10, max_iterations=6)
    q = emb.filter(F.col("vec_id") < 5)
    res = knn_graph_search(g, emb, q, "vec_id", "embedding", "vec_id", k=10)
    res.write.mode("overwrite").parquet(_KNN_SEARCH_EXPORT)
    rread = spark.read.parquet(_KNN_SEARCH_EXPORT).select("query_id", "neighbor_id")
    exact = cosine_topk(emb, q, "vec_id", "embedding", "vec_id", k=10).select(
        "query_id", "neighbor_id"
    )
    hits = (
        rread.join(exact, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / 10.0).alias("recall"),
        )
    )


_PCA_EXPORT = export_path("pca_components")


@register(
    "sim_pca_project",
    oracle=f"""
    WITH c AS (SELECT component, axis, b
               FROM read_parquet('{_PCA_EXPORT}/*.parquet')),
         v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
    SELECT v.vec_id,
           max(CASE WHEN c.component = 0
                    THEN list_dot_product(v.e, c.axis) - c.b END) AS pc0,
           max(CASE WHEN c.component = 1
                    THEN list_dot_product(v.e, c.axis) - c.b END) AS pc1,
           max(CASE WHEN c.component = 2
                    THEN list_dot_product(v.e, c.axis) - c.b END) AS pc2,
           max(CASE WHEN c.component = 3
                    THEN list_dot_product(v.e, c.axis) - c.b END) AS pc3
    FROM v CROSS JOIN c
    GROUP BY v.vec_id
    """,
    doc="Distributed PCA (operators/similarity.py:pca_train/pca_project) "
    "— per-partition Gram partials (one numpy GEMM per Arrow batch), "
    "driver reduce of the bounded d x d statistics, deterministic "
    "eigh (sign-fixed), then a PURE-Column projection "
    "(dot(x, w_j) - b_j with the mean folded into the offset — the "
    "100 TB pass is map-only whole-stage codegen).  The oracle is "
    "COMPONENT-CONDITIONED: the query exports the trained axes and "
    "DuckDB independently recomputes every vector's projection.",
)
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import (
        pca_project,
        pca_train,
    )

    emb = table(spark, sf_dir, "embeddings")
    comps, offsets, _mean, _vars = pca_train(emb, "embedding", n_components=4)
    spark.createDataFrame(
        [(j, comps[j], offsets[j]) for j in range(4)],
        "component int, axis array<double>, b double",
    ).write.mode("overwrite").parquet(_PCA_EXPORT)
    return pca_project(emb, "vec_id", "embedding", comps, offsets)


@register(
    "sim_eval_ivf_metrics",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
         q AS (SELECT vec_id, e FROM v WHERE vec_id < 5),
         exact AS (
           SELECT qid, nid FROM (
             SELECT q.vec_id AS qid, c.vec_id AS nid,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_dot_product(q.e, c.e)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(c.e, c.e))) DESC, c.vec_id) AS rk
             FROM q JOIN v c ON c.vec_id != q.vec_id
           ) WHERE rk <= 10
         ),
         cent AS (
           SELECT label AS cluster,
                  list_transform(range(1, 65),
                    i -> list_sum(list_transform(list(e), x -> x[i]))
                         / count(*)) AS ce
           FROM v GROUP BY label
         ),
         probes AS (
           SELECT query_id, cluster FROM (
             SELECT q.vec_id AS query_id, cent.cluster,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_dot_product(q.e, cent.ce)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(cent.ce, cent.ce))) DESC,
                        cent.cluster) AS pr
             FROM q CROSS JOIN cent
           ) WHERE pr <= 3
         ),
         ivf AS (
           SELECT query_id, neighbor_id, rank FROM (
             SELECT p.query_id, c.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY p.query_id
                      ORDER BY list_dot_product(q.e, c.e)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(c.e, c.e))) DESC, c.vec_id) AS rank
             FROM probes p
             JOIN v c ON c.label = p.cluster
             JOIN q ON q.vec_id = p.query_id
             WHERE c.vec_id != p.query_id
           ) WHERE rank <= 10
         ),
         tsize AS (SELECT qid, count(*) AS nt FROM exact GROUP BY qid),
         hits AS (
           SELECT i.query_id, i.rank
           FROM ivf i JOIN exact e ON e.qid = i.query_id AND e.nid = i.neighbor_id
         ),
         perq AS (
           SELECT query_id, count(*) AS nh, 1.0 / min(rank) AS mrr,
                  sum(1.0 / log2(rank + 1)) AS dcg
           FROM hits GROUP BY query_id
         ),
         ideal AS (
           SELECT t.qid, sum(1.0 / log2(i + 1)) AS idcg
           FROM tsize t, UNNEST(range(1, least(t.nt, 10) + 1)) AS u(i)
           GROUP BY t.qid
         )
    SELECT t.qid AS query_id,
           coalesce(p.nh::DOUBLE / least(t.nt, 10), 0.0) AS recall_at_k,
           coalesce(p.mrr, 0.0) AS mrr_at_k,
           coalesce(p.dcg / i.idcg, 0.0) AS ndcg_at_k
    FROM tsize t
    LEFT JOIN perq p ON p.query_id = t.qid
    JOIN ideal i ON i.qid = t.qid
    """,
    doc="Retrieval evaluation (operators/similarity.py:retrieval_metrics "
    "— the measurement half of the ANN family): per-query recall@10, "
    "MRR@10 and nDCG@10 of the IVF index (nprobe=3) against exact "
    "brute-force truth.  Both the index AND the metric math replicate "
    "in the oracle; top-k-shaped joins only, partial-aggregated sums.",
)
def sim_eval_ivf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import retrieval_metrics

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = cosine_topk(emb, queries, "vec_id", "embedding", "vec_id", k=10)
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", "vec_id",
        cluster_col="label", k=10, nprobe=3,
    )
    return retrieval_metrics(approx, truth, k=10)


_EMB_CHUNK_CACHE: dict[str, str] = {}


@register(
    "streaming_embedding_dedup",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
               FROM embeddings),
    inc AS (SELECT * FROM v WHERE vec_id < 50),
    cor AS (SELECT * FROM v WHERE vec_id >= 50),
    cent AS (
      SELECT label AS cl,
             list_transform(range(1, 65),
               i -> list_sum(list_transform(list(e), x -> x[i]))
                    / count(*)) AS ce
      FROM cor GROUP BY label
    ),
    probe AS (
      SELECT vec_id, cl FROM (
        SELECT i.vec_id, cent.cl,
               row_number() OVER (PARTITION BY i.vec_id
                 ORDER BY list_dot_product(i.e, cent.ce)
                   / (sqrt(list_dot_product(i.e, i.e))
                      * sqrt(list_dot_product(cent.ce, cent.ce))) DESC,
                   cent.cl) AS rn
        FROM inc i CROSS JOIN cent) WHERE rn = 1
    )
    SELECT i.vec_id FROM inc i JOIN probe p USING (vec_id)
    WHERE NOT EXISTS (
      SELECT 1 FROM cor c WHERE c.label = p.cl
        AND list_dot_product(i.e, c.e)
            / (sqrt(list_dot_product(i.e, i.e))
               * sqrt(list_dot_product(c.e, c.e))) >= 0.30)
    """,
    doc="Embedding near-dup gate ON LIVE INGESTION "
    "(operators/dedup.py:embedding_ingest_dedup): incoming vectors "
    "(vec_id < 50, replayed as micro-batches) are dropped when any "
    "vector of the FROZEN curated index (vec_id >= 50) sits within "
    "0.30 cosine in their IVF probe cell.  Fully stateless: the "
    "index's per-cell centroids fold into the plan as literals, the "
    "probe is a per-row argmax (map-only), and the candidate check is "
    "ONE stream-static LEFT ANTI equi-join on the cell — the corpus "
    "prunes to 1/k of the index per row and ingestion holds zero "
    "state.  Completes the live-ingestion pipeline next to the "
    "curation gates and the online LSH text dedup; stream == batch "
    "because no stage keeps state across micro-batches.",
)
def streaming_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from flink_1_8_sourcecode_spark.operators.dedup import (
        embedding_ingest_dedup,
    )

    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 50)

    chunks = _EMB_CHUNK_CACHE.get(sf_dir)
    if chunks is None or not os.path.isdir(chunks):
        chunks = tempfile.mkdtemp(prefix="sed_emb_")
        inc = emb.filter(F.col("vec_id") < 50)
        for lo, hi, part in ((0, 25, "a"), (25, 50, "b")):
            inc.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{chunks}/__chunk={part}"
            )
        _EMB_CHUNK_CACHE[sf_dir] = chunks
    src = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(chunks)
    )
    out = embedding_ingest_dedup(
        src, corpus, "vec_id", "embedding", "label",
        threshold=0.30, nprobe=1,
    ).select("vec_id")
    name = f"q_sed_{uuid.uuid4().hex[:8]}"
    from flink_1_8_sourcecode_spark.streaming import sources

    sources.run_bounded_to_memory(out, name)
    return spark.table(name)


@register(
    "sim_embedding_diversity",
    oracle="""
    WITH exploded AS (
      SELECT label,
             unnest(range(len(embedding))) AS pos,
             unnest(embedding)::DOUBLE AS x
      FROM embeddings
    ), per_dim AS (
      SELECT label, pos, count(*) AS n,
             sum(x) AS s1, sum(x * x) AS s2
      FROM exploded GROUP BY 1, 2
    )
    SELECT label,
           max(n)::BIGINT AS n_vecs,
           round(sum(s2) / max(n), 6) AS mean_sq_norm,
           round(greatest(0.0,
                 2 * (sum(s2) / max(n) - sum((s1 / n) * (s1 / n)))), 6)
             AS mean_pairwise_sq_dist
    FROM per_dim GROUP BY label
    """,
    doc="Per-group embedding diversity "
    "(operators/similarity.py:embedding_diversity): mean pairwise "
    "squared L2 distance WITHOUT pairs via the variance identity "
    "E||x-y||^2 = 2(E||x||^2 - ||Ex||^2) — every term reduces to "
    "per-dimension sums, so the whole metric is one posexplode + one "
    "map-side-combined groupBy(group, dim) + a dim-bounded rollup.  "
    "The is-this-source-a-million-near-copies corpus metric at any "
    "scale: no self-join, no O(n^2).",
)
def sim_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.similarity import (
        embedding_diversity,
    )

    emb = table(spark, sf_dir, "embeddings")
    return embedding_diversity(emb, "label", "embedding")
