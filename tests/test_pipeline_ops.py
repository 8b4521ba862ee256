"""Round-6 corpus-pipeline operators: deterministic splits/sampling,
token-budget mixing, scrubbing, int8 quantization.

Oracle equivalence is covered by test_correctness.py; these tests pin
the operator SEMANTICS (boundary behavior, exactness, reconstruction
bounds) and the plan shape (the map-only claim of hash_split).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import sampling as smp
from flink_1_8_sourcecode_spark.operators import text as tx
from flink_1_8_sourcecode_spark.operators.similarity import quantization_error
from tests.conftest import SF_DIR


def test_hash_split_is_map_only_and_calibrated(spark):
    d = table(spark, SF_DIR, "documents")
    out = smp.hash_split(d, "doc_id", 0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"hash_split must not shuffle:\n{plan}"
    n = d.count()
    held = out.filter(F.col("split") == "holdout").count()
    # md5 draw: binomial(n, 0.1); allow 5 sigma
    sigma = math.sqrt(n * 0.1 * 0.9)
    assert abs(held - 0.1 * n) <= 5 * sigma, (held, n)


def test_hash_split_stable_and_salt_decorrelates(spark):
    d = table(spark, SF_DIR, "documents")
    a = {r["doc_id"] for r in smp.hash_split(d, "doc_id", 0.1)
         .filter(F.col("split") == "holdout").collect()}
    b = {r["doc_id"] for r in smp.hash_split(d, "doc_id", 0.1)
         .filter(F.col("split") == "holdout").collect()}
    assert a == b, "same salt must reproduce the identical split"
    c = {r["doc_id"] for r in smp.hash_split(d, "doc_id", 0.1, salt="v2")
         .filter(F.col("split") == "holdout").collect()}
    assert c != a, "different salt should draw a different holdout set"


def test_hash_split_boundary_fractions(spark):
    """fraction=1.0 must assign EVERY row to holdout (regression: the
    old 9-char '100000000' threshold lost lexicographically to ~94% of
    8-char md5 prefixes), and fraction=0.0 must assign none."""
    assert smp.hex_threshold(1.0) == "g"
    assert smp.hex_threshold(0.0) == "00000000"
    d = table(spark, SF_DIR, "documents")
    n = d.count()
    all_hold = smp.hash_split(d, "doc_id", 1.0).filter(F.col("split") == "holdout")
    assert all_hold.count() == n
    none_hold = smp.hash_split(d, "doc_id", 0.0).filter(F.col("split") == "holdout")
    assert none_hold.count() == 0


def test_stratified_sample_exact_counts(spark):
    d = table(spark, SF_DIR, "documents")
    frac = 0.2
    kept = smp.stratified_sample_exact(d, "source", "doc_id", frac)
    want = {
        r["source"]: math.ceil(r["n"] * frac)
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_token_budget_mix_boundary_semantics(spark):
    d = table(spark, SF_DIR, "documents")
    budgets = {"src0": 5000, "src1": 0}
    out = smp.token_budget_mix(
        d, "source", "doc_id", tx.subword_count(F.col("text")),
        budgets=budgets, default_budget=1000,
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert "src1" not in by_src, "zero-budget source must be excluded"
    for src, rows in by_src.items():
        budget = budgets.get(src, 1000)
        rows.sort(key=lambda r: r["cum_tokens"])
        # every kept row except the last is strictly under budget;
        # the last kept row is the first to meet-or-cross it
        for r in rows[:-1]:
            assert r["cum_tokens"] < budget, (src, r)
        assert rows[-1]["cum_tokens"] >= min(budget, rows[-1]["cum_tokens"])
        # budgets are met, not undershot: the final cum is >= budget
        # unless the source ran out of documents entirely
        total_docs = sum(1 for r2 in out if r2["source"] == src)
        if rows[-1]["cum_tokens"] < budget:
            n_src = [r2 for r2 in out if r2["source"] == src]
            assert len(n_src) == total_docs


def test_quantize_int8_reconstruction_bounds(spark):
    emb = table(spark, SF_DIR, "embeddings").limit(100)
    rep = quantization_error(emb, "vec_id", "embedding").collect()
    assert len(rep) == 100
    for r in rep:
        # symmetric rounding: |err| <= scale/2 per element
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12, r
        assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-12, r
        assert r["cos_sim"] > 0.999, r


def test_quantize_int8_drop_vec(spark):
    """keep_vec=False must resolve (regression: qvec used to be built
    AFTER the select had dropped the vector column) and agree with the
    keep_vec=True codes."""
    from flink_1_8_sourcecode_spark.operators.similarity import quantize_int8

    emb = table(spark, SF_DIR, "embeddings").limit(20)
    slim = quantize_int8(emb, "vec_id", "embedding", keep_vec=False)
    assert "embedding" not in slim.columns
    full = quantize_int8(emb, "vec_id", "embedding", keep_vec=True)
    a = {r["vec_id"]: (r["scale"], r["qvec"]) for r in slim.collect()}
    b = {r["vec_id"]: (r["scale"], r["qvec"]) for r in full.collect()}
    assert a == b and len(a) == 20


def test_scrub_removes_all_blocklisted_terms(spark):
    d = table(spark, SF_DIR, "documents")
    pat = r"\b(spark|customer|vector)\b"
    scrubbed = d.select(tx.scrub(F.col("text"), pat).alias("t"))
    leftovers = scrubbed.filter(
        F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), 0)) > 0
    ).count()
    assert leftovers == 0
    # and the op actually fired on this corpus (non-vacuous test)
    hits = d.select(tx.scrub_count(F.col("text"), pat).alias("c")).agg(
        F.sum("c").alias("s")
    ).first()["s"]
    assert hits > 0


def test_pii_patterns_fire_on_synthetic_pii(spark):
    rows = [
        ("contact me at a.b+c@example.org or 10.1.2.3", 1, 1),
        ("call +1 (415) 555-0100 now", 0, 0),
        ("clean text", 0, 0),
    ]
    df = spark.createDataFrame(rows, "text string, want_email int, want_ip int")
    got = df.select(
        tx.scrub_count(F.col("text"), tx.PII_PATTERNS["email"]).alias("email"),
        tx.scrub_count(F.col("text"), tx.PII_PATTERNS["ipv4"]).alias("ip"),
        tx.scrub_count(F.col("text"), tx.PII_PATTERNS["phone"]).alias("phone"),
        "want_email", "want_ip",
    ).collect()
    for r in got:
        assert r["email"] == r["want_email"]
        assert r["ip"] == r["want_ip"]
    assert sum(r["phone"] for r in got) >= 1


def test_curate_corpus_two_shuffles(spark):
    """The 100 TB claim: the whole curation pass costs exactly two
    exchanges (fingerprint-dedup window + mixing window) plus AQE's
    union-side reuse; scrub/lang/quality fuse into the scans."""
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus

    d = table(spark, SF_DIR, "documents")
    out = curate_corpus(
        d, scrub_pattern=r"\b(spark)\b", lang="en", min_quality=0.55,
        budgets={"src0": 4000}, default_budget=800,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
    # holdout branch re-reads the split stage (same scan, no shuffle);
    # only the two window stages may exchange
    assert n_ex <= 2, f"expected <=2 exchanges, got {n_ex}:\n{plan}"


def test_curate_corpus_no_budget_keeps_all_splits(spark):
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus

    d = table(spark, SF_DIR, "documents")
    df = curate_corpus(d, lang=None, min_quality=0.0, budgets=None)
    assert "cum_tokens" not in df.columns  # no mixing stage, no column
    out = df.collect()
    assert {r["split"] for r in out} == {"train", "holdout"}
    # no lang/quality gating, dedup only: every distinct fingerprint kept
    assert len(out) > 0


def test_cosine_topk_gemm_equals_column_kernel(spark):
    """The GEMM kernel is a pure acceleration: identical (query,
    neighbor, rank) output to the Column-expression two-phase top-k,
    including on a wide query set (50 queries)."""
    from flink_1_8_sourcecode_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_gemm,
    )

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    a = cosine_topk(emb, queries, "vec_id", "embedding", "vec_id", k=5).collect()
    b = cosine_topk_gemm(emb, queries, "vec_id", "embedding", "vec_id", k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a_map = {key(r): r["neighbor_id"] for r in a}
    b_map = {key(r): r["neighbor_id"] for r in b}
    assert a_map == b_map
    # cosines agree to float tolerance (BLAS vs sequential fold order)
    bc = {key(r): r["cosine"] for r in b}
    for r in a:
        assert abs(r["cosine"] - bc[key(r)]) < 1e-9


def test_shard_assignment_map_only_uniform_stable(spark):
    d = table(spark, SF_DIR, "documents")
    out = smp.shard_assignment(d, "doc_id", 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "shard_assignment must not shuffle"
    counts = {r["shard"]: r["n"] for r in
              out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) <= set(range(16))
    n = sum(counts.values())
    # uniformity: no shard more than 3x the fair share on 500 docs
    assert max(counts.values()) < 3 * n / 16
    again = {r["shard"]: r["n"] for r in
             smp.shard_assignment(d, "doc_id", 16)
             .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_pack_sequences_invariants(spark):
    from flink_1_8_sourcecode_spark.operators import text as tx2

    d = table(spark, SF_DIR, "documents")
    seq_len = 512
    out = smp.pack_sequences(
        d, "source", "doc_id", tx2.subword_count(F.col("text")), seq_len
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: (r["seq_id"], r["seq_offset"]))
        # offsets are within a sequence, streams are gapless: each doc
        # starts exactly where the previous one ended
        pos = 0
        for r in rows:
            assert 0 <= r["seq_offset"] < seq_len
            assert r["seq_id"] * seq_len + r["seq_offset"] == pos, (src, r)
            pos += r["n_tokens"]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pack_and_mix_match_python_reference(spark, seed):
    """Randomized cross-check: pack_sequences and token_budget_mix agree
    with a straightforward pure-Python reference on random corpora
    (random sources, random token counts, including huge docs that
    straddle several sequences / blow the budget on arrival)."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(seed)
    n = 200
    ids = rng.choice(10_000, size=n, replace=False)
    srcs = rng.integers(0, 4, size=n)
    toks = rng.integers(1, 700, size=n)
    rows = [(int(i), f"s{s}", int(t)) for i, s, t in zip(ids, srcs, toks)]
    df = spark.createDataFrame(rows, "id long, src string, tok int")

    def order_key(row):
        return (hashlib.md5(str(row[0]).encode()).hexdigest(), row[0])

    # --- reference packing ---
    seq_len = 512
    want_pack = {}
    for s in {r[1] for r in rows}:
        pos = 0
        for r in sorted((r for r in rows if r[1] == s), key=order_key):
            want_pack[r[0]] = (pos // seq_len, pos % seq_len)
            pos += r[2]
    got = smp.pack_sequences(df, "src", "id", F.col("tok"), seq_len).collect()
    assert len(got) == n
    for r in got:
        assert (r["seq_id"], r["seq_offset"]) == want_pack[r["id"]], r

    # --- reference mixing ---
    budgets = {"s0": 3000, "s1": 0}
    default = 900
    want_keep = {}
    for s in {r[1] for r in rows}:
        b = budgets.get(s, default)
        cum = 0
        for r in sorted((r for r in rows if r[1] == s), key=order_key):
            if cum < b:
                cum += r[2]
                want_keep[r[0]] = cum
    got_mix = smp.token_budget_mix(
        df, "src", "id", F.col("tok"), budgets=budgets, default_budget=default
    ).collect()
    assert {r["id"]: r["cum_tokens"] for r in got_mix} == want_keep


def test_shard_partitioned_write_and_pruned_read(spark, tmp_path):
    """The write-layout end-to-end: shard_assignment -> partitionBy
    write -> partition-pruned read of one shard."""
    d = table(spark, SF_DIR, "documents")
    sharded = smp.shard_assignment(d, "doc_id", 8)
    out = str(tmp_path / "corpus_shards")
    sharded.write.partitionBy("shard").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == d.count()
    one = back.filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the shard predicate must land in PartitionFilters,
    # not in a post-scan Filter
    assert "PartitionFilters: [isnotnull(shard" in plan, plan[:800]
    want = sharded.filter(F.col("shard") == 3).count()
    assert one.count() == want


def test_zorder_layout_prunes_multidim_ranges(spark):
    """Z-order locality: for a square range predicate over two uniform
    dimensions, the Z-clustered layout touches fewer partitions than a
    single-column sort layout (which answers x-ranges well but smears
    y across every partition)."""
    from flink_1_8_sourcecode_spark.operators.partitioning import zorder_layout

    n, parts = 4096, 16
    base = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.floor(F.col("id") / 64)).alias("y"),
    )

    def touched(df, pred):
        return (
            df.withColumn("__p", F.spark_partition_id())
            .filter(pred)
            .select("__p").distinct().count()
        )

    pred = (
        (F.col("x") >= 10) & (F.col("x") < 18)
        & (F.col("y") >= 20) & (F.col("y") < 28)
    )
    z = zorder_layout(base, ["x", "y"], parts, bits=6).persist()
    linear = base.repartitionByRange(parts, "x").sortWithinPartitions("x").persist()
    zt, lt = touched(z, pred), touched(linear, pred)
    assert z.count() == n and linear.count() == n
    # 8x8 query on a 64x64 grid: z-order confines it to a few curve
    # segments; the x-sorted layout slices through ~every y for the x band
    assert zt < lt, (zt, lt)
    assert zt <= 4, zt
    z.unpersist(); linear.unpersist()


def test_zorder_value_interleaves_bits(spark):
    from flink_1_8_sourcecode_spark.operators.partitioning import zorder_value

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    got = df.select(zorder_value([F.col("a"), F.col("b")], bits=3).alias("z")).first()["z"]
    # a bits go to even positions, b bits to odd: a=101, b=011
    # -> z bits LSB..MSB: a0=1,b0=1,a1=0,b1=1,a2=1,b2=0 -> 0b011011
    assert got == 0b011011, bin(got)


def test_zip_with_index_consecutive_and_unique_id_unique(spark):
    from flink_1_8_sourcecode_spark.operators.partitioning import (
        zip_with_index,
        zip_with_unique_id,
    )

    d = table(spark, SF_DIR, "documents")
    idx = zip_with_index(d, ["n_chars", "doc_id"], n_partitions=5)
    pdf = idx.orderBy("index").toPandas()
    n = len(pdf)
    assert list(pdf["index"]) == list(range(n)), "indices must be 0..n-1"
    # order contract: index follows (n_chars, doc_id)
    key = list(zip(pdf["n_chars"], pdf["doc_id"]))
    assert key == sorted(key)

    uid = zip_with_unique_id(d).toPandas()
    assert uid["unique_id"].nunique() == n


def test_curate_corpus_fuzzy_lsh_reuses_signature_exchange(spark):
    """The near-dup stage's banded self-join must evaluate the expensive
    MinHash signature pipeline ONCE: both join branches (and the
    hot-bucket window) hang off a single exchange, the rest reusing it
    — the same plan shape the standalone dedup_minhash_lsh op pins.
    Checked on the pair subplan exactly as the pipeline builds it
    (pairs over the curated survivors), since the closure iteration
    truncates lineage in the final pipeline plan."""
    from flink_1_8_sourcecode_spark.operators.dedup import minhash_lsh_pairs
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus
    from pyspark.sql import Window

    d = table(spark, SF_DIR, "documents")
    t = F.col("text")
    curated = d.withColumn("text", tx.scrub(t, r"\b(spark)\b"))
    curated = curated.filter(tx.lang_id(t) == "en").filter(tx.quality_score(t) >= 0.55)
    fp_w = Window.partitionBy(tx.fingerprint(t)).orderBy(F.col("doc_id"))
    curated = (
        curated.withColumn("__rn", F.row_number().over(fp_w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    pairs = minhash_lsh_pairs(curated, "doc_id", "text", num_hashes=16, bands=8)
    pairs.collect()  # AQE materializes ReusedExchange only in the final plan
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:1500]

    # and the full fuzzy pipeline runs end-to-end with both dedup
    # stages: its survivors are a subset of the exact-only pipeline's
    fuzzy = curate_corpus(
        d, scrub_pattern=r"\b(spark)\b", lang="en", min_quality=0.55,
        budgets=None, neardup=True,
    )
    exact = curate_corpus(
        d, scrub_pattern=r"\b(spark)\b", lang="en", min_quality=0.55,
        budgets=None,
    )
    f_ids = {r["doc_id"] for r in fuzzy.collect()}
    e_ids = {r["doc_id"] for r in exact.collect()}
    assert f_ids <= e_ids and len(f_ids) > 0


def test_ivf_gemm_equals_column_kernel_wide_queries(spark):
    """ivf_topk_gemm is a pure acceleration of ivf_topk: identical
    (query, neighbor, rank) on a 40-query probe set, cosines to float
    tolerance (BLAS vs sequential fold)."""
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_topk, ivf_topk_gemm

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 40)
    a = ivf_topk(emb, queries, "vec_id", "embedding", "vec_id",
                 cluster_col="label", k=5, nprobe=3).collect()
    b = ivf_topk_gemm(emb, queries, "vec_id", "embedding", "vec_id",
                      cluster_col="label", k=5, nprobe=3).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert {key(r): r["neighbor_id"] for r in a} == {key(r): r["neighbor_id"] for r in b}
    bc = {key(r): r["cosine"] for r in b}
    for r in a:
        assert abs(r["cosine"] - bc[key(r)]) < 1e-9


def test_temperature_resample_semantics(spark):
    """T=1 is a no-op (accept everything); growing T flattens the
    mixture (the dominant source loses share, never gains); accepted
    sets are NESTED across temperatures (same hash order) — the
    mT5/XLM temperature-sampling rule as deterministic subsampling."""
    rows = [(i, "big" if i < 800 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def accepted(t):
        out = smp.temperature_resample(df, "source", "doc_id", temperature=t)
        return {r["doc_id"] for r in out.collect()}

    a1, a2, a5 = accepted(1.0), accepted(2.0), accepted(5.0)
    assert len(a1) == 1000, "T=1 must keep every row"
    # the under-represented source is never dropped (frac capped at 1)
    assert all(i in a2 for i in range(800, 1000))
    # dominant source shrinks monotonically with T, and draws are nested
    big2 = {i for i in a2 if i < 800}
    big5 = {i for i in a5 if i < 800}
    assert len(big5) < len(big2) < 800
    assert big5 <= big2

    with pytest.raises(ValueError, match="temperature"):
        smp.temperature_resample(df, "source", "doc_id", temperature=0.0)


def test_dedup_lines_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [("header\nbody one\nheader\n\n  body two  \nbody one\nfooter",)],
        "text string",
    )
    got = df.select(tx.dedup_lines(F.col("text")).alias("t")).first()["t"]
    assert got == "header\nbody one\nbody two\nfooter"


def test_domain_blocklist_and_char_entropy_semantics(spark):
    import math

    from flink_1_8_sourcecode_spark.operators.text import (
        char_entropy,
        domain_blocklist_flag,
        url_hosts,
    )

    rows = [
        (1, "go to https://evil.SPAM.example/path now"),   # subdomain hit
        (2, "see https://spam.example.org/x"),             # NOT blocked (different host)
        (3, "plain http://bad.io and https://ok.org/z"),   # exact hit
        (4, "no urls at all"),
        (5, "aaaa"),                                       # zero entropy
        (6, "abab"),                                       # exactly 1 bit/char
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           domain_blocklist_flag(df, "text", ["spam.example", "bad.io"])
           .select("doc_id", "blocked",
                   F.size(url_hosts(F.col("text"))).alias("nh"),
                   char_entropy(F.col("text")).alias("ent")).collect()}
    assert out[1]["blocked"] is True and out[1]["nh"] == 1
    assert out[2]["blocked"] is False  # spam.example.org != *.spam.example
    assert out[3]["blocked"] is True and out[3]["nh"] == 2
    assert out[4]["blocked"] is False and out[4]["nh"] == 0
    assert abs(out[5]["ent"] - 0.0) < 1e-12
    assert abs(out[6]["ent"] - 1.0) < 1e-12
    assert out[1]["ent"] > 3.0  # natural text sits well above garbage


def test_chunk_documents_overlap_and_partials(spark):
    """Chunking invariants: disjoint chunks reassemble the token
    stream exactly; strided chunks overlap by chunk-stride tokens; the
    final partial window is kept; empty docs yield nothing."""
    from flink_1_8_sourcecode_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "   ")], "doc_id long, text string")

    dis = chunk_documents(df, "doc_id", "text", chunk_tokens=4).collect()
    by_idx = {r["chunk_idx"]: r for r in dis if r["doc_id"] == 1}
    assert [by_idx[i]["chunk_text"] for i in range(3)] == [
        "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9",
    ]
    assert by_idx[2]["n_tokens"] == 2  # partial kept
    assert not [r for r in dis if r["doc_id"] == 2]  # empty doc -> no chunks

    ov = chunk_documents(df, "doc_id", "text", chunk_tokens=4, stride=2).collect()
    texts = [r["chunk_text"] for r in sorted(
        (r for r in ov if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    assert texts[0] == "t0 t1 t2 t3" and texts[1] == "t2 t3 t4 t5"
    assert texts[-1] == "t8 t9"


def test_curate_fuzzy_jaccard_threshold_monotone(spark):
    """neardup_min_jaccard prunes candidate pairs before closure: a
    higher threshold can only KEEP more documents (fewer merges), and
    threshold 0 equals the unthresholded fuzzy pipeline."""
    from flink_1_8_sourcecode_spark.operators.pipeline import curate_corpus

    d = table(spark, SF_DIR, "documents")

    def ids(**kw):
        return {
            r["doc_id"]
            for r in curate_corpus(
                d, lang=None, min_quality=0.0, budgets=None, neardup=True, **kw
            ).collect()
        }

    base = ids()
    t0 = ids(neardup_min_jaccard=0.0)
    t_hi = ids(neardup_min_jaccard=0.95)
    assert t0 == base
    assert base <= t_hi  # pruning pairs can only reduce merging


def test_paragraph_dedup_global_matches_bruteforce(spark):
    """Randomized corpora: the two-exchange groupBy(md5) paragraph dedup
    agrees with a direct Python reference (first corpus-wide occurrence
    by (doc_id, pos) wins; docs reconstructed from survivors)."""
    import random

    from flink_1_8_sourcecode_spark.operators.dedup import paragraph_dedup_global

    rng = random.Random(77)
    for trial in range(5):
        w = rng.randint(2, 4)
        docs = {
            did: [rng.choice("abc") for _ in range(rng.randint(0, 13))]
            for did in range(rng.randint(2, 6))
        }
        seen, want = set(), {}
        for did in sorted(docs):
            toks = docs[did]
            chunks = [
                " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
            ]
            kept = []
            for c in chunks:
                if c not in seen:
                    seen.add(c)
                    kept.append(c)
            want[did] = (len(chunks), len(kept), " ".join(kept))
        df = spark.createDataFrame(
            [(did, " ".join(toks)) for did, toks in docs.items()],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_text"])
            for r in paragraph_dedup_global(
                df, "doc_id", "text", chunk_tokens=w
            ).collect()
        }
        assert got == want, (trial, w, docs)


def test_bigram_lm_score_hand_computed(spark):
    """Two-doc corpus small enough to check the smoothed LM by hand."""
    import math

    from flink_1_8_sourcecode_spark.operators.text import bigram_lm_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    # bigrams: doc1 = ab, ba, ab ; doc2 = ab, bc ; vocab = {a,b,c,x}, V=4
    # c(ab)=3 c(ba)=1 c(bc)=1 ; ctx c(a)=3 c(b)=2
    k, V = 0.5, 4
    p_ab = (3 + k) / (3 + k * V)
    p_ba = (1 + k) / (2 + k * V)
    p_bc = (1 + k) / (2 + k * V)
    rows = {
        r["doc_id"]: r
        for r in bigram_lm_score(df, "doc_id", "text", add_k=k).collect()
    }
    assert set(rows) == {1, 2}  # doc 3 has no bigrams
    want1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert rows[1]["n_bigrams"] == 3 and abs(rows[1]["avg_logp"] - want1) < 1e-12
    assert rows[2]["n_bigrams"] == 2 and abs(rows[2]["avg_logp"] - want2) < 1e-12
    assert abs(rows[1]["ppl"] - math.exp(-want1)) < 1e-12


def test_range_search_gemm_consistent_with_topk_and_map_only(spark, sf_dir):
    """range_search at threshold t returns exactly the topk pairs with
    cosine >= t when k is large enough — and its plan has NO exchange."""
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.similarity import (
        cosine_topk,
        range_search_gemm,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    t = 0.25
    rs = range_search_gemm(emb, queries, "vec_id", "embedding", "vec_id", threshold=t)
    got = {(r["query_id"], r["neighbor_id"]) for r in rs.collect()}
    topk = cosine_topk(emb, queries, "vec_id", "embedding", "vec_id", k=1000)
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in topk.collect()
        if r["cosine"] >= t
    }
    assert got == want and got
    plan = rs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_feature_hash_embed_invariants(spark):
    """Unit norms, dims in range, single-token doc gives weight +/-1,
    and identical texts embed identically."""
    from flink_1_8_sourcecode_spark.operators.text import feature_hash_embed

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta gamma beta"), (3, "alpha beta gamma beta")],
        "doc_id long, text string",
    )
    rows = feature_hash_embed(df, "doc_id", "text", dim=64).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r["dim"] < 64
        by_doc.setdefault(r["doc_id"], {})[r["dim"]] = r["weight"]
    for did, vec in by_doc.items():
        assert abs(sum(w * w for w in vec.values()) - 1.0) < 1e-9, did
    assert list(by_doc[1].values())[0] in (1.0, -1.0)
    assert by_doc[2] == by_doc[3]


def test_dsir_importance_hand_computed(spark):
    """Three-doc corpus, target = docs containing 'x' marker: weights
    match the add-1 smoothed unigram log-ratio computed by hand."""
    import math

    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.operators.sampling import dsir_importance

    df = spark.createDataFrame(
        [(1, "a a b", True), (2, "a c", False), (3, "b c", False)],
        "doc_id long, text string, tgt boolean",
    )
    # raw counts: a=3 b=2 c=2 (nr=7); target counts: a=2 b=1 c=0 (nt=3); V=3
    out = {
        r["doc_id"]: r
        for r in dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    k, v, nr, nt = 1.0, 3, 7, 3

    def lr(ct, cr):
        return math.log((ct + k) / (nt + k * v)) - math.log((cr + k) / (nr + k * v))

    want1 = 2 * lr(2, 3) + lr(1, 2)
    want3 = lr(1, 2) + lr(0, 2)
    assert out[1]["n_tokens"] == 3 and abs(out[1]["log_weight"] - want1) < 1e-12
    assert out[3]["n_tokens"] == 2 and abs(out[3]["log_weight"] - want3) < 1e-12
    # the all-target-token doc outweighs the no-target-token doc
    assert out[1]["log_weight"] > out[3]["log_weight"]


def test_ppl_buckets_ordered_and_balanced(spark, sf_dir):
    from flink_1_8_sourcecode_spark.queries import load_all

    rows = load_all()["text_ppl_buckets"].spark(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["bucket"], []).append(r["ppl"])
    assert set(by) == {"head", "middle", "tail"}
    assert max(by["head"]) <= min(by["middle"]) <= max(by["middle"]) <= min(by["tail"])
    n = len(rows)
    for b in by.values():  # terciles within one doc of n/3
        assert abs(len(b) - n / 3) <= 1


def test_gopher_rules_hand_computed(spark):
    from flink_1_8_sourcecode_spark.operators.text import gopher_quality_flags

    good = " ".join(["that", "have", "with", "the"] * 15)  # 60 words, mean len 3.75
    bad_sym = " ".join(["x#y"] * 60)                  # all symbol words
    short = "the be nice"                             # < min_words
    df = spark.createDataFrame(
        [(1, good), (2, bad_sym), (3, short)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in gopher_quality_flags(df, "doc_id", "text").collect()
    }
    assert got[1]["keep"] and got[1]["n_stopwords"] == 4
    assert not got[2]["keep"] and got[2]["symbol_ratio"] == 1.0
    assert not got[3]["keep"] and got[3]["n_words"] == 3
    # relaxed thresholds admit the short doc
    relaxed = {
        r["doc_id"]: r["keep"]
        for r in gopher_quality_flags(
            df, "doc_id", "text", min_words=2, min_stopwords=1
        ).collect()
    }
    assert relaxed[3]


def test_winnowing_pairs_min_shared_and_star_cap(spark):
    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_pairs

    run = "p q r s t u v w"  # 8 tokens: >= w+k-1 -> shared fingerprints
    docs = [
        (1, run + " alpha beta gamma delta"),
        (2, run + " epsilon zeta eta theta"),
        (3, "one two three four five six seven eight nine"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnowing_pairs(
            df, "doc_id", "text", k=4, window=5, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(3 not in p for p in pairs)
    # star cap: a fingerprint hitting all 4 docs with max_bucket_size=2
    # links every member to the anchor with the n_shared=0 sentinel
    boil = [(i, run) for i in range(10, 14)]
    bdf = spark.createDataFrame(boil, "doc_id long, text string")
    star = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnowing_pairs(
            bdf, "doc_id", "text", k=4, window=5, min_shared=1, max_bucket_size=2
        ).collect()
    }
    assert star == {(10, 11): 0, (10, 12): 0, (10, 13): 0}


def test_ivf_range_search_consistent_with_ivf_topk(spark, sf_dir):
    """IVF range search at threshold t == IVF top-k (k >= bucket size)
    filtered to cosine >= t: same probes, no rank truncation."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.similarity import (
        ivf_range_search,
        ivf_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    t = 0.2
    rs = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_range_search(
            emb, queries, "vec_id", "embedding", "vec_id",
            cluster_col="label", threshold=t, nprobe=2,
        ).collect()
    }
    tk = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, "vec_id", "embedding", "vec_id",
            cluster_col="label", k=10**6, nprobe=2,
        ).collect()
        if r["cosine"] >= t
    }
    assert rs == tk and rs


def test_winnowing_pairs_one_row_per_pair(spark):
    """Regression (round-8 self-review): a pair sharing BOTH a hot
    fingerprint and >= min_shared small ones must yield ONE row with
    the real count, not a (count, 0-sentinel) duplicate."""
    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_pairs

    hot_run = "p q r s t u v w"       # shared by all 4 docs -> hot
    small_run = "j k l m n o aa bb"   # shared by docs 1,2 only
    docs = [
        (1, hot_run + " " + small_run),
        (2, hot_run + " cc dd ee ff " + small_run),
        (3, hot_run + " gg hh ii kk ll mm nn oo"),
        (4, hot_run + " qq rr ss tt uu vv ww xx"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = winnowing_pairs(
        df, "doc_id", "text", k=4, window=5, min_shared=1, max_bucket_size=3
    ).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs)), f"duplicate pair rows: {sorted(pairs)}"
    by = {(r["id_a"], r["id_b"]): r["n_shared"] for r in rows}
    assert by[(1, 2)] >= 1  # the real small-bucket count wins over the sentinel


def test_gemm_kernels_empty_query_set(spark, sf_dir):
    """Regression (round-8 self-review): an empty query side must return
    an empty result, not crash np.stack at plan-build time."""
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.similarity import (
        cosine_topk_gemm,
        range_search_gemm,
    )

    emb = table(spark, sf_dir, "embeddings")
    none = emb.filter(F.col("vec_id") < 0)
    assert cosine_topk_gemm(emb, none, "vec_id", "embedding", "vec_id").count() == 0
    assert (
        range_search_gemm(
            emb, none, "vec_id", "embedding", "vec_id", threshold=0.5
        ).count()
        == 0
    )


def test_dsir_keeps_zero_token_docs(spark):
    from flink_1_8_sourcecode_spark.operators.sampling import dsir_importance

    df = spark.createDataFrame(
        [(1, "a b", True), (2, "   ", False)], "doc_id long, text string, tgt boolean"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_weight"])
        for r in dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    assert set(got) == {1, 2}
    assert got[2] == (0, 0.0)


def test_ppl_buckets_single_plan_reuses_lm_exchange(spark, sf_dir):
    """The cutoffs live IN the plan (broadcast 1-row aggregate), so the
    LM pipeline's exchange is computed once and reused across the cuts
    branch and the scoring branch — not run twice via a driver .first()."""
    from flink_1_8_sourcecode_spark.queries import load_all

    df = load_all()["text_ppl_buckets"].spark(spark, sf_dir)
    df.collect()  # AQE: ReusedExchange only appears in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan[:2000]


def test_binary_sketch_and_hamming(spark):
    """Hand-checkable sketch bits + Hamming ranking on tiny vectors."""
    from flink_1_8_sourcecode_spark.operators.similarity import (
        binary_sketch,
        hamming_topk,
    )

    rows = [
        (1, [1.0, -1.0, 2.0]),    # bits: 1,0,1 -> lo = 0b101 = 5
        (2, [1.0, 1.0, 2.0]),     # 0b111 = 7  (hamming to 1: 1)
        (3, [-1.0, -1.0, -2.0]),  # 0b000 = 0  (hamming to 1: 2)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sk = {r["vec_id"]: (r["code_lo"], r["code_hi"]) for r in
          binary_sketch(df, "vec_id", "embedding").collect()}
    assert sk == {1: (5, 0), 2: (7, 0), 3: (0, 0)}
    q = df.filter(F.col("vec_id") == 1)
    got = [(r["neighbor_id"], r["hamming"], r["rank"]) for r in
           hamming_topk(df, q, "vec_id", "embedding", "vec_id", k=2)
           .orderBy("rank").collect()]
    assert got == [(2, 1, 1), (3, 2, 2)]


def test_bm25_topk_hand_computed(spark):
    """BM25 vs an independent pure-python computation on a tiny corpus."""
    import math

    from flink_1_8_sourcecode_spark.operators.text import bm25_topk

    docs = {
        1: "apple banana apple",
        2: "banana cherry",
        3: "durian durian",
        4: "apple apple apple banana",
    }
    terms, k1, b = ["apple", "banana"], 1.2, 0.75
    toks = {i: t.split() for i, t in docs.items()}
    n, avgdl = len(docs), sum(len(v) for v in toks.values()) / len(docs)
    dfreq = {t: sum(t in v for v in toks.values()) for t in terms}
    want = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf:
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s:
            want[i] = round(s, 6)

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, terms, k=10).collect()}
    assert got == pytest.approx(want)
    # non-matching doc 3 must not appear at all (posting-list shape)
    assert 3 not in got
    # top-k ordering: highest score first, ties by id
    ordered = [r.doc_id for r in bm25_topk(df, terms, k=2).collect()]
    assert ordered == sorted(want, key=lambda i: (-want[i], i))[:2]


def test_decontaminate_bloom_superset_and_false_positives(spark):
    """Bloom flags must be a SUPERSET of exact n-gram flags (a Bloom
    filter has no false negatives); shrinking the filter to a few bits
    must introduce false positives; and the probe side must use
    broadcast semi joins (the corpus never shuffles to meet the bloom)."""
    from flink_1_8_sourcecode_spark.operators.text import (
        decontaminate,
        decontaminate_bloom,
    )

    rows = [(i, f"alpha beta w{i} gamma delta epsilon w{i+1} zeta", ) for i in range(20)]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    holdout = spark.createDataFrame(
        [(100, "alpha beta w3 gamma unique holdout phrase here")],
        "doc_id long, text string",
    )

    exact = {
        r.doc_id
        for r in decontaminate(train, holdout, "doc_id", "text", n=3)
        .filter("contaminated").collect()
    }
    bloom = {
        r.doc_id
        for r in decontaminate_bloom(train, holdout, "doc_id", "text", n=3)
        .filter("bloom_contaminated").collect()
    }
    assert exact, "fixture must have a real contamination"
    assert exact <= bloom  # no false negatives, ever

    # 4-bit-wide filter: nearly every gram collides -> false positives
    tiny = {
        r.doc_id
        for r in decontaminate_bloom(
            train, holdout, "doc_id", "text", n=3, n_bits=4, n_hashes=2
        ).filter("bloom_contaminated").collect()
    }
    assert len(tiny) > len(exact)

    plan = (
        decontaminate_bloom(train, holdout, "doc_id", "text", n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoop") >= 3


def test_build_vocab_and_oov_stats(spark):
    """Vocabulary rank order (count desc, token asc) and exact OOV
    accounting on a hand-built corpus."""
    from flink_1_8_sourcecode_spark.operators.text import build_vocab, oov_stats

    df = spark.createDataFrame(
        [
            ("g1", "aa bb aa cc"),
            ("g1", "aa bb dd"),
            ("g2", "cc dd ee ee ee"),
        ],
        "grp string, text string",
    )
    vocab = build_vocab(df, "text", vocab_size=3)
    rows = [(r.token, r.cnt, r.rank) for r in vocab.collect()]
    # counts: aa=3, ee=3, bb=2, cc=2, dd=2 -> top3 = aa, ee, bb
    assert rows == [("aa", 3, 1), ("ee", 3, 2), ("bb", 2, 3)]

    got = {r.grp: (r.n_tokens, r.n_oov, r.oov_rate) for r in
           oov_stats(df, vocab, "grp", "text").collect()}
    # g1 tokens: aa bb aa cc aa bb dd -> oov = cc, dd = 2/7
    # g2 tokens: cc dd ee ee ee -> oov = cc, dd = 2/5
    assert got["g1"][0] == 7 and got["g1"][1] == 2
    assert got["g2"][0] == 5 and got["g2"][1] == 2
    assert abs(got["g1"][2] - 2 / 7) < 1e-12 and abs(got["g2"][2] - 2 / 5) < 1e-12


def test_tfidf_top_terms_hand_computed(spark):
    """TF-IDF keywords vs independent pure-python computation."""
    import math

    from flink_1_8_sourcecode_spark.operators.text import tfidf_top_terms

    docs = {
        1: "apple apple banana",
        2: "banana cherry cherry cherry",
        3: "apple durian",
    }
    toks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    dfreq = {}
    for v in toks.values():
        for t in set(v):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, v in toks.items():
        scores = {
            t: round(v.count(t) / len(v) * math.log((1 + n) / (1 + dfreq[t])), 6)
            for t in set(v)
        }
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        want[i] = [(t, s, r + 1) for r, (t, s) in enumerate(ranked)]

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = tfidf_top_terms(df, top_n=2).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.rnk)):
        got.setdefault(r.doc_id, []).append((r.term, r.tfidf, r.rnk))
    assert got == {k: [(t, pytest.approx(s), r) for t, s, r in v]
                   for k, v in want.items()}


def test_mips_topk_vs_bruteforce_and_cosine_divergence(spark):
    """MIPS ranks by raw dot product: a long vector must outrank a
    better-aligned short one (where cosine would flip the order);
    parity vs a numpy brute force."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.similarity import (
        cosine_topk,
        mips_topk,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(12, 8)).astype(float)
    vecs[3] *= 10.0  # the big-norm vector MIPS must prefer
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 2")

    got = mips_topk(df, q, "vec_id", "embedding", "vec_id", k=5).collect()
    for qid in (0, 1):
        dots = {j: round(float(vecs[qid] @ vecs[j]), 6) for j in range(12) if j != qid}
        want = sorted(dots, key=lambda j: (-dots[j], j))[:5]
        ranked = [r.neighbor_id for r in sorted(
            (r for r in got if r.query_id == qid), key=lambda r: r.rank)]
        assert ranked == want, qid

    # divergence fixture: MIPS top-1 is the scaled vector for at least
    # one query where cosine top-1 differs
    cos = cosine_topk(df, q, "vec_id", "embedding", "vec_id", k=1).collect()
    mip = {r.query_id: r.neighbor_id for r in got if r.rank == 1}
    cos1 = {r.query_id: r.neighbor_id for r in cos}
    assert 3 in mip.values() and mip != cos1


def test_weighted_upsample_counts(spark):
    """Integer weights repeat exactly; fractional weights emit floor or
    floor+1 with the expected overall rate; weight 0 drops the row."""
    from flink_1_8_sourcecode_spark.operators.sampling import weighted_upsample

    n = 400
    df = spark.range(n).select(F.col("id").alias("doc_id"))

    exact = weighted_upsample(df, "doc_id", F.lit(3.0)).groupBy("doc_id").count()
    assert exact.filter("count != 3").count() == 0 and exact.count() == n

    dropped = weighted_upsample(df, "doc_id", F.lit(0.0))
    assert dropped.count() == 0

    frac = weighted_upsample(df, "doc_id", F.lit(1.5))
    per = {r.doc_id: r["count"] for r in frac.groupBy("doc_id").count().collect()}
    assert set(per.values()) <= {1, 2} and len(per) == n
    total = sum(per.values())
    assert abs(total / n - 1.5) < 0.1  # hash draw ~ uniform

    # copy index is 1..n_copies
    copies = weighted_upsample(df.limit(5), "doc_id", F.lit(2.0)).collect()
    by_id = {}
    for r in copies:
        by_id.setdefault(r.doc_id, []).append(r.copy)
    assert all(sorted(v) == [1, 2] for v in by_id.values())


def test_langid_confusion_separable_corpus(spark):
    """On a corpus with genuinely distinct character distributions the
    trained bigram classifier must put every doc on the diagonal; a
    too-short doc falls to the lexicographically first language."""
    from flink_1_8_sourcecode_spark.operators.text import langid_confusion

    rows = []
    for i in range(4):
        rows.append((100 + i, "aa", f"aaaa bbbb aabb baba abab {i}"))
        rows.append((200 + i, "zz", f"zzzz yyyy zzyy yzyz zyzy {i}"))
    rows.append((999, "zz", "q"))  # 1 char -> no bigrams -> default 'aa'
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r.lang, r.predicted): r.n_docs
        for r in langid_confusion(df, "lang", "doc_id", "text").collect()
    }
    assert got[("aa", "aa")] == 4
    assert got[("zz", "zz")] == 4
    assert got[("zz", "aa")] == 1  # the short doc
    assert ("aa", "zz") not in got


def test_char_bigrams_short_and_order(spark):
    from flink_1_8_sourcecode_spark.operators.text import char_bigrams

    df = spark.createDataFrame(
        [(1, "AbC"), (2, "x"), (3, ""), (4, " hi ")], "i long, t string"
    )
    got = {r.i: r.g for r in df.select("i", char_bigrams(F.col("t")).alias("g")).collect()}
    assert got[1] == ["ab", "bc"]
    assert got[2] == [] and got[3] == []
    assert got[4] == ["hi"]  # trimmed first


class TestScrubPII:
    """scrub_pii: each default mask lands, near-misses stay untouched,
    the audit count is exact."""

    def test_each_pattern_masks_and_counts(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import scrub_pii

        rows = [
            (1, "mail a.user+tag@sub.example.org end"),
            (2, "host 192.168.1.254 up"),
            (3, "pan 4111111111111111 ok"),
            (4, "call 555-0123-4567 now"),
            (5, "two bob@x.io and eve@y.io here"),
        ]
        d = spark.createDataFrame(rows, "id long, t string")
        got = {r["id"]: (r["s"], r["n_masked"]) for r in
               scrub_pii(d, "t", out_col="s").collect()}
        assert got[1] == ("mail <EMAIL> end", 1)
        assert got[2] == ("host <IP> up", 1)
        assert got[3] == ("pan <CARDNUM> ok", 1)
        assert got[4] == ("call <PHONE> now", 1)
        assert got[5] == ("two <EMAIL> and <EMAIL> here", 2)

    def test_audit_counts_matches_not_sentinels(self, spark):
        """The audit column counts pattern MATCHES pre-replacement:
        a pre-existing literal '<EMAIL>' in the input must not inflate
        the count, and a custom replacement full of regex
        metacharacters must not break the counting."""
        from flink_1_8_sourcecode_spark.operators.text import scrub_pii

        d = spark.createDataFrame(
            [(1, "already says <EMAIL> and real bob@x.io")], "id long, t string"
        )
        r = scrub_pii(d, "t", out_col="s").first()
        assert r["s"] == "already says <EMAIL> and real <EMAIL>"
        assert r["n_masked"] == 1  # one real match, not two sentinels

        d2 = spark.createDataFrame([(1, "id ab12 and cd34")], "id long, t string")
        r2 = scrub_pii(
            d2, "t", out_col="s",
            patterns=[(r"[a-z]{2}\d{2}", r"(**)")],
        ).first()
        assert r2["s"] == "id (**) and (**)"
        assert r2["n_masked"] == 2

    def test_near_misses_untouched(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import scrub_pii

        rows = [
            (1, "version 1.2.3 released"),        # 3 dotted groups, not 4
            (2, "order 123456789012 shipped"),    # 12 digits < card floor
            (3, "not-an-email @ example"),        # no local part
            (4, "year 2024 and zip 90210"),       # short digit runs
        ]
        d = spark.createDataFrame(rows, "id long, t string")
        out = scrub_pii(d, "t", out_col="s").collect()
        for r in out:
            src = dict(rows)[r["id"]]
            assert r["s"] == src and r["n_masked"] == 0, (r["id"], r["s"])

    def test_custom_patterns_and_order(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import scrub_pii

        d = spark.createDataFrame([(1, "key=SECRET123 key=SECRET99")], "id long, t string")
        out = scrub_pii(
            d, "t", out_col="s", patterns=[(r"key=\w+", "<KEY>")]
        ).collect()[0]
        assert out["s"] == "<KEY> <KEY>" and out["n_masked"] == 2


def test_cap_per_key_exact_and_deterministic(spark):
    from flink_1_8_sourcecode_spark.operators.sampling import cap_per_key

    rows = [(f"k{i % 3}", i) for i in range(30)] + [("rare", 99)]
    d = spark.createDataFrame(rows, "key string, id long")
    out = cap_per_key(d, "key", "id", k=4).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["key"], set()).add(r["id"])
    assert all(len(v) == 4 for k, v in by_key.items() if k != "rare")
    assert by_key["rare"] == {99}  # under-cap keys keep everything
    out2 = cap_per_key(d, "key", "id", k=4).collect()
    assert {(r["key"], r["id"]) for r in out} == {(r["key"], r["id"]) for r in out2}
    # a different salt draws a different (still size-4) winner set
    alt = cap_per_key(d, "key", "id", k=4, salt="z").collect()
    assert {(r["key"], r["id"]) for r in alt} != {(r["key"], r["id"]) for r in out}


def test_normalize_ccnet_collides_digit_and_punct_variants(spark):
    from flink_1_8_sourcecode_spark.operators.text import normalize_ccnet
    from pyspark.sql import functions as F

    d = spark.createDataFrame(
        [
            (1, "3 Items for $5!"),
            (2, "8 items  for $9"),
            (3, "something ENTIRELY different?"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r["n"] for r in d.select("id", normalize_ccnet(F.col("t")).alias("n")).collect()}
    assert out[1] == out[2] == "0 items for 0"
    assert out[3] == "something entirely different"


def test_interleave_sources_round_robin_semantics(spark):
    from flink_1_8_sourcecode_spark.operators.sampling import interleave_sources

    rows = [(f"s{i % 3}", i) for i in range(9)] + [("s0", 100), ("s0", 101)]
    d = spark.createDataFrame(rows, "src string, id long")
    out = sorted(
        interleave_sources(d, "src", "id").collect(), key=lambda r: r["mix_rank"]
    )
    # ranks are unique and the first n_sources rows cover all sources
    ranks = [r["mix_rank"] for r in out]
    assert len(set(ranks)) == len(ranks)
    assert {r["src"] for r in out[:3]} == {"s0", "s1", "s2"}
    # within every complete round, each source appears exactly once
    assert {r["src"] for r in out[3:6]} == {"s0", "s1", "s2"}
    # s0 has 2 extra rows: they occupy the final rounds alone
    assert [r["src"] for r in out[-2:]] == ["s0", "s0"]


def test_validate_expectations_catches_planted_violations(spark):
    from flink_1_8_sourcecode_spark.operators.pipeline import validate_expectations

    d = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -99.0, None), (2, 3.0, "b"), (4, None, "c")],
        "id long, x double, s string",
    )
    rep = {r["rule"]: (r["violations"], r["passed"]) for r in
           validate_expectations(
               d,
               rules=[("x_positive", F.col("x") > 0),
                      ("s_not_null", F.col("s").isNotNull())],
               unique_cols=["id"],
           ).collect()}
    # x: -99 fails, NULL x fails via coalesce(False) -> 2 violations
    assert rep["x_positive"] == (2, False)
    assert rep["s_not_null"] == (1, False)
    assert rep["unique(id)"] == (1, False)  # id=2 twice -> n - distinct = 1
    # single-plan claim: exactly one aggregate pass feeds the report
    plan = validate_expectations(
        d, rules=[("x_positive", F.col("x") > 0)], unique_cols=["id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_copurchase_hot_basket_capped(spark):
    """A planted degenerate basket (1 order x 500 items) must not go
    quadratic: the cap bounds its pair contribution at C(cap, 2) while
    normal baskets are untouched."""
    from flink_1_8_sourcecode_spark.queries.pipeline_ops import _capped_baskets

    from pyspark.sql import functions as F

    hot = [(1, i) for i in range(500)]
    normal = [(2, 10), (2, 11), (3, 10), (3, 11)]
    li = spark.createDataFrame(hot + normal, "l_orderkey long, l_partkey long")
    b = _capped_baskets(li, max_basket=16)
    per_basket = {r["l_orderkey"]: r["n"] for r in
                  b.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_basket[1] == 16          # hot basket capped
    assert per_basket[2] == 2 and per_basket[3] == 2  # untouched
    # and the cap is deterministic across evaluations
    again = {r["l_orderkey"]: r["n"] for r in
             _capped_baskets(li, max_basket=16)
             .groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == per_basket
    kept = sorted(r["l_partkey"] for r in b.filter("l_orderkey = 1").collect())
    kept2 = sorted(r["l_partkey"] for r in
                   _capped_baskets(li, max_basket=16).filter("l_orderkey = 1").collect())
    assert kept == kept2


def test_rate_limit_per_bucket_semantics(spark):
    """rate_limit renews the cap per tumbling bucket and keeps the
    EARLIEST rows (vs cap_per_key's one global hash-ordered cap)."""
    import datetime as dt

    from flink_1_8_sourcecode_spark.operators.sampling import rate_limit

    base = dt.datetime(2024, 1, 1)
    rows = [
        # 4 events in hour bucket 0, 2 in bucket 1 for key "a"
        ("a", 1, base + dt.timedelta(minutes=1)),
        ("a", 2, base + dt.timedelta(minutes=2)),
        ("a", 3, base + dt.timedelta(minutes=3)),
        ("a", 4, base + dt.timedelta(minutes=4)),
        ("a", 5, base + dt.timedelta(minutes=61)),
        ("a", 6, base + dt.timedelta(minutes=62)),
        ("b", 7, base + dt.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(rows, "k string, id long, ts timestamp")
    out = rate_limit(df, "k", "ts", "id", k=2, window_seconds=3600)
    got = sorted((r.k, r.id) for r in out.collect())
    # earliest 2 of bucket 0, both of bucket 1, b untouched
    assert got == [("a", 1), ("a", 2), ("a", 5), ("a", 6), ("b", 7)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        rate_limit(df, "k", "ts", "id", k=0, window_seconds=3600)


def test_build_scd2_half_open_chain(spark):
    """build_scd2: per-key lead chain, NULL valid_to for the current
    version, deterministic tiebreak on equal times."""
    import datetime as dt

    from flink_1_8_sourcecode_spark.operators.joins import build_scd2

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k1", 1, t0), ("k1", 2, t0 + dt.timedelta(days=1)),
        ("k1", 3, t0 + dt.timedelta(days=1)),  # equal-time tie
        ("k2", 4, t0),
    ]
    df = spark.createDataFrame(rows, "k string, ver long, ts timestamp")
    out = {r.ver: (r.valid_from, r.valid_to) for r in
           build_scd2(df, ["k"], "ts", tiebreak=["ver"]).collect()}
    assert out[1] == (t0, t0 + dt.timedelta(days=1))
    assert out[2] == (t0 + dt.timedelta(days=1), t0 + dt.timedelta(days=1))
    assert out[3] == (t0 + dt.timedelta(days=1), None)  # current
    assert out[4] == (t0, None)


def test_canonicalize_url_rules(spark):
    """canonicalize_url: each rule individually + no-op on already-
    canonical and non-URL strings."""
    from flink_1_8_sourcecode_spark.operators.text import (
        canonicalize_url,
        url_domain,
    )

    from pyspark.sql import functions as F

    cases = [
        (1, "HTTP://Example.COM/A", "http://example.com/A"),          # host lower, path kept
        (2, "http://example.com:80/x", "http://example.com/x"),       # default port
        (3, "http://example.com/x#frag", "http://example.com/x"),     # fragment
        (4, "http://e.com/x?utm_source=a&q=1", "http://e.com/x?q=1"), # utm first
        (5, "http://e.com/x?q=1&utm_medium=b", "http://e.com/x?q=1"), # utm last
        (6, "http://e.com/x?utm_a=1&utm_b=2", "http://e.com/x"),      # only utm
        (7, "https://ok.org/path?q=2", "https://ok.org/path?q=2"),    # no-op
        (8, "no url here", "no url here"),                            # non-URL no-op
        (9, "HTTP://A.B:80", "http://a.b"),                           # bare authority + port
        # ADVICE r11 #2: >=2 consecutive utm params before a kept one
        (10, "http://e.com/x?utm_a=1&utm_b=2&x=3", "http://e.com/x?x=3"),
        (11, "http://e.com/x?utm_a=1&utm_b=2&utm_c=3&x=4&utm_d=5",
         "http://e.com/x?x=4"),
        # ADVICE r11 #3: :80 inside a query-param value must survive;
        # https default port is 443, so its :80 is real and kept
        (12, "http://a.com/r?next=http://b:80/x", "http://a.com/r?next=http://b:80/x"),
        (13, "HTTPS://A.B:80/p", "https://a.b:80/p"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id long, u string")
    got = {r.id: r.c for r in
           df.select("id", canonicalize_url(F.col("u")).alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    dom = df.select("id", url_domain(canonicalize_url(F.col("u"))).alias("d")).collect()
    doms = {r.id: r.d for r in dom}
    assert doms[1] == "example.com" and doms[9] == "a.b" and doms[8] == ""


class TestQualityClassifierTraining:
    """quality_classifier_train (operators/text.py): logistic regression
    fit in-engine — the model must actually SEPARATE the labeled classes
    (the r12 verdict's 'weak' finding: hash stand-in weights cannot)."""

    @staticmethod
    def _auc(scores_labels):
        """Exact AUC via rank-sum (ties get midranks)."""
        import numpy as np

        s = np.array([x[0] for x in scores_labels])
        y = np.array([x[1] for x in scores_labels])
        n1, n0 = int(y.sum()), int((1 - y).sum())
        if n1 == 0 or n0 == 0:
            return float("nan")
        order = np.argsort(s, kind="mergesort")
        ranks = np.empty(len(s))
        sorted_s = s[order]
        i = 0
        r = np.arange(1, len(s) + 1, dtype=float)
        while i < len(s):
            j = i
            while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
                j += 1
            r[i : j + 1] = (i + 1 + j + 1) / 2.0
            i = j + 1
        ranks[order] = r
        return float((ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))

    def _gopher_labeled(self, spark, sf):
        d = table(spark, sf, "documents")
        t = tx.tokens(F.col("text"))
        stop = F.array(*[F.lit(s) for s in tx.GOPHER_STOPWORDS])
        n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
        label = (F.size(t) > 0) & ((n_stop / F.size(t)) >= 0.02)
        return d.select("doc_id", "text", label.cast("int").alias("label"))

    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", SF_DIR])
    def test_fitted_model_separates_gopher_labels(self, spark, sf):
        labeled = self._gopher_labeled(spark, sf)
        w, b = tx.quality_classifier_train(labeled, "doc_id", "text", "label")
        scored = tx.quality_classifier_score(
            labeled, "doc_id", "text", weights=w, bias=b
        ).join(labeled.select("doc_id", "label"), "doc_id")
        pairs = [(r["score"], r["label"]) for r in scored.collect()]
        auc = self._auc(pairs)
        assert auc > 0.95, f"fitted model fails to rank quality: AUC={auc}"
        # the hash stand-in (weights=None) must NOT reach this bar —
        # proves the fit, not the features alone, carries the signal
        stand_in = tx.quality_classifier_score(labeled, "doc_id", "text").join(
            labeled.select("doc_id", "label"), "doc_id"
        )
        auc0 = self._auc([(r["score"], r["label"]) for r in stand_in.collect()])
        assert auc0 < 0.8, f"stand-in unexpectedly separates: AUC={auc0}"

    def test_train_separates_synthetic_vocab(self, spark):
        """Disjoint good/bad vocab: the fit must order every good doc
        above every bad doc (AUC == 1) and generalize to held-out docs
        made of the same vocab."""
        import random

        rng = random.Random(7)
        good_v = [f"fine{i}" for i in range(30)]
        bad_v = [f"junk{i}" for i in range(30)]
        rows = []
        for i in range(80):
            v = good_v if i % 2 == 0 else bad_v
            rows.append((i, " ".join(rng.choice(v) for _ in range(25)), i % 2 == 0))
        df = spark.createDataFrame(rows, "doc_id long, text string, good boolean")
        train = df.filter(F.col("doc_id") < 60).select(
            "doc_id", "text", F.col("good").cast("int").alias("label")
        )
        w, b = tx.quality_classifier_train(train, "doc_id", "text", "label")
        held = df.filter(F.col("doc_id") >= 60)
        scored = tx.quality_classifier_score(
            held, "doc_id", "text", weights=w, bias=b
        ).join(held.select("doc_id", "good"), "doc_id")
        pairs = [(r["score"], 1 if r["good"] else 0) for r in scored.collect()]
        assert self._auc(pairs) == 1.0
        # keep decision agrees with the labels on held-out docs
        for s, y in pairs:
            assert (s > 0.5) == bool(y), (s, y)

    def test_train_empty_input(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string, label int")
        w, b = tx.quality_classifier_train(df, "doc_id", "text", "label", n_iters=1)
        assert w == [0.0] * 4096 and b == 0.0


class TestCurateGate:
    """operators/pipeline.py:curate_gate — the stateless streaming
    curation gate (blocklist + bad-word ratio + classifier score)."""

    def _inputs(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "http://good.example.com/a", "the fast result and the fine answer"),
                (2, "http://blocked.example.com/b", "the fast result and the fine answer"),
                (3, "http://good.example.com/c", "slow slow slow slow pad"),
                (4, "http://good.example.com/d", ""),  # zero tokens
            ],
            "doc_id long, url string, text string",
        )
        blocked = spark.createDataFrame([("blocked.example.com",)], "domain string")
        return docs, blocked

    def test_gate_stages_batch(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import curate_gate

        docs, blocked = self._inputs(spark)
        # generous weights so every surviving doc passes the threshold:
        # isolate the blocklist/ratio/zero-token behavior
        out = curate_gate(
            docs, "url", "text", blocked, badwords=["slow"],
            max_badword_ratio=0.5, weights=[5.0] * 4096, bias=0.0,
        )
        kept = sorted(r.doc_id for r in out.collect())
        # doc 2 blocked by domain, doc 3 by ratio (4/5 > 0.5),
        # doc 4 scores 0.0 (zero tokens) — only doc 1 survives
        assert kept == [1]

    def test_stream_equals_batch(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.operators.pipeline import curate_gate

        docs, blocked = self._inputs(spark)
        weights = [((b * 2654435761) % 2**31) / 2**31 * 8 - 4 for b in range(64)]

        def gate(frame):
            return curate_gate(
                frame, "url", "text", blocked, badwords=["slow"],
                max_badword_ratio=0.5, weights=weights, bias=0.1,
                n_buckets=64,
            ).select("doc_id", "n_tokens", "score")

        expected = sorted(map(tuple, gate(docs).toPandas().values.tolist()))

        # replay the same docs as 2 micro-batches
        d = str(tmp_path / "cg_docs")
        docs.filter("doc_id <= 2").coalesce(1).write.mode("append").parquet(d)
        docs.filter("doc_id > 2").coalesce(1).write.mode("append").parquet(d)
        src = (
            spark.readStream.schema("doc_id long, url string, text string")
            .option("maxFilesPerTrigger", "1").parquet(d)
        )
        q = (
            gate(src).writeStream.format("memory").queryName("t_curate_gate")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(map(
            tuple, spark.table("t_curate_gate").toPandas().values.tolist()
        ))
        assert got == expected


class TestPsiDrift:
    """psi_drift (operators/pipeline.py): bucketize/histogram/PSI with
    deterministic Laplace smoothing; identical populations score ~0,
    disjoint ones score large; empty buckets contribute finitely."""

    def test_identical_populations_near_zero(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import psi_drift

        df = spark.createDataFrame(
            [(float(i % 10),) for i in range(1000)], "v double"
        )
        total = sum(
            r["psi_contrib"]
            for r in psi_drift(df, df, "v", [2.0, 4.0, 6.0, 8.0]).collect()
        )
        assert abs(total) < 1e-12

    def test_shifted_population_scores_high(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import psi_drift

        ref = spark.createDataFrame([(1.0,)] * 500, "v double")
        live = spark.createDataFrame([(9.0,)] * 500, "v double")
        rows = psi_drift(ref, live, "v", [2.0, 4.0, 6.0, 8.0]).collect()
        assert len(rows) == 5  # full bucket spine even where both empty
        assert sum(r["psi_contrib"] for r in rows) > 0.25

    def test_bucketize_semantics_and_guards(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import bucketize

        df = spark.createDataFrame(
            [(0.1,), (2.0,), (3.5,), (None,)], "v double"
        )
        got = [
            r["b"] for r in df.select(
                bucketize(F.col("v"), [1.0, 3.0]).alias("b")
            ).collect()
        ]
        assert got == [0, 1, 2, None]  # edges inclusive on the left
        import pytest as _pytest

        with _pytest.raises(ValueError, match="ascending"):
            bucketize(F.col("v"), [3.0, 1.0])
        with _pytest.raises(ValueError, match="ascending"):
            bucketize(F.col("v"), [])

    def test_broadcast_only_after_histograms(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import psi_drift

        df = spark.createDataFrame(
            [(float(i % 10),) for i in range(100)], "v double"
        )
        plan = (
            psi_drift(df, df, "v", [2.0, 5.0])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan  # spine/totals joins broadcast
