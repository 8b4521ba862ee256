"""Operator-level unit tests: multimodal plumbing, partitioning, shims —
things with no SQL oracle (physical ops) or stubbed kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.functions import scalar as fx
from flink_1_8_sourcecode_spark.operators import multimodal, partitioning
from tests.conftest import SF_DIR, SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    docs = table(spark, SF_SMALL, "documents")
    return multimodal.attach_fake_media(docs, "doc_id", "text")


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,content:binary,"
        "meta:struct<format:string,width:int,height:int,n_frames:int>>"
    )


def test_decode_features_deterministic(media):
    a = multimodal.decode_features(media).orderBy("media_id").limit(5).collect()
    b = multimodal.decode_features(media).orderBy("media_id").limit(5).collect()
    assert a == b
    assert all(0.0 <= r.mean_r <= 1.0 for r in a)


def test_decode_strict_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.decode_features(media, strict=True).limit(1).collect()


def test_resize_plan_bounds(media):
    out = multimodal.resize_plan(media, max_side=64)
    bad = out.filter((F.col("target_width") > 64) & (F.col("target_height") > 64)).count()
    assert bad == 0
    # aspect ratio preserved within rounding
    row = out.filter(F.col("meta.width") > 64).first()
    if row:
        orig = row.meta.width / row.meta.height
        new = row.target_width / row.target_height
        assert abs(orig - new) / orig < 0.1


def test_frame_sample(media):
    out = multimodal.frame_sample(media, every_nth=2)
    pdf = out.toPandas()
    assert (pdf.frame_idx % 2 == 0).all()
    # every media with n_frames>=1 contributes frame 0
    assert set(pdf.media_id) == set(media.select("media_id").toPandas().media_id)


def test_partition_by_hash_count(spark):
    li = table(spark, SF_SMALL, "lineitem")
    out = partitioning.partition_by_hash(li, ["l_orderkey"], 8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == li.count()


def test_partition_by_range_is_sorted_across(spark):
    o = table(spark, SF_SMALL, "orders")
    out = partitioning.partition_by_range(o.select("o_orderkey"), ["o_orderkey"], 4)
    parts = out.rdd.glom().collect()
    non_empty = [p for p in parts if p]
    maxes = [max(r.o_orderkey for r in p) for p in non_empty]
    mins = [min(r.o_orderkey for r in p) for p in non_empty]
    order = sorted(range(len(non_empty)), key=lambda i: mins[i])
    for a, b in zip(order, order[1:]):
        assert maxes[a] <= mins[b]


def test_sort_partition_local_order(spark):
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey")
    out = partitioning.sort_partition(partitioning.rebalance(li, 4), ["l_orderkey"])
    for part in out.rdd.glom().collect():
        keys = [r.l_orderkey for r in part]
        assert keys == sorted(keys)


def test_rescale_down(spark):
    li = table(spark, SF_SMALL, "lineitem")
    assert partitioning.rescale_down(li.repartition(8), 2).rdd.getNumPartitions() == 2


def test_similar_to_shim(spark):
    df = spark.createDataFrame([("abc",), ("axc",), ("abbbc",), ("zzz",)], ["s"])
    got = df.filter(fx.similar_to(F.col("s"), "a%c")).toPandas().s.tolist()
    assert got == ["abc", "axc", "abbbc"]
    got2 = df.filter(fx.similar_to(F.col("s"), "a_c")).toPandas().s.tolist()
    assert got2 == ["abc", "axc"]


def test_truncate_shim(spark):
    df = spark.createDataFrame([(3.749,), (-3.749,)], ["x"])
    got = df.select(fx.truncate(F.col("x"), 1).alias("t")).toPandas().t.tolist()
    assert got == [3.7, -3.7]


def test_element_shim(spark):
    df = spark.createDataFrame([([1],), ([1, 2],)], ["a"])
    import pandas as pd

    got = df.select(fx.element(F.col("a")).alias("e")).toPandas().e.tolist()
    assert got[0] == 1 and pd.isna(got[1])


class TestLshHotBucketCap:
    """Hot LSH buckets are star-linked (O(n) pairs) instead of expanded
    all-pairs (O(n^2)) — the 100 TB boilerplate-cluster guard."""

    def _docs(self, spark):
        hot = [(i, "common boilerplate header repeated verbatim in every page") for i in range(200)]
        normal = [
            (1000, "alpha beta gamma delta epsilon zeta eta theta"),
            (1001, "alpha beta gamma delta epsilon zeta eta iota"),
            (1002, "completely different text about something else entirely"),
        ]
        return spark.createDataFrame(hot + normal, "doc_id long, text string")

    def test_hot_bucket_bounded_and_connected(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import minhash_lsh_pairs

        df = self._docs(spark)
        pairs = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=64).toPandas()
        hot = pairs[(pairs.id_a < 1000) & (pairs.id_b < 1000)]
        # star pattern: every hot doc links to the anchor (min id), n-1 pairs
        assert len(hot) == 199
        assert set(hot.id_a) == {0}
        assert set(hot.id_b) == set(range(1, 200))

    def test_normal_buckets_unchanged_by_cap(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import minhash_lsh_pairs

        df = self._docs(spark)
        capped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=64).toPandas()
        uncapped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=None).toPandas()
        norm_c = {tuple(r) for r in capped[capped.id_a >= 1000].itertuples(index=False)}
        norm_u = {tuple(r) for r in uncapped[uncapped.id_a >= 1000].itertuples(index=False)}
        assert norm_c == norm_u
        # uncapped hot bucket explodes quadratically; capped stays linear
        assert len(uncapped[uncapped.id_b < 1000]) == 199 * 200 // 2
        assert len(capped[capped.id_b < 1000]) == 199


class TestDeltaIteration:
    """iterateDelta parity (DataSet.java:1206): only changed elements
    flow through the per-iteration shuffle."""

    def test_workset_shrinks_on_chain_graph(self, spark):
        from flink_1_8_sourcecode_spark.graph.graph import Graph

        n = 10
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        e = spark.createDataFrame(
            [(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, weight double"
        )
        sizes = []
        out = Graph(v, e).connected_components(
            max_iterations=20, on_progress=lambda i, c: sizes.append(c)
        ).toPandas()
        assert sorted(out.component.unique()) == [0]
        assert len(out) == n
        # the changed-vertex workset must shrink monotonically to empty —
        # the whole point of the workset optimization vs bulk iteration
        assert sizes[0] == n
        assert sizes[-1] == 0
        assert all(a > b for a, b in zip(sizes[1:], sizes[2:]))

    def test_delta_upsert_semantics(self, spark):
        from flink_1_8_sourcecode_spark.operators.iterations import iterate_delta

        sol = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, val string")
        ws = spark.createDataFrame([(1,), (3,)], "id int")

        def step(solution, workset, i):
            delta = (
                solution.join(workset, "id")
                .selectExpr("id", "concat(val, 'x') AS val")
            )
            return delta, workset.limit(0)

        out = iterate_delta(sol, ws, step, max_iterations=5, key="id").toPandas()
        got = dict(zip(out.id, out.val))
        assert got == {1: "ax", 2: "b", 3: "cx"}


def test_triangle_enumeration_known_graph(spark):
    """K4 has exactly 4 triangles; the pendant vertex adds none."""
    from flink_1_8_sourcecode_spark.graph.graph import Graph

    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = spark.createDataFrame(k4 + [(3, 4)], "src long, dst long")
    tri = Graph(v, e).triangle_enumeration().toPandas()
    got = sorted(map(tuple, tri.values))
    assert got == [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]


def test_decode_strict_uses_pil_when_available(spark):
    """strict=True runs a real Pillow decode when the library exists;
    the fallback NotImplementedError path is covered by
    test_decode_strict_raises."""
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    from flink_1_8_sourcecode_spark.operators.multimodal import decode_features

    buf = io.BytesIO()
    Image.new("RGB", (4, 4), color=(255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), ("image/png", 4, 4, 1))],
        "media_id long, content binary, meta struct<format: string, width: int, height: int, n_frames: int>",
    )
    out = decode_features(media, strict=True).toPandas()
    assert abs(out.iloc[0].mean_r - 1.0) < 1e-6
    assert out.iloc[0].mean_g == 0.0
    assert out.iloc[0].entropy == 0.0  # uniform image


def test_scatter_gather_iteration_max_propagation(spark):
    """User-programmable vertex-centric model (spargel/pregel parity):
    the classic propagate-the-max example written as three callbacks."""
    from flink_1_8_sourcecode_spark.graph.pregel import scatter_gather_iteration

    v = spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, val double")
    chain = [(i, i + 1) for i in range(5)] + [(i + 1, i) for i in range(5)]
    e = spark.createDataFrame(chain, "src long, dst long")
    out = scatter_gather_iteration(
        v, e,
        scatter=lambda joined, s: {"msg_val": F.col("src_val")},
        gather=lambda s: {"best": F.max("msg_val")},
        apply_fn=lambda joined, s: [
            "id", F.greatest(F.col("val"), F.coalesce(F.col("best"), F.col("val"))).alias("val")
        ],
        max_iterations=6,
    ).toPandas()
    assert (out.val == 5.0).all()


class TestSkewSaltedJoin:
    """Auto-skew salting: identical results to the plain join, hot keys
    detected by sampling and scattered across salt values (the
    max-task-time flattening claim, measured as max-rows-per-
    (key,salt)-group vs. the unsalted hot-key row count)."""

    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # key 1 owns 90% of rows; keys 2..50 share the rest
        rows = [(1, i) for i in range(9000)] + [
            (2 + i % 49, i) for i in range(1000)
        ]
        return spark.createDataFrame(rows, "k int, v int")

    @pytest.fixture(scope="class")
    def dim(self, spark):
        return spark.createDataFrame(
            [(i, f"name_{i}") for i in range(1, 51)], "k int, name string"
        )

    def test_results_equal_plain_join(self, spark, skewed, dim):
        got = partitioning.skew_salted_join(skewed, dim, on="k")
        plain = skewed.join(dim, "k")
        assert got.count() == plain.count() == 10000
        assert got.exceptAll(plain).count() == 0
        assert plain.exceptAll(got).count() == 0

    def test_left_join_keeps_unmatched(self, spark, skewed, dim):
        small_dim = dim.filter(F.col("k") > 1)  # hot key 1 unmatched
        got = partitioning.skew_salted_join(skewed, small_dim, on="k", how="left")
        plain = skewed.join(small_dim, "k", "left")
        assert got.count() == plain.count()
        assert got.filter(F.col("name").isNull()).count() == 9000

    def test_hot_key_detected_and_scattered(self, spark, skewed):
        hot = partitioning.detect_hot_keys(skewed, "k", sample_fraction=0.5)
        rows = {r["k"]: r["__factor"] for r in hot.collect()}
        assert 1 in rows and rows[1] >= 2, "the 90% key must be hot"
        assert all(k == 1 for k in rows), f"cold keys flagged hot: {rows}"

    def test_max_group_flattens(self, spark, skewed, dim):
        # after salting, no (key, salt) group may own the hot key whole
        hot = partitioning.detect_hot_keys(skewed, "k", sample_fraction=0.5)
        lf = skewed.join(F.broadcast(hot), "k", "left").withColumn(
            "__salt",
            F.when(F.col("__factor").isNull(), F.lit(0)).otherwise(
                (F.rand(seed=42) * F.col("__factor")).cast("int")
            ),
        )
        per_group = lf.groupBy("k", "__salt").count()
        hot_max = per_group.filter(F.col("k") == 1).agg(F.max("count")).first()[0]
        n_slices = per_group.filter(F.col("k") == 1).count()
        assert n_slices >= 2
        assert hot_max <= 9000 * 0.8, "hot key not flattened"

    def test_right_full_rejected(self, spark, skewed, dim):
        with pytest.raises(ValueError, match="inner/left"):
            partitioning.skew_salted_join(skewed, dim, on="k", how="full")


def test_dedup_clusters_transitive_closure(spark):
    from flink_1_8_sourcecode_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2, pair 5-6, singletons 3,4,7; edge direction mixed on
    # purpose — closure must be undirected
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.is_keeper)
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True),
        5: (5, True), 6: (5, False), 7: (7, True),
    }


class TestAlternatingCC:
    """Large-star/small-star CC (Kiveris et al.): same answer as min-id
    propagation, but O(log n) rounds instead of O(diameter) supersteps."""

    def test_agrees_with_delta_iteration_on_random_graphs(self, spark):
        import random

        from flink_1_8_sourcecode_spark.graph.graph import Graph

        rng = random.Random(3)
        n = 120
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
        e = spark.createDataFrame(edges, "src long, dst long")
        g = Graph(v, e)
        a = {r.id: r.component for r in g.connected_components(max_iterations=40).collect()}
        b = {r.id: r.component for r in g.connected_components_alternating().collect()}
        assert a == b

    def test_log_rounds_on_long_chain(self, spark):
        from flink_1_8_sourcecode_spark.graph.graph import Graph

        n = 256  # chain diameter 255: propagation would need ~255 supersteps
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        rounds = []
        out = Graph(v, e).connected_components_alternating(
            on_progress=lambda i, c: rounds.append(c)
        ).toPandas()
        assert (out.component == 0).all() and len(out) == n
        assert len(rounds) <= 10, f"expected O(log n) rounds, took {len(rounds)}"

    def test_max_rounds_exhausted_falls_back_exactly(self, spark):
        """If the star fixed point is not reached within max_rounds, a
        groupBy-min over the residual would be silently wrong (residual
        {(1,0),(2,1)} labels 2 as 1); the operator must instead finish
        with min-id propagation on the residual and stay exact."""
        from flink_1_8_sourcecode_spark.graph.graph import Graph

        n = 200  # long chain, forced premature stop
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "src long, dst long"
        )
        out = Graph(v, e).connected_components_alternating(max_rounds=3).toPandas()
        assert len(out) == n
        assert (out.component == 0).all(), (
            out[out.component != 0].head()
        )


class TestIvfRecallProperty:
    """ivf_topk is oracle-checked for determinism elsewhere; this pins
    its QUALITY claim: recall@k vs the exact cosine_topk ground truth is
    high on clustered data, monotone in nprobe (probe sets are nested),
    and exact once every cluster is probed."""

    def test_recall_monotone_in_nprobe_and_exact_at_full_probe(self, spark):
        import numpy as np

        from flink_1_8_sourcecode_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        rng = np.random.default_rng(11)
        n_clusters, dim, per = 8, 12, 40
        centers = rng.normal(size=(n_clusters, dim)) * 5.0
        rows, vid = [], 0
        for c in range(n_clusters):
            for p in centers[c] + rng.normal(size=(per, dim)):
                rows.append((vid, c, [float(x) for x in p]))
                vid += 1
        corpus = spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<double>"
        )
        queries = corpus.filter(F.col("vec_id") % 37 == 0)  # 9 spread queries

        gt = cosine_topk(corpus, queries, "vec_id", "embedding", "vec_id", k=5).toPandas()
        gt_sets = {q: set(g.neighbor_id) for q, g in gt.groupby("query_id")}

        recalls = []
        for nprobe in (1, 2, 4, 8):
            got = ivf_topk(
                corpus, queries, "vec_id", "embedding", "vec_id",
                cluster_col="label", k=5, nprobe=nprobe,
            ).toPandas()
            got_sets = {q: set(g.neighbor_id) for q, g in got.groupby("query_id")}
            recalls.append(
                float(np.mean([
                    len(gt_sets[q] & got_sets.get(q, set())) / len(gt_sets[q])
                    for q in gt_sets
                ]))
            )
        assert recalls[-1] == 1.0, recalls  # nprobe = #clusters => exact
        assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
        assert recalls[0] >= 0.5, recalls  # blobby corpus: 1 probe catches most


class TestIvfTrain:
    """ivf_train = deterministic Lloyd k-means over DataFrames: the
    coarse quantizer for ivf_topk when no cluster column exists."""

    def _blobs(self, spark, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(6, 10)) * 8.0
        rows, vid = [], 0
        for c in range(6):
            for p in centers[c] + rng.normal(size=(30, 10)):
                rows.append((vid, [float(x) for x in p]))
                vid += 1
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_deterministic_and_nearest_centroid_invariant(self, spark):
        import numpy as np

        from flink_1_8_sourcecode_spark.operators.similarity import ivf_train

        corpus = self._blobs(spark)
        a = ivf_train(corpus, "vec_id", "embedding", k=6, iterations=4).toPandas()
        b = ivf_train(corpus, "vec_id", "embedding", k=6, iterations=4).toPandas()
        pa_ = a.sort_values("vec_id").reset_index(drop=True)
        pb_ = b.sort_values("vec_id").reset_index(drop=True)
        assert (pa_.cluster == pb_.cluster).all()  # no RNG state anywhere

        # every point sits with its nearest final centroid (Lloyd invariant)
        vecs = {r.vec_id: np.array(r.embedding) for r in corpus.collect()}
        assign = dict(zip(pa_.vec_id, pa_.cluster))
        cents = {}
        for cl in set(assign.values()):
            members = [vecs[i] for i, c in assign.items() if c == cl]
            cents[cl] = np.mean(members, axis=0)
        # recompute one more assignment step by hand: with 4 iterations on
        # well-separated blobs the assignment is stable, so nearest final
        # centroid == recorded cluster
        for i, v in vecs.items():
            d = {cl: float(((v - c) ** 2).sum()) for cl, c in cents.items()}
            nearest = min(d, key=lambda cl: (d[cl], cl))
            assert nearest == assign[i], (i, d)

    def test_trained_clusters_give_high_recall(self, spark):
        import numpy as np

        from flink_1_8_sourcecode_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
            ivf_train,
        )

        corpus = self._blobs(spark)
        assign = ivf_train(corpus, "vec_id", "embedding", k=6, iterations=4)
        clustered = corpus.join(assign, "vec_id")
        queries = corpus.filter(F.col("vec_id") % 29 == 0)
        gt = cosine_topk(corpus, queries, "vec_id", "embedding", "vec_id", k=5).toPandas()
        got = ivf_topk(
            clustered, queries, "vec_id", "embedding", "vec_id",
            cluster_col="cluster", k=5, nprobe=2,
        ).toPandas()
        gt_sets = {q: set(g.neighbor_id) for q, g in gt.groupby("query_id")}
        got_sets = {q: set(g.neighbor_id) for q, g in got.groupby("query_id")}
        recall = float(np.mean([
            len(gt_sets[q] & got_sets.get(q, set())) / len(gt_sets[q]) for q in gt_sets
        ]))
        assert recall >= 0.8, recall


class TestTrainingDataFilters:
    """Published LLM-corpus pre-filters: Gopher repetition signals and
    GPT-3-style n-gram decontamination."""

    def test_repetition_stats_known_docs(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import repetition_stats

        docs = spark.createDataFrame(
            [
                (1, "menu\nmenu\nmenu\nabout us"),        # 3/4 lines duplicate
                (2, "one two one two one two"),            # top 2-gram dominates
                (3, "all words differ here entirely"),     # clean
                (4, ""),                                   # empty
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in repetition_stats(docs, "doc_id", "text").collect()}
        assert got[1].n_lines == 4 and abs(got[1].dup_line_frac - 0.5) < 1e-9
        # doc 2 grams: [one two, two one, one two, two one, one two] -> 3/5
        assert abs(got[2].top_ngram_share - 0.6) < 1e-9
        assert got[3].dup_line_frac == 0.0
        assert got[3].top_ngram_share < 0.5
        assert got[4].n_lines == 0 and got[4].top_ngram_share == 0.0

    def test_decontaminate_flags_overlaps_and_broadcasts(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import decontaminate

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [
                (1, "he said the quick brown fox jumps away fast"),  # 5-gram overlap
                (2, "a completely unrelated training document text here"),
                (3, "quick brown fox jumps over"),                    # exact 5-gram
            ],
            "doc_id long, text string",
        )
        out = decontaminate(docs, bench, "doc_id", "text", n=5)
        got = {r.doc_id: r.contaminated for r in out.collect()}
        assert got == {1: True, 2: False, 3: True}
        # the benchmark gram table must reach the join as a broadcast —
        # the corpus side never shuffles for it
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_decode_strict_runs_builtin_ppm_codec(spark):
    """The REAL codec path executes with no image library present:
    deterministic P6 images round-trip encode -> Arrow batch ->
    _ppm_decode, and the channel stats match numpy ground truth."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        decode_features,
        encode_ppm,
    )

    rows = []
    truth = {}
    for i in range(5):
        rng = np.random.default_rng(seed=i)
        px = rng.integers(0, 256, size=(8 + i, 6 + i, 3), dtype=np.uint8)
        rows.append((i, bytearray(encode_ppm(px)), ("image/ppm", px.shape[1], px.shape[0], 1)))
        n = px.shape[0] * px.shape[1]
        hist = np.bincount(px[:, :, 0].ravel(), minlength=256)
        p = hist[hist > 0] / n
        truth[i] = (
            px[:, :, 0].mean() / 255.0,
            px[:, :, 1].mean() / 255.0,
            px[:, :, 2].mean() / 255.0,
            float(-(p * np.log2(p)).sum() / 8.0),
        )
    media = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<format: string, width: int, height: int, n_frames: int>",
    )
    out = decode_features(media, strict=True).toPandas().set_index("media_id")
    assert len(out) == 5
    for i, (r, g, b, e) in truth.items():
        row = out.loc[i]
        assert abs(row.mean_r - r) < 1e-12
        assert abs(row.mean_g - g) < 1e-12
        assert abs(row.mean_b - b) < 1e-12
        assert abs(row.entropy - e) < 1e-12


def test_ppm_decoder_handles_comments_and_rejects_garbage(spark):
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import _ppm_decode

    px = np.zeros((2, 3, 3), dtype=np.uint8)
    px[:, :, 0] = 200
    with_comment = b"P6\n# a netpbm comment\n3 2\n255\n" + px.tobytes()
    d = _ppm_decode(with_comment)
    assert abs(d["mean_r"] - 200 / 255.0) < 1e-12
    assert d["mean_g"] == 0.0 and d["entropy"] == 0.0
    with pytest.raises(ValueError):
        _ppm_decode(b"JFIF not a ppm")


def test_reliable_checkpoint_knob(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation from localCheckpoint
    to reliable checkpoints: identical results, and checkpoint files
    actually land in the directory (the fault-tolerance contract a
    100 TB iterative run needs)."""
    import os

    from flink_1_8_sourcecode_spark.operators.iterations import iterate, iterate_delta
    from flink_1_8_sourcecode_spark.operators.partitioning import zip_with_index
    from flink_1_8_sourcecode_spark.operators.similarity import ivf_train

    ckdir = str(tmp_path / "reliable_ck")

    def files_under(d):
        return sum(len(fns) for _dp, _dn, fns in os.walk(d))

    # iterate: double a counter 4 times, checkpointing every step
    init = spark.createDataFrame([(1,)], "x long")
    out = iterate(
        init, lambda df, i: df.selectExpr("x * 2 AS x"),
        max_iterations=4, checkpoint_every=1, checkpoint_dir=ckdir,
    ).first()["x"]
    assert out == 16
    assert files_under(ckdir) > 0, "reliable checkpoint wrote nothing"

    # iterate_delta: same answer both ways
    sol = spark.createDataFrame([(1, "a"), (2, "b")], "id int, val string")
    ws = spark.createDataFrame([(1,)], "id int")

    def step(solution, workset, i):
        delta = solution.join(workset, "id").selectExpr("id", "concat(val, 'x') AS val")
        return delta, workset.limit(0)

    got = iterate_delta(
        sol, ws, step, max_iterations=3, key="id",
        checkpoint_every=1, checkpoint_dir=ckdir,
    ).toPandas()
    assert dict(zip(got.id, got.val)) == {1: "ax", 2: "b"}

    # ivf_train + zip_with_index run the reliable path end-to-end and
    # agree with the local path
    emb = table(spark, SF_DIR, "embeddings").limit(60)
    a = ivf_train(emb, "vec_id", "embedding", k=4, iterations=2).toPandas()
    b = ivf_train(
        emb, "vec_id", "embedding", k=4, iterations=2, checkpoint_dir=ckdir
    ).toPandas()
    assert dict(zip(a.vec_id, a.cluster)) == dict(zip(b.vec_id, b.cluster))

    d = table(spark, SF_DIR, "documents")
    ix_local = zip_with_index(d, ["doc_id"], n_partitions=4).toPandas()
    ix_rel = zip_with_index(
        d, ["doc_id"], n_partitions=4, checkpoint_dir=ckdir
    ).toPandas()
    assert dict(zip(ix_local.doc_id, ix_local["index"])) == dict(
        zip(ix_rel.doc_id, ix_rel["index"])
    )


def test_pq_codes_shape_determinism_and_duplicate_retrieval(spark):
    """PQ invariants: codes are m values in [0, k); training is
    deterministic (same codes on re-run); an exact duplicate vector has
    identical codes, hence ADC distance == the minimum over the corpus
    — the planted duplicate must come back at rank 1."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.similarity import pq_topk_adc, pq_train

    rng = np.random.default_rng(3)
    base = rng.normal(size=(120, 16))
    # ids 1000+i duplicate ids 0..19 exactly
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    rows += [(1000 + i, [float(x) for x in base[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    codes, cb = pq_train(df, "vec_id", "embedding", m=4, k=8, iterations=2)
    pdf = codes.toPandas()
    assert len(pdf) == 140
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in pdf.codes)
    again = pq_train(df, "vec_id", "embedding", m=4, k=8, iterations=2)[0].toPandas()
    assert {r.vec_id: list(r.codes) for r in pdf.itertuples()} == {
        r.vec_id: list(r.codes) for r in again.itertuples()
    }

    by_id = {r.vec_id: tuple(r.codes) for r in pdf.itertuples()}
    for i in range(20):
        assert by_id[i] == by_id[1000 + i], "duplicates must share codes"

    q = df.filter(F.col("vec_id") >= 1000)
    top = pq_topk_adc(codes, cb, q, "vec_id", "embedding", "vec_id", k=3).toPandas()
    r1 = top[top["rank"] == 1].set_index("query_id")
    for i in range(20):
        row = r1.loc[1000 + i]
        # the duplicate's ADC distance is the corpus minimum (identical
        # codes); rank-1 is the original unless another vector shares
        # the same codes AND a smaller id — then dist still ties at min
        assert row["adc_dist"] <= top[top.query_id == 1000 + i]["adc_dist"].min() + 1e-12
        assert by_id[int(row["neighbor_id"])] == by_id[1000 + i]


def test_wav_audio_features_ground_truth(spark):
    """The built-in RIFF/WAVE parser is a REAL codec: a synthesized
    sine's RMS is amplitude/sqrt(2), duration and rate parse exactly,
    stereo interleave counts frames (not raw samples), and non-WAV
    payloads raise readably."""
    import math

    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        _wav_decode,
        audio_features,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    stereo = np.empty(2 * rate)
    stereo[0::2] = sine
    stereo[1::2] = sine
    rows = [
        (1, bytearray(encode_wav(sine, rate))),
        (2, bytearray(encode_wav(stereo, rate, n_channels=2))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    for mid, ch in ((1, 1), (2, 2)):
        r = got[mid]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (rate, ch, rate)
        assert abs(r["duration_s"] - 1.0) < 1e-9
        assert abs(r["rms"] - 0.5 / math.sqrt(2)) < 1e-3
        assert abs(r["peak"] - 0.5) < 1e-3

    with pytest.raises(ValueError, match="RIFF"):
        _wav_decode(b"not audio")


def test_partition_custom_exact_placement(spark):
    """DataSet.partitionCustom parity: every row lands in EXACTLY the
    partition the user function chose for its key (not a hash), and a
    partitioner that points outside [0, n) fails loudly."""
    from flink_1_8_sourcecode_spark.operators.partitioning import partition_custom

    df = spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k long, v string")
    out = partition_custom(df, lambda k: int(k) % 3, "k", n=3)
    placed = out.select("k", F.spark_partition_id().alias("p")).collect()
    assert len(placed) == 40
    for r in placed:
        assert r["p"] == r["k"] % 3, r

    import pytest as _pytest

    with _pytest.raises(Exception, match="not in"):
        partition_custom(df, lambda k: 99, "k", n=3).collect()


class TestSemanticDedup:
    """SemDeDup invariants (operators/dedup.py:semantic_dedup)."""

    def _emb(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        # two tight bundles + noise: bundles are near-dups of each other
        rows = []
        for i in range(40):
            base = np.zeros(8)
            if i % 3 == 0:
                base[0] = 1.0  # bundle A: same direction -> cosine ~1
            elif i % 3 == 1:
                base[1] = 1.0  # bundle B
            else:
                base = rng.normal(size=8)  # noise
            v = base + rng.normal(scale=0.01, size=8)
            rows.append((i, [float(x) for x in v]))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_drop_rule_invariants(self, spark):
        import numpy as np
        import pandas as pd

        from flink_1_8_sourcecode_spark.operators.dedup import semantic_dedup

        emb = self._emb(spark)
        t = 0.95
        kept = semantic_dedup(emb, "vec_id", "embedding", threshold=t, k=4,
                              iterations=3).toPandas()
        # recompute clusters+cosines locally for the invariant check
        from flink_1_8_sourcecode_spark.operators.similarity import ivf_train
        assign = ivf_train(emb, "vec_id", "embedding", k=4, iterations=3).toPandas()
        full = emb.toPandas().merge(assign, on="vec_id")
        kept_ids = set(kept.vec_id)
        for cl, g in full.groupby("cluster"):
            g = g.sort_values("vec_id").reset_index(drop=True)
            x = np.asarray(g["embedding"].tolist())
            xn = x / np.linalg.norm(x, axis=1)[:, None]
            s = xn @ xn.T
            ids = g["vec_id"].tolist()
            # lowest id of every cluster is always kept
            assert ids[0] in kept_ids
            for i, xid in enumerate(ids):
                has_smaller_nn = any(s[i, j] > t for j in range(i))
                assert (xid not in kept_ids) == has_smaller_nn, (cl, xid)

    def test_threshold_extremes(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import semantic_dedup

        emb = self._emb(spark)
        all_kept = semantic_dedup(emb, "vec_id", "embedding", threshold=1.1,
                                  k=4, iterations=2).toPandas()
        assert len(all_kept) == 40  # nothing exceeds cosine 1.1
        one_per_cluster = semantic_dedup(emb, "vec_id", "embedding",
                                         threshold=-1.1, k=4,
                                         iterations=2).toPandas()
        # cos > -1.1 always: only each cluster's lowest id survives
        assert len(one_per_cluster) == one_per_cluster.cluster.nunique()


class TestRepeatedSpansHashPrepass:
    """The hash pre-pass must be a pure execution-strategy choice:
    identical (span, occ, ndocs) output to the direct string path."""

    def _docs(self, spark):
        rep = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (1, rep + " first tail words here"),
            (2, rep + " second tail entirely different ending tokens"),
            (3, "short doc"),  # < n tokens: zero windows
            (4, "x " * 30 + "y"),  # within-doc repetition of one token window
            (5, "unique sentence with no overlap whatsoever in this corpus at all ok"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_parity_with_direct_path(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import repeated_ngram_spans

        d = self._docs(spark)
        for n, mc in ((10, 2), (3, 2), (3, 3)):
            fast = repeated_ngram_spans(d, "doc_id", "text", n=n, min_count=mc)
            slow = repeated_ngram_spans(
                d, "doc_id", "text", n=n, min_count=mc, hash_prepass=False
            )
            got = sorted(map(tuple, fast.collect()))
            want = sorted(map(tuple, slow.collect()))
            assert got == want, (n, mc, got, want)
        # sanity: the shared prefix actually repeats across docs 1 and 2
        out = dict(
            (r["span"], (r["occ"], r["ndocs"]))
            for r in repeated_ngram_spans(d, "doc_id", "text", n=10, min_count=2).collect()
        )
        assert any(v[1] == 2 for v in out.values())


class TestDecontaminateFuzzy:
    """MinHash-LSH cross-set decontamination: catches lightly-edited
    eval leakage exact n-gram overlap misses; benchmark side broadcasts."""

    def _corpora(self, spark):
        bench = spark.createDataFrame(
            [(1, "the capital of france is paris and the capital of italy is rome ok")],
            "qid long, text string",
        )
        train = spark.createDataFrame(
            [
                # near-copy: one token changed mid-sentence
                (10, "the capital of france is paris and the capital of spain is rome ok"),
                (11, "completely unrelated document about distributed query engines"),
                # exact copy
                (12, "the capital of france is paris and the capital of italy is rome ok"),
            ],
            "doc_id long, text string",
        )
        return train, bench

    def test_flags_near_and_exact_copies_only(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import decontaminate_fuzzy

        train, bench = self._corpora(spark)
        out = decontaminate_fuzzy(train, bench, "doc_id", "text")
        got = {r["doc_id"]: r["contaminated_fuzzy"] for r in out.collect()}
        assert got == {10: True, 11: False, 12: True}

    def test_benchmark_band_side_broadcasts(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import decontaminate_fuzzy

        train, bench = self._corpora(spark)
        out = decontaminate_fuzzy(train, bench, "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:1500]

    def test_multi_doc_benchmark_signatures_not_pooled(self, spark):
        """Two benchmark docs must produce two signatures: a train doc
        matching neither individual doc but sharing tokens with both
        stays clean (a pooled min over the union could hash-collide
        bands it shouldn't)."""
        from flink_1_8_sourcecode_spark.operators.dedup import decontaminate_fuzzy

        bench = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (2, "one two three four five six seven eight nine ten eleven"),
            ],
            "qid long, text string",
        )
        train = spark.createDataFrame(
            [
                (20, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (21, "alpha two gamma four epsilon six eta eight iota ten mixed"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["contaminated_fuzzy"]
            for r in decontaminate_fuzzy(train, bench, "doc_id", "text").collect()
        }
        assert got[20] is True and got[21] is False


class TestRepeatedSpanIntervals:
    """Gaps-and-islands merge of repeated windows into maximal intervals,
    and the strip action that removes covered tokens."""

    def test_overlapping_windows_merge_to_one_interval(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import repeated_span_intervals

        rep = " ".join(f"w{i}" for i in range(12))  # 12-token shared prefix
        d = spark.createDataFrame(
            [(1, rep + " t1 one"), (2, rep + " t2 two different")],
            "doc_id long, text string",
        )
        iv = repeated_span_intervals(d, "doc_id", "text", n=10, min_count=2)
        rows = {(r["doc_id"], r["start_tok"], r["end_tok"]): r["span"] for r in iv.collect()}
        assert set(rows) == {(1, 1, 12), (2, 1, 12)}
        assert all(v == rep for v in rows.values())

    def test_touching_but_disjoint_repeats_stay_separate(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import repeated_span_intervals

        a = " ".join(f"a{i}" for i in range(3))
        b = " ".join(f"b{i}" for i in range(3))
        # doc 1 has A immediately followed by B (touching, not overlapping);
        # docs 2/3 repeat A and B separately so only the 3-gram windows
        # inside A and inside B survive
        d = spark.createDataFrame(
            [(1, f"{a} {b} tail x y"), (2, a + " mid1 mid2 q"), (3, b + " mid3 mid4 r")],
            "doc_id long, text string",
        )
        iv = repeated_span_intervals(d, "doc_id", "text", n=3, min_count=2)
        doc1 = sorted(
            (r["start_tok"], r["end_tok"]) for r in iv.collect() if r["doc_id"] == 1
        )
        assert doc1 == [(1, 3), (4, 6)], doc1

    def test_strip_keeps_unrepeated_docs_verbatim_tokens(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import strip_repeated_spans

        rep = " ".join(f"w{i}" for i in range(10))
        d = spark.createDataFrame(
            [(1, rep + " keepA keepB"), (2, rep + " keepC"), (3, "no repeats here at all")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["clean_text"] for r in
               strip_repeated_spans(d, "doc_id", "text", n=10, min_count=2).collect()}
        # reconstruction happens downstream of tokens(), which lowercases
        assert got == {1: "keepa keepb", 2: "keepc", 3: "no repeats here at all"}


class TestRepeatedCharSpans:
    """Character-granularity exact-substring dedup (Lee et al. 2021's
    actual >= 50-char criterion) vs the 10-token-window approximation."""

    def test_catches_sub_10_token_repeat_token_windows_miss(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import (
            repeated_char_spans,
            repeated_ngram_spans,
        )

        # 3 tokens, 110 chars: a >= 50-char repeat with FEWER than 10
        # tokens — never forms a 10-token window, always forms 50-char
        # windows.
        rep = (
            "supercalifragilisticexpialidocious"
            " pneumonoultramicroscopicsilicovolcanoconiosis"
            " floccinaucinihilipilification"
        )
        assert len(rep) >= 50 and len(rep.split()) < 10
        d = spark.createDataFrame(
            [(1, rep + " tail one"), (2, rep + " other tail"), (3, "unrelated")],
            "doc_id long, text string",
        )
        token_hits = repeated_ngram_spans(d, "doc_id", "text", n=10, min_count=2)
        assert token_hits.count() == 0
        char_hits = repeated_char_spans(d, "doc_id", "text", n=50, min_count=2)
        rows = char_hits.collect()
        assert len(rows) > 0
        assert all(len(r["span"]) == 50 and r["occ"] >= 2 for r in rows)
        assert any(r["ndocs"] == 2 for r in rows)

    def test_short_and_unique_docs_produce_nothing(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import repeated_char_spans

        d = spark.createDataFrame(
            [(1, "short"), (2, "x" * 49), (3, "a" * 60), (4, "b" * 60)],
            "doc_id long, text string",
        )
        # docs 3/4 are 60-char runs of DIFFERENT chars: no cross-doc
        # repeat, but each has 11 identical windows WITHIN itself
        out = {r["span"]: r["occ"] for r in
               repeated_char_spans(d, "doc_id", "text", n=50, min_count=2).collect()}
        assert out == {"a" * 50: 11, "b" * 50: 11}

    def test_intervals_merge_to_maximal_char_repeat(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import (
            repeated_char_span_intervals,
        )

        rep = "0123456789" * 7  # 70-char shared prefix
        d = spark.createDataFrame(
            [(1, rep + " then unique tail alpha"), (2, rep + " and another beta")],
            "doc_id long, text string",
        )
        iv = repeated_char_span_intervals(d, "doc_id", "text", n=50, min_count=2)
        rows = {(r["doc_id"], r["start_char"], r["end_char"]): r["span"]
                for r in iv.collect()}
        # the shared region extends past the literal prefix by the one
        # following space both docs share (70+1 chars), then diverges
        assert set(rows) == {(1, 1, 71), (2, 1, 71)}
        assert all(v == rep + " " for v in rows.values())


class TestConnectedComponentsJump:
    """Pointer-jumping CC: same fixed point as the delta iteration in
    O(log d) rounds."""

    def test_matches_delta_on_random_graph(self, spark):
        import random

        from flink_1_8_sourcecode_spark.graph.graph import Graph

        rng = random.Random(11)
        n = 140
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        e = spark.createDataFrame(
            [(rng.randrange(n), rng.randrange(n)) for _ in range(100)],
            "src long, dst long",
        )
        g = Graph(v, e)
        a = {r.id: r.component for r in g.connected_components(max_iterations=60).collect()}
        b = {r.id: r.component for r in g.connected_components_jump().collect()}
        assert a == b

    def test_long_chain_converges_in_log_rounds(self, spark):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.graph.graph import Graph

        n = 64  # diameter 63: delta needs 63 supersteps, jump must not
        v = spark.range(n).select("id")
        e = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        out = Graph(v, e).connected_components_jump(max_iterations=10).collect()
        assert {r.component for r in out} == {0} and len(out) == n

    def test_isolated_vertices_keep_own_label(self, spark):
        from flink_1_8_sourcecode_spark.graph.graph import Graph

        v = spark.createDataFrame([(1,), (2,), (9,)], "id long")
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        got = {r.id: r.component for r in Graph(v, e).connected_components_jump().collect()}
        assert got == {1: 1, 2: 1, 9: 9}


class TestNNDescent:
    """NN-Descent k-NN graph (Dong et al. 2011): recall floor vs exact
    brute force, determinism, degenerate inputs."""

    def test_recall_floor_and_determinism(self, spark):
        from flink_1_8_sourcecode_spark.operators.similarity import (
            cosine_topk,
            nn_descent_knn_graph,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        # registry config (sim_knn_graph): k=10, default build_factor 2.0.
        # Recall is k-sensitive — k=5 at the default over-build lands
        # ~0.85 (raise build_factor to 3.0 for fine-k uses)
        k = 10
        g1 = nn_descent_knn_graph(
            emb, "vec_id", "embedding", k=k, max_iterations=6
        ).collect()
        exact = cosine_topk(emb, emb, "vec_id", "embedding", "vec_id", k=k).collect()
        approx = {(r["vec_id"], r["neighbor_id"]) for r in g1}
        truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
        recall = len(approx & truth) / len(truth)
        assert recall >= 0.9, f"recall {recall:.3f} below floor"
        # every node has exactly k ranked neighbors, no self loops
        assert len(g1) == emb.count() * k
        assert all(r["vec_id"] != r["neighbor_id"] for r in g1)
        g2 = nn_descent_knn_graph(
            emb, "vec_id", "embedding", k=k, max_iterations=6
        ).collect()
        assert approx == {(r["vec_id"], r["neighbor_id"]) for r in g2}

    def test_tiny_corpus_is_exact(self, spark):
        """With cap >= N the candidate join covers every pair after one
        round — the descent must land on the exact graph."""
        from flink_1_8_sourcecode_spark.operators.similarity import (
            cosine_topk,
            nn_descent_knn_graph,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(12)
        g = nn_descent_knn_graph(emb, "vec_id", "embedding", k=3, max_iterations=4)
        exact = cosine_topk(emb, emb, "vec_id", "embedding", "vec_id", k=3)
        assert {(r["vec_id"], r["neighbor_id"]) for r in g.collect()} == {
            (r["query_id"], r["neighbor_id"]) for r in exact.collect()
        }

    def test_single_point_empty_graph(self, spark):
        from flink_1_8_sourcecode_spark.operators.similarity import (
            nn_descent_knn_graph,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(1)
        assert nn_descent_knn_graph(emb, "vec_id", "embedding", k=3).count() == 0


class TestKnnGraphSearch:
    """Beam search over the k-NN graph: the graph-ANN query path."""

    @pytest.fixture(scope="class")
    def graph_and_emb(self, spark):
        from flink_1_8_sourcecode_spark.operators.similarity import (
            nn_descent_knn_graph,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        g = nn_descent_knn_graph(emb, "vec_id", "embedding", k=10, max_iterations=6)
        return g.localCheckpoint(eager=True), emb

    def test_high_recall_and_no_self_matches(self, spark, graph_and_emb):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.operators.similarity import (
            cosine_topk,
            knn_graph_search,
        )

        g, emb = graph_and_emb
        q = emb.filter(F.col("vec_id") < 8)
        res = knn_graph_search(g, emb, q, "vec_id", "embedding", "vec_id", k=10).collect()
        assert all(r["query_id"] != r["neighbor_id"] for r in res)
        got = {(r["query_id"], r["neighbor_id"]) for r in res}
        exact = cosine_topk(emb, q, "vec_id", "embedding", "vec_id", k=10).collect()
        truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, recall

    def test_deterministic(self, spark, graph_and_emb):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.operators.similarity import knn_graph_search

        g, emb = graph_and_emb
        q = emb.filter(F.col("vec_id") < 3)
        a = knn_graph_search(g, emb, q, "vec_id", "embedding", "vec_id", k=5).collect()
        b = knn_graph_search(g, emb, q, "vec_id", "embedding", "vec_id", k=5).collect()
        assert {tuple(r) for r in a} == {tuple(r) for r in b}
        # exactly k ranked answers per query
        assert len(a) == 3 * 5


def test_resize_image_stats_nn_rule(spark):
    """NN resize picks src = floor(dst*src/target): identity at
    target == src dims; known pixel subset at target = src/2."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        resize_image_stats,
    )

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px)))], "media_id long, content binary"
    )
    full = resize_image_stats(df, target_side=4).collect()[0]
    assert full["src_width"] == 4 and full["src_height"] == 4
    assert abs(full["mean_r"] - px[:, :, 0].mean() / 255.0) < 1e-12
    half = resize_image_stats(df, target_side=2).collect()[0]
    sub = px[np.ix_([0, 2], [0, 2])]
    assert abs(half["mean_g"] - sub[:, :, 1].mean() / 255.0) < 1e-12


def test_video_frame_stats_walk_and_sampling(spark):
    """Container walk parses back exactly the encoded frames; every_nth
    keeps frames 0, n, 2n with correct per-frame means."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        video_frame_stats,
    )

    frames = [np.full((2, 3, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40)]
    content = b"".join(encode_ppm(f) for f in frames)
    df = spark.createDataFrame(
        [(7, bytearray(content))], "media_id long, content binary"
    )
    got = {
        r["frame_idx"]: r
        for r in video_frame_stats(df, every_nth=3).collect()
    }
    assert set(got) == {0, 3}
    assert got[0]["width"] == 3 and got[0]["height"] == 2
    assert abs(got[0]["mean_r"] - 10 / 255.0) < 1e-12
    assert abs(got[3]["mean_b"] - 40 / 255.0) < 1e-12


def test_dhash_near_pairs_complete_vs_bruteforce(spark):
    """Multi-index banding must find EXACTLY the brute-force Hamming<=3
    pairs (pigeonhole completeness), and the pigeonhole gate must refuse
    max_dist >= n_bands."""
    import itertools
    import random

    import pytest as _pytest

    from flink_1_8_sourcecode_spark.operators.multimodal import dhash_near_pairs

    rng = random.Random(7)
    sigs = []
    base0, base1 = rng.getrandbits(32), rng.getrandbits(32)
    for i in range(40):
        # half the fixtures are small perturbations of a shared base ->
        # guaranteed near pairs; half are fresh random words
        if i % 2 == 0:
            w0, w1 = base0, base1
            for _ in range(rng.randrange(0, 3)):
                bit = rng.randrange(64)
                if bit < 32:
                    w0 ^= 1 << bit
                else:
                    w1 ^= 1 << (bit - 32)
        else:
            w0, w1 = rng.getrandbits(32), rng.getrandbits(32)
        sigs.append((i, w0, w1))

    want = set()
    for (ia, a0, a1), (ib, b0, b1) in itertools.combinations(sigs, 2):
        d = bin(a0 ^ b0).count("1") + bin(a1 ^ b1).count("1")
        if d <= 3:
            want.add((ia, ib, d))

    df = spark.createDataFrame(sigs, "media_id long, w0 long, w1 long")
    got = {
        (r.id_a, r.id_b, r.dist) for r in dhash_near_pairs(df, max_dist=3).collect()
    }
    assert got == want and want  # complete, exact, and non-trivial

    with _pytest.raises(ValueError, match="pigeonhole"):
        dhash_near_pairs(df, max_dist=4)


def test_dhash64_known_image(spark):
    """dHash bits of a hand-built 2x3 gradient image: brighter-to-the-
    right rows set bits, darker rows don't."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.multimodal import dhash64, encode_ppm

    # 4x9 red plane: rows alternate ascending / descending brightness
    h, w = 8, 9
    red = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        ramp = np.arange(w, dtype=np.uint8) * 10
        red[y] = ramp if y % 2 == 0 else ramp[::-1]
    px = np.stack([red, red, red], axis=-1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(px)))], "media_id long, content binary"
    )
    row = dhash64(df).collect()[0]
    # grid==src here (8 rows, 9 cols): even rows -> 8 bits set, odd -> 0
    even = sum(1 << (ty * 8 + tx) for ty in (0, 2) for tx in range(8))
    even_hi = sum(1 << (ty * 8 + tx) for ty in (0, 2) for tx in range(8))
    assert row.w0 == even and row.w1 == even_hi


def test_audio_decimate_stride_and_channels(spark):
    """Decimation must keep frames 0, f, 2f... and keep channel frames
    together; factor=1 is identity; factor<1 refuses."""
    import numpy as np
    import pytest as _pytest

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        audio_decimate,
        encode_wav,
    )

    sig = np.array([0.1, -0.2, 0.3, -0.4, 0.5, -0.6, 0.7, -0.8])
    df = spark.createDataFrame(
        [(1, encode_wav(sig, 8000))], "media_id long, content binary"
    )
    r = audio_decimate(df, factor=3).collect()[0]
    kept = np.trunc(np.array([0.1, -0.4, 0.7]) * 32767.0) / 32768.0
    assert r.n_out == 3 and r.sample_rate_out == 8000 // 3
    assert r.mean_amp == _pytest.approx(kept.mean())
    assert r.peak == _pytest.approx(np.abs(kept).max())

    # stereo: both channels of a surviving frame survive
    stereo = np.array([0.1, 0.9, -0.2, -0.8, 0.3, 0.7, -0.4, -0.6])
    df2 = spark.createDataFrame(
        [(2, encode_wav(stereo.reshape(-1), 8000, n_channels=2))],
        "media_id long, content binary",
    )
    r2 = audio_decimate(df2, factor=2).collect()[0]
    kept2 = np.trunc(np.array([0.1, 0.9, 0.3, 0.7]) * 32767.0) / 32768.0
    assert r2.n_out == 2 and r2.mean_amp == _pytest.approx(kept2.mean())

    ident = audio_decimate(df, factor=1).collect()[0]
    assert ident.n_out == 8

    with _pytest.raises(ValueError, match="factor"):
        audio_decimate(df, factor=0)


def test_incremental_dedup_decisions_and_precedence(spark):
    """All three decisions on a hand-built batch; a doc duplicated in
    BOTH corpus and batch classifies dup_corpus (precedence); full-text
    vs prefix fingerprints differ when tails diverge."""
    from flink_1_8_sourcecode_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta one"), (101, "unrelated corpus doc here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta DIFFERENT TAIL"),  # dup_corpus @ prefix 4
            (2, "fresh new content entirely distinct"),     # kept
            (3, "fresh new content entirely UNLIKE two"),   # dup_batch of 2 @ prefix 4
            (4, "alpha beta gamma delta ANOTHER tail"),     # also corpus dup -> dup_corpus
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.decision
        for r in incremental_dedup(batch, corpus, prefix_tokens=4).collect()
    }
    assert got == {1: "dup_corpus", 2: "kept", 3: "dup_batch", 4: "dup_corpus"}

    # full-text fingerprints: every tail differs -> everything kept
    full = {
        r.doc_id: r.decision for r in incremental_dedup(batch, corpus).collect()
    }
    assert full == {1: "kept", 2: "kept", 3: "kept", 4: "kept"}


def test_k_core_vs_bruteforce_peeling(spark):
    """Randomized graphs: Graph.k_core must equal pure-python iterative
    peeling for several k; k<1 refuses."""
    import random

    import pytest as _pytest

    from flink_1_8_sourcecode_spark.graph import Graph

    rng = random.Random(11)
    n = 18
    edges = sorted({tuple(sorted((rng.randrange(n), rng.randrange(n))))
                    for _ in range(30) if True})
    edges = [(a, b) for a, b in edges if a != b]

    def brute(k):
        alive = set(range(n))
        while True:
            deg = {u: 0 for u in alive}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            nxt = {u for u in alive if deg[u] >= k}
            if nxt == alive:
                return alive
            alive = nxt

    v = spark.range(n).select("id")
    e = spark.createDataFrame(edges, "src long, dst long")
    g = Graph(v, e)
    for k in (1, 2, 3):
        got = {r.id for r in g.k_core(k=k).collect()}
        assert got == brute(k), f"k={k}"

    with _pytest.raises(ValueError, match="k must be"):
        g.k_core(k=0)


def test_zscore_anomaly_oracle_shape(spark):
    """Hand-built events: exactly the |z|>3 outlier is counted, a
    zero-variance type reports zero anomalies."""
    from flink_1_8_sourcecode_spark.queries import load_all  # noqa: F401
    import math

    rows = [("a", float(v)) for v in [10, 10, 10, 10, 10, 10, 10, 10, 10, 100]]
    rows += [("b", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    mu = sum(v for _, v in rows[:10]) / 10
    sd = math.sqrt(sum((v - mu) ** 2 for _, v in rows[:10]) / 10)
    z100 = abs((100 - mu) / sd)

    s = df.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    az = F.when(
        F.col("sigma") > 0, F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    ).otherwise(F.lit(0.0))
    out = {
        r.event_type: (r.n_anomalies, r.max_abs_z)
        for r in df.join(F.broadcast(s), "event_type")
        .select("event_type", az.alias("az"))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("az") > 3.0).cast("long")).alias("n_anomalies"),
            F.round(F.max("az"), 6).alias("max_abs_z"),
        )
        .collect()
    }
    assert out["a"][0] == (1 if z100 > 3 else 0)
    assert abs(out["a"][1] - round(z100, 6)) < 1e-9
    assert out["b"] == (0, 0.0)


def test_strip_repeated_chars_keep_first(spark):
    """Keeper occurrence (smallest (doc, start)) survives verbatim; every
    other occurrence is cut; non-repeating docs pass through."""
    from flink_1_8_sourcecode_spark.operators.dedup import (
        strip_repeated_char_spans_keep_first,
    )

    rep = "0123456789" * 6
    # fully distinct contexts at BOTH edges: every doc's maximal
    # repeated interval is exactly `rep`, so all occurrences fall in
    # one keeper group (differing edges would split span-text groups —
    # the documented extension-variant approximation)
    d = spark.createDataFrame(
        [
            (1, "AAA_" + rep + "_one"),
            (2, "BBB-" + rep + "-two"),
            (3, "CCC." + rep + ".three"),
            (4, "untouched document with no long repeats"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["clean_text"] for r in
           strip_repeated_char_spans_keep_first(d, "doc_id", "text").collect()}
    assert got[1] == "AAA_" + rep + "_one"        # keeper intact
    assert got[2] == "BBB--two" and got[3] == "CCC..three"
    assert got[4] == "untouched document with no long repeats"


class TestCertifiedHeavyHitters:
    """Misra-Gries candidates + exact recount = exactly {cnt > N/k}."""

    def test_matches_bruteforce_on_documents(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.operators.text import (
            certified_heavy_hitters,
            tokens,
        )

        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))
        got = {(r["tok"], r["cnt"]) for r in
               certified_heavy_hitters(toks, "tok", k_capacity=64).collect()}
        exact = toks.groupBy("tok").count().collect()
        n = sum(r["count"] for r in exact)
        want = {(r["tok"], r["count"]) for r in exact if r["count"] > n / 64}
        assert got == want

    def test_planted_heavy_survives_uniform_noise(self, spark):
        """Adversarial shape for MG: a sea of distinct singletons (every
        one evicts counters) must not dislodge the planted heavy item."""
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.operators.text import (
            certified_heavy_hitters,
        )

        noise = spark.range(5000).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("item")
        )
        heavy = spark.range(600).select(F.lit("HOT").alias("item"))
        data = noise.unionByName(heavy).repartition(8)
        # N = 5600, k=16 -> certify threshold 350 < 600 = HOT's count
        out = certified_heavy_hitters(data, "item", k_capacity=16).collect()
        assert {(r["item"], r["cnt"]) for r in out} == {("HOT", 600)}
        # and with k=8 (threshold 700 > 600) the certified set is empty
        assert certified_heavy_hitters(data, "item", k_capacity=8).count() == 0


class TestPCA:
    """Distributed PCA: orthonormal sign-fixed axes, variance ordering,
    reconstruction improves with components, determinism."""

    def test_axes_orthonormal_and_variance_ordered(self, spark):
        import numpy as np

        from flink_1_8_sourcecode_spark.operators.similarity import (
            pca_project,
            pca_train,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        comps, offs, mean, variances = pca_train(emb, "embedding", n_components=5)
        w = np.array(comps)
        assert np.allclose(w @ w.T, np.eye(5), atol=1e-9)
        proj = pca_project(emb, "vec_id", "embedding", comps, offs).toPandas()
        variances = [proj[f"pc{j}"].var() for j in range(5)]
        assert all(a >= b - 1e-12 for a, b in zip(variances, variances[1:]))
        # projections are centered (mean folded into the offset)
        assert all(abs(proj[f"pc{j}"].mean()) < 1e-9 for j in range(5))

    def test_deterministic_and_matches_numpy(self, spark):
        import numpy as np

        from flink_1_8_sourcecode_spark.operators.similarity import pca_train

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = pca_train(emb, "embedding", n_components=3)
        b = pca_train(emb, "embedding", n_components=3)
        assert a == b
        # against a plain numpy reference on the collected matrix
        x = np.stack(emb.toPandas()["embedding"].to_numpy()).astype("float64")
        cov = np.cov(x, rowvar=False, bias=True)
        evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
        w = np.array(a[0])
        got_vars = np.diag(w @ cov @ w.T)
        assert np.allclose(np.sort(got_vars)[::-1], evals, rtol=1e-8)


def test_pca_whitening_unit_variance(spark):
    """Whitened projections have ~unit variance per axis (population
    convention)."""
    from flink_1_8_sourcecode_spark.operators.similarity import (
        pca_project,
        pca_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    comps, offs, _mean, variances = pca_train(emb, "embedding", n_components=3)
    proj = pca_project(
        emb, "vec_id", "embedding", comps, offs, whiten=True, variances=variances
    ).toPandas()
    n = len(proj)
    for j in range(3):
        pop_var = proj[f"pc{j}"].var(ddof=0)
        assert abs(pop_var - 1.0) < 1e-6, (j, pop_var)


def test_retrieval_metrics_known_values(spark):
    """Hand-checkable metric math: 2 queries, known hits/ranks."""
    from flink_1_8_sourcecode_spark.operators.similarity import retrieval_metrics

    truth = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)],
        "query_id long, neighbor_id long",
    )
    results = spark.createDataFrame(
        [
            (1, 10, 1), (1, 99, 2), (1, 11, 3),   # q1: hits at rank 1 and 3
            (2, 98, 1), (2, 97, 2),               # q2: no hits
        ],
        "query_id long, neighbor_id long, rank long",
    )
    got = {r["query_id"]: r for r in retrieval_metrics(results, truth, k=3).collect()}
    import math

    # q1: |truth|=3, m=min(3,3)=3; hits=2 -> recall 2/3; MRR 1/1
    assert abs(got[1]["recall_at_k"] - 2 / 3) < 1e-12
    assert got[1]["mrr_at_k"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert abs(got[1]["ndcg_at_k"] - dcg / idcg) < 1e-12
    # q2: zero hits -> all zeros, and the row is PRESENT (not dropped)
    assert (got[2]["recall_at_k"], got[2]["mrr_at_k"], got[2]["ndcg_at_k"]) == (
        0.0, 0.0, 0.0,
    )


class TestKTruss:
    def test_cliques_survive_bridge_and_path_drop(self, spark):
        import itertools

        from flink_1_8_sourcecode_spark.graph.graph import Graph

        k4a = list(itertools.combinations(range(4), 2))
        k4b = list(itertools.combinations(range(10, 14), 2))
        edges = k4a + k4b + [(3, 10), (13, 20), (20, 21)]
        v = spark.createDataFrame(
            [(i,) for i in {x for e in edges for x in e}], "id long"
        )
        g = Graph(v, spark.createDataFrame(edges, "src long, dst long"))
        want = set(k4a) | set(k4b)
        assert {(r.src, r.dst) for r in g.k_truss(3).collect()} == want
        # K4 edges carry support 2 -> survive 4-truss, nothing survives 5
        assert {(r.src, r.dst) for r in g.k_truss(4).collect()} == want
        assert g.k_truss(5).count() == 0

    def test_star_hub_contributes_no_wedges(self, spark):
        """A min-ID hub (id 0) with a big star must contribute O(1)
        wedges under degree orientation — the id-canonical orientation
        the r10 code used built C(d, 2) wedges at the hub EVERY peel
        round.  Planted star + K4: truss result exact AND the wedge
        join stays bounded by the clique."""
        import itertools

        from flink_1_8_sourcecode_spark.graph.graph import (
            Graph,
            _degree_oriented_triangles,
        )
        from pyspark.sql import functions as F

        leaves = list(range(100, 300))
        star = [(0, leaf) for leaf in leaves]
        k4 = list(itertools.combinations([0, 1, 2, 3], 2))
        edges = star + k4
        ids = sorted({x for e in edges for x in e})
        v = spark.createDataFrame([(i,) for i in ids], "id long")
        g = Graph(v, spark.createDataFrame(edges, "src long, dst long"))
        # correctness: K4 survives the 4-truss, the star peels away
        assert {(r.src, r.dst) for r in g.k_truss(4).collect()} == set(k4)
        # bound: triangles enumerated over the full canonical edge list
        # are exactly the K4's 4 — the 200-leaf hub adds ZERO wedges
        # (each star edge orients leaf->hub; leaves have out-degree 1)
        ce = (
            g.edges.select(
                F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
            ).distinct()
        )
        tris = _degree_oriented_triangles(ce)
        assert tris.count() == 4

    def test_cascading_peel(self, spark):
        """Removing one edge's support can cascade: a triangle chain
        where each removal invalidates the next (needs > 1 round)."""
        from flink_1_8_sourcecode_spark.graph.graph import Graph

        # triangles sharing single edges: (0,1,2), (1,2,3): edge (1,2)
        # supports 2, all others 1 -> 4-truss (need 2) peels the outer
        # edges first, then (1,2) loses its triangles -> empty
        edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
        v = spark.createDataFrame([(i,) for i in range(4)], "id long")
        g = Graph(v, spark.createDataFrame(edges, "src long, dst long"))
        assert g.k_truss(4).count() == 0
        assert {(r.src, r.dst) for r in g.k_truss(3).collect()} == set(edges)


def test_phash_brightness_invariant_dhash_is_not_required(spark):
    """pHash: a monotonic intensity remap preserves every coefficient's
    order against the median -> identical hash; an unrelated image is
    far.  Exact duplicates collide for both hash families."""
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.multimodal import (
        encode_ppm,
        phash64,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (20, 24, 3)).astype(np.uint8)
    bright = np.clip(base.astype(int) // 2 + 100, 0, 255).astype(np.uint8)
    other = rng.randint(0, 256, (20, 24, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame(
            [(0, bytearray(encode_ppm(base))),
             (1, bytearray(encode_ppm(bright))),
             (2, bytearray(encode_ppm(base))),
             (3, bytearray(encode_ppm(other)))],
            columns=["media_id", "content"],
        )
    )
    sig = {r["media_id"]: (r["w0"], r["w1"]) for r in phash64(media).collect()}

    def dist(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert dist(sig[0], sig[2]) == 0          # exact dup
    assert dist(sig[0], sig[1]) == 0          # monotonic brightness map
    assert dist(sig[0], sig[3]) > 10          # unrelated content


def test_pca_moment_reduce_yields_single_row_engine_side(spark):
    """The (n, sum, gram) partial merge must happen IN-ENGINE: with
    partitions >> 1 the reduced moments frame holds exactly ONE row
    (the r10 code collected one row per Arrow batch to the driver —
    O(batches x d^2) transfer at corpus scale)."""
    import numpy as np

    from flink_1_8_sourcecode_spark.operators.similarity import (
        _pca_moments,
        _reduce_moments,
        pca_train,
    )

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=6).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v array<double>").repartition(37)
    moments = _pca_moments(df, "v")
    assert moments.count() > 1  # many partials before the reduce
    reduced = _reduce_moments(moments, fanin=4)  # force multi-round tree
    assert reduced.count() == 1
    # and the statistics survive the tree intact (vs direct numpy)
    row = reduced.first()
    x = np.array([r[1] for r in rows])
    assert row["n"] == 400
    np.testing.assert_allclose(np.array(row["s"]), x.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(
        np.array(row["g"]).reshape(6, 6), x.T @ x, rtol=1e-9
    )
    comps, offs, mean, vars_ = pca_train(df, "v", n_components=2)
    assert len(comps) == 2 and len(mean) == 6


class TestEmbeddingIngestDedup:
    """operators/dedup.py:embedding_ingest_dedup — the stateless
    IVF-probed embedding near-dup gate for live ingestion."""

    def _frames(self, spark):
        # two well-separated cells: cluster 0 near (1,0), cluster 1
        # near (0,1); incoming 100 ~ cluster-0 dup, 101 ~ cluster-0
        # novel (orthogonal-ish), 102 ~ cluster-1 dup
        cor = spark.createDataFrame(
            [
                (1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
                (3, [0.0, 1.0], 1), (4, [0.1, 0.9], 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        inc = spark.createDataFrame(
            [
                (100, [0.95, 0.05], 0),   # cosine ~1 vs cluster 0 -> dup
                (101, [0.6, -0.8], 0),    # probes cell 0, far -> kept
                (102, [0.05, 0.95], 1),   # dup vs cluster 1
            ],
            "vec_id long, embedding array<float>, label int",
        )
        return inc, cor

    def test_batch_gate(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import (
            embedding_ingest_dedup,
        )

        inc, cor = self._frames(spark)
        out = embedding_ingest_dedup(
            inc, cor, "vec_id", "embedding", "label", threshold=0.8
        )
        assert sorted(r.vec_id for r in out.collect()) == [101]
        assert out.columns == inc.columns  # schema-preserving

    def test_stream_equals_batch(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.operators.dedup import (
            embedding_ingest_dedup,
        )

        inc, cor = self._frames(spark)
        d = str(tmp_path / "emb")
        # two micro-batches
        inc.filter("vec_id <= 100").coalesce(1).write.parquet(d + "/a")
        inc.filter("vec_id > 100").coalesce(1).write.parquet(d + "/b")
        src = (
            spark.readStream
            .schema("vec_id long, embedding array<float>, label int")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true").parquet(d)
        )
        out = embedding_ingest_dedup(
            src, cor, "vec_id", "embedding", "label", threshold=0.8
        ).select("vec_id")
        q = (
            out.writeStream.format("memory").queryName("t_emb_gate")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(r.vec_id for r in spark.table("t_emb_gate").collect())
        assert got == [101]

    def test_nprobe2_matches_bruteforce_definition(self, spark, tmp_path):
        """nprobe=2 semantics vs a literal numpy recomputation: a row
        survives iff NO corpus vector in its two nearest centroid
        cells reaches the threshold; streaming + nprobe>1 refuses."""
        import numpy as np
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.operators.dedup import (
            embedding_ingest_dedup,
        )

        rng_vecs = [
            [0.9, 0.1, 0.2], [0.8, 0.3, 0.1], [0.1, 0.9, 0.3],
            [0.2, 0.8, 0.1], [0.3, 0.2, 0.9], [0.1, 0.1, 0.8],
        ]
        cor = spark.createDataFrame(
            [(i, v, i // 2) for i, v in enumerate(rng_vecs)],
            "vec_id long, embedding array<float>, label int",
        )
        inc_vecs = [
            [0.85, 0.2, 0.15], [0.15, 0.85, 0.2], [0.2, 0.15, 0.85],
            [0.6, 0.6, 0.6], [-0.9, 0.1, 0.1],
        ]
        inc = spark.createDataFrame(
            [(100 + i, v, 0) for i, v in enumerate(inc_vecs)],
            "vec_id long, embedding array<float>, label int",
        )
        tau = 0.97
        out = embedding_ingest_dedup(
            inc, cor, "vec_id", "embedding", "label",
            threshold=tau, nprobe=2,
        )
        got = sorted(r.vec_id for r in out.collect())

        C = np.array(rng_vecs, dtype=np.float64)
        cells = np.array([0, 0, 1, 1, 2, 2])
        cents = np.stack([C[cells == c].mean(axis=0) for c in (0, 1, 2)])

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        expected = []
        for i, v in enumerate(inc_vecs):
            v = np.array(v, dtype=np.float64)
            order = sorted(
                range(3), key=lambda c: (-cos(v, cents[c]), c)
            )[:2]
            dup = any(
                cos(v, C[j]) >= tau
                for c in order
                for j in range(len(C))
                if cells[j] == c
            )
            if not dup:
                expected.append(100 + i)
        assert got == expected
        assert expected  # the case is non-vacuous both ways
        assert len(expected) < len(inc_vecs)

        d = str(tmp_path / "emb_np")
        inc.coalesce(1).write.parquet(d)
        src = (
            spark.readStream
            .schema("vec_id long, embedding array<float>, label int")
            .parquet(d)
        )
        with _pytest.raises(NotImplementedError, match="nprobe"):
            embedding_ingest_dedup(
                src, cor, "vec_id", "embedding", "label",
                threshold=0.8, nprobe=2,
            )

    def test_empty_index_keeps_everything(self, spark):
        from flink_1_8_sourcecode_spark.operators.dedup import (
            embedding_ingest_dedup,
        )

        inc, cor = self._frames(spark)
        out = embedding_ingest_dedup(
            inc, cor.filter("vec_id < 0"), "vec_id", "embedding", "label",
            threshold=0.1,
        )
        assert out.count() == 3

    def test_shuffle_semi_fallback_matches_broadcast(self, spark):
        """broadcast_survivors=False (the whole-corpus re-dedup size
        escape hatch) must give the identical survivor set while the
        final semi-join drops the broadcast hint."""
        from flink_1_8_sourcecode_spark.operators.dedup import (
            embedding_ingest_dedup,
        )

        inc, cor = self._frames(spark)
        kw = dict(threshold=0.8, nprobe=2)
        bc = embedding_ingest_dedup(
            inc, cor, "vec_id", "embedding", "label", **kw
        )
        sh = embedding_ingest_dedup(
            inc, cor, "vec_id", "embedding", "label",
            broadcast_survivors=False, **kw,
        )
        got_bc = sorted(r.vec_id for r in bc.collect())
        got_sh = sorted(r.vec_id for r in sh.collect())
        assert got_bc == got_sh and got_bc  # identical, non-vacuous
        # the hinted plan broadcasts twice (probe join + survivor
        # semi); the fallback keeps only the probe-join broadcast
        def n_bc(df):
            p = df._jdf.queryExecution().executedPlan().toString()
            return p.count("BroadcastExchange")

        assert n_bc(sh) < n_bc(bc)


class TestBPE:
    """operators/text.py:bpe_train / bpe_tokenize vs an INDEPENDENT
    Python reimplementation of Sennrich-style BPE (word-frequency
    table, freq-desc/lexicographic tie-break, left-to-right
    non-overlapping merge application)."""

    @staticmethod
    def _ref_bpe(docs, num_merges, min_freq=2):
        from collections import Counter

        wc = Counter(w for t in docs for w in t.lower().split())
        syms = {w: list(w) for w in wc}
        merges = []
        for _ in range(num_merges):
            pc = Counter()
            for w, n in wc.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += n
            if not pc:
                break
            (a, b), f = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if f < min_freq:
                break
            merges.append((a, b, f))
            for w in syms:
                s, out, i = syms[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
        return merges, syms

    DOCS = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest low new",
        "aaa aaa baa ab",
    ]

    def test_train_matches_reference(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.DOCS)], "doc_id long, text string"
        )
        merges, vocab = bpe_train(df, "text", num_merges=10, min_freq=2)
        ref_merges, ref_syms = self._ref_bpe(self.DOCS, 10)
        assert merges == ref_merges
        got_syms = {r["__w"]: list(r["__sym"]) for r in vocab.collect()}
        assert got_syms == ref_syms
        vocab.unpersist()

    def test_overlapping_pair_application(self, spark):
        # "aaa" + merge (a, a): left-to-right non-overlapping -> [aa, a]
        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
        merges, vocab = bpe_train(df, "text", num_merges=1, min_freq=2)
        assert merges == [("a", "a", 4)]
        assert list(vocab.first()["__sym"]) == ["aa", "a"]
        vocab.unpersist()

    def test_min_freq_stops_early(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        # every pair unique -> nothing reaches min_freq=2
        df = spark.createDataFrame([(1, "abc def")], "doc_id long, text string")
        merges, vocab = bpe_train(df, "text", num_merges=5, min_freq=2)
        assert merges == []
        vocab.unpersist()

    @staticmethod
    def _ref_bpe_batched(docs, num_merges, min_freq=2, m=3):
        # independent reimplementation of the BATCHED schedule: per
        # round one pair count, greedy top-m symbol-disjoint picks,
        # all applied together
        from collections import Counter

        wc = Counter(w for t in docs for w in t.lower().split())
        syms = {w: list(w) for w in wc}
        merges = []
        while len(merges) < num_merges:
            mi = min(m, num_merges - len(merges))
            pc = Counter()
            for w, n in wc.items():
                s = syms[w]
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += n
            ranked = sorted(
                ((p, f) for p, f in pc.items() if f >= min_freq),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )
            sel, used = [], set()
            for (a, b), f in ranked:
                if a in used or b in used:
                    continue
                sel.append((a, b, f))
                used.update((a, b))
                if len(sel) >= mi:
                    break
            if not sel:
                break
            merges.extend(sel)
            for a, b, _ in sel:
                for w in syms:
                    s, out, i = syms[w], [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    syms[w] = out
        return merges, syms

    def test_batched_matches_reference(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.DOCS)], "doc_id long, text string"
        )
        for m in (2, 3, 10):
            merges, vocab = bpe_train(
                df, "text", num_merges=8, min_freq=2, merges_per_round=m
            )
            ref_merges, ref_syms = self._ref_bpe_batched(self.DOCS, 8, m=m)
            assert merges == ref_merges, f"m={m}"
            got_syms = {r["__w"]: list(r["__sym"]) for r in vocab.collect()}
            assert got_syms == ref_syms, f"m={m}"
            vocab.unpersist()

    def test_batched_m1_is_exact_sequential(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.DOCS)], "doc_id long, text string"
        )
        seq, v1 = bpe_train(df, "text", num_merges=6, min_freq=2)
        one, v2 = bpe_train(
            df, "text", num_merges=6, min_freq=2, merges_per_round=1
        )
        assert seq == one
        v1.unpersist()
        v2.unpersist()

    def test_batched_param_guard(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.operators.text import bpe_train

        with _pytest.raises(ValueError, match="merges_per_round"):
            bpe_train(None, "text", num_merges=2, merges_per_round=0)

    def test_tokenize_matches_reference_and_oov_fallback(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import (
            bpe_tokenize,
            bpe_train,
        )

        train = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.DOCS)], "doc_id long, text string"
        )
        _, vocab = bpe_train(train, "text", num_merges=10, min_freq=2)
        _, ref_syms = self._ref_bpe(self.DOCS, 10)
        apply_docs = self.DOCS + ["unseen zzz low"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(apply_docs)], "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_tokenize(df, "doc_id", "text", vocab).collect()
        }
        exp = {}
        for i, t in enumerate(apply_docs):
            ws = t.lower().split()
            # OOV words fall back to their character count
            exp[i] = (
                len(ws),
                sum(len(ref_syms[w]) if w in ref_syms else len(w) for w in ws),
            )
        assert got == exp
        vocab.unpersist()



class TestSnapshotDiff:
    def test_statuses_and_null_content(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", None), (3, "c", "de"), (4, "d", "fr")],
            "id long, text string, lang string",
        )
        new = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "xx"), (3, "CC", "de"), (5, "e", "it")],
            "id long, text string, lang string",
        )
        got = {
            r["id"]: r["status"]
            for r in snapshot_diff(old, new, "id", ["text", "lang"]).collect()
        }
        # id 2: NULL -> 'xx' must read as changed (null-sentinel digest)
        assert got == {
            1: "unchanged", 2: "changed", 3: "changed",
            4: "removed", 5: "added",
        }

    def test_null_never_collides_with_sentinel_like_value(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import snapshot_diff

        old = spark.createDataFrame([(1, None)], "id long, text string")
        new = spark.createDataFrame([(1, "\x00null")], "id long, text string")
        [r] = snapshot_diff(old, new, "id", ["text"]).collect()
        assert r["status"] == "changed"

    def test_length_prefix_blocks_concat_collision(self, spark):
        from flink_1_8_sourcecode_spark.operators.pipeline import snapshot_diff

        old = spark.createDataFrame([(1, "ab", "c")], "id long, a string, b string")
        new = spark.createDataFrame([(1, "a", "bc")], "id long, a string, b string")
        [r] = snapshot_diff(old, new, "id", ["a", "b"]).collect()
        assert r["status"] == "changed"

    def test_empty_content_cols_raise(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.operators.pipeline import snapshot_diff

        with _pytest.raises(ValueError, match="content column"):
            snapshot_diff(None, None, "id", [])


class TestEmbeddingDiversity:
    """embedding_diversity (operators/similarity.py): the variance
    identity must equal the brute-force mean pairwise squared distance,
    with no pairwise join in the plan."""

    def test_matches_bruteforce(self, spark):
        import itertools

        from flink_1_8_sourcecode_spark.operators.similarity import (
            embedding_diversity,
        )

        vecs = {
            "a": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
            "b": [[2.0, 2.0], [2.0, 2.0]],   # duplicates: diversity 0
            "c": [[5.0, -3.0]],              # singleton: diversity 0
        }
        rows = [(g, v) for g, vs in vecs.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, embedding array<float>")
        got = {
            r["g"]: (r["n_vecs"], r["mean_pairwise_sq_dist"])
            for r in embedding_diversity(df, "g").collect()
        }
        for g, vs in vecs.items():
            n = len(vs)
            # E over ORDERED iid pairs (x, y), including x == y
            tot = sum(
                sum((a - b) ** 2 for a, b in zip(u, w))
                for u, w in itertools.product(vs, vs)
            )
            want = tot / (n * n)
            assert got[g][0] == n
            # operator rounds to 6 decimals
            assert abs(got[g][1] - round(want, 6)) < 1e-9, (g, got[g], want)

    def test_no_pairwise_join(self, spark):
        from flink_1_8_sourcecode_spark.operators.similarity import (
            embedding_diversity,
        )

        df = spark.createDataFrame(
            [("g", [float(i), 1.0]) for i in range(50)],
            "g string, embedding array<float>",
        )
        plan = (
            embedding_diversity(df, "g")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "Join" not in plan  # pure aggregate pipeline


class TestPmiCollocations:
    """pmi_collocations (operators/text.py): PMI math vs an independent
    Python computation; global top-k is TakeOrderedAndProject (local
    top-k per partition + driver merge), not a row_number funnel."""

    def test_matches_independent_python(self, spark):
        import math
        from collections import Counter

        from flink_1_8_sourcecode_spark.operators.text import (
            pmi_collocations,
        )

        docs = [
            ("new york is big",),
            ("new york has people",),
            ("york new nothing",),
            ("big data new york",),
            ("data is big data",),
        ]
        df = spark.createDataFrame(docs, "text string")
        got = [
            (r["a"], r["b"], r["c_ab"], r["pmi"])
            for r in pmi_collocations(df, "text", min_count=2, top_k=3).collect()
        ]
        pairs = []
        for (t,) in docs:
            ws = t.split()
            pairs += list(zip(ws, ws[1:]))
        pc, lm, rm, n = Counter(pairs), Counter(), Counter(), len(pairs)
        for a, b in pairs:
            lm[a] += 1
            rm[b] += 1
        scored = [
            (a, b, c, round(math.log(c * n / (lm[a] * rm[b])), 6))
            for (a, b), c in pc.items() if c >= 2
        ]
        scored.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
        assert got == scored[:3]

    def test_param_guards(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import (
            pmi_collocations,
        )

        with pytest.raises(ValueError, match="min_count"):
            pmi_collocations(None, "t", min_count=0)
        with pytest.raises(ValueError, match="top_k"):
            pmi_collocations(None, "t", top_k=0)

    def test_distributed_topk_plan(self, spark):
        from flink_1_8_sourcecode_spark.operators.text import (
            pmi_collocations,
        )

        df = spark.createDataFrame([("a b a b",)] * 20, "text string")
        plan = (
            pmi_collocations(df, "text", min_count=2, top_k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestSpreadGate:
    def test_unkeyed_table_raises_not_round_robin(self, spark, tmp_path):
        """catalog._spread must be keyed-or-raise (r17): a keyless
        repartition(n) is the round-robin local-sort / SPARK-38388
        retry-duplication hazard the module docstring warns about."""
        from flink_1_8_sourcecode_spark.catalog import _spread

        p = str(tmp_path / "mystery.parquet")
        spark.range(10).toDF("some_id").write.parquet(p)
        df = spark.read.parquet(p)
        with pytest.raises(KeyError, match="_SPREAD_KEYS"):
            _spread(spark, df, p)

    def test_keyed_table_spreads_on_key(self, spark):
        """A keyed spread table hash-partitions on its declared id, not
        round-robin."""
        from flink_1_8_sourcecode_spark.catalog import table

        df = table(spark, SF_DIR, "documents", spread=True)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "RepartitionByExpression" in plan and "doc_id" in plan
