"""KMV distinct-count sketch: accuracy, merge invariance, overlap.

Property target: the sketch is a deterministic function of the VALUE
SET — independent of row order, duplication, and partitioning (the
mergeable-summary contract that makes the map-side truncation safe).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.operators import sketches as sk


def _ids(spark, n, tag=""):
    return spark.range(n).select(
        F.lit("g").alias("g"), F.concat(F.lit(tag), F.col("id")).alias("v")
    )


def test_exact_below_k(spark):
    df = _ids(spark, 37)
    out = sk.kmv_estimate(sk.kmv_sketch(df, "g", "v", k=64), 64).collect()
    assert len(out) == 1
    assert out[0]["kmv_size"] == 37
    assert out[0]["est_distinct"] == 37.0


def test_estimate_within_error_bound(spark):
    # 5000 distinct values, k=256 -> ~1/sqrt(k) ≈ 6% std error; assert 20%
    df = _ids(spark, 5000)
    out = sk.kmv_estimate(sk.kmv_sketch(df, "g", "v", k=256), 256).collect()[0]
    assert out["kmv_size"] == 256
    assert abs(out["est_distinct"] - 5000) / 5000 < 0.20


def test_partitioning_and_duplication_invariance(spark):
    base = _ids(spark, 500)
    noisy = base.union(base).union(base.limit(100)).repartition(13)
    a = sk.kmv_sketch(base.coalesce(1), "g", "v", k=64).collect()[0]["kmv"]
    b = sk.kmv_sketch(noisy, "g", "v", k=64).collect()[0]["kmv"]
    assert a == b
    assert len(a) == 64 and a == sorted(a)


def test_overlap_identical_and_disjoint(spark):
    left = _ids(spark, 300).select(F.lit("a").alias("g"), "v")
    same = _ids(spark, 300).select(F.lit("b").alias("g"), "v")
    other = _ids(spark, 300, tag="x").select(F.lit("c").alias("g"), "v")
    s = sk.kmv_sketch(left.union(same).union(other), "g", "v", k=64)
    ident = sk.kmv_overlap(s, "g", "a", "b", k=64).collect()[0]
    assert ident["est_jaccard"] == 1.0
    assert ident["est_union"] == ident["est_intersection"]
    disj = sk.kmv_overlap(s, "g", "a", "c", k=64).collect()[0]
    assert disj["est_jaccard"] == 0.0
    assert disj["est_intersection"] == 0.0


def test_k_guard():
    with pytest.raises(ValueError, match="k >= 2"):
        sk.kmv_sketch(None, "g", "v", k=1)


def test_streaming_final_equals_batch_any_order(spark, tmp_path):
    """Mergeability on the wire: replaying the rows as hash-split
    chunks (arbitrary value order, one chunk per micro-batch) yields
    the same final k-min set / estimate as the batch sketch."""
    import uuid

    from flink_1_8_sourcecode_spark.streaming.stateful import streaming_kmv_sketch

    df = _ids(spark, 900).withColumn("r", F.conv(F.substring(F.md5("v"), 1, 4), 16, 10))
    d = str(tmp_path / "kmv")
    # 3 chunks in hash order -> replayed a, b, c = arbitrary value order
    df.withColumn("c", F.pmod(F.col("r").cast("int"), F.lit(3))).drop("r") \
      .write.partitionBy("c").parquet(d)
    src = (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", "1").option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = streaming_kmv_sketch(src, "g", "v", k=64)
    name = f"t_kmv_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    fin = (
        spark.table(name).orderBy(F.col("n_seen").desc()).limit(1).collect()[0]
    )
    batch = sk.kmv_estimate(sk.kmv_sketch(df.drop("r"), "g", "v", k=64), 64).collect()[0]
    assert fin["n_seen"] == 900
    assert (fin["kmv_size"], fin["est_distinct"]) == (
        batch["kmv_size"], batch["est_distinct"]
    )


class TestExactGroupQuantiles:
    def test_ceil_rank_convention(self, spark):
        import math

        rows = [("g", v) for v in [5, 1, 4, 2, 3, 9, 7]]
        df = spark.createDataFrame(rows, "g string, v int")
        qs = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
        got = {
            (r["g"], r["q"]): r["v"]
            for r in sk.exact_group_quantiles(df, "g", "v", qs).collect()
        }
        vals = sorted(v for _, v in rows)
        for q in qs:
            want = vals[max(1, math.ceil(q * len(vals))) - 1]
            assert got[("g", q)] == want, (q, got)

    def test_ties_singletons_and_null_group(self, spark):
        rows = [("a", 2), ("a", 2), ("a", 2), ("b", 7), (None, 1), (None, 3)]
        df = spark.createDataFrame(rows, "g string, v int")
        got = sk.exact_group_quantiles(df, "g", "v", [0.5]).collect()
        by_g = {r["g"]: r["v"] for r in got}
        assert by_g == {"a": 2, "b": 7, None: 1}
        assert len(got) == 3  # exactly one row per (group, q)

    def test_invalid_q_raises(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="quantiles"):
            sk.exact_group_quantiles(None, "g", "v", [0.0])


class TestCountMin:
    def test_overestimates_and_exact_when_sparse(self, spark):
        from flink_1_8_sourcecode_spark.operators.sketches import (
            cms_build,
            cms_query,
        )

        rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
        df = spark.createDataFrame(rows, "item string")
        counters = cms_build(df, "item", width=4096, depth=3)
        probes = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("zzz",)], "item string"
        )
        got = {
            r["item"]: r["est_count"]
            for r in cms_query(counters, probes, "item", width=4096, depth=3).collect()
        }
        # 3 items in 4096 buckets: no collisions -> exact; absent -> 0
        assert got == {"a": 10, "b": 3, "c": 1, "zzz": 0}

    def test_never_underestimates_under_collisions(self, spark):
        from flink_1_8_sourcecode_spark.operators.sketches import (
            cms_build,
            cms_query,
        )

        rows = [(f"t{i}",) for i in range(200) for _ in (0, 1)]  # each twice
        df = spark.createDataFrame(rows, "item string")
        counters = cms_build(df, "item", width=16, depth=2)  # heavy collisions
        probes = df.distinct()
        got = cms_query(counters, probes, "item", width=16, depth=2).collect()
        assert all(r["est_count"] >= 2 for r in got)

    def test_param_guards(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.operators.sketches import (
            cms_build,
            cms_query,
        )

        with _pytest.raises(ValueError, match="width"):
            cms_build(None, "x", width=0)
        with _pytest.raises(ValueError, match="width"):
            cms_query(None, None, "x", depth=0)


def test_null_values_do_not_occupy_kmin_slots(spark):
    # COUNT(DISTINCT) convention: NULLs don't count, and must not
    # displace real hashes from the k-min set
    rows = [("g", f"v{i}") for i in range(10)] + [("g", None)] * 100
    df = spark.createDataFrame(rows, "g string, v string")
    out = sk.kmv_estimate(sk.kmv_sketch(df, "g", "v", k=8), 8).collect()[0]
    assert out["kmv_size"] == 8  # all 8 slots hold real value hashes
    assert out["est_distinct"] > 0


def test_overlap_matrix_upper_triangle_matches_pairwise(spark):
    # matrix rows must equal the one-pair operator on every pair
    rows = (
        [("a", f"v{i}") for i in range(300)]
        + [("b", f"v{i}") for i in range(150, 450)]
        + [("c", f"x{i}") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "g string, v string")
    s = sk.kmv_sketch(df, "g", "v", k=64)
    mat = {
        (r["left_key"], r["right_key"]): (
            r["est_union"], r["est_jaccard"], r["est_intersection"]
        )
        for r in sk.kmv_overlap_matrix(s, "g", k=64).collect()
    }
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    for lk, rk in mat:
        [p] = sk.kmv_overlap(s, "g", lk, rk, k=64).collect()
        assert mat[(lk, rk)] == (
            p["est_union"], p["est_jaccard"], p["est_intersection"]
        )
    # disjoint pairs estimate zero overlap; overlapping pair doesn't
    assert mat[("a", "c")][1] == 0.0 and mat[("b", "c")][1] == 0.0
    assert mat[("a", "b")][1] > 0.0


def test_streaming_kmv_state_is_one_row_per_group(spark, tmp_path):
    """Scale pin: the online KMV's state store holds exactly ONE row
    per group (the k-min list + counter) no matter how many values
    stream through — asserted on the store's own numRowsTotal."""
    import uuid

    from flink_1_8_sourcecode_spark.streaming.stateful import streaming_kmv_sketch

    d = str(tmp_path / "kmv_state")
    for c in range(3):
        rows = [("g1" if i % 2 else "g2", f"c{c}v{i}") for i in range(400)]
        spark.createDataFrame(rows, "g string, v string").coalesce(1).write.mode(
            "append"
        ).parquet(d + f"/c={c}")
    src = (
        spark.readStream.schema("g string, v string")
        .option("maxFilesPerTrigger", "1").option("recursiveFileLookup", "true")
        .parquet(d)
    )
    out = streaming_kmv_sketch(src, "g", "v", k=32)
    name = f"t_kmvst_{uuid.uuid4().hex[:6]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in q.recentProgress
            if p.get("stateOperators")
        ]
    finally:
        q.stop()
    assert state_rows and max(state_rows) == 2, state_rows  # one per group


class TestBroadcastEscapeHatches:
    """broadcast_totals / broadcast_sketches=False drop the broadcast
    hint so a group cardinality beyond executor memory can fall back to
    a shuffled join — same escape-hatch pattern as
    embedding_ingest_dedup's broadcast_survivors."""

    def test_quantiles_hatch_drops_hint(self, spark):
        df = spark.createDataFrame(
            [("g", v) for v in range(20)], "g string, v int"
        )
        on = sk.exact_group_quantiles(df, "g", "v", [0.5])
        off = sk.exact_group_quantiles(
            df, "g", "v", [0.5], broadcast_totals=False
        )
        p_on = on._jdf.queryExecution().executedPlan().toString()
        p_off = off._jdf.queryExecution().executedPlan().toString()
        # prefix_sum_per_key's internal offsets join stays broadcast;
        # the hatch must remove exactly the totals join's hint
        assert p_on.count("BroadcastHashJoin") == \
            p_off.count("BroadcastHashJoin") + 1
        assert sorted(map(tuple, on.collect())) == sorted(map(tuple, off.collect()))

    def test_overlap_matrix_hatch_drops_hint(self, spark):
        df = spark.createDataFrame(
            [("a", f"v{i}") for i in range(50)]
            + [("b", f"v{i}") for i in range(25, 75)],
            "g string, v string",
        )
        s = sk.kmv_sketch(df, "g", "v", k=16)
        on = sk.kmv_overlap_matrix(s, "g", k=16)
        off = sk.kmv_overlap_matrix(s, "g", k=16, broadcast_sketches=False)
        p_on = on._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in p_on
        assert sorted(map(tuple, on.collect())) == sorted(map(tuple, off.collect()))

    def test_stratified_hatch_drops_hint(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            stratified_sample_exact,
        )

        df = spark.createDataFrame(
            [("s", f"id{i}") for i in range(30)], "g string, id string"
        )
        on = stratified_sample_exact(df, "g", "id", 0.5)
        off = stratified_sample_exact(
            df, "g", "id", 0.5, broadcast_totals=False
        )
        p_on = on._jdf.queryExecution().executedPlan().toString()
        p_off = off._jdf.queryExecution().executedPlan().toString()
        assert p_on.count("BroadcastHashJoin") == \
            p_off.count("BroadcastHashJoin") + 1
        assert sorted(map(tuple, on.collect())) == sorted(map(tuple, off.collect()))


class TestApproxGroupQuantiles:
    """approx_group_quantiles: exact quantiles of the mergeable
    bottom-k sample; with k >= group size it IS the exact answer."""

    def test_equals_exact_when_k_covers_group(self, spark):
        df = spark.createDataFrame(
            [("g", f"id{i}", v) for i, v in enumerate([5, 1, 4, 2, 3, 9, 7])],
            "g string, id string, v int",
        )
        approx = sorted(map(tuple, sk.approx_group_quantiles(
            df, "g", "v", "id", [0.25, 0.5, 0.75], k=100).collect()))
        exact = sorted(map(tuple, sk.exact_group_quantiles(
            df, "g", "v", [0.25, 0.5, 0.75]).collect()))
        assert approx == exact

    def test_rank_error_within_bound(self, spark):
        # 1000 uniform values, k=256: sampled median's true rank must
        # sit within ~4 standard errors of 0.5 (sqrt(.25/256) ~ 3.1%)
        df = spark.createDataFrame(
            [("g", f"id{i}", i) for i in range(1000)],
            "g string, id string, v int",
        )
        [row] = sk.approx_group_quantiles(
            df, "g", "v", "id", [0.5], k=256).collect()
        true_rank = row["v"] / 1000.0
        assert abs(true_rank - 0.5) < 0.125, row


class TestWeightedGroupQuantiles:
    """weighted_group_quantiles: value at cumulative-weight target
    ceil(q*W); weight-1 rows degrade to the unweighted exact quantiles;
    integer-weight guard."""

    def test_weighted_semantics(self, spark):
        # values 1..4 with weights 1,1,1,7 (W=10): q=0.5 target 5 ->
        # value 4 (its cum range is 4..10); q=0.3 target 3 -> value 3
        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 1), ("g", 3, 1), ("g", 4, 7)],
            "g string, v int, w int",
        )
        got = {
            (r["g"], r["q"]): r["v"]
            for r in sk.weighted_group_quantiles(
                df, "g", "v", "w", [0.3, 0.5, 1.0]).collect()
        }
        assert got == {("g", 0.3): 3, ("g", 0.5): 4, ("g", 1.0): 4}

    def test_unit_weights_match_unweighted(self, spark):
        rows = [("g", v) for v in [5, 1, 4, 2, 3, 9, 7]]
        df = spark.createDataFrame(rows, "g string, v int").withColumn(
            "w", F.lit(1)
        )
        qs = [0.25, 0.5, 0.75]
        weighted = sorted(map(tuple, sk.weighted_group_quantiles(
            df, "g", "v", "w", qs).collect()))
        exact = sorted(map(tuple, sk.exact_group_quantiles(
            df, "g", "v", qs).collect()))
        assert weighted == exact

    def test_guards(self, spark):
        import pytest as _pytest

        df = spark.createDataFrame([("g", 1, 0)], "g string, v int, w int")
        with _pytest.raises(Exception, match="integers >= 1"):
            sk.weighted_group_quantiles(df, "g", "v", "w", [0.5]).collect()
        dfn = spark.createDataFrame(
            [("g", 1, None)], "g string, v int, w int"
        )
        with _pytest.raises(Exception, match="integers >= 1"):
            sk.weighted_group_quantiles(dfn, "g", "v", "w", [0.5]).collect()
        with _pytest.raises(ValueError, match="quantiles"):
            sk.weighted_group_quantiles(df, "g", "v", "w", [0.0])
