"""weighted_sample_no_replacement: differential vs an independent pure-
Python implementation, plus the w-proportional distribution property
(checked in Python over many salts — the hash scheme is engine-free, so
the statistical property of the CONSTRUCTION transfers to the Spark
lowering once the differential proves they compute the same thing).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.operators.sampling import (
    weighted_sample_no_replacement,
)


def _py_key(doc_id, w, salt=""):
    return min(
        hashlib.md5(f"{doc_id}#{c}{salt}".encode()).hexdigest()[:8]
        for c in range(1, w + 1)
    )


def _py_sample(rows, k, salt=""):
    """rows: [(group, id, w)] -> {group: [ids]} (min-key order)."""
    out: dict = {}
    for g, i, w in rows:
        out.setdefault(g, []).append((_py_key(i, w, salt), i))
    return {g: [i for _, i in sorted(v)[:k]] for g, v in out.items()}


ROWS = [("a", f"d{i}", (i % 7) + 1) for i in range(40)] + [
    ("b", f"e{i}", (i % 3) + 1) for i in range(9)
]


@pytest.mark.parametrize("salt", ["", "s1"])
def test_matches_independent_python(spark, salt):
    df = spark.createDataFrame(ROWS, "g string, id string, w int")
    got = weighted_sample_no_replacement(
        df, "g", "id", F.col("w"), k=6, salt=salt
    ).collect()
    by_g: dict = {}
    for r in got:
        by_g.setdefault(r["g"], []).append(r["id"])
    want = _py_sample(ROWS, 6, salt)
    assert {g: sorted(v) for g, v in by_g.items()} == {
        g: sorted(v) for g, v in want.items()
    }
    # group b has 9 rows > k=6 -> exactly k; and every picked row kept
    # its original columns
    assert len(by_g["a"]) == 6 and len(by_g["b"]) == 6


def test_k_at_least_group_size_returns_all(spark):
    df = spark.createDataFrame(ROWS[:5], "g string, id string, w int")
    assert weighted_sample_no_replacement(df, "g", "id", F.col("w"), k=99).count() == 5


def test_first_pick_proportional_to_weight():
    # pure-Python distribution check of the construction: first pick
    # (k=1) over 600 salts on weights 1/2/4 -> frequencies ~ w/7
    rows = [("g", "x", 1), ("g", "y", 2), ("g", "z", 4)]
    wins = {"x": 0, "y": 0, "z": 0}
    n = 600
    for s in range(n):
        pick = _py_sample(rows, 1, salt=f"t{s}")["g"][0]
        wins[pick] += 1
    for doc, w in [("x", 1), ("y", 2), ("z", 4)]:
        exp = n * w / 7
        # ~3.5 sigma band on a binomial(n, w/7)
        sd = (n * (w / 7) * (1 - w / 7)) ** 0.5
        assert abs(wins[doc] - exp) < 3.5 * sd, (doc, wins)


def test_weight_below_one_raises(spark):
    df = spark.createDataFrame([("g", "x", 0)], "g string, id string, w int")
    with pytest.raises(Exception, match="weight < 1"):
        weighted_sample_no_replacement(df, "g", "id", F.col("w"), k=1).collect()


def test_null_weight_raises(spark):
    # a NULL weight must raise as loudly as w < 1 — a NULL key would
    # silently never sample the row
    df = spark.createDataFrame(
        [("g", "x", None), ("g", "y", 2)], "g string, id string, w int"
    )
    with pytest.raises(Exception, match="NULL weight"):
        weighted_sample_no_replacement(df, "g", "id", F.col("w"), k=1).collect()


def test_param_guards(spark):
    df = spark.createDataFrame([("g", "x", 1)], "g string, id string, w int")
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_no_replacement(df, "g", "id", F.col("w"), k=0)
    with pytest.raises(ValueError, match="max_weight"):
        weighted_sample_no_replacement(df, "g", "id", F.col("w"), k=1, max_weight=0)


class TestUniformBottomK:
    """uniform_sample_bottomk (operators/sampling.py) + the online face
    (streaming/stateful.py:streaming_uniform_sample): bottom-k by hash
    is a mergeable summary — partition-wise bottom-k sets merge to the
    global sample, so stream == batch in any arrival order."""

    def test_matches_independent_python(self, spark):
        import hashlib

        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        rows = [("g", i) for i in range(100)] + [("h", i) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, id long")
        got = {
            (r["g"], r["id"])
            for r in uniform_sample_bottomk(df, "g", "id", k=5).collect()
        }
        want = set()
        for grp in ("g", "h"):
            ids = [i for g, i in rows if g == grp]
            best = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
            want |= {(grp, i) for i in best}
        assert got == want

    def test_merge_property(self, spark):
        # bottom-k of the union == bottom-k of (bottom-k(A) U bottom-k(B))
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        a = spark.createDataFrame([("g", i) for i in range(50)], "g string, id long")
        b = spark.createDataFrame([("g", i) for i in range(50, 120)], "g string, id long")
        whole = {r["id"] for r in uniform_sample_bottomk(
            a.union(b), "g", "id", k=7).collect()}
        pa_ = uniform_sample_bottomk(a, "g", "id", k=7)
        pb = uniform_sample_bottomk(b, "g", "id", k=7)
        merged = {r["id"] for r in uniform_sample_bottomk(
            pa_.union(pb), "g", "id", k=7).collect()}
        assert whole == merged

    def test_salt_changes_sample(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        df = spark.createDataFrame([("g", i) for i in range(200)], "g string, id long")
        s1 = {r["id"] for r in uniform_sample_bottomk(df, "g", "id", k=10).collect()}
        s2 = {r["id"] for r in uniform_sample_bottomk(
            df, "g", "id", k=10, salt="v2").collect()}
        assert s1 != s2 and len(s1) == len(s2) == 10

    def test_k_guard(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        with pytest.raises(ValueError, match="k must be positive"):
            uniform_sample_bottomk(None, "g", "id", k=0)

    def test_no_single_partition_funnel(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        df = spark.createDataFrame([("g", i) for i in range(100)], "g string, id long")
        plan = (
            uniform_sample_bottomk(df, "g", "id", k=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "SinglePartition" not in plan


class TestTemperatureMix:
    """temperature_mix (operators/sampling.py): n^alpha rebalancing —
    alpha=1 keeps natural proportions, alpha=0 equalizes, targets cap
    at source size, determinism across invocations."""

    def _df(self, spark):
        rows = (
            [("big", f"b{i}") for i in range(90)]
            + [("small", f"s{i}") for i in range(10)]
        )
        return spark.createDataFrame(rows, "src string, id string")

    def test_alpha_one_keeps_proportions(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            temperature_mix,
        )

        kept, targets = temperature_mix(self._df(spark), "src", "id", 1.0, 50)
        assert targets == {"big": 45, "small": 5}
        got = kept.groupBy("src").count().collect()
        assert {r["src"]: r["count"] for r in got} == targets

    def test_alpha_zero_equalizes(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            temperature_mix,
        )

        _, targets = temperature_mix(self._df(spark), "src", "id", 0.0, 20)
        assert targets == {"big": 10, "small": 10}

    def test_alpha_half_lifts_low_resource(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            temperature_mix,
        )

        _, targets = temperature_mix(self._df(spark), "src", "id", 0.5, 50)
        # sqrt weighting: p_small = 3.16/12.65 ~ 25% -> raw target 12,
        # capped at the 10 available docs; big gets round(37.5) = 38
        assert targets == {"big": 38, "small": 10}

    def test_target_caps_at_source_size(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            temperature_mix,
        )

        _, targets = temperature_mix(self._df(spark), "src", "id", 0.0, 1000)
        assert targets == {"big": 90, "small": 10}

    def test_deterministic_and_guards(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            temperature_mix,
        )

        df = self._df(spark)
        a, _ = temperature_mix(df, "src", "id", 0.7, 30)
        b, _ = temperature_mix(df, "src", "id", 0.7, 30)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        with pytest.raises(ValueError, match="alpha"):
            temperature_mix(df, "src", "id", -1, 10)
        with pytest.raises(ValueError, match="total_budget"):
            temperature_mix(df, "src", "id", 1.0, 0)


class TestStreamingUniformSampleContract:
    """ADVICE r14 + verdict task 6 (streaming/stateful.py:
    streaming_uniform_sample): string ids survive the state
    round-trip (no silent long-cast NULLing), n_seen counts DISTINCT
    ids per state fold, and the batch face excludes NULL ids."""

    def _run(self, spark, tmp_path, batches, k=3, name="t_usmp_contract"):
        import json

        from flink_1_8_sourcecode_spark.streaming.stateful import (
            streaming_uniform_sample,
        )

        d = tmp_path / "usmp_in"
        d.mkdir()
        for i, rows in enumerate(batches):
            with open(d / f"b{i}.json", "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
        src = (
            spark.readStream.schema("g string, id string")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        out = streaming_uniform_sample(src, "g", "id", k=k)
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("update").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        pdf = spark.table(name).toPandas()
        return pdf.sort_values("n_seen").groupby("g").last().reset_index()

    def test_string_ids_roundtrip_and_match_batch(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        ids = [f"doc-{i}" for i in range(40)]
        batches = [
            [{"g": "g1", "id": i} for i in ids[:25]],
            [{"g": "g1", "id": i} for i in ids[25:]],
        ]
        final = self._run(spark, tmp_path, batches, k=5,
                          name="t_usmp_str")
        got = set(final.loc[final["g"] == "g1", "sample_ids"].iloc[0])
        assert all(isinstance(x, str) for x in got)
        df = spark.createDataFrame([("g1", i) for i in ids], "g string, id string")
        want = {r["id"] for r in uniform_sample_bottomk(df, "g", "id", k=5).collect()}
        assert got == want

    def test_n_seen_counts_distinct_per_fold(self, spark, tmp_path):
        # the same id delivered twice WITHIN one fold counts once
        batches = [
            [
                {"g": "g1", "id": "a"},
                {"g": "g1", "id": "a"},
                {"g": "g1", "id": "b"},
            ]
        ]
        final = self._run(spark, tmp_path, batches, k=3, name="t_usmp_replay")
        assert int(final.loc[final["g"] == "g1", "n_seen"].iloc[0]) == 2

    def test_batch_face_excludes_null_ids(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            uniform_sample_bottomk,
        )

        rows = [("g", None)] * 5 + [("g", f"x{i}") for i in range(10)]
        df = spark.createDataFrame(rows, "g string, id string")
        got = [r["id"] for r in uniform_sample_bottomk(df, "g", "id", k=8).collect()]
        assert len(got) == 8 and None not in got

    def test_long_ids_keep_long_output(self, spark, tmp_path):
        import json

        from flink_1_8_sourcecode_spark.streaming.stateful import (
            streaming_uniform_sample,
        )

        d = tmp_path / "usmp_long"
        d.mkdir()
        with open(d / "b0.json", "w") as f:
            for i in range(20):
                f.write(json.dumps({"g": "g1", "id": i}) + "\n")
        src = (
            spark.readStream.schema("g string, id long")
            .option("maxFilesPerTrigger", 1)
            .json(str(d))
        )
        out = streaming_uniform_sample(src, "g", "id", k=4)
        assert out.schema["sample_ids"].dataType.simpleString() == "array<bigint>"
        q = (
            out.writeStream.format("memory").queryName("t_usmp_long")
            .outputMode("update").start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        pdf = spark.table("t_usmp_long").toPandas()
        samp = pdf.sort_values("n_seen").iloc[-1]["sample_ids"]
        assert len(samp) == 4 and all(isinstance(int(x), int) for x in samp)


class TestEpochBudgetMix:
    """epoch_budget_mix (operators/sampling.py — Muennighoff et al.
    2023 data-constrained scaling): proportional fill, water-filling
    past capped sources, integer epochs + fractional-prefix
    realization, determinism."""

    def _df(self, spark):
        rows = (
            [("big", f"b{i}", 10) for i in range(90)]
            + [("small", f"s{i}", 10) for i in range(10)]
        )
        return spark.createDataFrame(rows, "src string, id string, tok int")

    def test_proportional_no_caps(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            epoch_budget_mix,
        )

        kept, targets = epoch_budget_mix(
            self._df(spark), "src", "id", F.col("tok"),
            total_budget=500, max_epochs=4,
        )
        # 1000 total tokens, budget 500 -> alloc 450/50, epochs 0,
        # frac = alloc
        assert targets["big"]["epochs"] == 0
        assert targets["small"]["epochs"] == 0
        assert abs(targets["big"]["alloc"] - 450) < 1e-3
        assert abs(targets["small"]["alloc"] - 50) < 1e-3
        got = kept.groupBy("src").count().collect()
        assert {r["src"]: r["count"] for r in got} == {"big": 45, "small": 5}

    def test_cap_binds_and_waterfills(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            epoch_budget_mix,
        )

        kept, targets = epoch_budget_mix(
            self._df(spark), "src", "id", F.col("tok"),
            total_budget=2000, max_epochs=2,
        )
        # proportional first pass gives small 200 = its 2-epoch cap ->
        # pinned; big gets the rest (1800 = 2 epochs exactly)
        assert targets["small"]["alloc"] == 200.0
        assert targets["small"]["epochs"] == 2
        assert targets["small"]["frac_tokens"] == 0.0
        assert targets["big"]["epochs"] == 2
        counts = {
            (r["src"], r["n_copies"]): r["count"]
            for r in kept.groupBy("src", "n_copies").count().collect()
        }
        assert counts == {("big", 2): 90, ("small", 2): 10}

    def test_fractional_epoch_prefix(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            epoch_budget_mix,
        )

        kept, targets = epoch_budget_mix(
            self._df(spark), "src", "id", F.col("tok"),
            total_budget=1100, max_epochs=4,
        )
        # alloc big=990, small=110 -> epochs 1 + a 1-doc fractional
        # prefix for small (frac 10), 9-doc prefix for big (frac 90)
        assert targets["big"]["epochs"] == 1
        assert targets["small"]["epochs"] == 1
        two_small = kept.filter("src = 'small' AND n_copies = 2").count()
        assert two_small == 1
        # token-copies land within one crossing doc of the budget
        total_copies = kept.selectExpr("sum(n_copies * tok) s").first()["s"]
        assert 1100 <= total_copies <= 1100 + 10

    def test_determinism_and_guards(self, spark):
        from flink_1_8_sourcecode_spark.operators.sampling import (
            epoch_budget_mix,
        )

        df = self._df(spark)
        a, _ = epoch_budget_mix(df, "src", "id", F.col("tok"), 700)
        b, _ = epoch_budget_mix(df, "src", "id", F.col("tok"), 700)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        with pytest.raises(ValueError, match="total_budget"):
            epoch_budget_mix(df, "src", "id", F.col("tok"), 0)
        with pytest.raises(ValueError, match="max_epochs"):
            epoch_budget_mix(df, "src", "id", F.col("tok"), 10, max_epochs=0)
