"""Fluent DataSet-API facade (dataset_api.py) — DataSet.java surface.

Every fluent chain is checked against the equivalent hand-built
DataFrame plan or a hand-computed expected result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.dataset_api import DataSet, ExecutionEnvironment


@pytest.fixture()
def env(spark):
    return ExecutionEnvironment.get_execution_environment(spark)


@pytest.fixture()
def words(env):
    return env.from_collection(
        [("a", 1), ("b", 2), ("a", 3), ("c", 4), ("b", 5)], "w string, n int"
    )


class TestEnvironment:
    def test_generate_sequence_inclusive(self, env):
        assert sorted(r[0] for r in env.generate_sequence(3, 7).collect()) == [
            3, 4, 5, 6, 7,
        ]

    def test_from_elements_and_text_roundtrip(self, env, tmp_path):
        ds = env.from_elements(("x",), ("y",), schema="v string")
        ds.write_as_text(str(tmp_path / "t"))
        back = env.read_text_file(str(tmp_path / "t"))
        assert sorted(r[0] for r in back.collect()) == ["x", "y"]

    def test_csv_roundtrip(self, env, words, tmp_path):
        words.write_as_csv(str(tmp_path / "c"))
        back = env.read_csv_file(str(tmp_path / "c"), schema="w string, n int")
        assert back.count() == 5


class TestRowOps:
    def test_map_filter_project(self, env, words):
        got = (
            words.filter(F.col("n") > 1)
            .map(F.col("w"), (F.col("n") * 10).alias("n10"))
            .project(1, 0)  # positional, Flink-style
            .collect()
        )
        assert sorted(map(tuple, got)) == [(20, "b"), (30, "a"), (40, "c"), (50, "b")]

    def test_flat_map_explodes(self, env):
        ds = env.from_collection([("a b", 1)], "s string, n int")
        got = ds.flat_map(F.explode(F.split("s", " ")).alias("tok"), F.col("n")).collect()
        assert sorted(map(tuple, got)) == [("a", 1), ("b", 1)]

    def test_map_partition_arrow(self, env, words):
        def double(batches):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["n"] = pdf["n"] * 2
                yield pdf

        got = words.map_partition(double, "w string, n int").collect()
        assert sorted(r.n for r in got) == [2, 4, 6, 8, 10]


class TestGrouping:
    def test_group_by_sum_and_position_keys(self, env, words):
        by_name = {r.w: r.n for r in words.group_by("w").sum("n").collect()}
        by_pos = {r.w: r.n for r in words.group_by(0).sum(1).collect()}
        assert by_name == by_pos == {"a": 4, "b": 7, "c": 4}

    def test_agg_fields_multi(self, env, words):
        got = {r.w: (r.n,) for r in words.group_by("w").agg_fields(("SUM", "n")).collect()}
        assert got["b"] == (7,)

    def test_min_by_max_by_whole_row(self, env, words):
        mn = {r.w: r.n for r in words.group_by("w").min_by("n").collect()}
        mx = {r.w: r.n for r in words.group_by("w").max_by("n").collect()}
        assert mn == {"a": 1, "b": 2, "c": 4}
        assert mx == {"a": 3, "b": 5, "c": 4}

    def test_sort_group_first(self, env, words):
        got = words.group_by("w").sort_group("n", "DESC").first(1).collect()
        assert {(r.w, r.n) for r in got} == {("a", 3), ("b", 5), ("c", 4)}

    def test_reduce_group(self, env, words):
        def concat(pdf):
            import pandas as pd

            return pd.DataFrame(
                {"w": [pdf["w"].iloc[0]],
                 "joined": ["+".join(map(str, sorted(pdf["n"])))]}
            )

        got = {r.w: r.joined for r in
               words.group_by("w").reduce_group(concat, "w string, joined string").collect()}
        assert got == {"a": "1+3", "b": "2+5", "c": "4"}


class TestBinaryOps:
    def test_join_where_equal_to(self, env, words):
        dims = env.from_collection([("a", "alpha"), ("b", "beta")], "k string, full string")
        got = (
            words.join(dims, hint="tiny").where("w").equal_to("k").df
        )
        assert "Broadcast" in got._jdf.queryExecution().executedPlan().toString()
        rows = {(r.w, r.n, r.full) for r in got.collect()}
        assert ("a", 1, "alpha") in rows and len(rows) == 4

    def test_outer_join_kinds(self, env, words):
        dims = env.from_collection([("a", "alpha")], "k string, full string")
        left = words.left_outer_join(dims).where("w").equal_to("k").collect()
        assert sum(1 for r in left if r.full is None) == 3  # b,b,c unmatched
        full = words.full_outer_join(
            env.from_collection([("z", "zed")], "k string, full string")
        ).where("w").equal_to("k").collect()
        assert any(r.w is None for r in full)

    def test_co_group_apply(self, env, words):
        other = env.from_collection([("a", 10), ("z", 20)], "k string, m int")

        def cg(lpdf, rpdf):
            import pandas as pd

            key = lpdf["w"].iloc[0] if len(lpdf) else rpdf["k"].iloc[0]
            return pd.DataFrame(
                {"key": [key], "nl": [len(lpdf)], "nr": [len(rpdf)]}
            )

        got = {r.key: (r.nl, r.nr) for r in
               words.co_group(other).where("w").equal_to("k")
               .apply(cg, "key string, nl long, nr long").collect()}
        assert got == {"a": (2, 1), "b": (2, 0), "c": (1, 0), "z": (0, 1)}

    def test_cross_union_distinct(self, env, words):
        two = env.from_collection([(1,), (2,)], "x int")
        assert words.cross(two).count() == 10
        assert words.union(words).count() == 10  # UNION ALL semantics
        assert words.union(words).distinct().count() == 5
        assert words.distinct("w").count() == 3

    def test_validation_errors(self, env, words):
        dims = env.from_collection([("a", "x")], "k string, v string")
        with pytest.raises(ValueError, match="where"):
            words.join(dims).equal_to("k")
        with pytest.raises(ValueError, match="equal_to"):
            words.co_group(dims).where("w").apply(lambda a, b: None, "x int")


class TestPartitioningAndUtils:
    def test_zip_with_index_consecutive(self, env, words):
        idx = sorted(r["index"] for r in words.zip_with_index(["n"]).collect())
        assert idx == [0, 1, 2, 3, 4]

    def test_zip_with_unique_id_unique(self, env, words):
        ids = [r.unique_id for r in words.zip_with_unique_id().collect()]
        assert len(set(ids)) == 5

    def test_first_and_aggregate_global(self, env, words):
        assert words.first(2).count() == 2
        assert words.sum("n").collect()[0].n == 15
        assert words.max(1).collect()[0].n == 5

    def test_partitioning_lowering(self, env, words):
        assert words.partition_by_hash("w").df.rdd.getNumPartitions() >= 1
        assert words.rebalance(4).df.rdd.getNumPartitions() == 4
        # sort_partition keeps rows, sorts locally
        assert words.sort_partition("n", "DESC").count() == 5


class TestIterations:
    """DataSet.iterate / iterateDelta through the facade
    (DataSet.java:1156,1206)."""

    def test_bulk_iterate_converges_early(self, env):
        # doubling with a cap: converges (fixpoint) after 3 supersteps
        # of the 10 allowed; termination is an aggregate, not a collect
        ds = env.from_collection([(1,), (3,)], "x int")
        out = ds.iterate(10).close_with(
            lambda d: d.map(F.least(F.col("x") * 2, F.lit(8)).alias("x")),
            termination=lambda prev, cur: (
                prev.df.exceptAll(cur.df).isEmpty()
                and cur.df.exceptAll(prev.df).isEmpty()
            ),
        )
        assert sorted(r.x for r in out.collect()) == [8, 8]

    def test_delta_iterate_cc_chain(self, spark):
        from flink_1_8_sourcecode_spark.queries.rowops import (
            dataset_api_delta_cc,
        )

        rows = dataset_api_delta_cc(spark, "").collect()
        assert len(rows) == 100
        assert all(r.component == (r.id // 10) * 10 for r in rows)

    def test_delta_workset_shrinks_then_empties(self, env):
        # 1-chain of 5: the workset must strictly shrink and the loop
        # must stop on empty workset well before max_iterations
        from flink_1_8_sourcecode_spark.dataset_api import DataSet

        v = env.spark.range(5).select("id", F.col("id").alias("component"))
        fwd = env.spark.range(4).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        edges = DataSet(
            fwd.unionByName(
                fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        )
        vertices = DataSet(v)

        def step(solution, workset):
            ch = (
                workset.join(edges).where("id").equal_to("src")
                .map(F.col("dst").alias("cid"), F.col("component").alias("cand"))
                .group_by("cid").min("cand")
                .join(solution).where("cid").equal_to("id")
                .filter(F.col("cand") < F.col("component"))
                .map(F.col("cid").alias("id"), F.col("cand").alias("component"))
            )
            return ch, ch

        out = vertices.iterate_delta(vertices, 50, "id").close_with(step)
        rows = out.collect()
        assert sorted((r.id, r.component) for r in rows) == [
            (i, 0) for i in range(5)
        ]

    def test_iteration_validation(self, env, words):
        with pytest.raises(ValueError, match="positive"):
            words.iterate(0)
        with pytest.raises(ValueError, match="positive"):
            words.iterate_delta(words, -1, "w")
