"""Exact-output tests on the reference's canonical inline datasets.

Mirrors the fixtures used across the reference's ITCases
(flink-table/flink-table-planner/src/test/scala/org/apache/flink/table/
runtime/utils/StreamTestData.scala:34-81; flink-tests/.../operators/util/
CollectionDataSets.java get3TupleDataSet/get5TupleDataSet) — FIXTURES.md §4.
Expected values are hand-computed, verifying null handling, outer-join
padding, and grouped-aggregation semantics row-for-row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

T3 = [
    (1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world"),
    (4, 3, "Hello world, how are you?"), (5, 3, "I am fine."),
    (6, 3, "Luke Skywalker"), (7, 4, "Comment#1"), (8, 4, "Comment#2"),
    (9, 4, "Comment#3"), (10, 4, "Comment#4"), (11, 5, "Comment#5"),
    (12, 5, "Comment#6"), (13, 5, "Comment#7"), (14, 5, "Comment#8"),
    (15, 5, "Comment#9"), (16, 6, "Comment#10"), (17, 6, "Comment#11"),
    (18, 6, "Comment#12"), (19, 6, "Comment#13"), (20, 6, "Comment#14"),
    (21, 6, "Comment#15"),
]

T5 = [
    (1, 1, 0, "Hallo", 1), (2, 2, 1, "Hallo Welt", 2),
    (2, 3, 2, "Hallo Welt wie", 1), (3, 4, 3, "Hallo Welt wie gehts?", 2),
    (3, 5, 4, "ABC", 2), (3, 6, 5, "BCD", 3), (4, 7, 6, "CDE", 2),
    (4, 8, 7, "DEF", 1), (4, 9, 8, "EFG", 1), (4, 10, 9, "FGH", 2),
    (5, 11, 10, "GHI", 1), (5, 12, 11, "HIJ", 3), (5, 13, 12, "IJK", 3),
    (5, 14, 13, "JKL", 2), (5, 15, 14, "KLM", 2),
]


@pytest.fixture(scope="module")
def t3(spark):
    return spark.createDataFrame(T3, "a int, b long, c string")


@pytest.fixture(scope="module")
def t5(spark):
    return spark.createDataFrame(T5, "a int, b long, c int, d string, e long")


@pytest.fixture(scope="module")
def t3_nulls(spark):
    rows = [(1, 1, "Hi"), (2, 2, None), (3, 2, "Hello world"), (4, 3, None)]
    return spark.createDataFrame(rows, "a int, b long, c string")


def test_grouped_sum_t3(t3):
    got = {
        r.b: r.s
        for r in t3.groupBy("b").agg(F.sum("a").alias("s")).collect()
    }
    assert got == {1: 1, 2: 5, 3: 15, 4: 34, 5: 65, 6: 111}


def test_null_handling_in_aggs(t3_nulls):
    row = t3_nulls.agg(
        F.count("c").alias("non_null"),
        F.count(F.lit(1)).alias("all_rows"),
        F.min("c").alias("min_c"),
    ).first()
    assert row.non_null == 2  # count(col) skips NULLs
    assert row.all_rows == 4
    assert row.min_c == "Hello world"  # NULLs ignored by min


def test_groupby_null_key(t3_nulls):
    rows = t3_nulls.groupBy("c").agg(F.count(F.lit(1)).alias("cnt")).collect()
    got = sorted(
        [(r.c, r.cnt) for r in rows], key=lambda x: (x[0] is None, x[0] or "")
    )
    # NULL is a single group (SQL GROUP BY semantics, same as Flink)
    assert got == [("Hello world", 1), ("Hi", 1), (None, 2)]


def test_left_outer_join_padding(t3, t5):
    # join t3.b = t5.e; e values cover 1..3 -> b in {4,5,6} pads NULL
    j = t3.join(t5, t3.b == t5.e, "left").select(t3.a, t3.b, t5.d)
    padded = j.filter(F.col("d").isNull()).select("b").distinct()
    assert sorted(r.b for r in padded.collect()) == [4, 5, 6]
    # b=1 ('Hi') matches e=1 rows: 5 of them
    assert j.filter((F.col("b") == 1)).count() == 5


def test_full_outer_join_both_padded(t3, t5):
    j = t3.join(t5, t3.b == t5.c, "full")
    left_only = j.filter(t5.c.isNull()).count()
    right_only = j.filter(t3.b.isNull()).count()
    # t3.b in 1..6, t5.c in 0..14: c in {0,7..14} unmatched (9 rows),
    # b values all matched (1..6 subset of 0..14)
    assert right_only == 9
    assert left_only == 0


def test_minby_maxby_whole_row(t5):
    # minBy(e) per a: Flink returns the whole row of the minimum
    got = {
        r.a: r.d
        for r in t5.groupBy("a")
        .agg(F.min_by("d", F.struct("e", "b")).alias("d"))
        .collect()
    }
    assert got == {1: "Hallo", 2: "Hallo Welt wie", 3: "Hallo Welt wie gehts?",
                   4: "DEF", 5: "GHI"}


def test_distinct_and_union(t3):
    u = t3.select("b").union(t3.select("b"))
    assert u.count() == 42  # UNION ALL keeps duplicates (DataSet.union)
    assert u.distinct().count() == 6


def test_first_n_semantics(t3):
    # first(2) per group, ordered by a (deterministic variant)
    from pyspark.sql import Window

    w = Window.partitionBy("b").orderBy("a")
    got = (
        t3.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"), F.min("a").alias("first_a"))
    )
    rows = {r.b: (r.n, r.first_a) for r in got.collect()}
    assert rows == {1: (1, 1), 2: (2, 2), 3: (2, 4), 4: (2, 7), 5: (2, 11), 6: (2, 16)}
