"""Property tests for nondeterministic functions (excluded from
hash-checked oracles per FIXTURES.md §5) and Hypothesis-driven checks of
the engine's shims against Python reference semantics."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.functions import scalar as fx


def test_rand_integer_bounds(spark):
    df = spark.range(2000).select(fx.rand_integer(7, seed=42).alias("r"))
    pdf = df.toPandas()
    assert pdf.r.between(0, 6).all()
    assert set(pdf.r.unique()) == set(range(7))  # all buckets hit


def test_rand_uniform_range(spark):
    df = spark.range(5000).select(F.rand(seed=1).alias("x"))
    pdf = df.toPandas()
    assert ((pdf.x >= 0) & (pdf.x < 1)).all()
    assert 0.4 < pdf.x.mean() < 0.6


def test_uuid_unique_and_shaped(spark):
    pdf = spark.range(500).select(F.expr("uuid()").alias("u")).toPandas()
    assert pdf.u.nunique() == 500
    assert pdf.u.str.match(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    ).all()


@settings(max_examples=30, deadline=None)
@given(
    s=st.text(alphabet="abcxyz_%", min_size=0, max_size=8),
)
def test_similar_to_pattern_translation(s):
    """The SQL-pattern -> regex translation agrees with a Python oracle
    on %/_ wildcards (no char classes in this property)."""
    import re

    pattern = "a%c_"
    regex = "^" + fx._sql_regex_to_re(pattern) + "$"
    py = re.fullmatch("a.*c.", s) is not None
    ours = re.fullmatch(regex, s) is not None
    assert py == ours


def test_truncate_matches_python(spark):
    import math
    import random

    rng = random.Random(42)
    cases = [(rng.uniform(-1e6, 1e6), rng.randint(0, 4)) for _ in range(64)]
    df = spark.createDataFrame(cases, "x double, d int")
    for d in range(5):
        got = {
            r.x: r.t
            for r in df.filter(F.col("d") == d).select("x", fx.truncate(F.col("x"), d).alias("t")).collect()
        }
        for x, t in got.items():
            factor = 10**d
            expected = math.trunc(x * factor) / factor
            assert t == expected or abs(t - expected) < 1e-9, (x, d, t, expected)
