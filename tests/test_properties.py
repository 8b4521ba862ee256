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


def test_asof_join_matches_pandas_merge_asof_with_null_payload(spark):
    """The union+struct-carry as-of join must agree with pandas
    merge_asof on randomized keyed version histories (including NULL
    payload fields in the latest version)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_left, n_right = 200, 80
    left_pd = pd.DataFrame({
        "k": rng.integers(0, 5, n_left),
        "t": rng.integers(0, 1000, n_left).astype("int64"),
    }).sort_values("t").reset_index(drop=True)
    right_pd = pd.DataFrame({
        "k": rng.integers(0, 5, n_right),
        "rt": np.sort(rng.choice(np.arange(0, 1000, 7), n_right, replace=False)).astype("int64"),
        "payload": [None if i % 11 == 0 else float(i) for i in range(n_right)],
    }).sort_values("rt").reset_index(drop=True)

    from flink_1_8_sourcecode_spark.operators.joins import asof_join

    got = asof_join(
        spark.createDataFrame(left_pd, "k long, t long"),
        spark.createDataFrame(right_pd, "k long, rt long, payload double"),
        on="k", left_time="t", right_time="rt",
    ).toPandas().sort_values(["k", "t"]).reset_index(drop=True)

    exp = pd.merge_asof(
        left_pd.sort_values("t"), right_pd.sort_values("rt"),
        left_on="t", right_on="rt", by="k",
    ).sort_values(["k", "t"]).reset_index(drop=True)

    assert len(got) == len(exp)
    for g, e in zip(got.itertuples(index=False), exp.itertuples(index=False)):
        assert (g.k, g.t) == (e.k, e.t)
        ge, ee = g.payload, e.payload
        assert (pd.isna(ge) and pd.isna(ee)) or ge == ee, (g, e)


def test_lsh_cap_preserves_transitive_closure(spark):
    """Star-linking hot buckets must keep the same connected components
    as the uncapped all-pairs expansion (that is the dedup contract)."""
    import numpy as np

    rng = np.random.default_rng(3)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",
        "completely different words entirely here now",
    ]
    rows = []
    for i in range(120):
        base = texts[int(rng.integers(0, len(texts)))]
        rows.append((i, base))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from flink_1_8_sourcecode_spark.operators.dedup import minhash_lsh_pairs

    def components(pairs_pdf):
        parent = list(range(120))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs_pdf.id_a, pairs_pdf.id_b):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[ra] = rb
        return frozenset(frozenset(i for i in range(120) if find(i) == r)
                         for r in {find(i) for i in range(120)})

    capped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=8).toPandas()
    uncapped = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=None).toPandas()
    assert len(capped) < len(uncapped)  # the cap actually bit
    assert components(capped) == components(uncapped)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized check of the union+carry as-of join against pandas
    merge_asof (the reference semantics of TemporalRowtimeJoin): 5 keys,
    random probe times, unique build times per key."""
    import random

    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.joins import asof_join

    rng = random.Random(7)
    lrows = [
        (k, rng.randrange(0, 500), round(rng.random(), 6))
        for k in range(1, 6)
        for _ in range(40)
    ]
    rrows = [
        (k, t, float(t) + k) for k in range(1, 6) for t in rng.sample(range(500), 30)
    ]
    left = spark.createDataFrame(lrows, "k int, lt long, lv double")
    right = spark.createDataFrame(rrows, "k int, rt long, rv double")
    got = asof_join(left, right, on="k", left_time="lt", right_time="rt").toPandas()

    lp = pd.DataFrame(lrows, columns=["k", "lt", "lv"]).sort_values(
        ["lt", "k", "lv"], kind="mergesort"
    )
    rp = pd.DataFrame(rrows, columns=["k", "rt", "rv"]).sort_values(
        "rt", kind="mergesort"
    )
    exp = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k")

    def canon(df, cols=("k", "lt", "lv", "rv")):
        return sorted(
            tuple(None if pd.isna(v) else round(float(v), 6) for v in t)
            for t in df[list(cols)].itertuples(index=False, name=None)
        )

    assert canon(got) == canon(exp)


def test_skew_salted_join_random_distributions(spark):
    """Randomized key distributions (incl. a planted heavy hitter):
    salted join multiset-equals the plain join every time."""
    import random

    from flink_1_8_sourcecode_spark.operators import partitioning

    rng = random.Random(11)
    for trial in range(3):
        hot = rng.randrange(1, 10)
        rows = [(hot, i) for i in range(2000)] + [
            (rng.randrange(1, 30), i) for i in range(500)
        ]
        left = spark.createDataFrame(rows, "k int, v int")
        dim = spark.createDataFrame(
            [(i, i * 10) for i in range(1, 30) if rng.random() < 0.8],
            "k int, attr int",
        )
        got = partitioning.skew_salted_join(left, dim, on="k", seed=trial)
        plain = left.join(dim, "k")
        assert got.count() == plain.count(), f"trial {trial}"
        assert got.exceptAll(plain).count() == 0, f"trial {trial}"


def test_asof_join_directions_and_tolerance_match_pandas():
    """merge_asof parity for the round-6 surface extension: direction
    backward/forward/nearest x tolerance on randomized numeric-time
    version histories."""
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.joins import asof_join
    from flink_1_8_sourcecode_spark.session import get_spark

    spark = get_spark(app_name="flink18-spark-tests")
    rng = np.random.default_rng(7)
    n_l, n_r = 120, 80
    lp = pd.DataFrame({
        "k": rng.integers(0, 5, n_l),
        "lt": rng.integers(0, 1000, n_l).astype("float64"),
    }).sort_values("lt", kind="stable").reset_index(drop=True)
    lp["lid"] = np.arange(n_l)
    rp = pd.DataFrame({
        "k": rng.integers(0, 5, n_r),
        "rt": np.sort(rng.choice(np.arange(0, 1000, 3), n_r, replace=False)).astype("float64"),
        "payload": rng.integers(0, 10**6, n_r),
    }).reset_index(drop=True)

    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50.0):
            got = (
                asof_join(left, right, on="k", left_time="lt", right_time="rt",
                          direction=direction, tolerance=tol)
                .toPandas().sort_values("lid").reset_index(drop=True)
            )
            kw = {"tolerance": tol} if tol is not None else {}
            exp = pd.merge_asof(
                lp, rp, left_on="lt", right_on="rt", by="k",
                direction=direction, **kw,
            )
            for i in range(n_l):
                g, e = got.loc[i], exp.loc[i]
                ok = (g["payload"] == e["payload"]) or (
                    pd.isna(g["payload"]) and pd.isna(e["payload"])
                )
                assert ok, (direction, tol, i, g.to_dict(), e.to_dict())


def test_asof_time_buckets_parity_and_fanout():
    """The hot-key time-bucket pre-split (time_buckets=) is a pure
    re-plan: identical output to the unbucketed carry across
    direction x tolerance x bucket width on randomized histories —
    including widths that cut mid-history and a width larger than the
    whole range (single bucket).  The skew case: one key holding 90%
    of rows fans its carry across (key, bucket) partitions, visible as
    __bkt in the window partitioning."""
    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.joins import asof_join
    from flink_1_8_sourcecode_spark.session import get_spark

    spark = get_spark(app_name="flink18-spark-tests")
    rng = np.random.default_rng(13)
    n_l, n_r = 150, 100
    # 90% of left rows on the hot key 0 — the skew shape the pre-split is for
    lp = pd.DataFrame({
        "k": np.where(rng.random(n_l) < 0.9, 0, rng.integers(1, 5, n_l)),
        "lt": rng.integers(0, 1000, n_l).astype("float64"),
    })
    lp["lid"] = np.arange(n_l)
    rp = pd.DataFrame({
        "k": np.where(rng.random(n_r) < 0.9, 0, rng.integers(1, 5, n_r)),
        "rt": rng.choice(np.arange(0, 1000, 2), n_r, replace=False).astype("float64"),
        "payload": rng.integers(0, 10**6, n_r),
    })
    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 40.0):
            base = (
                asof_join(left, right, on="k", left_time="lt", right_time="rt",
                          direction=direction, tolerance=tol)
                .toPandas().sort_values("lid").reset_index(drop=True)
            )
            for width in (64.0, 250.0, 5000.0):
                got = (
                    asof_join(left, right, on="k", left_time="lt", right_time="rt",
                              direction=direction, tolerance=tol, time_buckets=width)
                    .toPandas().sort_values("lid").reset_index(drop=True)
                )
                for i in range(n_l):
                    g, b = got.loc[i], base.loc[i]
                    ok = (g["payload"] == b["payload"]) or (
                        pd.isna(g["payload"]) and pd.isna(b["payload"])
                    )
                    assert ok, (direction, tol, width, i, g.to_dict(), b.to_dict())

    plan = (
        asof_join(left, right, on="k", left_time="lt", right_time="rt",
                  time_buckets=64.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the carry window must partition on (key, bucket) — the fan-out
    assert "__bkt" in plan and "partitionBy" not in plan  # sanity: physical plan
    import re as _re
    assert _re.search(r"hashpartitioning\(k#\d+L?, __bkt", plan), plan[:2000]


def test_asof_time_buckets_auto(spark=None):
    """time_buckets="auto" must (a) equal the unbucketed and
    manual-width answers on randomized skewed histories, and (b) fan
    the detected hot key's carry across (key, __bkt) partitions with
    NO user-supplied width."""
    import re as _re

    import numpy as np
    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.joins import asof_join
    from flink_1_8_sourcecode_spark.session import get_spark

    spark = get_spark(app_name="flink18-spark-tests")
    rng = np.random.default_rng(29)
    n_l, n_r = 200, 140
    # 90% of rows on hot key 0; cold keys 1..4
    lp = pd.DataFrame({
        "k": np.where(rng.random(n_l) < 0.9, 0, rng.integers(1, 5, n_l)),
        "lt": rng.integers(0, 1000, n_l).astype("float64"),
    })
    lp["lid"] = np.arange(n_l)
    rp = pd.DataFrame({
        "k": np.where(rng.random(n_r) < 0.9, 0, rng.integers(1, 5, n_r)),
        "rt": rng.choice(np.arange(0, 1000, 2), n_r, replace=False).astype("float64"),
        "payload": rng.integers(0, 10**6, n_r),
    })
    left = spark.createDataFrame(lp)
    right = spark.createDataFrame(rp)

    for direction in ("backward", "forward", "nearest"):
        base = (
            asof_join(left, right, on="k", left_time="lt", right_time="rt",
                      direction=direction)
            .toPandas().sort_values("lid").reset_index(drop=True)
        )
        for buckets in ("auto", 130.0):
            got = (
                asof_join(left, right, on="k", left_time="lt", right_time="rt",
                          direction=direction, time_buckets=buckets)
                .toPandas().sort_values("lid").reset_index(drop=True)
            )
            for i in range(n_l):
                g, b = got.loc[i], base.loc[i]
                ok = (g["payload"] == b["payload"]) or (
                    pd.isna(g["payload"]) and pd.isna(b["payload"])
                )
                assert ok, (direction, buckets, i, g.to_dict(), b.to_dict())

    # the carry must partition on (key, __bkt) with no user width
    probe = asof_join(
        left, right, on="k", left_time="lt", right_time="rt",
        time_buckets="auto",
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"hashpartitioning\(k#\d+L?, __bkt", plan), plan[:2000]


def test_repeated_span_intervals_and_strip_match_bruteforce(spark):
    """Randomized corpora: the distributed interval merge and the strip
    action agree with a direct Python reference (window counting +
    interval merging + covered-token removal)."""
    import random
    from collections import Counter

    from flink_1_8_sourcecode_spark.operators.dedup import (
        repeated_span_intervals,
        strip_repeated_spans,
    )

    rng = random.Random(1234)

    def reference(docs, n, min_count):
        wins = Counter()
        for toks in docs.values():
            for p in range(len(toks) - n + 1):
                wins[tuple(toks[p : p + n])] += 1
        intervals, stripped = set(), {}
        for did, toks in docs.items():
            pos = [
                p
                for p in range(len(toks) - n + 1)
                if wins[tuple(toks[p : p + n])] >= min_count
            ]
            merged = []
            for p in pos:
                if merged and p - merged[-1][1] < n:
                    merged[-1][1] = p
                else:
                    merged.append([p, p])
            covered = set()
            for a, b in merged:
                intervals.add(
                    (did, a + 1, b + n, " ".join(toks[a : b + n]))
                )
                covered.update(range(a, b + n))
            stripped[did] = " ".join(
                t for i, t in enumerate(toks) if i not in covered
            )
        return intervals, stripped

    for trial in range(8):
        n = rng.randint(2, 4)
        min_count = rng.randint(2, 3)
        docs = {
            did: [rng.choice("abcde") for _ in range(rng.randint(0, 14))]
            for did in range(rng.randint(2, 6))
        }
        df = spark.createDataFrame(
            [(did, " ".join(toks)) for did, toks in docs.items()],
            "doc_id long, text string",
        )
        want_iv, want_strip = reference(docs, n, min_count)
        got_iv = {
            (r["doc_id"], r["start_tok"], r["end_tok"], r["span"])
            for r in repeated_span_intervals(
                df, "doc_id", "text", n=n, min_count=min_count
            ).collect()
        }
        assert got_iv == want_iv, (trial, n, min_count, docs)
        got_strip = {
            r["doc_id"]: r["clean_text"]
            for r in strip_repeated_spans(
                df, "doc_id", "text", n=n, min_count=min_count
            ).collect()
        }
        assert got_strip == want_strip, (trial, n, min_count, docs)


def test_winnowing_matches_bruteforce_and_guarantee(spark):
    """Randomized corpora: distributed winnowing equals a direct Python
    reference (same md5-base gram hash, min per window, distinct), and
    the paper's guarantee holds: docs sharing a run of >= window+k-1
    tokens share at least one fingerprint."""
    import hashlib as _hl
    import random as _rand

    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_fingerprints

    def base(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:7], 16)

    def reference(toks, k, w):
        grams = [base(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
        if not grams:
            return set()
        if len(grams) < w:
            return {min(grams)}
        return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}

    rng = _rand.Random(4242)
    for trial in range(6):
        k = rng.randint(2, 4)
        w = rng.randint(2, 5)
        shared = [rng.choice("abcdef") for _ in range(w + k - 1)]
        docs = {}
        for did in range(5):
            toks = [rng.choice("abcdef") for _ in range(rng.randint(0, 20))]
            if did in (1, 3):  # plant the shared run
                p = rng.randint(0, len(toks))
                toks = toks[:p] + shared + toks[p:]
            docs[did] = toks
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()], "doc_id long, text string"
        )
        got = {}
        for r in winnowing_fingerprints(df, "doc_id", "text", k=k, window=w).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        want = {d: reference(t, k, w) for d, t in docs.items()}
        want = {d: s for d, s in want.items() if s}
        assert got == want, (trial, k, w, docs)
        assert got[1] & got[3], "guarantee violated: shared run, no shared fp"


def test_winnowing_plan_is_map_only(spark, sf_dir):
    from flink_1_8_sourcecode_spark.operators.dedup import winnowing_fingerprints
    from flink_1_8_sourcecode_spark.catalog import table

    d = table(spark, sf_dir, "documents")
    fps = winnowing_fingerprints(d, "doc_id", "text")
    plan = fps._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]


def test_ngram_novelty_hand_computed(spark):
    from flink_1_8_sourcecode_spark.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: "a b c", "b c d"
            (2, "a b c"),        # gram: "a b c" (shared with doc 1)
            (3, "x y z w"),      # grams: "x y z", "y z w" (unique)
            (4, "q r"),          # too short: no 3-grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams_distinct"], r["novelty"])
        for r in ngram_novelty(df, "doc_id", "text", k=3).collect()
    }
    assert got[1] == (2, 0.5)   # "a b c" shared, "b c d" novel
    assert got[2] == (1, 0.0)
    assert got[3] == (2, 1.0)
    assert got[4] == (0, 0.0)


# --- Table-API string-expression parser (table_api.py) -------------------

# random expression ASTs rendered BOTH as a Flink expression string and
# as a python lambda over a pandas frame — the parser must agree with
# python semantics on every draw
_expr_ast = st.deferred(
    lambda: st.one_of(
        st.sampled_from([("col", "a"), ("col", "b")]),
        st.integers(min_value=-20, max_value=20).map(lambda v: ("lit", v)),
        st.tuples(st.sampled_from(["+", "-", "*"]), _expr_ast, _expr_ast).map(
            lambda t: ("bin", *t)
        ),
        # ternary 'cond ? (then, else)' — round-12 ifThenElse surface
        st.tuples(
            st.sampled_from(["<", ">", "="]), _expr_ast, _expr_ast,
            _expr_ast, _expr_ast,
        ).map(lambda t: ("ter", *t)),
    )
)


def _render(ast):
    kind = ast[0]
    if kind == "col":
        return ast[1], (lambda r, c=ast[1]: r[c])
    if kind == "lit":
        v = ast[1]
        s = str(v) if v >= 0 else f"(0 - {abs(v)})"
        return s, (lambda r, v=v: v)
    if kind == "ter":
        _, cmp_op, cl, cr, tast, east = ast
        cls_, clf = _render(cl)
        crs, crf = _render(cr)
        ts, tf = _render(tast)
        es, ef = _render(east)
        pyc = {"<": lambda a, b: a < b, ">": lambda a, b: a > b,
               "=": lambda a, b: a == b}[cmp_op]
        return (
            f"(({cls_} {cmp_op} {crs}) ? ({ts}, {es}))",
            (lambda row, clf=clf, crf=crf, tf=tf, ef=ef, pyc=pyc:
             tf(row) if pyc(clf(row), crf(row)) else ef(row)),
        )
    _, op, l, r_ = ast
    ls, lf = _render(l)
    rs, rf = _render(r_)
    py = {"+": lambda a, b: a + b, "-": lambda a, b: a - b, "*": lambda a, b: a * b}[op]
    return f"({ls} {op} {rs})", (lambda row, lf=lf, rf=rf, py=py: py(lf(row), rf(row)))


@settings(max_examples=25, deadline=None)
@given(ast=_expr_ast, cmp=st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
def test_string_expression_parser_matches_python(spark, ast, cmp):
    import pandas as pd

    from flink_1_8_sourcecode_spark.table_api import Table

    rows = [(1, 3), (-2, 7), (5, -5), (0, 0)]
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    df = spark.createDataFrame(rows, "a long, b long")
    expr_s, expr_f = _render(ast)
    got = [r["v"] for r in Table(df).select(f"{expr_s} as v").df.collect()]
    want = [expr_f(row) for _, row in pdf.iterrows()]
    assert got == want, (expr_s, got, want)
    # and as a filter against a comparison with b
    pred = f"{expr_s} {cmp} b"
    pyc = {"<": "lt", "<=": "le", ">": "gt", ">=": "ge", "=": "eq", "<>": "ne"}[cmp]
    got_ids = {(r["a"], r["b"]) for r in Table(df).filter(pred).df.collect()}
    want_ids = {
        (row["a"], row["b"])
        for _, row in pdf.iterrows()
        if getattr(pd.Series([expr_f(row)]), pyc)(row["b"]).iloc[0]
    }
    assert got_ids == want_ids, (pred, got_ids, want_ids)


# --- Avro codec (sources/avro.py) round-trip fuzz ------------------------

_avro_primitive = st.sampled_from(["boolean", "int", "long", "float", "double",
                                   "bytes", "string"])


def _value_for(schema, draw_ints):
    if schema == "boolean":
        return st.booleans()
    if schema in ("int", "long"):
        return draw_ints
    if schema == "float":
        # float32-representable values so the 4-byte round trip is exact
        return st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 4.0)
    if schema == "double":
        return st.floats(allow_nan=False, allow_infinity=False, width=64)
    if schema == "bytes":
        return st.binary(max_size=16)
    if schema == "string":
        return st.text(max_size=16)
    raise AssertionError(schema)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_avro_roundtrip_fuzz(data):
    """Random flat record schemas (primitives + nullable unions + arrays
    + maps) encode -> decode to the identical python values, both codecs."""
    from flink_1_8_sourcecode_spark.sources.avro import (
        decode_container,
        encode_avro,
    )

    ints = st.integers(min_value=-(2**62), max_value=2**62)
    n_fields = data.draw(st.integers(min_value=1, max_value=5))
    fields, makers = [], []
    for i in range(n_fields):
        kind = data.draw(st.sampled_from(["plain", "nullable", "array", "map"]))
        prim = data.draw(_avro_primitive)
        vs = _value_for(prim, ints)
        if kind == "plain":
            fields.append({"name": f"f{i}", "type": prim})
            makers.append(vs)
        elif kind == "nullable":
            fields.append({"name": f"f{i}", "type": ["null", prim]})
            makers.append(st.one_of(st.none(), vs))
        elif kind == "array":
            fields.append({"name": f"f{i}",
                           "type": {"type": "array", "items": prim}})
            makers.append(st.lists(vs, max_size=4))
        else:
            fields.append({"name": f"f{i}",
                           "type": {"type": "map", "values": prim}})
            makers.append(st.dictionaries(st.text(max_size=6), vs, max_size=4))
    schema = {"type": "record", "name": "fz", "fields": fields}
    n_rows = data.draw(st.integers(min_value=0, max_value=5))
    rows = [
        {f["name"]: data.draw(m) for f, m in zip(fields, makers)}
        for _ in range(n_rows)
    ]
    codec = data.draw(st.sampled_from(["null", "deflate"]))
    ws, recs = decode_container(encode_avro(schema, rows, codec=codec))
    assert ws == schema
    assert recs == rows


def test_prefix_sum_per_key_matches_pandas_reference(spark):
    """prefix_sum_per_key (the two-pass distributed per-key exclusive
    prefix) must equal the single-machine pandas groupby-cumsum on
    randomized inputs: many/few keys, NULL keys, duplicate order
    values, values > 1, and partition counts that force key runs to
    span multiple range partitions."""
    import random

    import pandas as pd

    from flink_1_8_sourcecode_spark.operators.partitioning import (
        prefix_sum_per_key,
    )
    from pyspark.sql import functions as F

    rng = random.Random(17)
    for trial, (n_rows, keys, n_parts) in enumerate(
        [(300, ["a", "b"], 16), (200, ["a", None], 7),
         (120, ["k1", "k2", "k3", "k4"], 3), (50, ["only"], 11)]
    ):
        rows = [
            (rng.choice(keys), i, rng.randint(0, 9))
            for i in range(n_rows)
        ]
        pdf = pd.DataFrame(rows, columns=["k", "i", "v"])
        df = spark.createDataFrame(rows, "k string, i long, v long")
        got = (
            prefix_sum_per_key(
                df, "k", [F.col("i")], value_col="v", out_col="p",
                n_partitions=n_parts,
            )
            .toPandas()
            .sort_values("i")
            .reset_index(drop=True)
        )
        ref = pdf.sort_values(["k", "i"], na_position="first").copy()
        ref["p"] = ref.groupby("k", dropna=False)["v"].cumsum() - ref["v"]
        ref = ref.sort_values("i").reset_index(drop=True)
        assert list(got["p"]) == list(ref["p"]), f"trial {trial}"
        # rank form (value_col=None) = 0-based dense rank per key
        got_rank = (
            prefix_sum_per_key(df, "k", [F.col("i")], out_col="r",
                               n_partitions=n_parts)
            .toPandas().sort_values("i").reset_index(drop=True)
        )
        ref["r"] = ref.sort_values(["k", "i"], na_position="first").groupby(
            "k", dropna=False
        ).cumcount()
        ref2 = ref.sort_values("i").reset_index(drop=True)
        assert list(got_rank["r"]) == list(ref2["r"]), f"trial {trial} rank"


# ---------------------------------------------------------------------------
# CEP NFA vs Python-regex differential fuzz
# ---------------------------------------------------------------------------

_CEP_TEMPLATES = (
    "AB", "AB+C", "A+B", "AB*C", "AB?C", "A+B+", "AB+", "A?B", "AB*",
    "A+B?C", "AB?C+",
)


def _cep_build(template):
    """Template -> Pattern with strict contiguity (next + consecutive)
    and greedy quantifiers — SQL MATCH_RECOGNIZE semantics, which are
    also exactly Python re's leftmost-greedy semantics."""
    from flink_1_8_sourcecode_spark.cep.pattern import Pattern

    p, i, k = None, 0, 0
    while i < len(template):
        sym = template[i]
        i += 1
        quant = template[i] if i < len(template) and template[i] in "+*?" else None
        if quant:
            i += 1
        name = f"s{k}_{sym}"
        k += 1
        p = Pattern.begin(name) if p is None else p.next(name)
        p = p.where(lambda r, s=sym: r["sym"] == s)
        if quant == "+":
            p = p.one_or_more().consecutive().greedy()
        elif quant == "*":
            p = p.one_or_more().optional().consecutive().greedy()
        elif quant == "?":
            p = p.optional().greedy()
    return p.with_skip("skip_past_last").validate()


@settings(max_examples=300, deadline=None)
@given(
    s=st.text(alphabet="ABC", min_size=0, max_size=24),
    template=st.sampled_from(_CEP_TEMPLATES),
)
def test_cep_nfa_matches_regex_reference(s, template):
    """Differential fuzz: the hand-written NFA (cep/matcher.py:
    _find_matches) against Python's regex engine on row-local
    symbol predicates.  With strict contiguity, greedy quantifiers and
    SKIP PAST LAST ROW, SQL MATCH_RECOGNIZE match selection IS
    leftmost-greedy non-overlapping scanning — re.finditer's contract
    — so every (start, end) span must agree exactly."""
    import re as _re

    from flink_1_8_sourcecode_spark.cep.matcher import _find_matches

    rows = [{"sym": c} for c in s]
    times = [float(i) for i in range(len(s))]
    found = list(_find_matches(rows, times, _cep_build(template)))
    got = [(m[0][1], m[-1][1] + 1) for m in found]
    expected = [
        (m.start(), m.end())
        for m in _re.finditer(template, s)
        if m.end() > m.start()
    ]
    assert got == expected, (s, template, got, expected)


# --- polymorphic '+' (table_api term()) ----------------------------------

_plus_operand = st.sampled_from(
    [("col", "sa"), ("col", "sb"), ("col", "n"), ("slit", "Z_"), ("ilit", 7)]
)


@settings(max_examples=30, deadline=None)
@given(ops=st.lists(_plus_operand, min_size=2, max_size=5))
def test_polymorphic_plus_matches_python(spark, ops):
    """Left-fold of '+' over string/int operands: Flink semantics say
    the fold concatenates from the first step whose accumulated or
    incoming operand is a string, and adds before that.  At least one
    string operand is forced so every example exercises the concat
    path at some position."""
    from flink_1_8_sourcecode_spark.table_api import Table

    if not any(k == "slit" or (k == "col" and v in ("sa", "sb")) for k, v in ops):
        ops = ops + [("slit", "Z_")]
    row = {"sa": "x1", "sb": "y", "n": 3}
    df = spark.createDataFrame([("x1", "y", 3)], "sa string, sb string, n long")

    def render(k, v):
        if k == "col":
            return v, row[v]
        if k == "slit":
            return f"'{v}'", v
        return str(v), v

    exprs, vals = zip(*[render(k, v) for k, v in ops])
    acc = vals[0]
    for v in vals[1:]:
        if isinstance(acc, str) or isinstance(v, str):
            acc = f"{acc}{v}"
        else:
            acc = acc + v
    expr = " + ".join(exprs)
    got = Table(df).select(f"({expr}) as v").df.collect()[0]["v"]
    assert str(got) == str(acc), (expr, got, acc)


@given(
    counts=st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=10**9),
        min_size=1,
        max_size=8,
    ),
    budget=st.floats(min_value=0.001, max_value=1e12,
                     allow_nan=False, allow_infinity=False),
    max_epochs=st.integers(min_value=1, max_value=10),
)
@settings(max_examples=200, deadline=None)
def test_waterfill_invariants(counts, budget, max_epochs):
    """epoch_budget_mix's allocation core (operators/sampling.py:
    _waterfill): caps respected, budget conserved up to the total cap,
    uncapped keys proportional to size, termination on any input."""
    from flink_1_8_sourcecode_spark.operators.sampling import _waterfill

    caps = {s: float(max_epochs) * t for s, t in counts.items()}
    alloc = _waterfill(counts, budget, caps)
    tol = max(1e-4, 1e-9 * budget)
    # caps respected
    for s in counts:
        assert alloc[s] <= caps[s] + tol
        assert alloc[s] >= -tol
    # conservation: everything allocatable is allocated
    want_total = min(budget, sum(caps.values()))
    assert abs(sum(alloc.values()) - want_total) <= max(
        tol, 1e-6 * max(1.0, want_total)
    )
    # uncapped keys stay proportional to their size
    uncapped = [
        s for s in counts
        if counts[s] > 0 and alloc[s] < caps[s] - tol
    ]
    if len(uncapped) >= 2:
        ratios = {alloc[s] / counts[s] for s in uncapped}
        lo, hi = min(ratios), max(ratios)
        assert hi - lo <= max(1e-6, 1e-6 * hi)
