"""Property-fuzz the catalog SQL rewrite layer (engine.py
mask_literals / _table_alias_bindings / _shadow_spans /
_route_external_catalogs) — the reference resolves catalog.db.table
names through Calcite's ExternalCatalogSchema scope resolution
(flink-table/.../catalog/ExternalCatalogSchema.scala); this repo's
pre-rewrite must behave identically on the statements Spark alone can
parse: rewrite == identity wherever no out-of-scope catalog name
appears, alias shadowing is per QUERY BLOCK (an alias bound inside a
subquery must not block resolution outside it), and dotted names
inside string literals or comments are never rewritten."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_1_8_sourcecode_spark.engine import Engine
from flink_1_8_sourcecode_spark.external_catalog import (
    InMemoryExternalCatalog,
)
from flink_1_8_sourcecode_spark.plans.sql_rewrite import mask_literals

# --- mask_literals unit properties -----------------------------------

_FRAGMENTS = st.lists(
    st.sampled_from([
        "SELECT a FROM t ",
        "'it''s'",
        "'cat.db1.tb'",
        '"quoted id"',
        "`back.tick`",
        "-- line cat.db1.tb comment\n",
        "-- unclosed 'quote\n",
        "/* block 'quote' */",
        "/* nested /* cat.db1.tb */ tail */",
        "WHERE x = 'a--b' ",
        "(a + b) ",
    ]),
    min_size=1,
    max_size=6,
)


@settings(max_examples=200, deadline=None)
@given(parts=_FRAGMENTS)
def test_mask_preserves_length_and_blanks_protected_regions(parts):
    sql = "".join(parts)
    masked = mask_literals(sql)
    assert len(masked) == len(sql)
    # unprotected characters survive unchanged; protected ones blank
    for orig, m in zip(sql, masked):
        assert m == orig or m == " "
    # masking is idempotent: a masked statement has no live literal or
    # comment interiors left to blank
    assert mask_literals(masked) == masked
    # no dotted catalog path survives inside a literal or comment
    for tok in ("cat.db1.tb",):
        i = 0
        while (i := masked.find(tok, i)) != -1:
            # any survivor must also be present verbatim in code
            # position of the original (not preceded by quote/comment
            # openers that mask_literals should have blanked)
            assert sql[i:i + len(tok)] == tok
            i += 1


def test_mask_comment_quote_does_not_swallow_code():
    # the r15 hole: an apostrophe inside a line comment used to open a
    # phantom literal that blanked real code up to the next quote
    sql = "SELECT a -- don't\nFROM base WHERE b = 'x'"
    masked = mask_literals(sql)
    assert "FROM base WHERE b =" in masked
    assert "don't" not in masked  # comment interior blanked
    assert "'x'" not in masked or masked.count("x") == 0


# --- catalog rewrite properties --------------------------------------


@pytest.fixture(scope="module")
def env(spark):
    eng = Engine(spark)
    base = spark.range(20).selectExpr(
        "cast(id as int) AS a", "cast(id % 7 as int) AS b"
    )
    base.createOrReplaceTempView("base")
    tb = spark.range(12).selectExpr(
        "cast(id as int) AS a", "cast(id % 5 as int) AS b"
    )
    tb.createOrReplaceTempView("truth_tb")
    cat = InMemoryExternalCatalog("cat")
    db = cat.create_sub_catalog("db1")
    db.create_table("tb", tb)
    eng.register_external_catalog("cat", cat)
    yield eng


_COMMENTS = st.sampled_from([
    "",
    "-- cat.db1.tb",
    "/* cat.db1.tb */",
    "-- it's a trap",
    "/* don't 'stop' */",
    "/* nested /* cat.db1.tb */ ok */",
])
_LITERALS = st.sampled_from([
    "'cat.db1.tb'",
    "'it''s'",
    "'-- not a comment'",
    "'/* not a comment */'",
    "'plain'",
])
_ALIASES = st.sampled_from(["cat", "t0", "window", "q"])
_WHERES = st.sampled_from(["", " WHERE {a}.a % 2 = 0", " WHERE {a}.a > 2"])


@settings(max_examples=25, deadline=None)
@given(alias=_ALIASES, lit=_LITERALS, com=_COMMENTS)
def test_identity_when_spark_resolves_alone(env, alias, lit, com):
    """No out-of-scope catalog reference -> the rewrite must return
    the statement UNCHANGED and create no scaffolding views — even
    when the alias spells the catalog name, the literal spells a
    catalog path, or a comment does."""
    q = (
        f"SELECT {alias}.a, {lit} AS s {com}\n"
        f"FROM base {alias} WHERE {alias}.a >= 0"
    )
    created: list[str] = []
    assert env._route_external_catalogs(q, created) == q
    assert created == []
    assert env.sql(q).count() == 20  # and Spark indeed resolves it


@settings(max_examples=20, deadline=None)
@given(sub_alias=st.sampled_from(["cat", "z"]), lit=_LITERALS,
       com=_COMMENTS)
def test_inner_alias_does_not_shadow_outer_catalog_ref(
    env, sub_alias, lit, com
):
    """Calcite scope resolution: an alias bound INSIDE a subquery is
    invisible to the enclosing query — `cat` as a subquery alias must
    not block `cat.db1.tb` resolution outside that subquery."""
    q = (
        f"SELECT t.a, {lit} AS s {com}\n"
        f"FROM cat.db1.tb t WHERE t.a IN "
        f"(SELECT {sub_alias}.a FROM base {sub_alias} "
        f"WHERE {sub_alias}.a < 9)"
    )
    got = sorted(r.a for r in env.sql(q).collect())
    assert got == list(range(9))


def test_top_level_alias_shadows_catalog_everywhere(env):
    # alias bound at statement level shadows the catalog even inside
    # subqueries (correlation scope) — identity, resolved by Spark
    q = ("SELECT cat.a FROM base cat "
         "WHERE cat.a IN (SELECT b FROM base WHERE b = cat.b)")
    created: list[str] = []
    assert env._route_external_catalogs(q, created) == q
    assert created == []


@st.composite
def _block(draw, depth: int, cat_ok: bool):
    """A query block over columns (a, b); returns (engine_sql,
    spark_equivalent_sql) where the catalog table is spelled
    cat.db1.tb in the former and truth_tb in the latter.  `cat_ok`
    is False when an enclosing block binds the alias `cat` (the
    catalog name is then out of scope, per Calcite)."""
    alias = draw(st.sampled_from(["cat", "t", "u"]))
    com = draw(_COMMENTS)
    where = draw(_WHERES).format(a=alias)
    use_cat_here = cat_ok and alias != "cat"
    choice = draw(st.integers(0, 2 if depth > 0 else 1))
    if choice == 2:
        sub, tsub = draw(_block(depth - 1, cat_ok and alias != "cat"))
        src, tsrc = f"({sub})", f"({tsub})"
    elif choice == 1 and use_cat_here:
        src, tsrc = "cat.db1.tb", "truth_tb"
    else:
        src = tsrc = "base"
    # a line comment must be newline-terminated inside a subquery or
    # it swallows the enclosing close-paren (that's SQL, not a rewrite
    # property)
    if com.startswith("--"):
        com += "\n"
    head = f"SELECT {alias}.a AS a, {alias}.b AS b {com} "
    return (
        f"{head} FROM {src} {alias}{where}",
        f"{head} FROM {tsrc} {alias}{where}",
    )


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_nested_blocks_match_spark_ground_truth(env, data):
    """Randomly nested subqueries mixing base tables, catalog tables,
    shadowing aliases, literals and comments: the routed statement
    must produce exactly the rows of the same statement with the
    catalog path replaced by the pre-registered truth view."""
    q, tq = data.draw(_block(depth=2, cat_ok=True))
    got = sorted(
        (r.a, r.b) for r in env.sql(q).collect()
    )
    want = sorted(
        (r.a, r.b) for r in env.spark.sql(tq).collect()
    )
    assert got == want
