"""External catalog facade (external_catalog.py, engine.py) —
TableEnvironment.registerExternalCatalog/:413,
getRegisteredExternalCatalog/:428 and the InMemoryExternalCatalog CRUD
tree (catalog/InMemoryExternalCatalog.scala): catalog.db.table names
resolve in Engine.sql/table/scan; unknown names throw the reference's
exception types."""

from __future__ import annotations

import pytest

from flink_1_8_sourcecode_spark.engine import Engine
from flink_1_8_sourcecode_spark.external_catalog import (
    CatalogAlreadyExistException,
    CatalogNotExistException,
    ExternalCatalogNotExistException,
    InMemoryExternalCatalog,
    TableAlreadyExistException,
    TableNotExistException,
)


@pytest.fixture()
def env(spark, sf_dir):
    eng = Engine(spark)
    cat = InMemoryExternalCatalog("warehouse")
    db = cat.create_sub_catalog("tpch")
    db.create_table("nat", spark.read.parquet(f"{sf_dir}/nation.parquet"))
    db.create_table("reg", spark.read.parquet(f"{sf_dir}/region.parquet"))
    # lazy table: only opened when first scanned
    cat.create_table(
        "lazy_reg", lambda: spark.read.parquet(f"{sf_dir}/region.parquet")
    )
    eng.register_external_catalog("warehouse", cat)
    return eng


class TestResolution:
    def test_scan_and_table(self, env, spark, sf_dir):
        want = spark.read.parquet(f"{sf_dir}/nation.parquet").count()
        assert env.scan("warehouse", "tpch", "nat").count() == want
        assert env.table("warehouse.tpch.nat").count() == want
        # 2-segment path: table directly under the catalog root
        assert env.table("warehouse.lazy_reg").count() == 5

    def test_sql_qualified_names(self, env):
        got = env.sql(
            "SELECT r.r_name, count(*) AS n "
            "FROM warehouse.tpch.nat n JOIN warehouse.tpch.reg r "
            "ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
        ).collect()
        assert sum(r["n"] for r in got) == 25
        assert len(got) == 5

    def test_sql_string_literal_not_rewritten(self, env):
        [r] = env.sql(
            "SELECT 'warehouse.tpch.nat' AS s FROM warehouse.tpch.reg LIMIT 1"
        ).collect()
        assert r["s"] == "warehouse.tpch.nat"

    def test_splice_views_are_dropped(self, env, spark):
        env.sql("SELECT * FROM warehouse.tpch.nat")
        leftovers = [
            t.name for t in spark.catalog.listTables()
            if t.name.startswith("__extcat_")
        ]
        assert leftovers == []

    def test_plain_session_tables_untouched(self, env, spark, sf_dir):
        env.register("plainnat", spark.read.parquet(f"{sf_dir}/nation.parquet"))
        assert env.sql("SELECT count(*) AS c FROM plainnat").collect()[0]["c"] == 25


class TestExceptions:
    def test_unknown_external_catalog(self, env):
        with pytest.raises(ExternalCatalogNotExistException, match="nosuch"):
            env.get_registered_external_catalog("nosuch")

    def test_unknown_sub_catalog(self, env):
        with pytest.raises(CatalogNotExistException, match="nodb"):
            env.scan("warehouse", "nodb", "nat")

    def test_unknown_table(self, env):
        with pytest.raises(TableNotExistException, match="notab"):
            env.scan("warehouse", "tpch", "notab")

    def test_duplicate_table(self, env, spark):
        cat = env.get_registered_external_catalog("warehouse")
        db = cat.get_sub_catalog("tpch")
        df = spark.range(1).toDF("x")
        with pytest.raises(TableAlreadyExistException):
            db.create_table("nat", df)
        # the reference's createTable REPLACES under ignoreIfExists
        # (InMemoryExternalCatalog.scala: the non-throw arm is a put)
        db.create_table("nat", df, ignore_if_exists=True)
        assert db.get_table("nat").columns == ["x"]

    def test_duplicate_sub_catalog(self, env):
        cat = env.get_registered_external_catalog("warehouse")
        with pytest.raises(CatalogAlreadyExistException):
            cat.create_sub_catalog("tpch")

    def test_drop_semantics(self, spark):
        cat = InMemoryExternalCatalog("c")
        df = spark.range(1).toDF("x")
        cat.create_table("t", df)
        cat.drop_table("t")
        with pytest.raises(TableNotExistException):
            cat.drop_table("t")
        cat.drop_table("t", ignore_if_not_exists=True)
        cat.create_sub_catalog("d")
        cat.drop_sub_catalog("d")
        with pytest.raises(CatalogNotExistException):
            cat.drop_sub_catalog("d")
        cat.drop_sub_catalog("d", ignore_if_not_exists=True)

    def test_alter_table(self, spark):
        cat = InMemoryExternalCatalog("c")
        a = spark.range(1).toDF("a")
        b = spark.range(1).toDF("b")
        with pytest.raises(TableNotExistException):
            cat.alter_table("t", a)
        cat.alter_table("t", a, ignore_if_not_exists=True)
        cat.create_table("t", a, ignore_if_exists=True)
        cat.alter_table("t", b)
        assert cat.get_table("t").columns == ["b"]

    def test_listing(self, env):
        cat = env.get_registered_external_catalog("warehouse")
        assert cat.list_sub_catalogs() == ["tpch"]
        assert cat.get_sub_catalog("tpch").list_tables() == ["nat", "reg"]


class TestQualifiedColumnReferences:
    def test_four_part_column_reference(self, env):
        # Calcite resolves warehouse.tpch.nat.n_name as column n_name of
        # table warehouse.tpch.nat — the longest-prefix rule here
        got = env.sql(
            "SELECT warehouse.tpch.nat.n_name AS nm FROM warehouse.tpch.nat "
            "WHERE warehouse.tpch.nat.n_nationkey = 3"
        ).collect()
        assert len(got) == 1 and got[0]["nm"] is not None

    def test_unknown_table_still_raises(self, env):
        from flink_1_8_sourcecode_spark.external_catalog import (
            TableNotExistException,
        )

        with pytest.raises(TableNotExistException):
            env.sql("SELECT * FROM warehouse.tpch.nosuch")


class TestAliasShadowing:
    """ADVICE r14 (engine.py _route_external_catalogs): a FROM-clause
    alias that spells a registered catalog name must shadow the
    catalog — Calcite scope resolution lets the in-scope alias win."""

    def test_alias_shadows_catalog(self, env, spark, sf_dir):
        env.register("mynat", spark.read.parquet(f"{sf_dir}/nation.parquet"))
        got = env.sql(
            "SELECT warehouse.n_name AS nm FROM mynat warehouse "
            "WHERE warehouse.n_nationkey = 3"
        ).collect()
        assert len(got) == 1 and got[0]["nm"] is not None

    def test_select_list_alias_does_not_shadow(self, env):
        # r15 review finding: a SELECT-list expression alias spelling
        # the catalog name must NOT suppress the catalog rewrite —
        # only FROM-clause aliases shadow (Calcite scope resolution)
        got = env.sql(
            "SELECT count(*) AS warehouse FROM warehouse.tpch.nat"
        ).collect()
        assert got[0]["warehouse"] == 25
        got = env.sql(
            "SELECT n.n_name, 1 AS warehouse FROM warehouse.tpch.nat n "
            "WHERE n.n_nationkey = 3"
        ).collect()
        assert len(got) == 1

    def test_subquery_alias_shadows_but_inner_select_alias_does_not(self, env):
        [r] = env.sql(
            "SELECT count(*) AS c FROM "
            "(SELECT n_nationkey AS warehouse FROM warehouse.tpch.nat) q "
            "WHERE q.warehouse >= 0"
        ).collect()
        assert r["c"] == 25

    def test_alias_shadows_only_in_its_statement(self, env):
        # same name used as a JOIN alias AND the catalog resolved in a
        # different statement — both work
        got = env.sql(
            "SELECT r.r_name AS nm FROM warehouse.tpch.reg r LIMIT 1"
        ).collect()
        assert len(got) == 1
        env.register("myreg", env.scan("warehouse", "tpch", "reg"))
        got = env.sql(
            "SELECT count(*) AS c FROM myreg AS warehouse"
        ).collect()
        assert got[0]["c"] == 5
