"""SQL entry-point suite — SURVEY.md §3.1 / §4.1.

The reference rewrites IN/EXISTS/scalar subqueries to joins
(SubQueryRemoveRule, FlinkRuleSets.scala:37-39) and decorrelates
(RelDecorrelator, StreamTableEnvironment.scala:810); Catalyst does the
same (RewritePredicateSubquery).  These queries go through
``Engine.sql`` verbatim — the SQL text doubles as the DuckDB oracle, so
the check is pure engine-vs-engine semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.engine import Engine
from flink_1_8_sourcecode_spark.queries import export_path, register


def _sql_query(name: str, sql: str, doc: str):
    @register(name, oracle=sql, doc=doc)
    def run(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        eng = Engine(spark)
        eng.register_testdata(sf_dir)
        return eng.sql(_sql)

    return run


_sql_query(
    "sql_in_subquery",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      AND o_totalprice > 300000
    """,
    "IN subquery -> semi join (SubQueryRemoveRule parity).",
)

_sql_query(
    "sql_exists_correlated",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 350000)
    """,
    "Correlated EXISTS -> decorrelated semi join (RelDecorrelator parity).",
)

_sql_query(
    "sql_not_in_subquery",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                            WHERE l_quantity > 49 AND l_discount > 0.09)
    """,
    "NOT IN -> null-aware anti join.  The discount conjunct keeps the "
    "survivor set non-empty at every SF (4/53/526 rows) — the "
    "quantity-only form was empty, a vacuous oracle (r11 audit).",
)

_sql_query(
    "sql_scalar_subquery",
    """
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation
    """,
    "Correlated scalar subquery -> left outer aggregate join.",
)

_sql_query(
    "sql_having_window_mix",
    """
    SELECT l_returnflag, l_linestatus, n_items, total FROM (
      SELECT l_returnflag, l_linestatus, count(*) AS n_items,
             sum(l_extendedprice) AS total
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 100
    ) WHERE total > 1000000
    """,
    "HAVING + derived-table filtering through the SQL entry.",
)


_sql_query(
    "sql_topn_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    "The canonical Flink SQL Top-N recipe (ROW_NUMBER per group, "
    "filter rn <= N — the pattern the reference's planner recognizes "
    "as a rank retraction operator): top-3 orders per customer.",
)

_sql_query(
    "sql_dedup_latest",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "The canonical Flink SQL deduplication recipe (ROW_NUMBER ... "
    "ORDER BY time DESC, keep rn = 1): latest event per user — the "
    "SQL form of dedup-by-key.",
)


@register(
    "table_api_string_expr",
    oracle="""
    SELECT l_linestatus,
           sum(l_quantity) AS sum_qty,
           avg(l_extendedprice) AS avg_price,
           count(l_orderkey) AS cnt
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    GROUP BY l_linestatus
    """,
    doc="Flink 1.8 Table-API STRING-EXPRESSION facade (table.scala:162 "
    "select / :318 filter / :375 groupBy string overloads; grammar from "
    "ExpressionParser.scala re-implemented in table_api.py): "
    "filter(\"l_quantity > 45 && l_returnflag === 'R'\").groupBy(...)."
    "select(\"..., l_quantity.sum as sum_qty, ...\") — every parsed "
    "expression lowers to a Catalyst Column, so pushdown/codegen apply "
    "unchanged.",
)
def table_api_string_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "lineitem"))
    return (
        t.filter("l_quantity > 45 && l_returnflag === 'R'")
        .groupBy("l_linestatus")
        .select(
            "l_linestatus, l_quantity.sum as sum_qty, "
            "l_extendedprice.avg as avg_price, l_orderkey.count as cnt"
        )
        .to_df()
    )


@register(
    "table_api_string_expr_project",
    oracle="""
    SELECT l_orderkey,
           l_extendedprice * (1 - l_discount) AS disc_price,
           lower(l_returnflag) AS flag_lc
    FROM lineitem
    ORDER BY disc_price DESC, l_orderkey
    LIMIT 5
    """,
    doc="String-expression projection + scalar suffix call + sort "
    "markers (ExpressionParser suffixFunctionCall/suffixDesc): "
    "select with arithmetic and upperCase(), orderBy(\"disc_price."
    "desc, l_orderkey.asc\"), offset/fetch (table.scala:987,1009,1030).",
)
def table_api_string_expr_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "lineitem"))
    return (
        t.select(
            "l_orderkey, l_extendedprice * (1 - l_discount) as disc_price, "
            "l_returnflag.lowerCase() as flag_lc"
        )
        .orderBy("disc_price.desc, l_orderkey.asc")
        .fetch(5)
        .to_df()
    )


@register(
    "sink_insert_roundtrip",
    oracle="""
    SELECT n_regionkey, count(*)::BIGINT AS n_nations,
           min(n_name) AS first_nation
    FROM nation GROUP BY n_regionkey
    """,
    doc="INSERT INTO a registered sink + read-back "
    "(TableEnvironment.registerTableSink TableEnvironment.scala:586, "
    "sqlUpdate :756, Table.insertInto table.scala:1052, "
    "CsvTableSink.scala): the write-side facade every reference job "
    "ends with.  The sink is a distributed parquet write (overwrite "
    "mode so the query is rerun-stable); the oracle recomputes the "
    "SELECT directly.",
)
def sink_insert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import tempfile
    from pathlib import Path

    eng = Engine(spark)
    eng.register_testdata(sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = str(Path(tempfile.gettempdir()) / f"spark_graft_sink_{tag}" / "nation_agg")
    eng.register_sink("nation_agg_sink", "parquet", path)
    return eng.sql(
        """
        INSERT OVERWRITE nation_agg_sink
        SELECT n_regionkey, count(*) AS n_nations,
               min(n_name) AS first_nation
        FROM nation GROUP BY n_regionkey
        """
    )


@register(
    "table_api_over_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           sum(o_totalprice) OVER w AS running_spend,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS recent_cnt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Table-API OVER windows through the string-expression facade "
    "(Over builder parity with api/java/windows.scala; infix 'over' "
    "from ExpressionParser.scala:225; table.scala:1118 window()): an "
    "unbounded-range running sum and a bounded 2-preceding ROWS count "
    "per customer, both lowered to Catalyst window specs so the plan "
    "is the same WindowExec as the native DataFrame form.",
)
def table_api_over_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Over, Table

    t = Table(table(spark, sf_dir, "orders"))
    w1 = Over.partitionBy("o_custkey").order_by("o_orderkey").alias("w1")
    w2 = (
        Over.partitionBy("o_custkey").order_by("o_orderkey")
        .preceding(2).alias("w2")
    )
    return (
        t.window(w1, w2)
        .select(
            "o_custkey, o_orderkey, "
            "o_totalprice.sum over w1 as running_spend, "
            "o_orderkey.count over w2 as recent_cnt"
        )
        .to_df()
    )


@register(
    "table_api_tumble_window",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '1 day', ts::TIMESTAMP) AS w_start,
           count(*) AS cnt, round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
    doc="Table-API GROUP window through the string facade "
    "(Tumble.over('1.days').on('ts').alias('w'), windows.scala parity; "
    "table.scala:1070 window(groupWindow)): daily tumble per event "
    "type with w.start projection — lowers to Spark's window() struct "
    "grouping, so the plan is the same partial-aggregated "
    "HashAggregate as the native form.",
)
def table_api_tumble_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table, Tumble

    t = Table(table(spark, sf_dir, "events"))
    return (
        t.window(Tumble.over("1.days").on("ts").alias("w"))
        .groupBy("w, event_type")
        .select(
            "event_type, w.start as w_start, "
            "event_id.count as cnt, value.sum.round(4) as total"
        )
        .to_df()
    )


@register(
    "table_api_interval_arithmetic",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 30 MINUTE AS deadline,
           ts + INTERVAL 1 DAY AS next_day,
           ts + INTERVAL 2 HOUR + INTERVAL 15 SECOND AS composite
    FROM events WHERE event_id < 2000
    """,
    doc="In-expression interval literals through the string facade "
    "(expressionDsl.scala LiteralLongExpression: 10.minutes / 1.day / "
    "chained 2.hours + 15.seconds) plus the .rowtime event-time marker "
    "(RelTimeIndicatorConverter.scala -> plain TimestampType column): "
    "each literal lowers to a Catalyst INTERVAL expression, so the "
    "whole projection is map-only WholeStageCodegen — zero exchanges, "
    "zero Python.",
)
def table_api_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "events"))
    return (
        t.filter("event_id < 2000")
        .select(
            "event_id, ts.rowtime + 30.minutes as deadline, "
            "ts + 1.day as next_day, ts + 2.hours + 15.seconds as composite"
        )
        .to_df()
    )


@register(
    "table_api_join_lateral",
    oracle="""
    SELECT doc_id, t.pos - 1 AS pos, t.tok FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x != ''),
               (x, i) -> {'pos': i, 'tok': x})) AS t
      FROM documents WHERE doc_id < 20
    )
    """,
    doc="String-form joinLateral THROUGH the Table facade "
    "(table.scala:627; TableFunction.java:85): a registered 'tokenize' "
    "table function returning array<struct<pos, tok>> exploded by "
    "t.joinLateral(\"tokenize(text) as (pos, tok)\") — same CROSS "
    "APPLY semantics and same plan (Generate over the scan) as the "
    "native posexplode form in udtf_lateral_explode.",
)
def table_api_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.operators.text import tokens
    from flink_1_8_sourcecode_spark.table_api import (
        Table,
        register_table_function,
    )

    register_table_function(
        "tokenize",
        lambda c: F.transform(
            tokens(c), lambda x, i: F.struct(i.alias("pos"), x.alias("tok"))
        ),
    )
    t = Table(table(spark, sf_dir, "documents")).filter("doc_id < 20")
    return (
        t.joinLateral("tokenize(text) as (pos, tok)")
        .select("doc_id, pos, tok")
        .to_df()
    )


@register(
    "table_api_string_concat",
    oracle="""
    SELECT doc_id,
           lang || '#' || source AS tag,
           'doc:' || doc_id::VARCHAR AS label,
           upper(lang) || n_chars::VARCHAR AS sized
    FROM documents WHERE doc_id % 3 = 0
    """,
    doc="Flink's polymorphic '+' through the string facade "
    "(arithmetic.scala Plus: a string operand means concatenation, "
    "the other side implicitly cast): string+string, string+numeric "
    "and a chained fold all lower to Catalyst concat() — map-only "
    "WholeStageCodegen, zero Python (table_api.py:_Parser.term).",
)
def table_api_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "documents"))
    return (
        t.filter("doc_id % 3 = 0")
        .select(
            "doc_id, lang + '#' + source as tag, "
            "'doc:' + doc_id as label, "
            "lang.upperCase + n_chars as sized"
        )
        .to_df()
    )


@register(
    "table_api_temporal_functions",
    oracle="""
    SELECT event_id,
           extract(hour FROM ts)::BIGINT AS h,
           date_trunc('day', ts) AS day_start,
           date_diff('minute', date_trunc('day', ts), ts)::INT AS mins_into_day,
           sign(value)::DOUBLE AS sgn,
           (CASE WHEN value * 100 >= 0 THEN floor(value * 100)
                 ELSE ceil(value * 100) END / 100)::DOUBLE AS v2
    FROM events WHERE event_id < 1000
    """,
    doc="The temporal/math grammar tail through the string facade with "
    "a full oracle: .extract(HOUR), .floor(DAY), "
    "timestampDiff(MINUTE, ...) (aligned origin, so boundary-crossing "
    "and complete-interval semantics coincide), .sign and "
    ".truncate(2) — all lower to Catalyst expressions, map-only "
    "WholeStageCodegen, zero Python (table_api.py:_apply_suffix).",
)
def table_api_temporal_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "events"))
    return (
        t.filter("event_id < 1000")
        .select(
            "event_id, ts.extract(HOUR) as h, ts.floor(DAY) as day_start, "
            "timestampDiff(MINUTE, ts.floor(DAY), ts) as mins_into_day, "
            "value.sign as sgn, value.truncate(2) as v2"
        )
        .to_df()
    )


@register(
    "table_api_string_functions",
    oracle="""
    SELECT doc_id,
           lpad(lang, 4, '*') AS padded,
           regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
           to_base64(encode(substring(lang, 1, 2))) AS b64,
           repeat(lang, 2) AS rep,
           md5(lang) AS h
    FROM documents WHERE doc_id % 4 = 0
    """,
    doc="The string-function grammar tail with a full oracle: "
    ".lpad, .regexpExtract(group), .substring.toBase64, .repeat and "
    ".md5 through the string facade — every call lowers to a "
    "Catalyst expression (map-only WholeStageCodegen, zero Python; "
    "table_api.py:_apply_suffix string tail).",
)
def table_api_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.table_api import Table

    t = Table(table(spark, sf_dir, "documents"))
    return (
        t.filter("doc_id % 4 = 0")
        .select(
            "doc_id, lang.lpad(4, '*') as padded, "
            "source.regexpExtract('src([0-9]+)', 1) as src_num, "
            "lang.substring(1, 2).toBase64 as b64, "
            "lang.repeat(2) as rep, lang.md5 as h"
        )
        .to_df()
    )


@register(
    "external_catalog_qualified",
    oracle="""
    SELECT r.r_name, count(*)::BIGINT AS n_nations,
           sum(n.n_nationkey)::BIGINT AS key_sum
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="External-catalog name resolution "
    "(TableEnvironment.scala:413 registerExternalCatalog, "
    "catalog/InMemoryExternalCatalog.scala): a warehouse.tpch.nation "
    "3-part qualified name joined to a 2-part warehouse.region name "
    "through Engine.sql's pre-rewrite resolution "
    "(engine.py:_route_external_catalogs) — the resolved objects are "
    "plain DataFrames, so the join still broadcasts and the scans "
    "still prune/push down.",
)
def external_catalog_qualified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.engine import Engine
    from flink_1_8_sourcecode_spark.external_catalog import (
        InMemoryExternalCatalog,
    )

    eng = Engine(spark)
    cat = InMemoryExternalCatalog("warehouse")
    cat.create_sub_catalog("tpch", ignore_if_exists=True).create_table(
        "nation", table(spark, sf_dir, "nation"), ignore_if_exists=True
    )
    cat.create_table("region", table(spark, sf_dir, "region"),
                     ignore_if_exists=True)
    eng.register_external_catalog("warehouse", cat)
    return eng.sql(
        "SELECT r.r_name, count(*) AS n_nations, "
        "sum(n.n_nationkey) AS key_sum "
        "FROM warehouse.tpch.nation n JOIN warehouse.region r "
        "ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
    )


_DESCRIPTOR_CSV_EXPORT = export_path("descriptor_csv_src")


@register(
    "descriptor_connect_source",
    oracle="""
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END)::BIGINT
             AS n_long
    FROM documents GROUP BY lang
    """,
    doc="Descriptor/connect registration path "
    "(TableEnvironment.scala:656 connect, "
    "descriptors/ConnectTableDescriptor.scala:45 registerTableSource, "
    "FileSystem.scala + OldCsv.scala + Schema.scala): the documents "
    "table is exported to pipe-delimited CSV, registered back through "
    "connect(FileSystem().path(p)).with_format(OldCsv()...)"
    ".with_schema(Schema()...) and aggregated with plain SQL — proving "
    "the declarative chain lowers to a real distributed CSV scan with "
    "the declared schema (descriptors.py).",
)
def descriptor_connect_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.descriptors import (
        FileSystem,
        OldCsv,
        Schema,
    )

    table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").option("sep", "|").csv(_DESCRIPTOR_CSV_EXPORT)
    eng = Engine(spark)
    (
        eng.connect(FileSystem().path(_DESCRIPTOR_CSV_EXPORT))
        .with_format(
            OldCsv()
            .field("doc_id", "BIGINT")
            .field("lang", "STRING")
            .field("n_chars", "BIGINT")
            .field_delimiter("|")
        )
        .with_schema(
            Schema()
            .field("doc_id", "BIGINT")
            .field("lang", "STRING")
            .field("n_chars", "BIGINT")
        )
        .register_table_source("descriptor_docs")
    )
    return eng.sql(
        "SELECT lang, count(*) AS n_docs, "
        "sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS n_long "
        "FROM descriptor_docs GROUP BY lang"
    )


_ENVFILE_CSV_EXPORT = export_path("envfile_csv_src")


@register(
    "environment_file_pipeline",
    oracle="""
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS chars_total
    FROM documents WHERE n_chars > 100 GROUP BY lang
    """,
    doc="SQL-client environment file (flink-sql-client "
    "config/Environment.java, conf/sql-client-defaults.yaml): a YAML "
    "environment registers a filesystem/CSV source table AND a "
    "filtering view over it (environment.py:load_environment lowering "
    "onto the descriptors.py chain); the query aggregates through the "
    "view — proving the declarative file produces the same "
    "distributed CSV scan + plan as code-registered descriptors.",
)
def environment_file_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.environment import load_environment

    table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    ).write.mode("overwrite").option("sep", "|").csv(_ENVFILE_CSV_EXPORT)
    eng = Engine(spark)
    fields = [
        {"name": "doc_id", "type": "BIGINT"},
        {"name": "lang", "type": "VARCHAR"},
        {"name": "n_chars", "type": "BIGINT"},
    ]
    load_environment(eng, {
        "tables": [
            {
                "name": "env_docs",
                "type": "source-table",
                "schema": fields,
                "connector": {"type": "filesystem",
                              "path": _ENVFILE_CSV_EXPORT},
                "format": {"type": "csv", "fields": fields,
                           "field-delimiter": "|"},
            },
            {
                "name": "env_long_docs",
                "type": "view",
                "query": "SELECT lang, n_chars FROM env_docs "
                         "WHERE n_chars > 100",
            },
        ],
    })
    return eng.sql(
        "SELECT lang, count(*) AS n_docs, sum(n_chars) AS chars_total "
        "FROM env_long_docs GROUP BY lang"
    )


_CATALOG_INSERT_EXPORT = export_path("extcat_insert_sink")


@register(
    "external_catalog_insert_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*)::BIGINT AS n_orders,
           sum(o_custkey)::BIGINT AS cust_sum
    FROM orders GROUP BY o_orderpriority
    """,
    doc="External-catalog SINK path "
    "(ExternalCatalogInsertTest.scala:48 insertInto('test.db3.tb3'), "
    "engine.py insert_into qualified-name arm + "
    "descriptors.py ExternalCatalogTable.write): an aggregate of "
    "orders is INSERTed through a descriptor-defined catalog table "
    "(CSV connector spec, arity-validated + positionally cast to the "
    "declared schema at insert time) and read BACK through the "
    "catalog scan — closing the read/write asymmetry; the write and "
    "the re-scan are both distributed DataFrameWriter/Reader jobs.",
)
def external_catalog_insert_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.catalog import table
    from flink_1_8_sourcecode_spark.descriptors import (
        ExternalCatalogTable,
        FileSystem,
        OldCsv,
        Schema,
    )
    from flink_1_8_sourcecode_spark.external_catalog import (
        InMemoryExternalCatalog,
    )

    eng = Engine(spark)
    cat = InMemoryExternalCatalog("sinkcat")
    db = cat.create_sub_catalog("db3", ignore_if_exists=True)
    sink_tbl = (
        ExternalCatalogTable.builder(
            FileSystem().path(_CATALOG_INSERT_EXPORT)
        )
        .with_format(
            OldCsv()
            .field("priority", "STRING")
            .field("n_orders", "BIGINT")
            .field("cust_sum", "BIGINT")
            .field_delimiter("|")
        )
        .with_schema(
            Schema()
            .field("priority", "STRING")
            .field("n_orders", "BIGINT")
            .field("cust_sum", "BIGINT")
        )
        .supports_batch()
        .as_table_source()
    )
    db.create_table("tb3", sink_tbl, ignore_if_exists=True)
    eng.register_external_catalog("sinkcat", cat)
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_custkey").alias("cust_sum"),
        )
    )
    eng.insert_into(agg, "sinkcat.db3.tb3", overwrite=True)
    return eng.sql(
        "SELECT priority, n_orders, cust_sum FROM sinkcat.db3.tb3"
    )
