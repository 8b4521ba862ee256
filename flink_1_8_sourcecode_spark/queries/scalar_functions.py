"""Scalar-function (expression library) inventory — SURVEY.md §2.11.

Reference catalog: flink-table/.../validate/FunctionCatalog.scala:157-508;
expression impls flink-table/.../table/expressions/*.scala.  Each query
exercises one function family end-to-end through real execution (the
analogue of the reference's ScalarFunctionsTest.scala, which checks every
function in all syntaxes against expected literals).

Oracle notes: DuckDB lacks initcap/overlay/sinh/cosh/tanh/sha1 and its
SIMILAR TO takes a real regex — the oracle SQL emulates those with
arithmetic/string primitives, mirroring exactly what our shims compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.functions import scalar as fx
from flink_1_8_sourcecode_spark.queries import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           length(c_name) AS len,
           lower(c_name) AS lo,
           upper(c_name) AS up,
           substring(c_name, 1, 8) AS sub,
           concat(c_name, '|', c_mktsegment) AS cat,
           lpad(c_mktsegment, 12, '*') AS lp,
           rpad(c_mktsegment, 12, '-') AS rp,
           trim(lpad(c_mktsegment, 12, ' ')) AS trm,
           replace(c_name, 'Customer', 'Cust') AS repl,
           repeat(c_mktsegment, 2) AS rep,
           strpos(c_name, '#') AS pos,
           reverse(c_mktsegment) AS rev,
           regexp_extract(c_name, '#(\\d+)', 1) AS rex,
           regexp_replace(c_name, '\\d', 'N', 'g') AS rrep
    FROM customer WHERE c_custkey < 50
    """,
    doc="String functions (stringExpressions.scala; FunctionCatalog.scala:192-217).",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.length("c_name").alias("len"),
        F.lower("c_name").alias("lo"),
        F.upper("c_name").alias("up"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("cat"),
        F.lpad("c_mktsegment", 12, "*").alias("lp"),
        F.rpad("c_mktsegment", 12, "-").alias("rp"),
        F.trim(F.lpad("c_mktsegment", 12, " ")).alias("trm"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("repl"),
        F.repeat("c_mktsegment", 2).alias("rep"),
        F.locate("#", F.col("c_name")).alias("pos"),
        F.reverse("c_mktsegment").alias("rev"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("rex"),
        F.regexp_replace("c_name", r"\d", "N").alias("rrep"),
    )


@register(
    "fn_string_shims",
    oracle="""
    SELECT c_custkey,
           -- INITCAP emulation (DuckDB lacks it)
           array_to_string(
             list_transform(string_split(lower(c_mktsegment), ' '),
                            w -> upper(w[1]) || w[2:]), ' ') AS ini,
           -- OVERLAY(c_name PLACING 'XX' FROM 2 FOR 3)
           substring(c_name, 1, 1) || 'XX' || substring(c_name, 5) AS ovl,
           -- SIMILAR TO 'Cust%_001%' (SQL-pattern translated to regex)
           regexp_full_match(c_name, 'Cust.*.001.*') AS sim
    FROM customer WHERE c_custkey < 50
    """,
    doc="INITCAP / OVERLAY / SIMILAR TO (FunctionCatalog.scala:196; "
    "our similar_to shim translates SQL patterns to regex).",
)
def fn_string_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    return c.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("ini"),
        F.overlay("c_name", F.lit("XX"), 2, 3).alias("ovl"),
        fx.similar_to(F.col("c_name"), "Cust%_001%").alias("sim"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(-l_quantity) AS v_abs,
           ceil(l_extendedprice / 1000) AS v_ceil,
           floor(l_extendedprice / 1000) AS v_floor,
           exp(l_discount) AS v_exp,
           ln(l_quantity + 1) AS v_ln,
           log10(l_extendedprice) AS v_log10,
           log2(l_quantity) AS v_log2,
           sqrt(l_quantity) AS v_sqrt,
           power(l_quantity, 2) AS v_pow,
           mod(l_orderkey, 7) AS v_mod,
           sign(l_discount - 0.05)::DOUBLE AS v_sign,
           sin(l_quantity) AS v_sin,
           cos(l_quantity) AS v_cos,
           tan(l_discount) AS v_tan,
           cot(l_quantity) AS v_cot,
           asin(l_discount) AS v_asin,
           acos(l_discount) AS v_acos,
           atan(l_quantity) AS v_atan,
           atan2(l_quantity, l_linenumber) AS v_atan2,
           degrees(l_discount) AS v_deg,
           radians(l_quantity) AS v_rad,
           -- sinh/cosh/tanh emulated (DuckDB lacks them)
           (exp(l_discount) - exp(-l_discount)) / 2 AS v_sinh,
           (exp(l_discount) + exp(-l_discount)) / 2 AS v_cosh,
           -- TRUNCATE(x, 1) toward zero
           trunc(l_extendedprice * 10) / 10 AS v_trunc,
           pi() AS v_pi
    FROM lineitem WHERE l_orderkey < 100
    """,
    doc="Math functions (mathExpressions.scala; FunctionCatalog.scala:220-257).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    q, d, p = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(-q).alias("v_abs"),
        F.ceil(p / 1000).cast("double").alias("v_ceil"),
        F.floor(p / 1000).cast("double").alias("v_floor"),
        F.exp(d).alias("v_exp"),
        F.log(q + 1).alias("v_ln"),
        F.log10(p).alias("v_log10"),
        F.log2(q).alias("v_log2"),
        F.sqrt(q).alias("v_sqrt"),
        F.pow(q, 2).alias("v_pow"),
        (F.col("l_orderkey") % 7).alias("v_mod"),
        F.signum(d - 0.05).alias("v_sign"),
        F.sin(q).alias("v_sin"),
        F.cos(q).alias("v_cos"),
        F.tan(d).alias("v_tan"),
        fx.cot(q).alias("v_cot"),
        F.asin(d).alias("v_asin"),
        F.acos(d).alias("v_acos"),
        F.atan(q).alias("v_atan"),
        F.atan2(q, F.col("l_linenumber").cast("double")).alias("v_atan2"),
        F.degrees(d).alias("v_deg"),
        F.radians(q).alias("v_rad"),
        F.sinh(d).alias("v_sinh"),
        F.cosh(d).alias("v_cosh"),
        fx.truncate(p, 1).alias("v_trunc"),
        F.lit(3.141592653589793).alias("v_pi"),
    )


@register(
    "fn_temporal",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           strftime(o_orderdate, '%Y-%m') AS ym,
           o_orderdate + INTERVAL 90 DAY AS due,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
           -- (o_orderdate, +30d) OVERLAPS (1997-01-01, 1997-12-31)
           (least(o_orderdate, o_orderdate + INTERVAL 30 DAY)
              <= greatest(TIMESTAMP '1997-01-01', TIMESTAMP '1997-12-31')
            AND least(TIMESTAMP '1997-01-01', TIMESTAMP '1997-12-31')
              <= greatest(o_orderdate, o_orderdate + INTERVAL 30 DAY)) AS in97
    FROM orders WHERE o_orderkey < 200
    """,
    doc="Temporal functions (time.scala; FunctionCatalog.scala:260-270): "
    "EXTRACT units, DATE_FORMAT, interval arithmetic, TIMESTAMPDIFF, OVERLAPS shim.",
)
def fn_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("y"),
        F.quarter(od).alias("q"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        F.date_format(od, "yyyy-MM").alias("ym"),
        (od + F.expr("INTERVAL 90 DAY")).alias("due"),
        F.datediff(od, F.to_timestamp(F.lit("1995-01-01"))).alias("days_since"),
        fx.overlaps(
            od,
            od + F.expr("INTERVAL 30 DAY"),
            F.to_timestamp(F.lit("1997-01-01")),
            F.to_timestamp(F.lit("1997-12-31")),
        ).alias("in97"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256,
           to_base64(c_name::BLOB) AS b64,
           from_base64(to_base64(c_name::BLOB))::VARCHAR AS roundtrip
    FROM customer WHERE c_custkey < 100
    """,
    doc="Hash functions MD5/SHA2 + TO/FROM_BASE64 (hashExpressions.scala; "
    "FunctionCatalog.scala:467-474). SHA1/SHA224/... also exposed via F.sha1/sha2.",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("h_md5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("h_sha256"),
        F.base64(F.col("c_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("c_name").cast("binary"))).cast("string").alias("roundtrip"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
                ELSE 'other' END AS status_word,
           CASE WHEN o_totalprice > 300000 THEN 'big' ELSE 'small' END AS size_word,
           coalesce(nullif(o_orderstatus, 'P'), 'pending') AS denulled,
           if(o_totalprice BETWEEN 100000 AND 200000, 1, 0) AS in_band,
           (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS urgent,
           (o_orderstatus IS NOT DISTINCT FROM 'P') AS is_p_nullsafe,
           (o_orderpriority LIKE '%HIGH%') AS has_high
    FROM orders WHERE o_orderkey < 300
    """,
    doc="Comparison/logic: CASE, NULLIF, COALESCE, IF, IN, BETWEEN, "
    "IS NOT DISTINCT FROM, LIKE (FunctionCatalog.scala:157-190).",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    st, tp, pri = F.col("o_orderstatus"), F.col("o_totalprice"), F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        F.when(st == "O", "open").when(st == "F", "filled").otherwise("other").alias(
            "status_word"
        ),
        F.when(tp > 300000, "big").otherwise("small").alias("size_word"),
        F.coalesce(F.nullif(st, F.lit("P")), F.lit("pending")).alias("denulled"),
        F.when(tp.between(100000, 200000), 1).otherwise(0).alias("in_band"),
        pri.isin("1-URGENT", "2-HIGH").alias("urgent"),
        st.eqNullSafe(F.lit("P")).alias("is_p_nullsafe"),
        pri.like("%HIGH%").alias("has_high"),
    )


@register(
    "fn_collection",
    oracle="""
    SELECT p_partkey,
           len(string_split(p_name, ' ')) AS card,
           string_split(p_name, ' ')[1] AS first_tok,
           string_split(p_name, ' ')[-1] AS last_tok,
           list_contains(string_split(p_type, ' '), 'PROMO') AS has_promo,
           array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_toks,
           list_position(string_split(p_name, ' '), p_brand) AS brand_pos,
           {'k': p_partkey, 's': p_size}.s AS row_field
    FROM part WHERE p_partkey < 100
    """,
    doc="Collection ops: ARRAY/CARDINALITY/1-based AT/ELEMENT/ROW "
    "(collection.scala; FunctionCatalog.scala:273-286).",
)
def fn_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(toks).alias("card"),
        fx.at(toks, 1).alias("first_tok"),
        fx.at(toks, F.size(toks)).alias("last_tok"),
        F.array_contains(F.split(F.col("p_type"), " "), "PROMO").alias("has_promo"),
        F.concat_ws(",", F.array_sort(toks)).alias("sorted_toks"),
        F.array_position(toks, F.col("p_brand")).cast("long").alias("brand_pos"),
        F.struct(F.col("p_partkey").alias("k"), F.col("p_size").alias("s"))["s"].alias(
            "row_field"
        ),
    )


@register(
    "fn_json",
    oracle="""
    SELECT json_extract_string(props, '$.k')::INT AS k, count(*) AS cnt
    FROM events GROUP BY 1
    """,
    doc="JSON extraction over the events.props string column "
    "(get_json_object / from_json — Spark superset; Flink 1.8 has JSON "
    "only as a source format, flink-formats/flink-json).",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "fn_misc",
    oracle="""
    SELECT p_partkey,
           hex(p_size) AS v_hex,
           bin(p_size) AS v_bin,
           chr(65 + (p_size % 26)) AS v_chr,
           ascii(substring(p_name, 1, 1)) AS v_ascii,
           greatest(p_size, 25) AS v_greatest,
           least(p_size, 25) AS v_least
    FROM part WHERE p_partkey < 200
    """,
    doc="BIN/HEX/CHR/ASCII/GREATEST/LEAST (mathExpressions.scala, "
    "stringExpressions.scala; FunctionCatalog.scala:416-483).",
)
def fn_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.hex(F.col("p_size")).alias("v_hex"),
        F.bin(F.col("p_size")).alias("v_bin"),
        F.chr(F.lit(65) + (F.col("p_size") % 26)).alias("v_chr"),
        F.ascii(F.substring("p_name", 1, 1)).alias("v_ascii"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("v_greatest"),
        F.least(F.col("p_size"), F.lit(25)).alias("v_least"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT l_orderkey,
           l_quantity::INT AS q_int,
           l_quantity::VARCHAR AS q_str,
           l_orderkey::DOUBLE AS k_dbl,
           (l_extendedprice > 20000)::INT AS flag_int,
           l_shipdate::DATE::VARCHAR AS ship_day
    FROM lineitem WHERE l_orderkey < 100
    """,
    doc="CAST matrix (cast.scala): numeric/string/bool/date conversions.",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("q_int"),
        F.col("l_quantity").cast("string").alias("q_str"),
        F.col("l_orderkey").cast("double").alias("k_dbl"),
        (F.col("l_extendedprice") > 20000).cast("int").alias("flag_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
    )
