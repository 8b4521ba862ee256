"""TPC-H-style benchmark queries (adapted to the testdata star schema).

Reference parity: the reference ships TPC-H Q3 and Q10 as its own example
queries (flink-examples/flink-examples-batch/src/main/java/org/apache/flink/
examples/java/relational/TPCHQuery3.java:103, TPCHQuery10.java;
flink-examples/flink-examples-table/.../TPCHQuery3Table.scala).  We add
Q1/Q5/Q6-style queries to exercise scan+filter+agg, the 6-table join chain,
and a pure filter-agg.

Scale notes: explicit broadcast() hints are used ONLY for the genuinely
bounded dims (region: 5 rows, nation: 25 rows, and single-row aggregates) —
a forced hint is honored regardless of size and *fails* past the 8 GB
broadcast limit rather than demoting, so tables that grow with sf
(customer/supplier/part) carry no hint: the static autoBroadcastJoinThreshold
plus AQE pick broadcast at small sf and shuffle-hash/sort-merge at scale.
Fact-fact joins (orders x lineitem) shuffle on the join key — that is the
correct plan at 100 TB; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register

_TS = lambda s: F.to_timestamp(F.lit(s))  # noqa: E731


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)  AS sum_qty,
           sum(l_extendedprice) AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity) AS avg_qty,
           avg(l_extendedprice) AS avg_price,
           avg(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Pricing summary report: scan -> filter -> hash agg (map-side partials).",
    bench=True,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= _TS("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).alias("sum_disc_price"),
            F.sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="Shipping-priority: dim join -> fact join -> agg -> top-k.",
    bench=True,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _TS("1998-03-15"))
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _TS("1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5",
    oracle="""
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="Local-supplier volume: 6-table join chain, bounded dims broadcast.",
    bench=True,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01")) & (F.col("o_orderdate") < _TS("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Forecast-revenue change: pure pushed-down filter + global agg.",
    bench=True,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1997-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="Order-priority checking (Q4 shape): EXISTS -> left-semi join + agg.",
    bench=True,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1997-01-01")) & (F.col("o_orderdate") < _TS("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    sem = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "tpch_q14",
    oracle="""
    SELECT 100.00 * sum(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
           / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    doc="Promotion effect (Q14 shape): part join + conditional agg.",
    bench=True,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-03-01")) & (F.col("l_shipdate") < _TS("1997-04-01"))
    )
    part = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc)
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, qty_sum
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN (SELECT l_orderkey, sum(l_quantity) AS qty_sum
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 150) big
        ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    doc="Large-volume customer (Q18 shape): agg-subquery (HAVING) -> join -> top-k.",
    bench=True,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty_sum"))
        .filter(F.col("qty_sum") > 150)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "qty_sum")
    )


@register(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           c_acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="Returned-item reporting (reference's TPCHQuery10.java): join + agg + top-k.",
    bench=True,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1997-01-01")) & (F.col("o_orderdate") < _TS("1997-04-01"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@register(
    "tpch_q7",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_9')
        OR (sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
    doc="Volume shipping (Q7 shape): two-role nation join (supplier vs "
    "customer nation), symmetric pair filter, per-year revenue.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01")) & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9")
    ) | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) nations
    GROUP BY o_year
    """,
    doc="National market share (Q8 shape): 7-table join, conditional "
    "share aggregate per year.",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01")) & (F.col("o_orderdate") < _TS("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    share_num = F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((share_num / F.sum(vol)).alias("mkt_share"))
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="Shipping-mode priority (Q12 shape, adapted: linestatus stands in "
    "for the absent shipmode column): fact-fact join + bucketed "
    "conditional counts.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01")) & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q19",
    oracle="""
    SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    doc="Discounted revenue (Q19 shape): disjunction of conjunctive "
    "range predicates across BOTH join sides — the classic "
    "join-predicate-pushdown stress.",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")

    def arm(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    cond = arm("Brand#12", 15, 1, 21) | arm("Brand#23", 25, 10, 30) | arm("Brand#34", 35, 20, 40)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q22",
    oracle="""
    SELECT c_mktsegment, count(*) AS numcust, sum(c_acctbal) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT'
                        AND o_orderdate >= TIMESTAMP '1997-01-01')
    GROUP BY c_mktsegment
    """,
    doc="Global sales opportunity (Q22 shape, adapted: mktsegment stands "
    "in for the absent phone prefix; anti-join restricted to recent "
    "urgent orders since every synthetic customer has orders): "
    "scalar-avg subquery + anti-join.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    urgent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderdate") >= _TS("1997-01-01"))
    )
    no_orders = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"), F.sum("c_acctbal").alias("totacctbal")
    )


# ---------------------------------------------------------------------------
# Round-5 additions: the 9 remaining TPC-H shapes (q2/q9/q11/q13/q15/q16/
# q17/q20/q21).  The testdata has no partsupp table and no
# l_commitdate/l_receiptdate/p_container columns, so — like q12/q22 above —
# each query keeps the ORIGINAL plan shape (correlated scalar subqueries,
# multi-EXISTS anti-joins, max-over-view) on the columns that exist:
#   * partsupp        -> the distinct (l_partkey, l_suppkey) supply relation
#                        derived from lineitem (unit cost = extprice/qty)
#   * receipt > commit (lateness) -> l_shipdate > o_orderdate + 30 days
#   * p_container     -> p_type
# ---------------------------------------------------------------------------


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM part
      JOIN ps       ON p_partkey = ps.l_partkey
      JOIN supplier ON s_suppkey = ps.l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'PROMO'
      AND supply_cost = (
        SELECT min(ps2.supply_cost)
        FROM ps ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation  n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region  r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="Minimum-cost supplier (Q2 shape): correlated MIN subquery over the "
    "lineitem-derived supply relation.  The oracle keeps the textbook "
    "correlated form; the Spark plan de-correlates it into a window MIN "
    "over p_partkey — one shuffle instead of a per-row subquery, the "
    "rewrite Catalyst itself applies to correlated scalar aggregates.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    from pyspark.sql import Window

    eur = (
        ps.join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    best = eur.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        best.join(part, best.l_partkey == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           sum(l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity) AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="Product-type profit (Q9 shape, adapted: 0.1*p_retailprice stands in "
    "for the absent ps_supplycost): 5-table join, profit per supplier "
    "nation per year.",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("sum_profit"))
    )


@register(
    "tpch_q11",
    oracle="""
    SELECT l_partkey AS ps_partkey,
           sum(l_extendedprice * l_quantity) AS part_value
    FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * l_quantity) > (
      SELECT 0.001 * sum(l_extendedprice * l_quantity)
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
    """,
    doc="Important stock (Q11 shape): per-part supply value from one "
    "nation's suppliers, kept when above a scalar-subquery fraction of "
    "the nation's total — group agg + broadcast scalar threshold.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    filtered = li.join(supp, li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    )
    per_part = filtered.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum(val).alias("part_value")
    )
    thresh = filtered.agg((0.001 * F.sum(val)).alias("__thresh"))
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("__thresh"))
        .select("ps_partkey", "part_value")
    )


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    doc="Customer order-count distribution (Q13 shape, adapted: the "
    "priority filter stands in for the absent o_comment NOT LIKE): "
    "left outer join with a join-side predicate, two-level aggregation.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="Top supplier (Q15 shape): quarterly revenue view, supplier(s) at "
    "the view's MAX — max-over-view scalar subquery, broadcast back.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01")) & (F.col("l_shipdate") < _TS("1996-04-01"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        supp.join(revenue, supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM supply JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="Parts/supplier relationship (Q16 shape, adapted: negative account "
    "balance stands in for the absent complaints comment): NOT IN "
    "anti-join + count-distinct per part attribute.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    supply = li.select("l_partkey", "l_suppkey").distinct()
    return (
        supply.join(bad_supp, supply.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17",
    oracle="""
    SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="Small-quantity-order revenue (Q17 shape): correlated per-part "
    "average threshold.  The oracle keeps the correlated form; the Spark "
    "plan de-correlates into a per-part aggregate joined back — the "
    "standard Catalyst rewrite, one extra shuffle over the semi-joined "
    "lineitem subset only.",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cand = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    # restrict lineitem to candidate parts FIRST (left-semi), then compute
    # the per-part average over that subset only — the correlated subquery
    # touches no other part's rows
    li_cand = li.join(cand.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
    thresh = li_cand.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("__qty_thresh")
    ).withColumnRenamed("l_partkey", "__tp")
    return (
        li_cand.join(thresh, li_cand.l_partkey == F.col("__tp"))
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg((F.sum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50)
    """,
    doc="Potential part promotion (Q20 shape): nested IN subquery with a "
    "grouped HAVING threshold — semi-join chain, aggregation before the "
    "semi-join so the probe side is already distinct-per-supplier.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01")) & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders    ON o_orderkey = l1.l_orderkey
      JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    """,
    doc="Suppliers who kept orders waiting (Q21 shape, adapted: 'late' is "
    "l_shipdate > o_orderdate + 30 days in place of the absent "
    "receipt/commit dates).  The oracle keeps the textbook multi-EXISTS "
    "form; the Spark plan rewrites both correlated EXISTS into per-order "
    "distinct-supplier counts (n_supp >= 2, n_late_supp == 1) — two "
    "aggregations + one join instead of two correlated probes per row, "
    "the formulation that scales.",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "__late", late.cast("int")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("__n_supp"),
        F.countDistinct(F.when(F.col("__late") == 1, F.col("l_suppkey"))).alias(
            "__n_late_supp"
        ),
    )
    l1 = lo.filter(F.col("__late") == 1).join(
        per_order.filter((F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)),
        "l_orderkey",
        "left_semi",
    )
    return (
        l1.join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
