"""Join operator inventory (SURVEY.md §2.4).

Covers: inner/left/right/full equi-joins (DataSet.java:751-948), cross
(DataSet.java:1056), theta/non-equi (DataSetJoin.scala:51), single-row
broadcast join (DataSetSingleRowJoin.scala), semi/anti (SubQueryRemoveRule,
FlinkRuleSets.scala:37-39), coGroup (DataSet.java:1009), interval join
(KeyedStream.java:414), temporal as-of join (TemporalRowtimeJoin.scala:63).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators.joins import asof_join, interval_join
from flink_1_8_sourcecode_spark.queries import register


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
    doc="Batch equi inner join (DataSet.join; size-based join strategy).",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'P'
    GROUP BY c_custkey, c_name
    """,
    doc="Left outer join with join-side predicate; NULL padding counted as 0.",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey, c_name
    FROM customer RIGHT JOIN orders ON c_custkey = o_custkey AND c_acctbal > 9000
    WHERE o_totalprice > 450000
    """,
    doc="Right outer join: every qualifying order kept, customer NULL-padded.",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000), "right").select(
        "o_orderkey", "c_name"
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                FROM customer WHERE c_acctbal > 8000 GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    doc="Full outer join of two aggregates (FullOuterJoinDriver.java parity).",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 8000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"),
        # NULL-padding coalesced to 0: hash-stable output (NaN in a leading
        # sort column breaks row-order canonicalization on both engines).
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="Left-semi join (Flink: IN/EXISTS rewritten by SubQueryRemoveRule).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no order above "
    "300000.  The unfiltered form was empty at every SF (every "
    "synthetic customer has an order), so the anti logic was never "
    "value-checked (r11 vacuity audit) — the price filter keeps the "
    "anti set non-empty at sf0.001/0.01/0.1 (3/30/308 rows).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    doc="Cartesian product (DataSet.cross / CrossDriver.java) — dims only.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_theta",
    oracle="""
    SELECT a.s_nationkey AS nationkey, count(*) AS n_pairs
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_acctbal > b.s_acctbal
    GROUP BY a.s_nationkey
    """,
    doc="Theta join: equi-prefix + inequality (Flink needs equi prefix; Spark same plan).",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = table(spark, sf_dir, "supplier").alias("a")
    b = table(spark, sf_dir, "supplier").alias("b")
    return (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_acctbal") > F.col("b.s_acctbal")),
        )
        .groupBy(F.col("a.s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_single_row",
    oracle="""
    SELECT l_returnflag, count(*) AS n_above_avg
    FROM lineitem, (SELECT avg(l_quantity) AS avg_qty FROM lineitem)
    WHERE l_quantity > avg_qty
    GROUP BY l_returnflag
    """,
    doc="Single-row broadcast nested-loop join (DataSetSingleRowJoin.scala).",
)
def join_single_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    avg_row = li.agg(F.avg("l_quantity").alias("avg_qty"))
    return (
        li.join(F.broadcast(avg_row))
        .filter(F.col("l_quantity") > F.col("avg_qty"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "join_cogroup",
    oracle="""
    WITH oc AS (SELECT o_custkey AS k, count(*) AS cnt FROM orders GROUP BY 1),
         ec AS (SELECT user_id AS k, count(*) AS cnt FROM events GROUP BY 1)
    SELECT coalesce(oc.k, ec.k) AS custkey,
           coalesce(oc.cnt, 0) AS n_orders,
           coalesce(ec.cnt, 0) AS n_events
    FROM oc FULL OUTER JOIN ec ON oc.k = ec.k
    WHERE coalesce(oc.k, ec.k) < 200
    """,
    doc="coGroup (DataSet.coGroup/CoGroupDriver.java): both groups to one "
    "UDF via DataFrame cogroup + applyInPandas.",
)
def join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 200)

    def combine(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"custkey": [key[0]], "n_orders": [len(left)], "n_events": [len(right)]}
        )

    return (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(combine, "custkey long, n_orders long, n_events long")
    )


@register(
    "join_interval",
    oracle="""
    SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id
    FROM events s JOIN events p
      ON s.user_id = p.user_id
     AND s.event_type = 'signup' AND p.event_type = 'purchase'
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 30 MINUTE
    """,
    doc="Interval join (KeyedStream.intervalJoin between [0, 30min]).",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id"), F.col("ts").alias("s_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = interval_join(
        s.withColumnRenamed("user_id", "u"),
        p.withColumnRenamed("p_user", "u"),
        on="u",
        left_time="s_ts",
        right_time="p_ts",
        lower="0 seconds",
        upper="30 minutes",
    )
    return joined.select("signup_id", "purchase_id", F.col("u").alias("user_id"))


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           coalesce(c.event_id, -1) AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="Temporal as-of join (TemporalRowtimeJoin.scala:63): latest prior "
    "click per purchase; union + key-sorted last-value carry, one shuffle.",
    bench=True,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("last_click_id")
    )
    out = asof_join(
        p,
        c,
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        right_cols=["last_click_id"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("last_click_id"), F.lit(-1)).alias("last_click_id"),
    )


@register(
    "join_temporal_sql_lateral",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT user_id, ts AS c_ts, event_id
               FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.c_ts <= p.ts
    """,
    doc="Flink 1.8 temporal-table-function SQL join routed through "
    "Engine.sql: FROM purchases p, LATERAL TABLE (user_clicks(p.ts)) c "
    "— registerFunction(createTemporalTableFunction) + the reference's "
    "LATERAL TABLE syntax (TemporalRowtimeJoin.scala), INNER "
    "semantics (probes with no prior version vanish, the "
    "empty-correlate behavior).  Oracle: DuckDB ASOF (inner) JOIN.",
)
def join_temporal_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.engine import Engine
    from flink_1_8_sourcecode_spark.operators.joins import (
        create_temporal_table_function,
    )

    eng = Engine(spark)
    ev = table(spark, sf_dir, "events")
    eng.register(
        "purchases",
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id")
    )
    eng.register_temporal_table_function(
        "user_clicks", create_temporal_table_function(clicks, "c_ts", "user_id")
    )
    return eng.sql(
        """
        SELECT p.event_id AS purchase_id, p.user_id, c.click_id
        FROM purchases p, LATERAL TABLE (user_clicks(p.ts)) c
        """
    )


@register(
    "join_asof_bucketed",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           coalesce(c.event_id, -1) AS last_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="join_asof through the hot-key time-bucket pre-split "
    "(asof_join(time_buckets=6h)): the carry window partitions on "
    "(key, 6-hour bucket) with per-bucket seeds carried from prior "
    "buckets — identical semantics (same oracle as join_asof), but the "
    "plan fans a hot key's history across buckets instead of one "
    "window partition (operators/joins.py).",
)
def join_asof_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("last_click_id")
    )
    out = asof_join(
        p,
        c,
        on="user_id",
        left_time="p_ts",
        right_time="c_ts",
        right_cols=["last_click_id"],
        time_buckets=6 * 3600.0,
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.coalesce(F.col("last_click_id"), F.lit(-1)).alias("last_click_id"),
    )


@register(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           coalesce(CASE WHEN c.ts <= p.ts + INTERVAL 10 MINUTE
                         THEN c.event_id END, -1) AS next_click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts >= p.ts
    """,
    doc="Forward as-of join with tolerance (merge_asof direction= "
    "'forward'): the next click at-or-after each purchase, voided when "
    "more than 10 minutes out — same single-shuffle carry as backward, "
    "over a reversed time order (operators/joins.py:asof_join).",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("next_click_id")
    )
    out = asof_join(
        p, c, on="user_id", left_time="p_ts", right_time="c_ts",
        right_cols=["next_click_id"], direction="forward", tolerance=600.0,
    )
    return out.select(
        "purchase_id", "user_id",
        F.coalesce(F.col("next_click_id"), F.lit(-1)).alias("next_click_id"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         b AS (SELECT p.event_id, p.user_id, p.ts,
                      c.event_id AS bid, c.ts AS bt
               FROM p ASOF LEFT JOIN c
                 ON p.user_id = c.user_id AND c.ts <= p.ts),
         f AS (SELECT p.event_id, c.event_id AS fid, c.ts AS ft
               FROM p ASOF LEFT JOIN c
                 ON p.user_id = c.user_id AND c.ts >= p.ts)
    SELECT b.event_id AS purchase_id, b.user_id,
           coalesce(CASE
             WHEN fid IS NULL THEN bid
             WHEN bid IS NULL THEN fid
             WHEN (epoch(ft) - epoch(b.ts)) < (epoch(b.ts) - epoch(bt)) THEN fid
             ELSE bid END, -1) AS nearest_click_id
    FROM b JOIN f ON b.event_id = f.event_id
    """,
    doc="Nearest as-of join (merge_asof direction='nearest', ties "
    "prefer backward): the closest click in either direction per "
    "purchase; both carries share one exchange "
    "(operators/joins.py:asof_join).",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("nearest_click_id")
    )
    out = asof_join(
        p, c, on="user_id", left_time="p_ts", right_time="c_ts",
        right_cols=["nearest_click_id"], direction="nearest",
    )
    return out.select(
        "purchase_id", "user_id",
        F.coalesce(F.col("nearest_click_id"), F.lit(-1)).alias("nearest_click_id"),
    )


@register(
    "join_temporal_sql_lateral_stream",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts AS c_ts, event_id FROM events
               WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS purchase_id, p.user_id,
                  c.event_id AS click_id,
                  row_number() OVER (PARTITION BY p.user_id, p.event_id
                                     ORDER BY c.c_ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.ts
         )
    SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1
    """,
    doc="The temporal-table-function SQL join with a STREAMING probe "
    "and a STATIC version history, routed through Engine.sql: "
    "FROM purchases_stream p, LATERAL TABLE (user_clicks(p.ts)) c.  "
    "temporal_join dispatches to the stateless path — the bounded "
    "history is captured sorted once and every probe micro-batch runs "
    "a vectorized merge_asof inside mapInPandas (no shuffle, no "
    "state); INNER semantics, greatest-(time, payload) tie rule, same "
    "answer as the batch LATERAL form.",
)
def join_temporal_sql_lateral_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.engine import Engine
    from flink_1_8_sourcecode_spark.operators.joins import (
        create_temporal_table_function,
    )
    from flink_1_8_sourcecode_spark.queries.streaming_windows import (
        _replayed_stream,
        _run_to_table,
    )

    eng = Engine(spark)
    stream = _replayed_stream(spark, sf_dir, "lat_stream_")
    eng.register(
        "purchases_s",
        stream.filter(F.col("event_type").isin("purchase", "noop")).select(
            "event_id", "user_id", "ts"
        ),
    )
    clicks = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_id"))
    )
    eng.register_temporal_table_function(
        "user_clicks", create_temporal_table_function(clicks, "c_ts", "user_id")
    )
    out = eng.sql(
        """
        SELECT p.event_id AS purchase_id, p.user_id, c.click_id
        FROM purchases_s p, LATERAL TABLE (user_clicks(p.ts)) c
        """
    )
    name = _run_to_table(out, "q_lat_stream", state_partitions=4)
    return spark.table(name).filter(F.col("user_id") >= 0)


@register(
    "join_apply_changelog",
    oracle="""
    WITH ch AS (
      SELECT 'U' AS op, 1 AS version, c_custkey, c_name, c_nationkey,
             c_acctbal + 1000 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT 'D', 2, c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT 'I', 1, c_custkey + 100000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 = 0
    ), latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY c_custkey
          ORDER BY version DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END) AS rn
        FROM ch
      ) WHERE rn = 1
    )
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM latest WHERE op IN ('I', 'U')
    """,
    doc="Changelog materialization (operators/joins.py:apply_changelog) "
    "— the batch form of the reference's retract/upsert stream-to-table "
    "semantics: per key the highest-version change wins, delete beats "
    "insert at equal version, surviving deletes remove, upserts "
    "replace-or-add, untouched base rows stream through a left-anti + "
    "union (the base is never windowed).  The changelog is built "
    "deterministically from customer in BOTH engines (updates %7, "
    "deletes %11 at a higher version, inserts %13 at shifted keys).",
)
def join_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.joins import apply_changelog

    c = table(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    upd = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .select(F.lit("U").alias("op"), F.lit(1).alias("version"), *cols)
    )
    dels = c.filter(F.col("c_custkey") % 11 == 0).select(
        F.lit("D").alias("op"), F.lit(2).alias("version"), *cols
    )
    ins = (
        c.filter(F.col("c_custkey") % 13 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 100000)
        .select(F.lit("I").alias("op"), F.lit(1).alias("version"), *cols)
    )
    changelog = upd.unionByName(dels).unionByName(ins)
    return apply_changelog(
        c.select(*cols), changelog, keys=["c_custkey"], version_col="version"
    )


@register(
    "join_snapshot_as_of",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts::TIMESTAMP AS ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
                                event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
    """,
    doc="Point-in-time snapshot (operators/joins.py:snapshot_as_of — "
    "the temporal table function's lookup semantics standalone, "
    "Table.createTemporalTableFunction): each user's latest event "
    "at-or-before 2024-01-15, one latest-wins window over the "
    "time-filtered history; the as-of filter pushes to the scan.",
)
def join_snapshot_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.joins import snapshot_as_of

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    return snapshot_as_of(
        e, ["user_id"], "ts", "2024-01-15 00:00:00", tiebreak=["event_id"]
    )


@register(
    "join_scd2_intervals",
    oracle="""
    SELECT user_id, event_id, event_type,
           ts::TIMESTAMP AS valid_from,
           (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id))::TIMESTAMP AS valid_to
    FROM events
    """,
    doc="SCD type-2 interval build (operators/joins.py:build_scd2 — the "
    "materialized twin of the temporal table function's version chain, "
    "Table.createTemporalTableFunction): every event version gains "
    "valid_from/valid_to via one per-key LEAD window (half-open "
    "intervals, NULL = current).  Exactly one key-hash exchange; makes "
    "snapshot_as_of a plain BETWEEN filter downstream.",
)
def join_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.joins import build_scd2

    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return build_scd2(
        e, ["user_id"], "ts", tiebreak=["event_id"]
    ).select("user_id", "event_id", "event_type", "valid_from", "valid_to")
