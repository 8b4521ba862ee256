"""Aggregation operator inventory (SURVEY.md §2.5).

Covers: grouped reduce/field aggs (DataSet.java:339-443), minBy/maxBy
(DataSet.java:523,559), distinct (DataSet.java:596), first(n) per group
(UnsortedGrouping.java:202), built-in agg functions incl. STDDEV/VAR and
COLLECT multiset (FunctionCatalog.scala:371-381), DISTINCT aggs
(FlinkRuleSets.scala:165), rollup/cube/grouping sets + GROUPING_ID
(FunctionCatalog.scala:367-369), UDAF (AggregateFunction.java:103 ->
pandas_udf GROUPED_AGG), reduceGroup (full-group UDF -> applyInPandas).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "agg_basic",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty, min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty, avg(l_quantity) AS avg_qty,
           count(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Field aggregations sum/min/max/avg/count (Aggregations.java:27).",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.avg("l_quantity").alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "agg_distinct_modifier",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           sum(DISTINCT l_quantity) AS sum_distinct_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="DISTINCT-modified aggregates (AggregateExpandDistinctAggregatesRule).",
)
def agg_distinct_modifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum_distinct(F.col("l_quantity")).alias("sum_distinct_qty"),
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           stddev_samp(value) AS sd_samp, stddev_pop(value) AS sd_pop,
           var_samp(value) AS v_samp, var_pop(value) AS v_pop
    FROM events GROUP BY event_type
    """,
    doc="STDDEV_POP/SAMP, VAR_POP/SAMP (aggfunctions/*.scala).",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("sd_samp"),
            F.stddev_pop("value").alias("sd_pop"),
            F.var_samp("value").alias("v_samp"),
            F.var_pop("value").alias("v_pop"),
        )
    )


@register(
    "agg_minby_maxby",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, c_acctbal) AS richest,
           min_by(c_name, c_acctbal) AS poorest
    FROM customer GROUP BY c_nationkey
    """,
    doc="minBy/maxBy whole-row arg-min/max (DataSet.java:523,559).",
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("richest"),
            F.min_by("c_name", "c_acctbal").alias("poorest"),
        )
    )


@register(
    "agg_first_n_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3 AND o_custkey < 100
    """,
    doc="first(n) per group (UnsortedGrouping.java:202) via ranked window.",
)
def agg_first_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") < 100))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    doc="distinct on projected fields (DataSet.distinct / DataSetDistinct.scala).",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           sum(l_quantity) AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP + GROUPING_ID (DecomposeGroupingSetRule; FunctionCatalog.scala:367).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           avg(l_extendedprice) AS avg_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.avg("l_extendedprice").alias("avg_price"))
        .select("l_returnflag", "l_linestatus", "gid", "avg_price")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="GROUPING SETS via the SQL entry point (spark.sql over registered views).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_collect_multiset",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
           count(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
    doc="COLLECT multiset agg (CollectAggFunction.scala) — emitted as a "
    "sorted joined string for engine-portable comparison.",
)
def agg_collect_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "agg_udaf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           sum(l_extendedprice * l_quantity) / sum(l_quantity) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="UDAF (AggregateFunction.java:103) as Arrow-batched pandas GROUPED_AGG.",
)
def agg_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(weighted_avg("l_extendedprice", "l_quantity").alias("weighted_avg_price"))
    )


@register(
    "agg_reduce_group",
    oracle="""
    SELECT c_nationkey, count(*) AS n, max(c_acctbal) - min(c_acctbal) AS bal_range
    FROM customer GROUP BY c_nationkey
    """,
    doc="reduceGroup full-group UDF (DataSet.java:464 / GroupReduceDriver.java) "
    "via applyInPandas.",
)
def agg_reduce_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "n": [len(pdf)],
                "bal_range": [float(pdf["c_acctbal"].max() - pdf["c_acctbal"].min())],
            }
        )

    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .applyInPandas(summarize, "c_nationkey int, n long, bal_range double")
    )


@register(
    "agg_sort_group",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list(c_name ORDER BY c_acctbal DESC, c_name)[:3], '|') AS top3
    FROM customer GROUP BY c_nationkey
    """,
    doc="sortGroup + reduceGroup (UnsortedGrouping.java:271): within-group "
    "ordering via sorted struct collect.",
)
def agg_sort_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sort_array over struct(-acctbal, name) gives desc-by-balance order.
    sorted_names = F.transform(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("c_acctbal")).alias("nb"), F.col("c_name").alias("nm")))
            ),
            1,
            3,
        ),
        lambda s: s["nm"],
    )
    return (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.concat_ws("|", sorted_names).alias("top3"))
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.75) AS p75,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (built-in agg breadth "
    "beyond the reference's SUM/AVG/STDDEV set — documented superset): "
    "Spark percentile() == DuckDB quantile_cont (both linear "
    "interpolation over the sorted group).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.percentile("value", F.lit(0.95)).alias("p95"),
    )


@register(
    "agg_histogram",
    oracle="""
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
    SELECT CASE WHEN o_totalprice < lo THEN 0
                WHEN o_totalprice >= hi THEN 11
                ELSE floor((o_totalprice - lo) / ((hi - lo) / 10))::BIGINT + 1
           END AS bucket,
           count(*) AS cnt
    FROM orders, b GROUP BY 1
    """,
    doc="Value-distribution histogram via width_bucket over the global "
    "min/max (single-row broadcast, then a map-side bucket + one hash "
    "agg — the scalable two-pass histogram shape).  The oracle spells "
    "out Postgres width_bucket semantics (DuckDB lacks the function) "
    "with the same division order as Spark's WidthBucket expression.",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    return (
        o.join(F.broadcast(bounds), F.lit(True))
        .select(
            F.width_bucket("o_totalprice", F.col("lo"), F.col("hi"), F.lit(10)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           corr(l_extendedprice, l_discount) AS price_disc_corr,
           covar_pop(l_extendedprice, l_quantity) AS price_qty_covar,
           covar_samp(l_extendedprice, l_quantity) AS price_qty_covar_s
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Bivariate statistical aggregates (corr / covar_pop / "
    "covar_samp) per group — partial-aggregable single-pass moments, "
    "map-side combine like any hash agg.",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.corr("l_extendedprice", "l_discount").alias("price_disc_corr"),
        F.covar_pop("l_extendedprice", "l_quantity").alias("price_qty_covar"),
        F.covar_samp("l_extendedprice", "l_quantity").alias("price_qty_covar_s"),
    )


@register(
    "agg_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort_day,
           datediff('day', f.cohort_day, a.day) AS day_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
    doc="Cohort retention matrix over the events stream: users grouped "
    "by first-activity day, distinct active users counted at each day "
    "offset — the canonical product-analytics rollup a unified "
    "batch/stream engine serves.  Two partial-aggregated groupBys + "
    "one distinct + a user-keyed join; at scale the (user, day) "
    "distinct collapses map-side and the cohort table is "
    "users-bounded.",
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "agg_sessionization",
    oracle="""
    WITH o AS (
      SELECT user_id, epoch_us(ts::TIMESTAMP) AS t,
             CASE WHEN epoch_us(ts::TIMESTAMP)
                       - lag(epoch_us(ts::TIMESTAMP))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) > 1800000000
                       OR lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, t,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM o
    ),
    per_session AS (
      SELECT user_id, session_id, count(*) AS n_events,
             max(t) - min(t) AS span_us
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*) AS n_sessions,
           sum(n_events)::BIGINT AS n_events,
           avg(n_events::DOUBLE) AS avg_events_per_session,
           max(span_us)::BIGINT AS max_session_span_us
    FROM per_session GROUP BY user_id
    """,
    doc="Batch sessionization (gaps-and-islands, 30-min inactivity "
    "gap): per-user session count, event counts, and longest session "
    "span — the batch twin of the streaming session window "
    "(window_session).  ONE exchange on user_id feeds both windows "
    "AND both aggregations (sort within partitions, no re-shuffle); "
    "at 100 TB the only data movement is the initial user-keyed "
    "repartition.",
)
def agg_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))  # ts is NTZ; session TZ=UTC
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = (
        ((t - F.lag(t).over(w)) > 1_800_000_000)
        | F.lag("ts").over(w).isNull()
    ).cast("int")
    ws = Window.partitionBy("user_id").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.select("user_id", t.alias("t"), is_new.alias("is_new")).select(
        "user_id", "t", F.sum("is_new").over(ws).alias("session_id")
    )
    per_session = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("span_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.avg(F.col("n_events").cast("double")).alias("avg_events_per_session"),
        F.max("span_us").alias("max_session_span_us"),
    )


@register(
    "agg_zscore_anomaly",
    oracle="""
    WITH s AS (
      SELECT event_type,
             avg(value) AS mu,
             stddev_pop(value) AS sigma,
             count(*) AS n
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_type,
             CASE WHEN s.sigma > 0
                  THEN abs((e.value - s.mu) / s.sigma) ELSE 0.0 END AS az
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_type,
           count(*) AS n_events,
           sum(CASE WHEN az > 3.0 THEN 1 ELSE 0 END)::BIGINT AS n_anomalies,
           round(max(az), 6) AS max_abs_z
    FROM z GROUP BY event_type
    """,
    doc="Per-event-type z-score anomaly screen over the events stream "
    "(|z| > 3 on value): the per-type moment table is a tiny broadcast "
    "aggregate, the probe is map-only, and the rollup partial-"
    "aggregates — two passes over events, zero large shuffles.  The "
    "batch form of the streaming monitoring rule a unified engine "
    "serves both ways.",
)
def agg_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("__mu"),
        F.stddev_pop("value").alias("__sigma"),
    )
    az = F.when(
        F.col("__sigma") > 0,
        F.abs((F.col("value") - F.col("__mu")) / F.col("__sigma")),
    ).otherwise(F.lit(0.0))
    return (
        ev.join(F.broadcast(s), "event_type")
        .select("event_type", az.alias("__az"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("__az") > 3.0).cast("long")).alias("n_anomalies"),
            F.round(F.max("__az"), 6).alias("max_abs_z"),
        )
    )


@register(
    "agg_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    hit AS (
      SELECT s.user_id, s.s_ts,
             max(CASE WHEN p.ts > s.s_ts
                       AND p.ts <= s.s_ts + INTERVAL 1 HOUR
                      THEN 1 ELSE 0 END) AS converted
      FROM s LEFT JOIN (SELECT user_id, ts FROM events
                        WHERE event_type = 'purchase') p
        ON s.user_id = p.user_id
      GROUP BY s.user_id, s.s_ts
    )
    SELECT CAST(s_ts AS DATE) AS signup_day,
           count(*) AS n_signups,
           sum(converted)::BIGINT AS n_converted,
           round(avg(converted::DOUBLE), 6) AS conv_rate
    FROM hit GROUP BY signup_day
    """,
    doc="Aggregate funnel conversion: users by first-signup day, "
    "converted = any purchase within 1 hour of that signup — the "
    "rollup twin of the row-level CEP funnel (cep_funnel_signup_"
    "purchase reports WHO converted; this reports the rate curve). "
    "Per-user first-signup aggregate, one user-keyed join (AQE), "
    "per-day partial-agg rollup.",
)
def agg_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    hit = (
        s.join(p, "user_id", "left")
        .withColumn(
            "__c",
            F.when(
                (F.col("ts") > F.col("s_ts"))
                & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
                1,
            ).otherwise(0),
        )
        .groupBy("user_id", "s_ts")
        .agg(F.max("__c").alias("converted"))
    )
    return hit.groupBy(F.to_date("s_ts").alias("signup_day")).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.sum("converted").alias("n_converted"),
        F.round(F.avg(F.col("converted").cast("double")), 6).alias("conv_rate"),
    )


@register(
    "agg_pivot_langs",
    oracle="""
    SELECT source,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
           sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::BIGINT AS de,
           sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END)::BIGINT AS es,
           sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::BIGINT AS fr,
           sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END)::BIGINT AS zh
    FROM documents GROUP BY source
    """,
    doc="PIVOT to a wide source x language count matrix via "
    "DataFrame.pivot with an EXPLICIT value list — the explicit list "
    "keeps the plan a single partial-aggregated groupBy (no "
    "distinct-values pre-query, no second job) and fixes the output "
    "schema for any engine.",
)
def agg_pivot_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    langs = ["en", "de", "es", "fr", "zh"]
    return (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .na.fill(0, langs)
    )
