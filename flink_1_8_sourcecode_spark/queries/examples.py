"""The reference's remaining example programs, re-expressed over the
testdata schema.

flink-examples/flink-examples-batch: WordCount / PageRank /
ConnectedComponents / EnumTriangles / TransitiveClosureNaive /
TPCHQuery3 / TPCHQuery10 / KMeans / LinearRegression live elsewhere in
the registry (text_wordcount, graph_*, tpch_*, sim_ivf_train_assign,
ml wrappers).  This module closes the last two batch gaps:
WebLogAnalysis and PiEstimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "example_weblog_analysis",
    oracle="""
    WITH filter_docs AS (
      SELECT doc_id FROM documents
      WHERE text LIKE '%query%' AND text LIKE '%table%'
    ), filter_ranks AS (
      SELECT n_chars AS rank, doc_id, (doc_id % 100)::INT AS avg_duration
      FROM documents WHERE n_chars >= 250
    ), filter_visits AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    )
    SELECT r.rank, r.doc_id AS url, r.avg_duration
    FROM filter_docs d
    JOIN filter_ranks r ON d.doc_id = r.doc_id
    WHERE NOT EXISTS (SELECT 1 FROM filter_visits v WHERE v.user_id = r.doc_id)
    """,
    doc="WebLogAnalysis (flink-examples/.../relational/WebLogAnalysis"
    ".java:90) — the reference's filter/filter/filter + join + "
    "ANTI-join relational composition, mapped onto the testdata "
    "schema: keyword-filtered documents join their rank relation "
    "(rank = n_chars, min-rank filter), then anti-join the visited-"
    "url set (clicked user ids).  Plan shape preserved: two pushed "
    "scans, an equi-join, and a left-anti join (the reference's "
    "coGroup-based antiJoinVisits).",
)
def example_weblog_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "events")
    filter_docs = d.filter(
        F.col("text").contains("query") & F.col("text").contains("table")
    ).select("doc_id")
    filter_ranks = d.filter(F.col("n_chars") >= 250).select(
        F.col("n_chars").alias("rank"),
        "doc_id",
        (F.col("doc_id") % 100).cast("int").alias("avg_duration"),
    )
    filter_visits = (
        e.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    joined = filter_docs.join(filter_ranks, "doc_id").select(
        "rank", F.col("doc_id").alias("url"), "avg_duration"
    )
    return joined.join(
        filter_visits, joined.url == filter_visits.user_id, "left_anti"
    )


@register(
    "example_pi_estimation",
    oracle=f"""
    WITH pts AS (
      SELECT i,
             ({" + ".join(f"(strpos('0123456789abcdef', md5('x|' || i::VARCHAR)[{k + 1}]) - 1) * {16 ** (6 - k)}" for k in range(7))})
               / 268435456.0 AS x,
             ({" + ".join(f"(strpos('0123456789abcdef', md5('y|' || i::VARCHAR)[{k + 1}]) - 1) * {16 ** (6 - k)}" for k in range(7))})
               / 268435456.0 AS y
      FROM range(10000) t(i)
    )
    SELECT count(*) AS n,
           sum(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END)::BIGINT
             AS inside,
           4.0 * sum(CASE WHEN x * x + y * y <= 1.0 THEN 1 ELSE 0 END)
             / count(*) AS pi_estimate
    FROM pts
    """,
    doc="PiEstimation (flink-examples/.../misc/PiEstimation.java) — the "
    "reference's Monte Carlo sampler with the repo's determinism "
    "discipline: points come from the md5_base28 hash family "
    "(quasi-random, engine-portable, retry-stable) instead of task-"
    "local RNG, so the estimate is exact-reproducible and oracle-"
    "checkable.  Map-only over a range source; one global aggregate.",
)
def example_pi_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import md5_base28

    n = 10000
    pts = spark.range(n).select(
        (md5_base28(F.concat(F.lit("x|"), F.col("id").cast("string"))) / F.lit(268435456.0)).alias("x"),
        (md5_base28(F.concat(F.lit("y|"), F.col("id").cast("string"))) / F.lit(268435456.0)).alias("y"),
    )
    inside = F.sum(
        F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1).otherwise(0)
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n"),
        inside.cast("bigint").alias("inside"),
        (F.lit(4.0) * inside / F.count(F.lit(1))).alias("pi_estimate"),
    )


# session DFA over event types — StateMachineExample's shape (states +
# transition function + absorbing invalid state) on the events table
_DFA_CASE = """CASE
      WHEN {acc} = 'invalid' OR {x} = 'error' THEN 'invalid'
      WHEN {acc} = 'anon' AND {x} = 'signup' THEN 'active'
      WHEN {acc} = 'anon' AND {x} IN ('view', 'click') THEN 'anon'
      WHEN {acc} = 'active' AND {x} = 'purchase' THEN 'customer'
      WHEN {acc} = 'active' AND {x} IN ('view', 'click') THEN 'active'
      WHEN {acc} = 'customer' AND {x} IN ('view', 'click', 'purchase')
        THEN 'customer'
      ELSE 'invalid'
    END"""


@register(
    "example_state_machine",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           list_reduce(['anon'] || evs,
                       (acc, x) -> {_DFA_CASE.format(acc="acc", x="x")})
             AS final_state,
           len(evs) AS n_events
    FROM seq
    """,
    doc="StateMachineExample (flink-examples-streaming/.../statemachine/"
    "StateMachineExample.java) as a deterministic batch fold: each "
    "user's event-time-ordered event types run through the session DFA "
    "(anon -> active -> customer; 'error' or an out-of-order business "
    "event absorbs into 'invalid') via a JVM aggregate HOF — one "
    "user-keyed exchange, no Python.  The STREAMING form of the same "
    "per-key automaton is the CEP engine (cep/streaming.py), which is "
    "where the reference's DFA actually runs; this query pins the "
    "transition semantics against an engine-independent oracle.",
)
def example_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"],
        ).alias("evs")
    )
    # same transition table as _DFA_CASE (the oracle's list_reduce
    # lambda), expressed as Column when-chains — keep in lockstep
    fold = F.aggregate(
        F.col("evs"),
        F.lit("anon"),
        lambda acc, x: F.when(
            (acc == "invalid") | (x == "error"), F.lit("invalid")
        )
        .when((acc == "anon") & (x == "signup"), F.lit("active"))
        .when((acc == "anon") & x.isin("view", "click"), F.lit("anon"))
        .when((acc == "active") & (x == "purchase"), F.lit("customer"))
        .when((acc == "active") & x.isin("view", "click"), F.lit("active"))
        .when(
            (acc == "customer") & x.isin("view", "click", "purchase"),
            F.lit("customer"),
        )
        .otherwise(F.lit("invalid")),
    )
    return seq.select(
        "user_id", fold.alias("final_state"), F.size("evs").alias("n_events")
    )
