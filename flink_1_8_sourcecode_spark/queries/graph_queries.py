"""Graph query inventory (Gelly parity, SURVEY.md §2.15).

Connected components runs on a deterministic chain graph (10 chains of
10 vertices) so the oracle is closed-form; PageRank runs on the
nation-region clique graph with a recursive-CTE oracle that replicates
the exact same fixed-iteration update, so values match to float
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.graph import Graph
from flink_1_8_sourcecode_spark.queries import register

_PR_ITER = 8
_PR_DAMP = 0.85


@register(
    "graph_connected_components",
    oracle="""
    SELECT id::BIGINT AS id, ((id // 10) * 10)::BIGINT AS component
    FROM range(100) t(id)
    """,
    doc="ConnectedComponents (flink-gelly/.../library/ConnectedComponents.java): "
    "min-id label propagation by iterative join on a 10x10-chain graph.",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = spark.range(100).select(F.col("id"))
    e = (
        spark.range(100)
        .filter((F.col("id") % 10) != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    return Graph(v, e).connected_components(max_iterations=15)


@register(
    "graph_sssp",
    oracle="""
    SELECT id::BIGINT AS id, floor(log2(id + 1))::DOUBLE AS dist
    FROM range(127) t(id)
    """,
    doc="Single-source shortest paths (flink-gelly/.../library/"
    "SingleSourceShortestPaths.java): Bellman-Ford relaxation by "
    "iterative join on a 127-vertex binary tree (dist = depth = "
    "floor(log2(id+1)); converges in ~7 rounds).",
)
def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = 127
    v = spark.range(n).select("id")
    parents = spark.range((n - 1) // 2).select(F.col("id").alias("src"))
    e = parents.select("src", (F.col("src") * 2 + 1).alias("dst")).unionByName(
        parents.select("src", (F.col("src") * 2 + 2).alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    return Graph(v, e).single_source_shortest_paths(source=0, max_iterations=10)


_PR_EDGES_DUCK = """
      -- ring within each region (cyclic successor) + spokes to the hub
      SELECT n_nationkey AS src,
             coalesce(lead(n_nationkey) OVER w,
                      min(n_nationkey) OVER (PARTITION BY n_regionkey)) AS dst
      FROM nation WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)
      UNION ALL
      SELECT n_nationkey AS src,
             min(n_nationkey) OVER (PARTITION BY n_regionkey) AS dst
      FROM nation
      QUALIFY n_nationkey != min(n_nationkey) OVER (PARTITION BY n_regionkey)
"""


@register(
    "graph_pagerank",
    oracle=f"""
    WITH RECURSIVE edges AS ({_PR_EDGES_DUCK}
    ), outd AS (
      SELECT src, count(*) AS d FROM edges GROUP BY src
    ), w AS (
      SELECT e.src, e.dst, 1.0 / outd.d AS w FROM edges e JOIN outd USING (src)
    ),
    pr AS (
      SELECT 0 AS iter, n_nationkey AS id, 1.0 / 25 AS rank FROM nation
      UNION ALL
      SELECT iter + 1, w.dst AS id,
             {(1.0 - _PR_DAMP)} / 25 + {_PR_DAMP} * sum(pr.rank * w.w)
      FROM pr JOIN w ON pr.id = w.src
      WHERE iter < {_PR_ITER}
      GROUP BY iter + 1, w.dst
    )
    SELECT id::INT AS id, rank::DOUBLE AS rank FROM pr WHERE iter = {_PR_ITER}
    """,
    doc="PageRank (flink-gelly/.../linkanalysis/PageRank.java): fixed "
    f"{_PR_ITER}-iteration power method, damping {_PR_DAMP}, on an "
    "asymmetric ring+hub graph per region (non-uniform fixpoint); oracle "
    "replicates the identical update via recursive CTE.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nation = table(spark, sf_dir, "nation")
    v = nation.select(F.col("n_nationkey").alias("id"))
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    wr = Window.partitionBy("n_regionkey")
    ring = nation.select(
        F.col("n_nationkey").alias("src"),
        F.coalesce(F.lead("n_nationkey").over(w), F.min("n_nationkey").over(wr)).alias("dst"),
    )
    spokes = nation.select(
        F.col("n_nationkey").alias("src"), F.min("n_nationkey").over(wr).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    return Graph(v, ring.unionByName(spokes)).page_rank(
        iterations=_PR_ITER, damping=_PR_DAMP
    )
