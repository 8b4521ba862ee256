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
    bench=True,
    oracle="""
    SELECT id::BIGINT AS id, ((id // 10) * 10)::BIGINT AS component
    FROM range(100) t(id)
    """,
    doc="ConnectedComponents (flink-gelly/.../library/ConnectedComponents.java): "
    "min-id components on a 10x10-chain graph via POINTER JUMPING "
    "(graph/graph.py:connected_components_jump) — O(log d) rounds vs "
    "the delta iteration's O(d) supersteps, the right variant when "
    "per-superstep fixed cost dominates (this graph, and the shrunken "
    "tail rounds of a 100 TB run).  The Gelly-parity delta iteration "
    "(connected_components) stays pinned by "
    "tests/test_operators.py::test_workset_shrinks_on_chain_graph.",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = spark.range(100).select(F.col("id"))
    e = (
        spark.range(100)
        .filter((F.col("id") % 10) != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    # iteration parallelism tracks the (tiny) per-round data — Flink
    # setParallelism parity; see connected_components' docstring
    return Graph(v, e).connected_components_jump(shuffle_partitions=4)


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


def _ring_hub_graph(spark: SparkSession, sf_dir: str):
    """Deterministic ring+hub graph over nation (shared by PageRank /
    LabelPropagation / TriangleEnumerator queries)."""
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
    return v, ring.unionByName(spokes)


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
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).page_rank(iterations=_PR_ITER, damping=_PR_DAMP)


_LPA_ITER = 3


def _lpa_oracle(iters: int = _LPA_ITER) -> str:
    """Unrolled fixed-iteration replica of the reference's
    UpdateVertexLabel argmax-(frequency, label) update."""
    sql = (
        f"WITH edges AS ({_PR_EDGES_DUCK}), "
        "lp0 AS (SELECT n_nationkey AS id, n_nationkey AS label FROM nation)"
    )
    for i in range(1, iters + 1):
        sql += f""",
    m{i} AS (SELECT e.dst AS id, l.label, count(*) AS cnt
             FROM edges e JOIN lp{i - 1} l ON e.src = l.id GROUP BY e.dst, l.label),
    u{i} AS (SELECT * FROM m{i} UNION ALL SELECT id, label, 1 AS cnt FROM lp{i - 1}),
    lp{i} AS (SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label DESC) AS rn
        FROM u{i}) WHERE rn = 1)"""
    sql += f"\n    SELECT id::INT AS id, label::INT AS label FROM lp{iters}"
    return sql


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    doc="LabelPropagation (flink-gelly/.../library/LabelPropagation.java): "
    f"{_LPA_ITER} supersteps of adopt-most-frequent-neighbor-label with "
    "greater-label tie-break, on the ring+hub nation graph; oracle "
    "unrolls the identical update.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).label_propagation(iterations=_LPA_ITER)


@register(
    "graph_triangles",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM edges WHERE src != dst)
    SELECT e1.a::INT AS v1, e1.b::INT AS v2, e2.b::INT AS v3
    FROM ce e1
    JOIN ce e2 ON e2.a = e1.b
    JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="TriangleEnumerator (flink-gelly/.../library/TriangleEnumerator.java): "
    "distinct triangles (v1<v2<v3) with the reference's degree-ordered "
    "wedge construction; oracle is the canonical 3-way self-join.",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).triangle_enumeration()


_HITS_ITER = 4


def _hits_oracle(iters: int = _HITS_ITER) -> str:
    """Unrolled replica of HITS.java's authority->normalize->hub->
    normalize round."""
    sql = (
        f"WITH edges AS ({_PR_EDGES_DUCK}), "
        "v AS (SELECT n_nationkey AS id FROM nation), "
        "h0 AS (SELECT id, 1.0 AS hub FROM v)"
    )
    for i in range(1, iters + 1):
        sql += f""",
    ar{i} AS (SELECT e.dst AS id, sum(h.hub) AS a
              FROM edges e JOIN h{i - 1} h ON e.src = h.id GROUP BY e.dst),
    af{i} AS (SELECT v.id, coalesce(ar{i}.a, 0) AS authority
              FROM v LEFT JOIN ar{i} ON v.id = ar{i}.id),
    an{i} AS (SELECT id, authority / sqrt(sum(authority * authority) OVER ()) AS authority
              FROM af{i}),
    hr{i} AS (SELECT e.src AS id, sum(a.authority) AS hsum
              FROM edges e JOIN an{i} a ON e.dst = a.id GROUP BY e.src),
    hf{i} AS (SELECT v.id, coalesce(hr{i}.hsum, 0) AS hub
              FROM v LEFT JOIN hr{i} ON v.id = hr{i}.id),
    h{i} AS (SELECT id, hub / sqrt(sum(hub * hub) OVER ()) AS hub FROM hf{i})"""
    sql += (
        f"\n    SELECT h.id::INT AS id, h.hub::DOUBLE AS hub, "
        f"a.authority::DOUBLE AS authority FROM h{iters} h JOIN an{iters} a USING (id)"
    )
    return sql


@register(
    "graph_hits",
    oracle=_hits_oracle(),
    doc="HITS (flink-gelly/.../library/linkanalysis/HITS.java): "
    f"{_HITS_ITER} rounds of authority = sum(in-neighbor hubs), hub = "
    "sum(out-neighbor authorities), each L2-normalized; oracle unrolls "
    "the identical rounds.",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).hits(iterations=_HITS_ITER)


# 2 supersteps keep every score a dyadic rational (0.5/1, 0.5/2), so the
# float arithmetic is EXACT in both engines and argmax ties cannot flip
_CD_ITER = 2
_CD_DELTA = 0.5


def _community_oracle(iters: int = _CD_ITER) -> str:
    # the engine runs on getUndirected() per CommunityDetection.java:79 —
    # symmetrize the oracle's edges the same way (duplicates kept)
    sql = (
        f"WITH edges_d AS ({_PR_EDGES_DUCK}), "
        "edges AS (SELECT src, dst FROM edges_d "
        "UNION ALL SELECT dst AS src, src AS dst FROM edges_d), "
        "c0 AS (SELECT n_nationkey::BIGINT AS id, n_nationkey::BIGINT AS label, "
        "1.0 AS score FROM nation)"
    )
    for i in range(1, iters + 1):
        sql += f""",
    p{i} AS (SELECT e.dst AS id, c.label AS lbl,
                    sum(c.score) AS s, max(c.score) AS hi
             FROM edges e JOIN c{i - 1} c ON e.src = c.id
             GROUP BY e.dst, c.label),
    w{i} AS (SELECT id, lbl, hi FROM (
               SELECT *, row_number() OVER (PARTITION BY id
                         ORDER BY s DESC, lbl ASC) AS rn FROM p{i}) WHERE rn = 1),
    c{i} AS (SELECT c.id,
                    coalesce(w.lbl, c.label) AS label,
                    CASE WHEN w.id IS NULL THEN c.score
                         WHEN w.lbl != c.label THEN w.hi - {_CD_DELTA} / {i}
                         ELSE w.hi END AS score
             FROM c{i - 1} c LEFT JOIN w{i} w ON c.id = w.id)"""
    sql += f"\n    SELECT id::BIGINT AS id, label::BIGINT AS label FROM c{iters}"
    return sql


@register(
    "graph_community_detection",
    oracle=_community_oracle(),
    doc="CommunityDetection (flink-gelly/.../library/CommunityDetection.java, "
    "Leung et al.): adopt the label with the highest summed (label, score) "
    "message, re-scored by hop attenuation delta/superstep; oracle unrolls "
    f"{_CD_ITER} supersteps of the identical update.",
)
def graph_community_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).community_detection(max_iterations=_CD_ITER, delta=_CD_DELTA)


@register(
    "graph_summarize",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    grp AS (SELECT n_nationkey AS id, n_regionkey AS g FROM nation)
    SELECT s.g::INT AS src_group, d.g::INT AS dst_group,
           (e.src % 2)::INT AS edge_value, count(*) AS edge_count
    FROM edges e JOIN grp s ON e.src = s.id JOIN grp d ON e.dst = d.id
    GROUP BY s.g, d.g, e.src % 2
    """,
    doc="Summarization (flink-gelly/.../library/Summarization.java): "
    "vertices collapse by group value (region), edges group by "
    "(src group, dst group, edge value) with counts.",
)
def graph_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = table(spark, sf_dir, "nation")
    v, e = _ring_hub_graph(spark, sf_dir)
    v = v.join(
        nation.select(F.col("n_nationkey").alias("id"), F.col("n_regionkey").alias("region")),
        "id",
    )
    e = e.withColumn("edge_value", (F.col("src") % 2).cast("int"))
    _sv, se = Graph(v, e).summarize("region", "edge_value")
    return se.select(
        F.col("src_group").cast("int"), F.col("dst_group").cast("int"),
        "edge_value", "edge_count",
    )


@register(
    "graph_cc_logrounds",
    oracle="""
    SELECT id::BIGINT AS id, ((id // 10) * 10)::BIGINT AS component
    FROM range(100) t(id)
    """,
    doc="ConnectedComponents via alternating large-star/small-star "
    "contractions (O(log n) rounds regardless of diameter — the 100 TB "
    "path for high-diameter graphs; graph/graph.py:"
    "connected_components_alternating) on the same 10x10-chain graph as "
    "graph_connected_components.",
)
def graph_cc_logrounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = spark.range(100).select(F.col("id"))
    e = (
        spark.range(100)
        .filter((F.col("id") % 10) != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    # iteration parallelism tracks the (tiny) per-round edge set —
    # Flink setParallelism parity, same as graph_connected_components
    return Graph(v, e).connected_components_alternating(shuffle_partitions=4)


_UND_DUCK = f"""
    und AS (SELECT DISTINCT s, t FROM (
              SELECT src AS s, dst AS t FROM edges WHERE src != dst
              UNION ALL
              SELECT dst AS s, src AS t FROM edges WHERE src != dst)),
    deg AS (SELECT s, count(*) AS d FROM und GROUP BY 1)
"""


@register(
    "graph_jaccard_index",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    wedge AS (SELECT a.t AS u, b.t AS v
              FROM und a JOIN und b ON a.s = b.s AND a.t < b.t),
    shared AS (SELECT u, v, count(*) AS shared FROM wedge GROUP BY 1, 2)
    SELECT u::BIGINT AS u, v::BIGINT AS v, shared,
           shared::DOUBLE / (du.d + dv.d - shared) AS jaccard
    FROM shared JOIN deg du ON du.s = u JOIN deg dv ON dv.s = v
    """,
    doc="Jaccard vertex similarity (flink-gelly/.../library/similarity/"
    "JaccardIndex.java): |N(u) n N(v)| / |N(u) u N(v)| per pair with a "
    "common neighbor — wedge self-join + degree join on the ring+hub "
    "nation graph.",
)
def graph_jaccard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).jaccard_index()


@register(
    "graph_adamic_adar",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    cent AS (SELECT und.s, und.t, 1.0 / ln(deg.d) AS w
             FROM und JOIN deg ON und.s = deg.s),
    wedge AS (SELECT a.t AS u, b.t AS v, a.w
              FROM cent a JOIN cent b ON a.s = b.s AND a.t < b.t)
    SELECT u::BIGINT AS u, v::BIGINT AS v, sum(w) AS score
    FROM wedge GROUP BY 1, 2
    """,
    doc="Adamic-Adar similarity (flink-gelly/.../library/similarity/"
    "AdamicAdar.java): sum of 1/ln(deg(w)) over common neighbors — "
    "rare shared neighbors outweigh hubs.",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).adamic_adar()


@register(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM edges WHERE src != dst),
    tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
            FROM ce e1
            JOIN ce e2 ON e2.a = e1.b
            JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
    m AS (SELECT v1 AS id FROM tri UNION ALL SELECT v2 FROM tri
          UNION ALL SELECT v3 FROM tri),
    tc AS (SELECT id, count(*) AS triangles FROM m GROUP BY 1)
    SELECT deg.s::BIGINT AS id,
           coalesce(tc.triangles, 0) AS triangles,
           CASE WHEN deg.d >= 2
                THEN 2.0 * coalesce(tc.triangles, 0) / (deg.d * (deg.d - 1))
                ELSE 0.0 END AS coefficient
    FROM deg LEFT JOIN tc ON tc.id = deg.s
    """,
    doc="Local clustering coefficient (flink-gelly/.../library/"
    "clustering/undirected/LocalClusteringCoefficient.java): "
    "2*triangles / d*(d-1) per vertex, triangle counts from the "
    "degree-ordered enumerator.",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    return Graph(v, e).local_clustering_coefficient()


@register(
    "graph_clustering_global",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM edges WHERE src != dst),
    tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
            FROM ce e1
            JOIN ce e2 ON e2.a = e1.b
            JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
    m AS (SELECT v1 AS id FROM tri UNION ALL SELECT v2 FROM tri
          UNION ALL SELECT v3 FROM tri),
    tc AS (SELECT id, count(*) AS triangles FROM m GROUP BY 1),
    local AS (SELECT deg.s AS id, deg.d,
                     coalesce(tc.triangles, 0) AS t,
                     CASE WHEN deg.d >= 2
                          THEN 2.0 * coalesce(tc.triangles, 0)
                               / (deg.d * (deg.d - 1))
                          ELSE 0.0 END AS c
              FROM deg LEFT JOIN tc ON tc.id = deg.s)
    SELECT sum(t) / 3 AS n_triangles,
           (sum(d * (d - 1)) / 2)::BIGINT AS n_wedges,
           CASE WHEN sum(d * (d - 1)) > 0
                THEN 3.0 * (sum(t) / 3) / (sum(d * (d - 1)) / 2)
                ELSE 0.0 END AS global_coefficient,
           avg(c) AS average_coefficient
    FROM local
    """,
    doc="Global + average clustering coefficient (flink-gelly/.../"
    "clustering/undirected/GlobalClusteringCoefficient.java, "
    "AverageClusteringCoefficient.java): 3*triangles/wedges and the "
    "mean of local coefficients, one aggregate over the local table.",
)
def graph_clustering_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    g = Graph(v, e)
    und = (
        e.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .unionAll(e.select(F.col("dst").alias("s"), F.col("src").alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    local = g.local_clustering_coefficient()
    joined = local.join(deg, local.id == deg.s)
    return joined.agg(
        (F.sum("triangles") / 3).alias("n_triangles"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
        F.when(
            F.sum(F.col("d") * (F.col("d") - 1)) > 0,
            3.0 * (F.sum("triangles") / 3)
            / (F.sum(F.col("d") * (F.col("d") - 1)) / 2),
        ).otherwise(F.lit(0.0)).alias("global_coefficient"),
        F.avg("coefficient").alias("average_coefficient"),
    )


@register(
    "graph_triadic_census",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM edges WHERE src != dst),
    tri AS (SELECT count(*) AS t FROM (
              SELECT 1 FROM ce e1
              JOIN ce e2 ON e2.a = e1.b
              JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b)),
    base AS (SELECT (SELECT count(*) FROM deg) AS n,
                    (SELECT count(*) FROM ce) AS m,
                    (SELECT sum(d * (d - 1)) / 2 FROM deg) AS w,
                    (SELECT t FROM tri) AS t)
    SELECT (n * (n - 1) * (n - 2) / 6
            - (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)
            - (w - 3 * t) - t)::BIGINT AS t0_empty,
           (m * (n - 2) - 2 * (w - 3 * t) - 3 * t)::BIGINT AS t1_one_edge,
           (w - 3 * t)::BIGINT AS t2_open_wedge,
           t::BIGINT AS t3_triangle
    FROM base
    """,
    doc="Undirected triadic census (flink-gelly/.../clustering/"
    "undirected/TriadicCensus.java): vertex-triple counts by edge "
    "count (0/1/2/3) in closed form from n, m, wedges, and triangles — "
    "three cheap aggregates instead of materializing C(n,3) triples.",
)
def graph_triadic_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    g = Graph(v, e)
    und = (
        e.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .unionAll(e.select(F.col("dst").alias("s"), F.col("src").alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    base = deg.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("d") / 2).cast("long").alias("m"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("w"),
    ).join(F.broadcast(g.triangle_enumeration().agg(F.count(F.lit(1)).alias("t"))))
    n, m, w, t = F.col("n"), F.col("m"), F.col("w"), F.col("t")
    t2 = w - 3 * t
    t1 = m * (n - 2) - 2 * t2 - 3 * t
    return base.select(
        (n * (n - 1) * (n - 2) / 6 - t1 - t2 - t).cast("long").alias("t0_empty"),
        t1.cast("long").alias("t1_one_edge"),
        t2.cast("long").alias("t2_open_wedge"),
        t.cast("long").alias("t3_triangle"),
    )


@register(
    "graph_vertex_metrics",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK}
    SELECT (SELECT count(*) FROM deg) AS n_vertices,
           ((SELECT count(*) FROM und) / 2)::BIGINT AS n_edges,
           (SELECT avg(d) FROM deg) AS avg_degree,
           (SELECT max(d) FROM deg) AS max_degree,
           (SELECT sum(d * (d - 1)) / 2 FROM deg)::BIGINT AS n_wedges
    FROM (SELECT 1)
    """,
    doc="Vertex metrics summary (flink-gelly/.../library/metric/"
    "undirected/VertexMetrics.java): vertex/edge counts, average and "
    "max degree, wedge (triplet) count — one aggregate over the "
    "degree table.",
)
def graph_vertex_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    und = (
        e.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .unionAll(e.select(F.col("dst").alias("s"), F.col("src").alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    return deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.avg("d").alias("avg_degree"),
        F.max("d").alias("max_degree"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
    )


@register(
    "graph_edge_metrics",
    oracle=f"""
    WITH edges AS ({_PR_EDGES_DUCK}),
    {_UND_DUCK},
    d2 AS (SELECT und.s, und.t, ds.d AS sd, dt.d AS td
           FROM und JOIN deg ds ON ds.s = und.s JOIN deg dt ON dt.s = und.t),
    per_v AS (SELECT s, max(sd) AS d,
                     sum(CASE WHEN sd < td OR (sd = td AND s < t)
                              THEN 1 ELSE 0 END) AS low
              FROM d2 GROUP BY s),
    tri AS (SELECT s, low * (low - 1) / 2 AS tt,
                   low * (low - 1) / 2 + low * (d - low) AS rt
            FROM per_v)
    SELECT sum(tt)::BIGINT AS triangle_triplet_count,
           sum(rt)::BIGINT AS rectangle_triplet_count,
           max(tt)::BIGINT AS maximum_triangle_triplets,
           max(rt)::BIGINT AS maximum_rectangle_triplets
    FROM tri
    """,
    doc="Edge metrics (flink-gelly/.../library/metric/undirected/"
    "EdgeMetrics.java): per vertex, low = #edges where it is the "
    "(degree, id)-low-order endpoint; triangle triplets = C(low, 2), "
    "rectangle triplets add low*(d-low); summed and maxed exactly as "
    "the reference's accumulators.",
)
def graph_edge_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    v, e = _ring_hub_graph(spark, sf_dir)
    und = (
        e.select(F.col("src").alias("s"), F.col("dst").alias("t"))
        .unionAll(e.select(F.col("dst").alias("s"), F.col("src").alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    ds = deg.select(F.col("s").alias("__vs"), F.col("d").alias("sd"))
    dt = deg.select(F.col("s").alias("__vt"), F.col("d").alias("td"))
    d2 = (
        und.join(ds, und.s == F.col("__vs"))
        .join(dt, und.t == F.col("__vt"))
        .select(und.s.alias("u"), und.t.alias("w"), "sd", "td")
    )
    per_v = d2.groupBy("u").agg(
        F.max("sd").alias("d"),
        F.sum(
            F.when(
                (F.col("sd") < F.col("td"))
                | ((F.col("sd") == F.col("td")) & (F.col("u") < F.col("w"))),
                1,
            ).otherwise(0)
        ).alias("low"),
    )
    low, d = F.col("low"), F.col("d")
    tri = per_v.select(
        (low * (low - 1) / 2).alias("tt"),
        (low * (low - 1) / 2 + low * (d - low)).alias("rt"),
    )
    return tri.agg(
        F.sum("tt").cast("long").alias("triangle_triplet_count"),
        F.sum("rt").cast("long").alias("rectangle_triplet_count"),
        F.max("tt").cast("long").alias("maximum_triangle_triplets"),
        F.max("rt").cast("long").alias("maximum_rectangle_triplets"),
    )


@register(
    "graph_bipartite_projection",
    oracle="""
    WITH be AS (SELECT DISTINCT source AS top, lang AS bottom FROM documents)
    SELECT a.top AS src, b.top AS dst, a.bottom
    FROM be a JOIN be b ON a.bottom = b.bottom AND a.top != b.top
    """,
    doc="Bipartite top projection (flink-gelly/.../bipartite/"
    "BipartiteGraph.java:127 projectionTopSimple): sources connected "
    "once per shared language on the documents source-language "
    "bipartite graph (graph/bipartite.py).",
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.graph.bipartite import BipartiteGraph

    d = table(spark, sf_dir, "documents")
    edges = d.select(F.col("source").alias("top"), F.col("lang").alias("bottom"))
    top = d.select(F.col("source").alias("id")).distinct()
    bottom = d.select(F.col("lang").alias("id")).distinct()
    return BipartiteGraph(top, bottom, edges).projection_top_simple()


@register(
    "graph_transitive_closure",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT id AS src, id + 1 AS dst FROM range(12) t(id) WHERE id % 4 != 3
      UNION ALL
      SELECT id AS src, id + 4 AS dst FROM range(8) t(id)
    ), tc AS (
      SELECT src, dst FROM e
      UNION
      SELECT tc.src, e.dst FROM tc JOIN e ON tc.dst = e.src
      WHERE tc.src != e.dst
    )
    SELECT DISTINCT src::BIGINT AS src, dst::BIGINT AS dst FROM tc
    """,
    doc="Transitive closure (flink-examples/.../graph/"
    "TransitiveClosureNaive.java — the reference's canonical bulk-"
    "iteration example) on a 12-vertex layered DAG, via DOUBLING "
    "iteration (closure joined with itself: O(log diameter) rounds "
    "instead of one hop per round); oracle is the recursive CTE.",
)
def graph_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.graph.graph import transitive_closure

    chain = (
        spark.range(12)
        .filter(F.col("id") % 4 != 3)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    skips = spark.range(8).select(F.col("id").alias("src"), (F.col("id") + 4).alias("dst"))
    return transitive_closure(chain.unionByName(skips), max_iterations=6)


def _kcore_fixture_edges():
    """Clique(0-5) + ring(6-15) + chain(16-25) with bridges 5-6 and
    15-16: the 2-core is exactly {0..15} (the chain unravels from the
    free end over ~10 peel rounds, then the bridge vertex follows)."""
    edges = [(i, j) for i in range(6) for j in range(i + 1, 6)]          # clique
    edges += [(i, i + 1) for i in range(6, 15)] + [(15, 6)]              # ring
    edges += [(i, i + 1) for i in range(16, 25)]                         # chain
    edges += [(5, 6), (15, 16)]                                          # bridges
    return edges


_KCORE_EDGES_DUCK = " UNION ALL ".join(
    f"SELECT {s} AS src, {d} AS dst" for s, d in _kcore_fixture_edges()
)


@register(
    "graph_kcore",
    oracle=f"""
    WITH RECURSIVE
    raw AS ({_KCORE_EDGES_DUCK}),
    edges AS (
      SELECT src, dst FROM raw WHERE src != dst
      UNION SELECT dst, src FROM raw WHERE src != dst
    ),
    core AS (
      SELECT 0 AS g, (SELECT list(id) FROM range(26) t(id)) AS ids
      UNION ALL
      SELECT g + 1,
             (SELECT coalesce(list(src), []) FROM (
                SELECT src FROM edges
                WHERE list_contains(c.ids, src) AND list_contains(c.ids, dst)
                GROUP BY src HAVING count(*) >= 2))
      FROM core c WHERE g < 20
    )
    SELECT unnest(ids)::BIGINT AS id FROM core WHERE g = 20
    """,
    doc="k-core subgraph (Seidman 1983) for k=2 on a clique+ring+chain "
    "fixture: iterative peeling of degree<k vertices until fixpoint "
    "(the chain unravels one vertex per round — a real ~11-round "
    "iteration).  Oracle = generation-capped recursive CTE carrying "
    "the survivor set as a list (idempotent after convergence, so the "
    "capped generation equals the fixpoint) "
    "(graph/graph.py:Graph.k_core).",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _kcore_fixture_edges()
    v = spark.range(26).select("id")
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(v, e).k_core(k=2, max_iterations=20)


@register(
    "graph_k_truss",
    oracle="""
    -- 3-truss of (two K4 cliques + bridge + pendant path) = the cliques
    WITH a AS (SELECT unnest(range(0, 4)) AS i),
         b AS (SELECT unnest(range(10, 14)) AS i)
    SELECT x.i::BIGINT AS src, y.i::BIGINT AS dst
    FROM a x JOIN a y ON x.i < y.i
    UNION ALL
    SELECT x.i::BIGINT, y.i::BIGINT FROM b x JOIN b y ON x.i < y.i
    """,
    doc="k-truss subgraph (Cohen 2008; graph/graph.py:k_truss — the "
    "edge analogue of k-core): iterative triangle-support peeling, "
    "each triangle enumerated once at its minimum vertex (degree-"
    "ordered wedge join), eager per-round truncation, signature "
    "convergence.  The bench graph is two K4 cliques joined by a "
    "bridge plus a pendant path; the 3-truss is exactly the cliques "
    "(closed-form oracle).",
)
def graph_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    import itertools

    edges = (
        list(itertools.combinations(range(4), 2))
        + list(itertools.combinations(range(10, 14), 2))
        + [(3, 10), (13, 20), (20, 21)]
    )
    vids = sorted({x for e in edges for x in e})
    v = spark.createDataFrame([(i,) for i in vids], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return Graph(v, e).k_truss(3)
