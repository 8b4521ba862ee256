"""Bipartite graphs + projections (flink-gelly/.../graph/bipartite/
BipartiteGraph.java).

A bipartite graph has TOP and BOTTOM vertex sets and edges only
between them; the projections collapse it to a unipartite graph on one
side, connecting two same-side vertices once per shared neighbor on
the other side (projectionTopSimple:127 / projectionBottomSimple:171 —
the "simple" projections carry the connecting vertex as the edge
value; the "full" variants add both endpoint values, which in a
DataFrame is just a join back to the vertex tables).

Scale: the projection is a self-join of the edge list on the shared
side — per shared vertex b it emits deg(b)^2 pairs, the same blowup
the reference has; for hub-heavy sides, pre-filter or cap the
neighborhood first (same caveat as the Jaccard wedge join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BipartiteGraph:
    """``edges`` must have columns (top, bottom); vertex frames carry at
    least an ``id`` column and ride through projections unchanged."""

    def __init__(self, top: DataFrame, bottom: DataFrame, edges: DataFrame):
        self.top = top
        self.bottom = bottom
        self.edges = edges.select("top", "bottom").distinct()

    def projection_top_simple(self) -> DataFrame:
        """(src, dst, bottom): one edge per ordered pair of distinct top
        vertices per shared bottom vertex (projectionTopSimple:127)."""
        a, b = self.edges.alias("a"), self.edges.alias("b")
        return (
            a.join(b, F.col("a.bottom") == F.col("b.bottom"))
            .filter(F.col("a.top") != F.col("b.top"))
            .select(
                F.col("a.top").alias("src"),
                F.col("b.top").alias("dst"),
                F.col("a.bottom").alias("bottom"),
            )
        )

    def projection_bottom_simple(self) -> DataFrame:
        """(src, dst, top): the symmetric bottom-side projection
        (projectionBottomSimple:171)."""
        a, b = self.edges.alias("a"), self.edges.alias("b")
        return (
            a.join(b, F.col("a.top") == F.col("b.top"))
            .filter(F.col("a.bottom") != F.col("b.bottom"))
            .select(
                F.col("a.bottom").alias("src"),
                F.col("b.bottom").alias("dst"),
                F.col("a.top").alias("top"),
            )
        )
