"""Graph library — Gelly capability parity (SURVEY.md §2.15).

A ``Graph`` is two DataFrames (vertices: id, ...; edges: src, dst, ...)
— the same decomposition as Gelly's DataSet<Vertex> + DataSet<Edge>
(flink-libraries/flink-gelly/.../graph/Graph.java:87).  Algorithms are
driver-controlled iterative joins (the Spark-idiomatic replacement for
scatter-gather/GSA/vertex-centric iteration models under
flink-gelly/.../spargel|gsa|pregel/); representative deliverables are
ConnectedComponents and PageRank (flink-gelly/.../library/).
"""

from flink_1_8_sourcecode_spark.graph.graph import Graph

__all__ = ["Graph"]
