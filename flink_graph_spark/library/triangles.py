"""Triangle counting over a canonically-oriented undirected graph
(src < dst on every edge).

Not in the reference prototype (Gelly grew TriangleEnumerator later);
included for graph-metric coverage. Plan: wedge join — edges(u,v) ⋈
edges(v,w) gives wedges u<v<w, closed by a semi-join against edges(u,w).
Each triangle is counted exactly once thanks to the total order on ids.
All equi-joins on stable longs → AQE handles skew; no adjacency arrays,
so hub vertices never hit executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def triangle_count(graph: Graph) -> DataFrame:
    """1-row frame (n_triangles BIGINT). Edges must be canonical
    (src < dst); symmetrize + filter first if not.
    """
    e = graph.edges.select("src", "dst")
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    closed = wedges.join(ac, ["a", "c"], "left_semi")
    return closed.agg(F.count("*").cast("long").alias("n_triangles"))


def triangles_per_vertex(graph: Graph) -> DataFrame:
    """(id, n_triangles) for every vertex participating in ≥1 triangle."""
    e = graph.edges.select("src", "dst")
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"], "left_semi")
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count("*").cast("long").alias("n_triangles"))


def oracle_sql(edges_cte: str) -> str:
    return f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM {edges_cte} ab
JOIN {edges_cte} bc ON ab.dst = bc.src
JOIN {edges_cte} ac ON ac.src = ab.src AND ac.dst = bc.dst"""
