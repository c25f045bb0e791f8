"""Single-source shortest paths — reference:
flink.graphs.library.SingleSourceShortestPaths (~120 LoC:
InitVerticesMapper, MinDistanceMessenger, VertexDistanceUpdater).

Bellman-Ford by supersteps: dist=0 at source else +inf (represented as
NULL — both Spark's ``least``/``min`` and DuckDB's ignore NULLs, so NULL
is a faithful +inf); message = dist + edge value along out-edges;
update = min(old, min msg). Min-propagation is order-insensitive and
integer-exact → oracle parity holds at any scale and any fixed
iteration count, converged or not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, GraphAlgorithm
from ..operators.pregel import pregel


def shortest_paths(graph: Graph, source_id, max_iter: int = 10) -> DataFrame:
    """Returns (id, dist); dist NULL = unreachable within max_iter hops."""
    res = pregel(
        graph,
        initial=F.when(F.col("id") == F.lit(source_id), F.lit(0).cast("long")),
        msg_to_dst=F.col("src_dist") + F.col("value"),
        msg_to_dst_reads=("src",),
        agg=F.min("__msg").alias("__agg"),
        update=F.least(F.col("dist"), F.col("__agg")),
        max_iter=max_iter,
        state_col="dist",
        delta=True,
    )
    return res.vertices


def shortest_paths_gsa(graph: Graph, source_id, max_iter: int = 10) -> DataFrame:
    """Same SSSP expressed on the gather–sum–apply surface (Gelly's
    `GSASingleSourceShortestPaths`): gather = src dist + edge weight,
    sum = min, apply = min(old, summed). Bit-identical results to
    ``shortest_paths`` — the two operators share one physical loop —
    so the same unrolled Bellman-Ford oracle verifies both.
    """
    from ..operators.gsa import gather_sum_apply

    res = gather_sum_apply(
        graph,
        initial=F.when(F.col("id") == F.lit(source_id), F.lit(0).cast("long")),
        gather=F.col("src_dist") + F.col("value"),
        gather_reads=("src",),
        sum_agg=F.min("__msg").alias("__agg"),
        apply=F.least(F.col("dist"), F.col("__agg")),
        max_iter=max_iter,
        state_col="dist",
        delta=True,
    )
    return res.vertices


def oracle_ctes(
    edges_cte: str, vertices_cte: str, source_id, max_iter: int = 10
) -> tuple[str, str]:
    """(CTE text, final SELECT) — unrolled Bellman-Ford twin."""
    ctes = [
        f"d0 AS MATERIALIZED (SELECT v.id, CASE WHEN v.id = {source_id} THEN CAST(0 AS BIGINT)"
        f" END AS dist FROM {vertices_cte} v)"
    ]
    for i in range(1, max_iter + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT v.id, LEAST(p.dist, m.md) AS dist
  FROM {vertices_cte} v
  JOIN d{i - 1} p ON v.id = p.id
  LEFT JOIN (
    SELECT e.dst AS id, MIN(s.dist + e.value) AS md
    FROM d{i - 1} s JOIN {edges_cte} e ON s.id = e.src
    WHERE s.dist IS NOT NULL
    GROUP BY 1
  ) m ON v.id = m.id
)"""
        )
    final = f"SELECT id, dist FROM d{max_iter}"
    return ",\n".join(ctes), final


class SingleSourceShortestPaths(GraphAlgorithm):
    def __init__(self, source_id, max_iter: int = 10):
        self.source_id = source_id
        self.max_iter = max_iter

    def run(self, graph: Graph) -> Graph:
        d = shortest_paths(graph, self.source_id, self.max_iter)
        return Graph(d.withColumnRenamed("dist", "value"), graph.edges)
