"""Per-edge Adamic–Adar similarity — Σ 1/ln(deg(w)) over common
neighbors w of the edge endpoints (Gelly-successor
library/similarity/AdamicAdar; the prototype reference stops at
Jaccard, so this is a §2.10 extension sharing its machinery).

Plan mirrors ``library.jaccard``: adjacency arrays joined to each
edge's endpoints, common neighbors via ``array_intersect`` — but
Adamic–Adar needs the common neighbors' IDENTITIES (to weight by their
degree), so the intersection array is exploded and joined to the
degree table. The explode emits only |common| rows per edge (bounded
by min endpoint degree), far below the |E|·avg-degree wedge
intermediate of a count-style plan. Common neighbors always have
degree ≥ 2, so ln(deg) > 0 — no division guard needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def adamic_adar(
    graph: Graph, round_to: int = 6, salt_buckets: int | None = None
) -> DataFrame:
    """Returns (src, dst, aa) for every edge; neighborhoods over the
    undirected view, 0.0 when the endpoints share no neighbor."""
    e = graph.edges.select("src", "dst")
    if salt_buckets:
        from ..functions.skew import salted_adjacency

        adj = salted_adjacency(e, buckets=salt_buckets)
    else:
        adj = (
            e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
            .unionByName(
                e.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
            )
            .groupBy("id")
            .agg(F.sort_array(F.collect_set("nbr")).alias("ns"))
        )
    deg = adj.select("id", F.size("ns").cast("bigint").alias("deg"))

    a = adj.select(F.col("id").alias("src"), F.col("ns").alias("na"))
    b = adj.select(F.col("id").alias("dst"), F.col("ns").alias("nb"))
    # score per DISTINCT edge — a duplicated edge row would explode its
    # intersection twice and the groupBy sum would double `s` (same
    # multigraph hazard as jaccard_similarity_counts); the final join
    # still emits one output row per ORIGINAL edge row. Builders that
    # guarantee distinctness (Graph.distinct_edges) skip the extra
    # edge-table shuffle.
    ed = e if graph.distinct_edges else e.distinct()
    commons = (
        ed.join(a, "src")
        .join(b, "dst")
        .select(
            "src", "dst", F.explode(F.array_intersect("na", "nb")).alias("w")
        )
    )
    scores = (
        commons.join(deg.select(F.col("id").alias("w"), "deg"), "w")
        .groupBy("src", "dst")
        .agg(F.sum(F.lit(1.0) / F.log("deg")).alias("s"))
    )
    return (
        e.join(scores, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.round(F.coalesce(F.col("s"), F.lit(0.0)), round_to).alias("aa"),
        )
    )


def oracle_ctes(edges_cte: str, round_to: int = 6) -> tuple[str, str]:
    """(CTE text, final SELECT); same shape as jaccard.oracle_ctes."""
    ctes = [
        f"""aa_adj AS MATERIALIZED (
  SELECT src AS id, dst AS nbr FROM {edges_cte}
  UNION
  SELECT dst AS id, src AS nbr FROM {edges_cte}
)""",
        "aa_deg AS MATERIALIZED (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg"
        " FROM aa_adj GROUP BY 1)",
        f"""aa_s AS MATERIALIZED (
  SELECT e.src, e.dst, SUM(1.0 / ln(d.deg)) AS s
  FROM (SELECT DISTINCT src, dst FROM {edges_cte}) e
  JOIN aa_adj a ON a.id = e.src
  JOIN aa_adj b ON b.id = e.dst AND b.nbr = a.nbr
  JOIN aa_deg d ON d.id = a.nbr
  GROUP BY 1, 2
)""",
    ]
    final = f"""SELECT e.src, e.dst,
       ROUND(COALESCE(c.s, 0.0), {round_to}) AS aa
FROM {edges_cte} e
LEFT JOIN aa_s c ON c.src = e.src AND c.dst = e.dst"""
    return ",\n".join(ctes), final


class AdamicAdar:
    """GraphAlgorithm packaging: edge value = Adamic-Adar score."""

    def __init__(self, salt_buckets: int | None = None):
        self.salt_buckets = salt_buckets

    def run(self, graph: Graph) -> Graph:
        scored = adamic_adar(
            graph, round_to=None, salt_buckets=self.salt_buckets
        ).withColumnRenamed("aa", "value")
        return Graph(graph.vertices, scored)
