"""Per-edge Jaccard similarity — reference:
example/JaccardSimilarityMeasure.java [unverified, SURVEY §2.9]:
|N(u) ∩ N(v)| / |N(u) ∪ N(v)| over undirected neighbor sets.

Implemented as a count-based inverted-index plan (edges ⋈ adjacency ⋈
adjacency + hash aggs) instead of the reference's collect-the-
neighborhood-into-a-set approach: no per-vertex set materialization, so
hub vertices don't blow memory at scale; everything is joins + aggs
Catalyst can reorder and AQE can skew-split. Integer counts → division
of identical ints is bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph


def jaccard_similarity(
    graph: Graph, round_to: int = 6, salt_buckets: int | None = None
) -> DataFrame:
    """Returns (src, dst, jaccard) for every edge. Neighborhoods are over
    the undirected view, neighbor sets are distinct ids.

    Plan: adjacency arrays (sorted collect_set per vertex) joined to each
    edge's two endpoints, intersection via ``array_intersect`` — two
    hash joins of |E| rows against |V| compact rows, NO |E|·avg-degree
    wedge blowup. At sf0.1 (1.2M edges, avg deg 120) this is ~6x faster
    than the count-based wedge join because the ~140M-row intermediate
    never exists.

    Hub handling: ``collect_set`` is a holistic agg — one reduce task
    owns a hub's entire raw inbox. ``salt_buckets`` builds the arrays
    via the two-phase salted agg (``functions.skew.salted_adjacency``)
    so hub inboxes spread over N reducers; the final per-vertex array
    still materializes (fine to ~1e6 degree). Beyond that, use
    ``jaccard_similarity_counts`` — no arrays at all.
    """
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
    a = adj.select(F.col("id").alias("src"), F.col("ns").alias("na"))
    b = adj.select(F.col("id").alias("dst"), F.col("ns").alias("nb"))
    return (
        e.join(a, "src")
        .join(b, "dst")
        .withColumn("common", F.size(F.array_intersect("na", "nb")).cast("double"))
        .select(
            "src",
            "dst",
            F.round(
                F.col("common")
                / (F.size("na") + F.size("nb") - F.col("common")),
                round_to,
            ).alias("jaccard"),
        )
    )


def jaccard_similarity_counts(graph: Graph, round_to: int = 6) -> DataFrame:
    """Count-based wedge-join variant: no per-vertex neighbor array, so
    hub degree never hits executor memory — the skew-safe path for
    power-law graphs (AQE splits the skewed wedge join). Costs an
    |E|·avg-degree intermediate; prefer ``jaccard_similarity`` when
    max degree is bounded.
    """
    e = graph.edges.select("src", "dst")
    # the wedge join must run over DISTINCT edges: a duplicated edge
    # row would double `common` past the inclusion-exclusion bound and
    # the denominator ds+dd-common can reach 0 (divide-by-zero under
    # ANSI mode) — found by the skewed-RMat integration test, whose
    # generator emits multi-edges. Builders that guarantee distinctness
    # (Graph.distinct_edges) skip the extra edge-table shuffle.
    ed = e if graph.distinct_edges else e.distinct()
    adj = (
        e.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
        .unionByName(e.select(F.col("dst").alias("id"), F.col("src").alias("nbr")))
        .distinct()
    )
    deg = adj.groupBy("id").agg(F.count("*").alias("deg"))

    a = adj.select(F.col("id").alias("src"), F.col("nbr").alias("na"))
    b = adj.select(F.col("id").alias("bid"), F.col("nbr").alias("nb"))
    common = (
        ed.join(a, "src")
        .join(b, (F.col("dst") == F.col("bid")) & (F.col("na") == F.col("nb")))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("common"))
    )

    ds = deg.select(F.col("id").alias("src"), F.col("deg").alias("ds"))
    dd = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dd"))
    return (
        e.join(ds, "src")
        .join(dd, "dst")
        .join(common, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.round(
                F.coalesce(F.col("common"), F.lit(0)).cast("double")
                / (F.col("ds") + F.col("dd") - F.coalesce(F.col("common"), F.lit(0))),
                round_to,
            ).alias("jaccard"),
        )
    )


def oracle_ctes(edges_cte: str, round_to: int = 6) -> tuple[str, str]:
    ctes = [
        f"""jc_adj AS MATERIALIZED (
  SELECT src AS id, dst AS nbr FROM {edges_cte}
  UNION
  SELECT dst AS id, src AS nbr FROM {edges_cte}
)""",
        "jc_deg AS MATERIALIZED (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM jc_adj GROUP BY 1)",
        f"""jc_common AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(COUNT(*) AS BIGINT) AS common
  FROM (SELECT DISTINCT src, dst FROM {edges_cte}) e
  JOIN jc_adj a ON a.id = e.src
  JOIN jc_adj b ON b.id = e.dst AND b.nbr = a.nbr
  GROUP BY 1, 2
)""",
    ]
    final = f"""SELECT e.src, e.dst,
       ROUND(CAST(COALESCE(c.common, 0) AS DOUBLE)
             / (ds.deg + dd.deg - COALESCE(c.common, 0)), {round_to}) AS jaccard
FROM {edges_cte} e
JOIN jc_deg ds ON ds.id = e.src
JOIN jc_deg dd ON dd.id = e.dst
LEFT JOIN jc_common c ON c.src = e.src AND c.dst = e.dst"""
    return ",\n".join(ctes), final
