"""Incremental SSSP maintenance under edge removal (§2.10 extension —
the Gelly-successor `IncrementalSSSPExample` re-thought relationally;
the reference prototype has no incremental recompute).

Given a graph, its SSSP result `dist`, and a removed edge (u, v), the
exact new distances are recovered WITHOUT a full recompute:

1. **Tight-edge DAG**: edge (a, b, w) is *tight* iff
   dist(a) + w == dist(b) — the shortest-path DAG. Computed over the
   post-removal edge set with one triplet-shaped join.
2. **Invalidation = reachability**: a vertex's old distance is still
   valid iff it is reachable from the source THROUGH TIGHT EDGES after
   the removal. Vertices outside that reachable set had every shortest
   path run through (u, v) — their distances are invalidated to +inf
   (NULL). Reachability is a delta-mode Pregel on the tight subgraph —
   the same min/OR-propagation kernel as connected components, but on
   a DAG whose edge count is ≤ |E| and whose depth is the shortest-path
   depth.
3. **Delta repair**: one delta-mode Bellman-Ford over the new edge set
   initialized with the surviving distances. Valid regions re-send once
   and immediately converge; only the invalidated region iterates, so
   the cost is proportional to the AFFECTED subgraph, not the graph.

At 100 TB this is the difference between re-running a 30-superstep
global fixpoint and running depth-of-affected-region supersteps over
the frontier of a (typically tiny) invalidated zone. Exactness: the
repair is plain min-propagation from a state that is everywhere either
the true new distance or +inf, so it converges to the full-recompute
answer (equality-tested in tests/test_algorithms.py; the registry
oracle IS a full recompute on the modified edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..operators.pregel import pregel


def incremental_sssp_remove_edge(
    graph: Graph,
    dist: DataFrame,
    source_id,
    u,
    v,
    max_iter: int = 10,
) -> DataFrame:
    """(id, dist) after removing edge (u, v), exact vs full recompute.

    ``dist`` is the prior result (id, dist) for ``graph`` (NULL = +inf /
    unreachable). All parallel (u, v) edges are removed.
    """
    e2 = graph.edges.filter(
        ~((F.col("src") == F.lit(u)) & (F.col("dst") == F.lit(v)))
    )
    d = dist.select("id", "dist")

    # 1. tight edges of the post-removal graph
    tight = (
        e2.join(
            d.select(F.col("id").alias("src"), F.col("dist").alias("sd")),
            "src",
        )
        .join(
            d.select(F.col("id").alias("dst"), F.col("dist").alias("dd")),
            "dst",
        )
        .filter(F.col("sd") + F.col("value") == F.col("dd"))
        .select("src", "dst", F.lit(1).cast("long").alias("value"))
    )

    # 2. reachability from source over tight edges (0/1 max-propagation)
    tg = Graph(d.select("id", F.col("id").alias("value")), tight)
    reach = pregel(
        tg,
        initial=F.when(F.col("id") == F.lit(source_id), F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
        msg_to_dst=F.col("src_r"),
        msg_to_dst_reads=("src",),
        agg=F.max("__msg").alias("__agg"),
        update=F.greatest(F.col("r"), F.col("__agg")),
        max_iter=max_iter,
        state_col="r",
        delta=True,
    ).vertices

    # 3. surviving distances (+inf where invalidated), then delta repair
    init = d.join(reach, "id").select(
        "id", F.when(F.col("r") == 1, F.col("dist")).alias("dist0")
    )
    g2 = Graph(init.select("id", F.col("dist0").alias("value")), e2)
    res = pregel(
        g2,
        initial=F.col("value"),
        msg_to_dst=F.col("src_dist") + F.col("value"),
        msg_to_dst_reads=("src",),
        agg=F.min("__msg").alias("__agg"),
        update=F.least(F.col("dist"), F.col("__agg")),
        max_iter=max_iter,
        state_col="dist",
        delta=True,
    )
    return res.vertices
