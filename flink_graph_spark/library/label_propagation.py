"""Label propagation — reference: flink.graphs.library.LabelPropagation
(~100 LoC): each superstep a vertex sends its label to its out-neighbors
and adopts the most frequent incoming label (ties → max label), keeping
its own label when its inbox is empty.

The mode aggregation needs a two-level plan (count per (vertex,label)
then rank) so it doesn't fit the single-agg pregel kernel — it gets its
own synchronous loop with the same lineage-checkpoint policy. Integer
counts + deterministic (count DESC, label DESC) tie-break → exact
oracle parity at fixed iteration counts.

For undirected behavior (the common use), pass ``graph.get_undirected()``
— mirroring the reference, which expects a symmetrized input graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, GraphAlgorithm
from ..plans.checkpoints import release_local_checkpoint


def label_propagation(
    graph: Graph, max_iter: int = 10, label_col: str = "value", checkpoint_every: int = 2
) -> DataFrame:
    """Returns (id, label). Initial label = vertex value."""
    # Loop-invariant edges: project, pre-partition by the join key (src)
    # and persist ONCE — every superstep's message join then reuses the
    # cached partitioning and only the small label frame shuffles. A
    # graph already src-partitioned + cached (builder posture) is used
    # as-is; its shared cache must survive this call.
    owns_edge_cache = not graph.src_partitioned
    if owns_edge_cache:
        edges = graph.edges.select("src", "dst").repartition("src").persist()
    else:
        edges = graph.edges.select("src", "dst")
    labels = graph.vertices.select(
        "id", F.col(label_col).alias("label")
    ).localCheckpoint(eager=True)
    live_ckpt = labels

    for it in range(1, max_iter + 1):
        # r10 (guide §2.4): ONE exchange per superstep carries the raw
        # message stream hashed by id — hash(id) satisfies the
        # clustering requirement of groupBy(id,label), of groupBy(id)
        # AND of the update join, so the two-level mode aggregation and
        # the join all run exchange-free on top of it. The previous
        # shape paid two full exchanges (partial counts by (id,label),
        # then counts again by id). Regrouping integer counts is exact.
        msgs = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
            .repartition("id")
        )
        counts = msgs.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        # mode with (cnt DESC, label DESC) tie-break as a single hash agg
        # (max of (cnt, label) struct) — avoids the sort-based ranking
        # window, one fewer sort per superstep
        picked = counts.groupBy("id").agg(
            F.max(F.struct("cnt", "label"))["label"].alias("new_label")
        )
        labels = labels.join(picked, "id", "left").select(
            "id", F.coalesce("new_label", "label").alias("label")
        )
        if it % checkpoint_every == 0 or it == max_iter:
            labels = labels.localCheckpoint(eager=True)
            release_local_checkpoint(live_ckpt)
            live_ckpt = labels
    if owns_edge_cache:
        edges.unpersist()
    return labels


def oracle_ctes(
    edges_cte: str, vertices_cte: str, max_iter: int = 10, label_expr: str = "value"
) -> tuple[str, str]:
    ctes = [f"l0 AS MATERIALIZED (SELECT id, {label_expr} AS label FROM {vertices_cte})"]
    for i in range(1, max_iter + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT v.id, COALESCE(p.label, o.label) AS label
  FROM {vertices_cte} v
  JOIN l{i - 1} o ON v.id = o.id
  LEFT JOIN (
    SELECT id, label FROM (
      SELECT id, label,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label DESC) AS rn
      FROM (
        SELECT e.dst AS id, s.label, COUNT(*) AS cnt
        FROM l{i - 1} s JOIN {edges_cte} e ON s.id = e.src
        GROUP BY 1, 2
      )
    ) WHERE rn = 1
  ) p ON v.id = p.id
)"""
        )
    final = f"SELECT id, label FROM l{max_iter}"
    return ",\n".join(ctes), final


class LabelPropagation(GraphAlgorithm):
    def __init__(self, max_iter: int = 10):
        self.max_iter = max_iter

    def run(self, graph: Graph) -> Graph:
        labels = label_propagation(graph, self.max_iter)
        return Graph(labels.withColumnRenamed("label", "value"), graph.edges)


def label_spread(
    graph: Graph,
    max_iter: int = 3,
    label_col: str = "value",
    seed_col: str = "seed",
    unlabeled: int = -1,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Semi-supervised label SPREADING (Zhu & Ghahramani-style, mode
    vote): seed vertices are CLAMPED to their label; unlabeled vertices
    (label = ``unlabeled``) adopt the most frequent label among their
    LABELED in-neighbors each round (ties → max label), keeping
    ``unlabeled`` while no labeled neighbor exists. The sparse-labels →
    similarity-graph → full-labels pattern used to extend a small
    human-labeled set over a corpus. Same plan shape as
    ``label_propagation`` — the labeled-sender filter only shrinks the
    message frame."""
    owns_edge_cache = not graph.src_partitioned
    if owns_edge_cache:
        edges = graph.edges.select("src", "dst").repartition("src").persist()
    else:
        edges = graph.edges.select("src", "dst")
    labels = graph.vertices.select(
        "id", F.col(label_col).alias("label"), F.col(seed_col).alias("seed")
    ).localCheckpoint(eager=True)
    live_ckpt = labels

    for it in range(1, max_iter + 1):
        senders = labels.filter(F.col("label") != unlabeled)
        # same single-exchange message spine as label_propagation (§2.4)
        msgs = (
            edges.join(senders, edges["src"] == senders["id"])
            .select(F.col("dst").alias("id"), "label")
            .repartition("id")
        )
        counts = msgs.groupBy("id", "label").agg(F.count("*").alias("cnt"))
        picked = counts.groupBy("id").agg(
            F.max(F.struct("cnt", "label"))["label"].alias("new_label")
        )
        labels = labels.join(picked, "id", "left").select(
            "id",
            F.when(F.col("seed"), F.col("label"))
            .otherwise(F.coalesce("new_label", "label"))
            .alias("label"),
            "seed",
        )
        if it % checkpoint_every == 0 or it == max_iter:
            labels = labels.localCheckpoint(eager=True)
            release_local_checkpoint(live_ckpt)
            live_ckpt = labels
    if owns_edge_cache:
        edges.unpersist()
    return labels.select("id", "label")


def spread_oracle_ctes(
    edges_cte: str,
    vertices_cte: str,
    max_iter: int = 3,
    label_expr: str = "value",
    seed_expr: str = "seed",
    unlabeled: int = -1,
) -> tuple[str, str]:
    """(CTE text, final SELECT) — unrolled clamped label spreading."""
    ctes = [
        f"sp0 AS MATERIALIZED (SELECT id, {label_expr} AS label,"
        f" {seed_expr} AS seed FROM {vertices_cte})"
    ]
    for i in range(1, max_iter + 1):
        ctes.append(
            f"""sp{i} AS MATERIALIZED (
  SELECT v.id,
         CASE WHEN v.seed THEN v.label
              ELSE COALESCE(p.label, v.label) END AS label,
         v.seed
  FROM sp{i - 1} v
  LEFT JOIN (
    SELECT id, label FROM (
      SELECT id, label,
             ROW_NUMBER() OVER (PARTITION BY id
                                ORDER BY cnt DESC, label DESC) AS rn
      FROM (
        SELECT e.dst AS id, s.label, COUNT(*) AS cnt
        FROM sp{i - 1} s JOIN {edges_cte} e ON s.id = e.src
        WHERE s.label <> {unlabeled}
        GROUP BY 1, 2
      )
    ) WHERE rn = 1
  ) p ON v.id = p.id
)"""
        )
    final = f"SELECT id, label FROM sp{max_iter}"
    return ",\n".join(ctes), final
