"""Community detection with hop-attenuated label scores (§2.10
extension — the Gelly-successor `CommunityDetection` algorithm after
Leung et al., "Towards real-time community detection in large
networks"; the reference prototype ships only plain LabelPropagation,
`library/LabelPropagation.java` per SURVEY.md PROVENANCE).

Semantics (deterministic variant):
* vertex state = (label, score); init label = id, score = 1.0.
* superstep: every vertex sends (label, score × edge weight) across
  each incident edge (both directions — community structure is
  undirected).
* receiver groups its inbox BY LABEL: sum of scores ranks the labels
  (attenuated heavy votes beat many weak ones), argmax with
  label-descending tie-break; the adopted label's new score is the MAX
  single received score for it minus the attenuation ``delta`` — hops
  away from a label's origin weaken it, which is what stops the
  giant-label flooding that plain LPA suffers on hub graphs.
* empty inbox → state unchanged. Fixed ``max_iter`` supersteps
  (oracle-parity mode, like the library's PageRank/LPA).

Exactness across engines: with ``delta = 0.5`` and integer edge
weights every score is a dyadic rational (k/2) with magnitude far
below 2^52, so products, sums, and comparisons are BIT-EXACT in IEEE
doubles on both Spark and DuckDB — the argmax never flips on
last-bit float noise, and the oracle needs no rounding tolerance.

Plan shape per superstep: one triplet join (src-partitioned cached
edge table — only the small state side shuffles), then TWO hash aggs
(per-(id,label) partial-summed, then per-id argmax over a struct) and
one left join back to state. All expressions stay in whole-stage
codegen; lineage is truncated on the shared checkpoint cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, GraphAlgorithm
from ..plans.checkpoints import release_local_checkpoint

DELTA = 0.5  # hop attenuation; keep k/2-exact (see module docstring)


def community_detection(
    graph: Graph, max_iter: int = 4, checkpoint_every: int = 2
) -> DataFrame:
    """(id, label, score) after ``max_iter`` supersteps.

    Cadence note: stays at checkpoint_every=2 (unlike pregel's 3) —
    each iteration references ``v`` twice (state attach + update join)
    and runs a heavy two-stage per-label aggregate, so an unchecked
    chain re-executes those legs ~2^k-fold: measured at sf0.1 uu,
    cadence 2 = 6.1s vs cadence 3 = 10.8s. Same for both LPA variants.
    """
    if not graph.src_partitioned:
        graph = graph.partition_by_src()
    e = graph.edges.select("src", "dst", F.col("value").cast("double").alias("w"))
    v = graph.vertices.select(
        "id", F.col("id").alias("label"), F.lit(1.0).alias("score")
    ).localCheckpoint(eager=True)
    live_ckpt = v

    for it in range(1, max_iter + 1):
        st = v.select(
            F.col("id").alias("__sid"), F.col("label").alias("l"),
            F.col("score").alias("sc"),
        )
        # one state attach on src, messages fanned to BOTH endpoints —
        # the edge table is canonical (src < dst), so joining state to
        # src and dst separately would scan it twice; instead each
        # joined triplet emits its src-side message to dst and its
        # dst-side message to src via a 2-element explode
        tri = (
            e.join(st, F.col("src") == F.col("__sid"))
            .drop("__sid")
            .withColumnRenamed("l", "src_l")
            .withColumnRenamed("sc", "src_sc")
            .join(
                st.withColumnRenamed("l", "dst_l").withColumnRenamed(
                    "sc", "dst_sc"
                ),
                F.col("dst") == F.col("__sid"),
            )
        )
        msgs = tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("dst").alias("id"),
                        F.col("src_l").alias("label"),
                        (F.col("src_sc") * F.col("w")).alias("msc"),
                    ),
                    F.struct(
                        F.col("src").alias("id"),
                        F.col("dst_l").alias("label"),
                        (F.col("dst_sc") * F.col("w")).alias("msc"),
                    ),
                )
            ).alias("m")
        ).select("m.id", "m.label", "m.msc")
        per_label = msgs.groupBy("id", "label").agg(
            F.sum("msc").alias("s"), F.max("msc").alias("mx")
        )
        pick = per_label.groupBy("id").agg(
            F.max(F.struct("s", "label", "mx")).alias("p")
        )
        v = (
            v.join(pick, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("p.label"), F.col("label")).alias("label"),
                F.coalesce(F.col("p.mx") - F.lit(DELTA), F.col("score")).alias(
                    "score"
                ),
            )
        )
        if it % checkpoint_every == 0 or it == max_iter:
            v = v.localCheckpoint(eager=True)
            release_local_checkpoint(live_ckpt)
            live_ckpt = v
    return v


def oracle_ctes(
    ue_cte: str, vertices_cte: str, max_iter: int = 4
) -> tuple[str, str]:
    """(CTE text, final SELECT). ``ue_cte`` must hold BOTH directions
    (src, dst, value); replays the superstep pair of GROUP BYs with the
    same (s DESC, label DESC) argmax order."""
    ctes = [
        f"cd0 AS MATERIALIZED (SELECT id, id AS label, 1.0 AS score"
        f" FROM {vertices_cte})"
    ]
    for i in range(1, max_iter + 1):
        ctes.append(
            f"""cdl{i} AS MATERIALIZED (
  SELECT e.dst AS id, s.label,
         SUM(s.score * e.value) AS s, MAX(s.score * e.value) AS mx
  FROM cd{i - 1} s JOIN {ue_cte} e ON s.id = e.src
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"""cdp{i} AS MATERIALIZED (
  SELECT id, label, mx FROM cdl{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY id
                             ORDER BY s DESC, label DESC) = 1
)"""
        )
        ctes.append(
            f"""cd{i} AS MATERIALIZED (
  SELECT c.id, COALESCE(p.label, c.label) AS label,
         COALESCE(p.mx - {DELTA}, c.score) AS score
  FROM cd{i - 1} c LEFT JOIN cdp{i} p ON c.id = p.id
)"""
        )
    final = f"SELECT id, label, score FROM cd{max_iter}"
    return ",\n".join(ctes), final


class CommunityDetection(GraphAlgorithm):
    """GraphAlgorithm packaging: vertex value := community label."""

    def __init__(self, max_iter: int = 4):
        self.max_iter = max_iter

    def run(self, graph: Graph) -> Graph:
        labels = community_detection(graph, self.max_iter)
        return Graph(
            labels.select("id", F.col("label").alias("value")), graph.edges
        )
