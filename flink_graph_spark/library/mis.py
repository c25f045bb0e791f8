"""Maximal Independent Set — deterministic Luby iteration (§2.10
extension; the classic Pregel/Spargel showcase alongside CC/LPA).

Luby's algorithm with hash priorities instead of RNG: vertex v enters
the MIS in a round iff its priority is strictly smaller than every
UNDECIDED neighbor's; v and its neighbors then leave the undecided
set. Priority = ``((id * 2654435761) mod 2^32) * 2^22 + id`` — pure
int64 arithmetic identical on any engine, and collision-free for
id < 2^22 (the +id term makes it a total order), so rounds are fully
deterministic and the unrolled DuckDB oracle (``oracle_ctes``)
replays them exactly.

Scale: each round is one message aggregation (min neighbor priority
over the undecided subgraph, a single shuffle), one filter, and one
semi-join removal; the undecided set shrinks geometrically (Luby:
expected O(log n) rounds), so like k-core the early rounds dominate.
Lineage is truncated per round with localCheckpoint; convergence
early-stops on an ``isEmpty`` of the undecided frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoints import release_local_checkpoint

PRIORITY_MULT = 2654435761
PRIORITY_MOD = 4294967296
PRIORITY_SHIFT = 4194304  # 2^22 — ids must be < this for a total order


def priority_col(id_col: str = "id") -> F.Column:
    return (
        (F.col(id_col) * PRIORITY_MULT) % PRIORITY_MOD
    ) * PRIORITY_SHIFT + F.col(id_col)


def maximal_independent_set(graph: Graph, max_iter: int = 6) -> DataFrame:
    """Returns (id,) — the MIS members, sorted. ``max_iter`` bounds the
    rounds (mirrored by the oracle); Luby converges in O(log n)
    expected rounds, and on convergence extra rounds are no-ops."""
    edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .unionByName(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = graph.vertices.select(
        "id", priority_col("id").alias("p")
    ).localCheckpoint(eager=True)
    mis = und.select("id").where(F.lit(False)).localCheckpoint(eager=True)

    n_und: int | None = None  # carried from the round-end count below
    for i in range(max_iter):
        # first round: one cheap scan of the initial checkpoint; later
        # rounds reuse the count that materialized und (no extra job)
        if (n_und == 0) or (n_und is None and und.isEmpty()):
            break
        ue = (
            edges.join(und.select(F.col("id").alias("src")), "src", "left_semi")
            .join(und.select(F.col("id").alias("dst")), "dst", "left_semi")
        )
        nbr_min = (
            ue.join(
                und.select(F.col("id").alias("dst"), F.col("p").alias("np")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("np").alias("nmin"))
        )
        winners = (
            und.join(nbr_min, "id", "left")
            .where(F.col("nmin").isNull() | (F.col("p") < F.col("nmin")))
            .select("id")
        )
        mis_prev = mis
        mis = mis.unionByName(winners).localCheckpoint(eager=True)
        release_local_checkpoint(mis_prev)
        if i == max_iter - 1:
            # the final round's undecided-set update feeds nothing —
            # skip it (the oracle's unrolled chain stops at the same
            # point)
            break
        removed = winners.unionByName(
            ue.join(winners.withColumnRenamed("id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("id"))
        ).distinct()
        und_prev = und
        # LAZY checkpoint materialized by the survivor count — the count
        # doubles as next round's emptiness check, one action instead of
        # eager-checkpoint + isEmpty (same fusion as the Pregel superstep)
        und = und.join(removed, "id", "left_anti").localCheckpoint(eager=False)
        n_und = und.count()
        # the new checkpoint is materialized; the previous round's
        # (which `winners`/`removed` read) is now unreferenced
        release_local_checkpoint(und_prev)

    release_local_checkpoint(edges)
    release_local_checkpoint(und)
    return mis.orderBy("id")


def oracle_ctes(
    edges_cte: str, vertices_cte: str, max_iter: int = 6
) -> tuple[str, str]:
    """(CTE text, final SELECT) — unrolled Luby rounds."""
    ctes = [
        f"""mis_e AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM {edges_cte} WHERE src <> dst
    UNION
    SELECT dst AS src, src AS dst FROM {edges_cte} WHERE src <> dst
  )
)""",
        f"""mis_u0 AS MATERIALIZED (
  SELECT id, ((id * {PRIORITY_MULT}) % {PRIORITY_MOD}) * {PRIORITY_SHIFT} + id AS p
  FROM {vertices_cte}
)""",
        "mis_m0 AS (SELECT id FROM mis_u0 WHERE 1 = 0)",
    ]
    for i in range(1, max_iter + 1):
        p = i - 1
        ctes.append(
            f"""mis_nb{i} AS MATERIALIZED (
  SELECT e.src AS id, MIN(u2.p) AS nmin
  FROM mis_e e
  JOIN mis_u{p} u1 ON e.src = u1.id
  JOIN mis_u{p} u2 ON e.dst = u2.id
  GROUP BY 1
)"""
        )
        ctes.append(
            f"""mis_w{i} AS MATERIALIZED (
  SELECT u.id FROM mis_u{p} u
  LEFT JOIN mis_nb{i} n ON u.id = n.id
  WHERE n.nmin IS NULL OR u.p < n.nmin
)"""
        )
        ctes.append(
            f"""mis_m{i} AS MATERIALIZED (
  SELECT id FROM mis_m{p} UNION SELECT id FROM mis_w{i}
)"""
        )
        if i < max_iter:
            # the last round's undecided-set update has no consumer
            ctes.append(
                f"""mis_u{i} AS MATERIALIZED (
  SELECT u.id, u.p FROM mis_u{p} u
  WHERE u.id NOT IN (SELECT id FROM mis_w{i})
    AND u.id NOT IN (
      SELECT e.dst FROM mis_e e JOIN mis_w{i} w ON e.src = w.id
      WHERE EXISTS (SELECT 1 FROM mis_u{p} x WHERE x.id = e.dst)
    )
)"""
            )
    final = f"SELECT id FROM mis_m{max_iter} ORDER BY id"
    return ",\n".join(ctes), final


class MaximalIndependentSet:
    """GraphAlgorithm packaging: vertex value = membership flag."""

    def __init__(self, max_iter: int = 6):
        self.max_iter = max_iter

    def run(self, graph: Graph) -> Graph:
        members = maximal_independent_set(graph, self.max_iter)
        v = graph.vertices.select("id").join(
            members.select("id", F.lit(True).alias("value")), "id", "left"
        ).select("id", F.coalesce("value", F.lit(False)).alias("value"))
        return Graph(v, graph.edges)
