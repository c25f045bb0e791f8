"""Minimum spanning forest via Borůvka rounds with pointer-jumping
star contraction (Borůvka 1926; the textbook DISTRIBUTED MST — each
round every component picks its lightest outgoing edge, components
merge along the chosen edges, component count at least halves, so
ceil(log2 n) rounds suffice; SURVEY.md §2.10 extension).

Determinism: edges are totally ordered by (w, src, dst) — the
tie-break makes "lightest" unique without assuming unique weights, and
with a total order the chosen-edge pointer graph has ONLY 2-cycles
(around any longer cycle the edge order would have to strictly
decrease back into itself), so the contraction step is: collapse
2-cycles to their min endpoint, then pointer-jump log n times. Every
step is a join or aggregate on the COMPONENT table (≤ n rows,
halving), never the edge list — the classic work bound, expressed
relationally. The DuckDB oracle replays every round unrolled.

Weights are the portable affine hash of the canonical (src < dst)
pair, so fixture graphs are weight-deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_A, MINHASH_B, MINHASH_P
from ..graph import Graph
from ..plans.checkpoints import release_local_checkpoint

W_MOD = 1000


def _w_expr(cs, cd):
    return (
        F.lit(1)
        + (
            (F.lit(MINHASH_A[2]) * (cs * 1000 + cd) + F.lit(MINHASH_B[2]))
            % F.lit(MINHASH_P)
        )
        % F.lit(W_MOD)
    ).cast("long")


def boruvka_mst(
    graph: Graph, rounds: int = 3, jumps: int = 5
) -> DataFrame:
    """(src, dst, w) — minimum-spanning-forest edges over the
    undirected view, weights = portable hash of the canonical pair."""
    canon = (
        graph.edges.select(
            F.least("src", "dst").alias("cs"),
            F.greatest("src", "dst").alias("cd"),
        )
        .filter(F.col("cs") != F.col("cd"))
        .distinct()
        .withColumn("w", _w_expr(F.col("cs"), F.col("cd")))
        .localCheckpoint(eager=True)
    )
    sym = canon.unionByName(
        canon.select(
            F.col("cd").alias("cs"), F.col("cs").alias("cd"), "w"
        )
    ).select(
        F.col("cs").alias("a"), F.col("cd").alias("b"),
        "w",
        F.least("cs", "cd").alias("cs"),
        F.greatest("cs", "cd").alias("cd"),
    )
    labels = graph.vertices.select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)
    mst: DataFrame | None = None
    for r in range(rounds):
        la = labels.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
        lb = labels.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
        live = (
            sym.join(la, "a").join(lb, "b").filter(F.col("ca") != F.col("cb"))
        )
        wsel = Window.partitionBy("ca").orderBy("w", "cs", "cd")
        sel = (
            live.withColumn("__rn", F.row_number().over(wsel))
            .filter(F.col("__rn") == 1)
            .select("ca", "cb", "cs", "cd", "w")
            .localCheckpoint(eager=True)
        )
        if sel.limit(1).count() == 0:
            # converged: no component has an outgoing edge. Extra
            # rounds are no-ops in BOTH engines (the oracle's unrolled
            # sel_r CTEs come up empty), so stopping early preserves
            # parity while skipping dead scheduler rounds.
            release_local_checkpoint(sel)
            break
        chosen = sel.select("cs", "cd", "w").distinct()
        mst_prev = mst
        mst = chosen if mst is None else mst.unionByName(chosen).distinct()
        mst = mst.localCheckpoint(eager=True)
        if mst_prev is not None:
            release_local_checkpoint(mst_prev)
        if r == rounds - 1:
            # the final round's label contraction feeds no further
            # selection — skip the pointer graph and jump chain (the
            # oracle's unrolled chain stops at the same point)
            release_local_checkpoint(sel)
            break
        # pointer graph over components: p(c) = partner of the chosen
        # edge, identity for finished components
        comps = labels.select("comp").distinct()
        ptr = (
            comps.join(
                sel.select(F.col("ca").alias("comp"), F.col("cb").alias("p")),
                "comp",
                "left",
            )
            .select("comp", F.coalesce("p", F.col("comp")).alias("p"))
        )
        # collapse 2-cycles to their min endpoint (roots point to self)
        pp = ptr.select(F.col("comp").alias("p"), F.col("p").alias("p2"))
        ptr = (
            ptr.join(pp, "p")
            .select(
                "comp",
                F.when(
                    F.col("p2") == F.col("comp"),
                    F.least("comp", "p"),
                ).otherwise(F.col("p")).alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        # ptr's blocks are materialized; sel is no longer read by any
        # surviving plan (mst was checkpointed above)
        release_local_checkpoint(sel)
        for _j in range(jumps):
            nxt = ptr.select(F.col("comp").alias("p"), F.col("p").alias("pn"))
            ptr_prev = ptr
            ptr = ptr.join(nxt, "p").select(
                "comp", F.col("pn").alias("p")
            ).localCheckpoint(eager=True)
            release_local_checkpoint(ptr_prev)
        # Convergence guard: every pointer must now reach a root
        # (p == p∘p). The oracle unrolls the SAME fixed jump count, so
        # an unconverged chain would not be a parity mismatch — it
        # would be the SAME silent cycle edge in both engines. Fail
        # loudly instead: one count over the ≤n-row component table.
        pj = ptr.select(F.col("comp").alias("p"), F.col("p").alias("p2"))
        stale = ptr.join(pj, "p").filter(F.col("p") != F.col("p2")).count()
        if stale:
            raise RuntimeError(
                f"boruvka_mst: {stale} component pointers unconverged "
                f"after {jumps} jumps (merge chain > 2^{jumps} labels); "
                "raise `jumps` — the DuckDB oracle unrolls the same "
                "count, so both sides must use the larger value"
            )
        labels_prev = labels
        labels = labels.join(
            ptr, labels["comp"] == ptr["comp"]
        ).select("id", F.col("p").alias("comp")).localCheckpoint(eager=True)
        release_local_checkpoint(labels_prev)
        release_local_checkpoint(ptr)
    # the result reads only the final mst checkpoint
    release_local_checkpoint(labels)
    if mst is None:
        # no component ever had an outgoing edge (empty or edge-free
        # graph): the forest is empty — same (src, dst, w) schema
        return canon.select(
            F.col("cs").alias("src"), F.col("cd").alias("dst"), "w"
        ).limit(0)
    release_local_checkpoint(canon)
    return mst.select(
        F.col("cs").alias("src"), F.col("cd").alias("dst"), "w"
    )


def grid_oracle_sql(
    rows: int, cols: int, rounds: int = 3, jumps: int = 5
) -> str:
    """DuckDB twin on the undirected rows×cols grid — same rounds,
    unrolled."""
    n = rows * cols
    w = (
        f"(1 + (({MINHASH_A[2]} * (cs * 1000 + cd) + {MINHASH_B[2]})"
        f" % {MINHASH_P}) % {W_MOD})"
    )
    ctes = [
        f"""mst_cells AS (SELECT i // {cols} AS r, i % {cols} AS c
             FROM generate_series(0, {n - 1}) g(i))""",
        f"""mst_canon AS MATERIALIZED (
  SELECT cs, cd, {w} AS w FROM (
    SELECT r*{cols}+c AS cs, r*{cols}+c+1 AS cd FROM mst_cells
    WHERE c < {cols - 1}
    UNION ALL
    SELECT r*{cols}+c, (r+1)*{cols}+c FROM mst_cells
    WHERE r < {rows - 1}))""",
        """mst_sym AS MATERIALIZED (
  SELECT cs AS a, cd AS b, w, cs, cd FROM mst_canon
  UNION ALL SELECT cd, cs, w, cs, cd FROM mst_canon)""",
        f"""lab_0 AS MATERIALIZED (
  SELECT i AS id, i AS comp FROM generate_series(0, {n - 1}) g(i))""",
    ]
    chosen_names = []
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""sel_{r} AS MATERIALIZED (
  SELECT ca, cb, cs, cd, w FROM (
    SELECT la.comp AS ca, lb.comp AS cb, e.cs, e.cd, e.w,
           ROW_NUMBER() OVER (PARTITION BY la.comp
                              ORDER BY e.w, e.cs, e.cd) AS rn
    FROM mst_sym e
    JOIN lab_{p} la ON e.a = la.id
    JOIN lab_{p} lb ON e.b = lb.id
    WHERE la.comp <> lb.comp)
  WHERE rn = 1)"""
        )
        chosen_names.append(f"SELECT cs, cd, w FROM sel_{r}")
        if r == rounds:
            # the last round's label contraction has no consumer —
            # mirror the Spark loop's early break
            break
        ctes.append(
            f"""ptr_{r}_0 AS MATERIALIZED (
  SELECT c.comp, COALESCE(s.cb, c.comp) AS p
  FROM (SELECT DISTINCT comp FROM lab_{p}) c
  LEFT JOIN sel_{r} s ON c.comp = s.ca)"""
        )
        ctes.append(
            f"""ptr_{r}_c AS MATERIALIZED (
  SELECT t.comp,
         CASE WHEN q.p = t.comp THEN LEAST(t.comp, t.p)
              ELSE t.p END AS p
  FROM ptr_{r}_0 t JOIN ptr_{r}_0 q ON t.p = q.comp)"""
        )
        prev = f"ptr_{r}_c"
        for j in range(1, jumps + 1):
            ctes.append(
                f"""ptr_{r}_{j} AS MATERIALIZED (
  SELECT t.comp, q.p
  FROM {prev} t JOIN {prev} q ON t.p = q.comp)"""
            )
            prev = f"ptr_{r}_{j}"
        ctes.append(
            f"""lab_{r} AS MATERIALIZED (
  SELECT l.id, t.p AS comp
  FROM lab_{p} l JOIN {prev} t ON l.comp = t.comp)"""
        )
    union = "\nUNION ALL\n".join(chosen_names)
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT DISTINCT cs AS src, cd AS dst, CAST(w AS BIGINT) AS w
FROM ({union})"""
