"""Summarization checks: hand-computed condensation of the golden
fixture with a synthetic grouping, plus the GraphAlgorithm packaging."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_graph_spark.graph import Graph
from flink_graph_spark.library.summarization import (
    Summarization,
    summarize_edges,
    summarize_vertices,
)
from flink_graph_spark.sources.graphs import golden_graph


def _grouped_golden(spark):
    """Golden graph with vertices regrouped: odd ids → group 1, even →
    group 0 (values 1,2,3,4,5 → groups {1,3,5} and {2,4})."""
    g = golden_graph(spark)
    v = g.vertices.select("id", (F.col("id") % 2).alias("value"))
    return Graph(v, g.edges)


def test_summarize_vertices_groups(spark):
    got = {
        r["group_value"]: (r["id"], r["n_vertices"])
        for r in summarize_vertices(_grouped_golden(spark)).collect()
    }
    # group 1 = {1,3,5} rep 1; group 0 = {2,4} rep 2
    assert got == {1: (1, 3), 0: (2, 2)}


def test_summarize_edges_condensation(spark):
    # golden edges: 1→2,1→3,2→3,3→4,3→5,4→5,5→1 under odd/even groups:
    # odd→even: 1→2,3→4        → 2
    # odd→odd:  1→3,3→5,5→1    → 3
    # even→odd: 2→3,4→5        → 2
    got = {
        (r["src_group"], r["dst_group"]): (r["src"], r["dst"], r["n_edges"])
        for r in summarize_edges(_grouped_golden(spark)).collect()
    }
    assert got == {
        (1, 0): (1, 2, 2),
        (1, 1): (1, 1, 3),
        (0, 1): (2, 1, 2),
    }


def test_summarize_edges_with_edge_value(spark):
    # keeping the edge value splits every parallel-edge group (golden
    # edge values are all distinct) → 7 rows, each n_edges = 1
    rows = summarize_edges(_grouped_golden(spark), include_edge_value=True).collect()
    assert len(rows) == 7
    assert all(r["n_edges"] == 1 for r in rows)


def test_summarization_algorithm_packaging(spark):
    sg = Summarization().run(_grouped_golden(spark))
    v = {r["id"]: (r["value"]["group_value"], r["value"]["n_vertices"])
         for r in sg.vertices.collect()}
    assert v == {1: (1, 3), 2: (0, 2)}
    e = {(r["src"], r["dst"]): r["value"] for r in sg.edges.collect()}
    assert e == {(1, 2): 2, (1, 1): 3, (2, 1): 2}
