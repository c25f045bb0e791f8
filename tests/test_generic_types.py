"""Generic key/value coverage: the reference's K is any Comparable
(String-keyed fixtures in TestGraphUtils) and VV/EV any serializable
type (DummyCustomType POJO). Spark equivalent: any orderable column
type for ids, struct columns for POJO-like values (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import rows_as_dict, rows_as_set
from flink_graph_spark.graph import EdgeDirection, Graph


def _string_graph(spark):
    return Graph.from_collection(
        spark,
        [("a", 1), ("b", 2), ("c", 3)],
        [("a", "b", 10), ("b", "c", 20), ("c", "a", 30)],
        vertex_schema="id string, value long",
        edge_schema="src string, dst string, value long",
    )


def test_string_keyed_degrees(spark):
    g = _string_graph(spark)
    assert rows_as_dict(g.degrees(), "id", "degree") == {"a": 2, "b": 2, "c": 2}
    assert rows_as_dict(g.out_degrees(), "id", "degree") == {"a": 1, "b": 1, "c": 1}


def test_string_keyed_subgraph_and_validate(spark):
    g = _string_graph(spark)
    sg = g.subgraph(F.col("id") != "c", F.lit(True))
    assert rows_as_set(sg.edges) == {("a", "b", 10)}
    assert g.validate() is True


def test_string_keyed_pregel_min_label(spark):
    from flink_graph_spark.operators.pregel import pregel

    g = _string_graph(spark)
    res = pregel(
        g.get_undirected(),
        initial=F.col("id"),
        msg_to_dst=F.col("src_state"),
        agg=F.min("__msg").alias("__agg"),
        update=F.least(F.col("state"), F.col("__agg")),
        max_iter=4,
        delta=True,
    )
    assert rows_as_dict(res.vertices, "id", "state") == {
        "a": "a", "b": "a", "c": "a"
    }


def test_struct_valued_vertices(spark):
    v = spark.createDataFrame(
        [(1, ("alice", 30)), (2, ("bob", 25))],
        "id long, value struct<name:string, age:int>",
    )
    e = spark.createDataFrame([(1, 2, 1)], "src long, dst long, value long")
    g = Graph(v, e)
    # map over struct fields, keep struct shape
    g2 = g.map_vertices(
        F.struct(
            F.upper(F.col("value.name")).alias("name"),
            (F.col("value.age") + 1).alias("age"),
        )
    )
    got = {r["id"]: (r["value"]["name"], r["value"]["age"]) for r in g2.vertices.collect()}
    assert got == {1: ("ALICE", 31), 2: ("BOB", 26)}
    # neighborhood agg over struct sub-field
    s = g.reduce_on_neighbors([F.sum("nbr_value.age").alias("s")], EdgeDirection.OUT)
    assert rows_as_dict(s, "id", "s") == {1: 25}


def test_multi_column_edge_values(spark):
    e = spark.createDataFrame(
        [(1, 2, 5.0, "x"), (1, 3, 7.0, "y")],
        "src long, dst long, weight double, tag string",
    )
    v = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, value long")
    g = Graph(v, e)
    got = g.reduce_on_edges(
        [F.sum("weight").alias("w"), F.collect_set("tag").alias("tags")],
        EdgeDirection.OUT,
    ).collect()
    assert got[0]["w"] == 12.0
    assert sorted(got[0]["tags"]) == ["x", "y"]
