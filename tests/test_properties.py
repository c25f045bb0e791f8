"""Property-based invariants on random small graphs (hypothesis).

Upgrades the reference's golden-output-only strategy (SURVEY.md §5):
structural invariants that must hold for EVERY graph, not just the
fixture — exercised on randomly generated edge lists.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_graph_spark.graph import EdgeDirection, Graph

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=1,
    max_size=12,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _graph(spark, edges):
    return Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long, value long")
    )


@given(edges=edge_lists)
@SETTINGS
def test_degree_sum_equals_twice_edges(spark, edges):
    g = _graph(spark, edges)
    total = g.degrees().agg(F.sum("degree")).collect()[0][0]
    assert total == 2 * len(edges)


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_reverse_involution_and_degree_swap(spark, edges):
    g = _graph(spark, edges)
    r = g.reverse()
    assert sorted(map(tuple, r.reverse().edges.collect())) == sorted(
        map(tuple, g.edges.collect())
    )
    out_g = {r_["id"]: r_["degree"] for r_ in g.out_degrees().collect()}
    in_r = {r_["id"]: r_["degree"] for r_ in r.in_degrees().collect()}
    assert out_g == in_r


@given(edges=edge_lists)
@SETTINGS
def test_subgraph_edges_subset_and_closed(spark, edges):
    g = _graph(spark, edges)
    sg = g.subgraph(F.col("value") % 2 == 0, F.col("value") < 50)
    surviving = {r["id"] for r in sg.vertices.collect()}
    for row in sg.edges.collect():
        assert row["src"] in surviving and row["dst"] in surviving
        assert row["value"] < 50
        assert (row["src"], row["dst"], row["value"]) in set(edges)


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_undirected_doubles_edges_and_validates(spark, edges):
    g = _graph(spark, edges)
    u = g.get_undirected()
    assert u.edges.count() == 2 * len(edges)
    assert g.validate() is True  # from_edges closure ⇒ always valid


@given(edges=edge_lists)
@SETTINGS
def test_reduce_on_edges_out_matches_python(spark, edges):
    g = _graph(spark, edges)
    got = {
        r["id"]: r["s"]
        for r in g.reduce_on_edges(
            [F.sum("value").alias("s")], EdgeDirection.OUT
        ).collect()
    }
    expected: dict[int, int] = {}
    for s, _, v in edges:
        expected[s] = expected.get(s, 0) + v
    assert got == expected


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_intersect_idempotent_and_difference_annihilates(spark, edges):
    g = _graph(spark, edges)
    # g ∩ g keeps exactly the distinct edge set and the full vertex set
    same = g.intersect(g)
    assert {tuple(r) for r in same.edges.collect()} == set(edges)
    assert same.vertices.count() == g.vertices.count()
    # g - g removes every vertex, hence every edge
    gone = g.difference(g)
    assert gone.vertices.count() == 0
    assert gone.edges.count() == 0


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_intersect_with_disjoint_graph_is_empty(spark, edges):
    g = _graph(spark, edges)
    shifted = [(s + 100, d + 100, v) for (s, d, v) in edges]
    h = _graph(spark, shifted)
    got = g.intersect(h)
    assert got.edges.count() == 0
    assert got.vertices.count() == 0


# ---- round-3 text/dedup operator invariants ---------------------------

token_docs = st.lists(
    st.lists(
        st.sampled_from("a b c d e f g h".split()), min_size=1, max_size=24
    ),
    min_size=1,
    max_size=6,
)


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )


@given(docs=token_docs)
@SETTINGS
def test_passage_dedup_counts_consistent(spark, docs):
    from flink_graph_spark.functions.dedup import passage_dedup

    rows = passage_dedup(_docs_df(spark, docs)).collect()
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["n_occ"] >= r["n_docs"]
        assert 0 <= r["first_doc"] < len(docs)


@given(docs=token_docs)
@SETTINGS
@pytest.mark.slow
def test_token_budget_never_exceeded_and_prefix_closed(spark, docs):
    from flink_graph_spark.functions.text import token_budget_select

    budget = 30
    sel = token_budget_select(_docs_df(spark, docs), budget=budget).collect()
    assert sum(r["n_tokens"] for r in sel) <= budget
    # prefix property: any unselected doc either has quality below every
    # selected one, or ties the boundary quality with a later doc_id /
    # would overflow the budget
    if sel:
        qmin = min(r["quality"] for r in sel)
        picked = {r["doc_id"] for r in sel}
        from flink_graph_spark.functions.text import quality_score

        allq = {
            r["doc_id"]: r["quality"]
            for r in quality_score(_docs_df(spark, docs)).collect()
        }
        for d, q in allq.items():
            if d not in picked:
                assert q <= qmin


@given(docs=token_docs)
@SETTINGS
def test_quality_filters_keep_iff_no_flag(spark, docs):
    from flink_graph_spark.functions.text import quality_filters

    for r in quality_filters(_docs_df(spark, docs)).collect():
        d = r.asDict()
        keep, flags = d.pop("keep"), [v for k, v in d.items() if k != "doc_id"]
        assert keep == (not any(flags))


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_coloring_proper_on_random_graphs(spark, edges):
    """Iterated-MIS coloring: whatever subset gets colored within the
    round budget is properly colored (no monochromatic edge), and with
    a generous budget on ≤8 vertices everything is colored."""
    from flink_graph_spark.library.coloring import color_graph

    g = _graph(spark, edges)
    colors = {r["id"]: r["color"] for r in color_graph(g, 8).collect()}
    assert all(c is not None for c in colors.values())
    for e in g.edges.select("src", "dst").collect():
        if e["src"] != e["dst"]:
            assert colors[e["src"]] != colors[e["dst"]]


@given(edges=edge_lists)
@SETTINGS
@pytest.mark.slow
def test_matching_vertices_disjoint_on_random_graphs(spark, edges):
    """Propose-accept matching: every vertex appears in at most one
    matched pair (src side and dst side disjoint within themselves)."""
    from flink_graph_spark.library.matching import bipartite_matching

    g = _graph(spark, edges)
    m = bipartite_matching(g, 4).collect()
    srcs = [r["src"] for r in m]
    dsts = [r["dst"] for r in m]
    assert len(srcs) == len(set(srcs))
    assert len(dsts) == len(set(dsts))


@given(docs=st.lists(st.text(alphabet="ab ", min_size=6, max_size=30),
                     min_size=2, max_size=5))
@SETTINGS
@pytest.mark.slow
def test_containment_at_least_jaccard(spark, docs):
    """For every pair: containment (inter/min) >= jaccard (inter/union)
    over the same capped shingle universe."""
    from flink_graph_spark.functions import dedup as dedup_mod

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    jac = {(r["da"], r["db"]): r["jaccard"]
           for r in dedup_mod.dedup_ngram_topk(df, k=100).collect()}
    con = {(r["da"], r["db"]): r["containment"]
           for r in dedup_mod.ngram_containment_topk(df, k=100).collect()}
    assert set(jac) == set(con)
    for pair, j in jac.items():
        assert con[pair] >= j - 1e-9
