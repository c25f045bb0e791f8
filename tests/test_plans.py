"""Physical-plan regression tests (SURVEY.md §4.2 scale posture).

Executes representative queries at sf0.001 and asserts the properties
that keep them alive at 100 TB: no nested-loop joins on unbounded
sides, derived-graph consumers read the shared cache instead of
re-scanning parquet, scans stay narrow (column pruning reaches the
reader), and whole-stage codegen covers the hot path. These are the
checks `tools/explain_audit.py` prints interactively, frozen as tests.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _final_plan(spark, df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_graph_queries_read_shared_cache(spark, queries):
    plan = _final_plan(spark, queries["degrees_total"](spark, SF_DIR))
    assert "InMemoryTableScan" in plan


def test_no_nested_loop_on_graph_joins(spark, queries):
    for name in ("subgraph_edges", "triplets", "jaccard_part_copurchase"):
        plan = _final_plan(spark, queries[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name


def test_scans_are_pruned_to_needed_columns(spark, queries):
    # cs-graph build needs only 2 columns from orders and 2 from lineitem
    plan = _final_plan(spark, queries["top_degree_vertices"](spark, SF_DIR))
    widths = [len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
    assert widths and max(widths) <= 2


def test_codegen_covers_hot_path(spark, queries):
    plan = _final_plan(spark, queries["reduce_on_neighbors_all"](spark, SF_DIR))
    assert len(set(re.findall(r"codegen id : (\d+)", plan))) >= 2


def test_simhash_single_agg_pass_no_bit_explode(spark, queries):
    # SimHash must be ONE hash-aggregate over the token frame (60
    # conditional sums), never a token×bit explode(sequence(...)) that
    # would 60× the shuffle input at corpus scale.
    plan = _final_plan(spark, queries["simhash_docs"](spark, SF_DIR))
    assert "sequence(" not in plan
    # exactly one explode remains: text → tokens
    assert plan.count("explode(") == 1


def test_ann_lsh_joins_are_bucketed_not_all_pairs(spark, queries):
    # The only nested-loop allowed in the LSH plan is the broadcast
    # against the 32-row hyperplane bank; candidate generation must be
    # an equi-join on (table, bucket) and scoring a hash join — never a
    # corpus×corpus product.
    plan = _final_plan(spark, queries["ann_topk_lsh"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # candidates must come from an equi-join on (table, bucket) — the
    # signature pattern of bucketed LSH, vs an all-pairs product
    assert re.search(r"keys \[\d+\]: \[table#\d+, bucket#\d+", plan)
    # scoring attaches vectors via hash joins above the candidate list
    assert plan.count("BroadcastHashJoin") >= 2


def test_embedding_near_dup_pairs_only_ints_in_nested_loop(spark, queries):
    # The quadratic pair generation must stay id-only; the vectors attach
    # via broadcast hash joins above it (see functions/similarity.py).
    plan = _final_plan(spark, queries["embedding_near_dup"](spark, SF_DIR))
    nl = re.search(
        r"BroadcastNestedLoopJoin[\s\S]*?Output \[\d+\]: \[([^\]]*)\]", plan
    )
    if nl:  # output of the NL join itself must be narrow (ids, no arrays)
        assert "array" not in nl.group(1).lower()
    assert plan.count("BroadcastHashJoin") >= 2
