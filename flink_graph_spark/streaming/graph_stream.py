"""Streaming graph ingestion — incremental degree maintenance over an
edge stream (north-star extension; the reference is batch-only,
SURVEY.md §2.10).

The batch engine's Parquet sink (``sources.sinks.write_graph_parquet``)
doubles as a streaming source: edges land as files, Structured
Streaming tails the directory, and a stateful aggregation keeps
per-vertex degrees current. With ``maxFilesPerTrigger`` < file count
the snapshot genuinely accumulates across micro-batches, so the
availableNow result equals the batch ``out_degrees`` — the oracle.

At scale this is the "graph as a feed" posture: edge deltas append as
files (or Kafka), degree/feature state lives in the state store keyed
by vertex id, and downstream consumers read the update stream instead
of re-scanning the edge table.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph
from ..sources.sinks import write_graph_parquet

EDGES_SCHEMA = "src long, dst long, value long"


def stage_edges(graph: Graph, key: str) -> str:
    """Write the graph's edges once to a process-shared staging dir
    (Parquet, src-partitioned by the sink) and return the edges path.
    """
    stage = os.path.join(
        tempfile.gettempdir(),
        f"fgs_gstream_{hashlib.sha1(key.encode()).hexdigest()[:10]}",
    )
    if not os.path.exists(os.path.join(stage, "edges", "_SUCCESS")):
        write_graph_parquet(graph, stage)
    return os.path.join(stage, "edges")


def read_edges_stream(
    spark: SparkSession, edges_path: str, max_files_per_trigger: int = 12
) -> DataFrame:
    return (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(edges_path)
    )


def streaming_out_degrees(edges: DataFrame) -> DataFrame:
    """Running out-degree per vertex (complete-mode snapshot equals the
    batch ``Graph.out_degrees`` over the same edges).
    """
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("long").alias("degree")
    )
