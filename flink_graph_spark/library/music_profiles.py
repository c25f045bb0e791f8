"""MusicProfiles-style composite pipeline over the ``events`` table.

Reference: example/MusicProfiles.java [unverified, SURVEY.md §2.9] — the
richest query pattern in the repo: filter mismatches → top-song-per-user
(argmax) → user–user similarity graph via shared songs → label
propagation communities. Re-expressed over events: event types play the
role of songs.

Every stage is a deterministic DataFrame plan with a SQL twin:
argmax tie-breaks (count DESC, event_type ASC), canonical a<b edges,
fixed-iteration LPA with (count DESC, label DESC) ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from .label_propagation import label_propagation


def top_event_per_user(events: DataFrame) -> DataFrame:
    """Filter 'error' events (the reference drops mismatched triplets),
    then argmax event_type per user by play count.
    Returns (user_id, top_event, n_plays).
    """
    from pyspark.sql import Window

    counts = (
        events.filter(F.col("event_type") != "error")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_plays"))
    )
    # ties break (count DESC, event_type ASC) — ASC on the string rules
    # out a single max-of-struct agg; the ranking window shuffles only
    # the tiny (user, type) count frame
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_plays"), F.asc("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_event"), "n_plays")
    )


TOP_EVENT_SQL = """
top_event AS MATERIALIZED (
    SELECT user_id, event_type AS top_event, n_plays FROM (
        SELECT user_id, event_type, COUNT(*) AS n_plays,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY COUNT(*) DESC, event_type ASC) AS rn
        FROM events WHERE event_type <> 'error'
        GROUP BY user_id, event_type
    ) WHERE rn = 1
)"""


def shared_top_event_graph(events: DataFrame) -> Graph:
    """User–user edges between users with the same top event (a<b
    canonical, value = 1) — the 'similar taste' graph the reference
    builds from shared songs.
    """
    top = top_event_per_user(events)
    a = top.select(F.col("user_id").alias("src"), F.col("top_event").alias("te"))
    b = top.select(F.col("user_id").alias("dst"), F.col("top_event").alias("te"))
    edges = (
        a.join(b, "te")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", F.lit(1).cast("long").alias("value"))
    )
    return Graph.from_edges(edges)


SHARED_TOP_EDGES_SQL = (
    TOP_EVENT_SQL
    + """,
shared_edges AS MATERIALIZED (
    SELECT a.user_id AS src, b.user_id AS dst, CAST(1 AS BIGINT) AS value
    FROM top_event a
    JOIN top_event b ON a.top_event = b.top_event AND a.user_id < b.user_id
)"""
)


def music_profiles_communities(events: DataFrame, max_iter: int = 3) -> DataFrame:
    """Full pipeline: filter → argmax → shared-taste graph → LPA
    communities (fixed iterations, deterministic ties).
    Returns (id, label).
    """
    g = shared_top_event_graph(events).get_undirected()
    return label_propagation(g, max_iter=max_iter)
