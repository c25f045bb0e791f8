"""Explicit release of superseded localCheckpoint blocks.

Iterative operators truncate lineage with ``localCheckpoint(eager=True)``
each round. Spark only reclaims those blocks when the ContextCleaner
notices the JVM-side RDD object is unreachable — which, driven through
py4j, can lag indefinitely (measured: a finished run's blocks survive
``gc.collect()`` + ``System.gc()`` polling for minutes and are only
displaced when the same code path runs again). Harmless at test scale;
at cluster scale a 50-superstep loop would pin 50 snapshots of vertex
state in executor storage until the driver GC happens to flush them.

So loops release superseded checkpoints EXPLICITLY: the moment a new
checkpoint is materialized (eager=True ⇒ its blocks are already
written and its lineage no longer reads the parent), the previous
round's blocks are unpersisted. Only the final checkpoint — the one the
returned DataFrame actually reads — is left for the session to own.

Safety contract: call ``release_local_checkpoint`` only on a DataFrame
that (a) came straight from ``localCheckpoint()`` and (b) no surviving
DataFrame's plan can read anymore. localCheckpoint blocks are NOT
recomputable — releasing one that a live plan still references turns
the next action into a block-not-found failure, which is why this is a
deliberate helper with a narrow contract and not a blanket unpersist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Unpersist the RDD behind a localCheckpoint()ed DataFrame.

    Returns True if a LogicalRDD was found and its RDD unpersisted
    (non-blocking), False otherwise. Defensive no-op on anything that
    is not a direct localCheckpoint result (e.g. a ``.select()``
    wrapper, or Spark Connect frames with no ``_jdf``), so callers can
    release unconditionally in loop teardown.
    """
    try:
        node = df._jdf.queryExecution().analyzed()
        if node.getClass().getName().endswith(".LogicalRDD"):
            node.rdd().unpersist(False)
            return True
    except Exception:
        pass
    return False
