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


def drain_shuffle_scratch(
    spark, min_free_gb: float = 40.0, timeout_s: int = 180
) -> None:
    """Disk-gated shuffle-scratch drain for MULTI-JOB operators that
    materialize a narrow waist mid-plan (e.g. adamic_adar's enriched
    checkpoint): after the waist is materialized the enumeration's
    shuffle files are dead weight, but their deletion is ASYNC — the
    ContextCleaner only queues them once a JVM GC notices the
    ShuffleDependency objects are unreachable, and processes the queue
    one entry at a time. On a scratch-tight box the operator's SECOND
    phase then starts against a nearly-full disk and dies on space the
    cleaner was about to free (the exact failure mode
    tools/scale_sweep.py's between-queries ``_drain_scratch`` fixes —
    this is the same loop, callable BETWEEN a single operator's
    phases). Only engages below ``min_free_gb`` free on /tmp, so every
    normally-sized run pays one statvfs call and nothing else."""
    import gc
    import shutil
    import time

    floor = min_free_gb * 2**30
    if shutil.disk_usage("/tmp").free >= floor:
        return
    gc.collect()  # drop py4j refs so the JVM can see dead dependencies
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        return  # non-py4j session stub (unit tests)
    free = shutil.disk_usage("/tmp").free
    t0, stalled = time.time(), 0
    while time.time() - t0 < timeout_s:
        time.sleep(5)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            return
        now = shutil.disk_usage("/tmp").free
        if now >= floor:
            return
        stalled = stalled + 1 if now - free < 2**30 else 0
        if stalled >= 6:  # 30s without progress: nothing left to drain
            return
        free = now


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
