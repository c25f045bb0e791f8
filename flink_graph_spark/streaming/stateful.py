"""Custom stateful streaming operator — running per-user totals via
``applyInPandasWithState`` (north-star extension; the reference has no
streaming surface, SURVEY.md §2.10).

This is the pattern for operators Structured Streaming's built-in
windows can't express: arbitrary per-key state (here a (count, cents)
pair) updated per micro-batch, with GroupStateTimeout for state expiry
at scale. State is partitioned by user_id, so it scales with the key
count, not the event count; each micro-batch touches only the keys it
contains.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_cents long"
STATE_SCHEMA = "n long, cents long"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: Optional[int] = None,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # key idle past its TTL: evict the state, emit nothing — at
        # scale this is what bounds the store on an unbounded key space
        state.remove()
        return
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # SUM semantics: NULL values contribute nothing (a NaN would
        # poison the int cast); n still counts the row, mirroring the
        # twin's COUNT(*) + COALESCE(SUM(...), 0)
        vals = pdf["value"].dropna()
        cents += int((vals * 100).round().astype("int64").sum())
    state.update((n, cents))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
    )


def running_user_totals(
    events: DataFrame, ttl_minutes: int | None = None
) -> DataFrame:
    """Streaming running (count, cents) per user. Emits one row per user
    per micro-batch containing that user — for a single availableNow
    pass over a complete input the final snapshot equals the batch
    GROUP BY user_id.

    ``ttl_minutes`` arms a processing-time timeout per key: state for a
    key idle longer than the TTL is evicted on a later micro-batch. On
    an unbounded key space (the 100 TB posture) this is mandatory —
    without expiry the state store grows monotonically. Use TTL with
    continuous triggers only: under ``trigger(availableNow=True)`` the
    runner keeps scheduling timeout-processing batches, so the snapshot
    harness (`run_available_now`) never terminates with a TTL armed.
    """
    ttl_ms = ttl_minutes * 60_000 if ttl_minutes is not None else None
    return events.groupBy("user_id").applyInPandasWithState(
        partial(_update, ttl_ms=ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
