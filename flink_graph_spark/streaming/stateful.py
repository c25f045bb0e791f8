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

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_cents long"
STATE_SCHEMA = "n long, cents long"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, cents) per user. Emits one row per user
    per micro-batch containing that user — for a single availableNow
    pass over a complete input the final snapshot equals the batch
    GROUP BY user_id.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
