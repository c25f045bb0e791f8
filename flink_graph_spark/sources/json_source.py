"""JSON-lines source — the engine's second text-based source format
(the reference reads CSV via env.readCsvFile; JSON-lines is the
equivalent ubiquitous interchange format for event/log pipelines).

Events are staged from the driver's parquet to newline-delimited JSON
once per (sf_dir) key — pandas-side, no Spark job — then read back
through ``spark.read.json`` with an EXPLICIT schema: schema inference
on JSON costs a full extra pass at scale and silently widens types;
a 100 TB pipeline always pins the schema.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STAGED: dict[str, str] = {}

EVENTS_JSON_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string,"
    " value double, props string"
)


def stage_events_json(sf_dir: str) -> str:
    """Write events.parquet as JSON-lines under /tmp (memoized per
    sf_dir); timestamps serialized as microsecond ISO strings."""
    key = os.path.abspath(sf_dir)
    if key in _STAGED and os.path.exists(_STAGED[key]):
        return _STAGED[key]
    pdf = pd.read_parquet(f"{sf_dir}/events.parquet")
    pdf["ts"] = pd.to_datetime(pdf["ts"]).dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    d = tempfile.mkdtemp(prefix="fgs_json_")
    path = os.path.join(d, "events.jsonl")
    pdf.to_json(path, orient="records", lines=True)
    _STAGED[key] = d
    return d


def parse_events_ts(raw: DataFrame) -> DataFrame:
    """ts string → timestamp_ntz, NULL-tolerant. Under ANSI mode (the
    engine default) ``to_timestamp_ntz`` throws CANNOT_PARSE_TIMESTAMP,
    so ONE malformed log line would kill the whole read — the same
    failure class as the round-6 ``$.k`` ANSI-cast bug; same contract:
    malformed → NULL. There is no try_to_timestamp_ntz, so parse with
    ``try_to_timestamp`` and cast ltz → ntz — an exact identity under
    the engine's pinned UTC session timezone (no DST gaps)."""
    ts = F.expr(
        "try_to_timestamp(ts, \"yyyy-MM-dd'T'HH:mm:ss.SSSSSS\")"
    ).cast("timestamp_ntz")
    return raw.withColumn("ts", ts)


def read_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events from the JSON-lines staging with the SAME schema/semantics
    as ``tables.load_table(..., 'events')`` (ts → timestamp_ntz)."""
    raw = spark.read.schema(EVENTS_JSON_SCHEMA).json(stage_events_json(sf_dir))
    return parse_events_ts(raw)
