"""Event analytics over ``events`` — gap sessionization, JSON property
extraction, hourly rollups, top-k per user (north-star extension,
SURVEY.md §2.10; the reference has no streaming/event surface).

Parity notes:
* Gaps are compared in integer epoch-microseconds (both engines read
  the same nanosecond parquet truncated to µs) — no timestamp-diff
  dialect drift.
* Money sums go through integer cents (ROUND(value*100) is the same
  double→int in both engines) so aggregation order can't move the
  6th decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 1_800_000_000  # 30 minutes


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Classic batch sessionization: lag over (user, time) → new-session
    flag on gap > threshold → running sum = session id → per-session
    rollup. One window pass + one aggregation; partitions by user_id so
    it scales with the user count, not the event count.
    Returns (user_id, session_id, n_events, start_ts, end_ts, sum_cents).
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = (
        events.select("user_id", "event_id", "ts", "value", us.alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_us").isNull()
                | ((F.col("us") - F.col("prev_us")) > gap_us),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("is_new").over(wrun))
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
    )


def sessionize_sql(gap_us: int = SESSION_GAP_US) -> tuple[str, str]:
    """(CTE text, final SELECT) for composition by the registry."""
    ctes = f"""
ev AS MATERIALIZED (
    SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events
),
flagged AS MATERIALIZED (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us}
                   THEN 1 ELSE 0 END AS is_new
    FROM (
        SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                      AS prev_us
        FROM ev
    )
),
sess AS MATERIALIZED (
    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)"""
    final = """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM sess GROUP BY 1, 2"""
    return ctes, final


def json_k_stats(events: DataFrame) -> DataFrame:
    """Extract the JSON property ``$.k`` from props and aggregate per
    event type. get_json_object stays JVM-side (no Python UDF)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


JSON_K_STATS_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1"""


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1h window per event_type (batch twin of the streaming
    windowed agg in streaming/)."""
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


HOURLY_ROLLUP_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2"""


def top_events_per_user(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value per user (window ranking, deterministic
    event_id tie-break)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("user_id", "event_id", "value", F.col("rn").cast("long").alias("rn"))
    )


def top_events_per_user_sql(k: int = 3) -> str:
    return f"""
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id ASC) AS rn
    FROM events
) WHERE rn <= {k}"""
