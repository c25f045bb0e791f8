"""SparkSession factory tuned for the engine.

Scale posture (SURVEY.md §4.2): AQE on (runtime re-planning, skew-join
splitting, partition coalescing), UTC session timezone (oracle parity with
DuckDB), Arrow enabled for the few pandas-UDF paths, shuffle partitions
sized to the local core count (on a real cluster this would be
~2-3x total executor cores; AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink-graph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine-required runtime confs to an externally-provided session.

    The driver hands us its own SparkSession for ``entry``/``queries``;
    these settings are required for oracle parity (UTC timestamps) and
    for sane shuffle behavior on local mode.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # some driver rounds ship events.parquet as TIMESTAMP(NANOS), which
    # Spark's vectorized reader otherwise rejects; with this set it reads
    # as long nanos and the loaders normalize by actual unit (harmless
    # when the file is timestamp[us], as in round 2)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    return spark
