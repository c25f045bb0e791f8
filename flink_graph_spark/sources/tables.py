"""Parquet table loaders for the driver-provided TPC-H-ish testdata.

The reference has no storage format of its own (I/O = whatever DataSet
sources are used, CSV in examples — SURVEY.md §1.3); the new engine reads
columnar Parquet so Catalyst gets pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long nanos (legacy.parquet.nanosAsLong);
        # truncate to micros exactly like DuckDB's ns→us read of the same
        # file, and keep it NTZ to match the other tables' timestamps.
        df = df.withColumn(
            "ts",
            F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def read_csv_edges(spark: SparkSession, path: str, delimiter: str = ",") -> DataFrame:
    """CSV edge-list source (the reference's example-driver input path:
    env.readCsvFile → edge tuples, example/*.java ~L30-60).
    """
    return (
        spark.read.option("delimiter", delimiter)
        .schema("src long, dst long, value long")
        .csv(path)
    )
