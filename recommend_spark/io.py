"""Fixture loading: the one place that knows the on-disk layout + quirks.

Reference parity: the reference's only ingest is CSV-with-header via
``sc.textFile`` + manual split (upstream:engine.py § __init__); ours is
schema'd columnar scans through the DataSource V2 parquet reader, which
gives predicate pushdown, column pruning and row-group skipping for free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import ensure_runtime_confs

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with quirk shims applied (FIXTURES.md Q1).

    ``events.ts`` is parquet TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a BIGINT of
    nanoseconds; convert with integer division (``DIV`` — double division
    would lose precision at 1e18 magnitudes) to a microsecond timestamp.
    """
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]
