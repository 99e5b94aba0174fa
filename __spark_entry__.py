"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``recommend_spark``; this module only adapts the
registry to the driver's API.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from recommend_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Pricing summary + top-3-lines-per-order composed: scan → filter → agg →
    window → join — the whole vertical slice (SURVEY.md §7 M0).
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    from recommend_spark.canon import davg, dsum
    from recommend_spark.io import load_table

    sf_dir = "/root/testdata/sf0.001"
    li = load_table(spark, sf_dir, "lineitem")
    summary = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base"),
            davg("l_quantity", "avg_qty"),
            F.count("*").alias("cnt"),
        )
    )
    w = W.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    top3 = (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("top3_lines"))
    )
    return summary.join(top3, ["l_returnflag", "l_linestatus"], "left")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``."""
    return dict(ORACLES)
