"""SparkSession factory with the configs every operator depends on.

Scale notes (100 TB design): the same settings apply on a real cluster —
AQE handles runtime coalescing + skew joins, shuffle partitions should be
sized ~2-3x total cores with partition sizes of 128-512 MB (AQE's
``advisoryPartitionSizeInBytes`` takes over at runtime).  Locally we pin 32
shuffle partitions to match ``local[32]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs that are safe (and required) to set at runtime on *any* session,
#: including one the test driver created for us.  All are runtime-settable.
RUNTIME_CONFS: dict[str, str] = {
    # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 hard-rejects by
    # default; read it as long and convert in the loader (FIXTURES.md Q1).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Determinism: oracle comparisons assume UTC (FIXTURES.md Q3).
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Right-size shuffles for this container (local[32]); without it a
    # driver-owned session runs every shuffle/state-store stage at the 200
    # default.  On a real cluster the deployment sets this (2-3x cores) and
    # AQE coalesces to ~advisoryPartitionSizeInBytes at runtime.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply RUNTIME_CONFS to an existing session (driver-owned or ours)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; loader fallbacks still apply
    return spark


def get_spark(app_name: str = "recommend_spark") -> SparkSession:
    """Create (or get) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster the same confs
    apply unchanged (master comes from spark-submit).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # A 200+ query session generates hundreds of WholeStageCodegen
        # classes; the JVM's default ~240 MB code cache fills, the JIT
        # turns itself off, and every later query runs interpreted (2-10x
        # slower — the late-suite slowdown pattern in long bench/sweep
        # sessions).  512 MB keeps the JIT on for the whole inventory.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m",
        )
        # Status-store retention: even with the UI off, the app/SQL status
        # listeners retain per-execution plan graphs + per-task metrics
        # (defaults: 1000 executions / 100k tasks).  A 200+ query sweep
        # accumulates hundreds of MB of listener state and measurably
        # slows late-suite job submission; cap retention at what a local
        # debugging session actually needs.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "10000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)
