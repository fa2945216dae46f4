"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` in a single JVM, but
every config here is chosen to survive a 1000-executor cluster reading
100 TB: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), broadcast threshold sized for dimension tables, shuffle
partitions sized to the environment rather than the 200 default, and
Arrow enabled for the (rare) Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — coalesce small shuffle partitions,
    # split skewed ones, convert SMJ→broadcast when a side turns out
    # small. At 100 TB this is the main defense against skew.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier/part at any SF the dims
    # stay small relative to facts) should broadcast; 64 MB is a safe
    # executor-memory fraction on any real cluster.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for Pandas-UDF / toPandas paths (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Don't let one bad row kill an Arrow batch silently.
    "spark.sql.execution.arrow.pyspark.fallback.enabled": "false",
    "spark.ui.enabled": "false",
    # The events table stores TIMESTAMP(NANOS); Spark 4 only reads it
    # via the nanos-as-long escape hatch (converted in sources.catalog).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # FAIR scheduling so concurrent jobs (the point of a job server)
    # share the cluster instead of FIFO-starving each other — the Spark
    # analog of the reference's per-queue worker concurrency
    # (reference: cmd/init.go:44, core.go:437-440).
    "spark.scheduler.mode": "FAIR",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dungbeetle_spark", **overrides: str) -> SparkSession:
    """Build (or reuse) the session.

    ``spark.sql.shuffle.partitions`` is set to the local core count for
    tests; on a real cluster you would size it to ~2-3× total cores or
    let AQE coalesce from a higher initial number.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in {**_DEFAULTS, **overrides}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
