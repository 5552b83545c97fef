"""SparkSession factory with scale-conscious defaults.

Tuned for the container (local[N], single JVM) but every setting is the
one you'd also want on a 1000-executor cluster:

  * AQE on — runtime coalescing of shuffle partitions, skew-join
    splitting, dynamic join-strategy switches are the single biggest
    win at 100 TB.
  * Arrow on — every pandas_udf / applyInPandas / toPandas crossing is
    Arrow-batched, never pickled row-at-a-time.
  * shuffle.partitions sized to cores locally; on a real cluster AQE
    coalesces from a deliberately-high initial number, so we set the
    initial high and let AQE shrink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tada_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session. Safe to call repeatedly."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # native TIME type (time-of-day — the reference's civil.Time
        # dtype, types.go:207-220); flag-gated in Spark 4.x
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
