"""SparkSession factory with the configuration this engine assumes.

Local mode is a stand-in for a real cluster: the same settings (AQE,
shuffle-partition sizing, Arrow) are what we would set fleet-wide. Nothing
here is local-only except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "relationaldecomposition_spark",
              shuffle_partitions: int | None = None,
              master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing + skew-join handling replaces hand-tuned
      partition counts at 100 TB scale.
    - ``shuffle_partitions`` defaults to $SPARK_GRAFT_CPUS (driver contract)
      or the JVM default; on a real cluster AQE coalesces down from a high
      initial number, so err high.
    - Arrow on: every Pandas-UDF path in operators/ uses Arrow batches.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # concurrent decomposition jobs (runner.py) share the cluster fairly
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
