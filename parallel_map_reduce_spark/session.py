"""SparkSession factory tuned for this engine.

Defaults target the test harness (local[N], small scale factors) but the
settings are the ones you would ship to a 1000-executor cluster reading
100 TB: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow for the few pandas-UDF code paths, and a shuffle
partition count that AQE is free to coalesce downward.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "parallel_map_reduce_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32 in the
    driver environment; fall back to all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing + skew-join handling. At 100 TB
        # this is what absorbs skewed letter/word/user keys without manual
        # salting of every operator.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for pandas UDF / mapInPandas paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # The events table stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as BIGINT nanos, converted in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Deterministic wall-clock semantics regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # Whole-document text rows can be large; keep scan partitions sized
        # so a partition of documents fits executor memory at scale.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
