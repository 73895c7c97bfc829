"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE (runtime re-planning, skew-join
handling, partition coalescing) and Arrow-batched Python execution are the
knobs that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "quickstart_streaming_agents_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    - ``spark.sql.adaptive.*``: AQE re-plans at runtime — coalesces tiny
      shuffle partitions at small SF and splits skewed ones at large SF.
    - ``spark.sql.session.timeZone=UTC``: parquet fixtures are UTC; DuckDB
      oracle comparisons require identical wall-clock rendering.
    - Arrow enabled: every pandas UDF (ml_predict, anomaly detection,
      vector search) moves data in columnar batches, not pickled rows.
    - shuffle partitions default to the local core count; on a real
      cluster this is overridden via spark-submit conf (AQE coalescing
      makes the initial number far less critical).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
