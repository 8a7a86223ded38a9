"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for correctness parity with the DuckDB oracle (UTC session timezone)
and for Arrow-batched Python exchange. At cluster scale the same settings
apply; only master/memory come from spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "findtextcenternet-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        # oracle parity: duckdb timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalesce + skew-join splitting (north rule: skew)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow exchange for pandas UDF stages
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # corpus rows carry multi-KB binary html: the default 4096-row
        # columnar batch × many concurrent readers exhausts the heap at
        # high local parallelism; 512 keeps per-reader buffers ~MB-scale
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return b.getOrCreate()
