"""SparkSession factory with the engine's standard configuration.

Tuned for the pipeline's shape: Arrow-batched pandas UDFs over large string
payloads (small batches), AQE on for skew/coalesce, shuffle partitions sized
by the caller (local testing default 32; a real cluster would set this to
2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "logtemplatecrawler-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  arrow_batch_rows: int = 256) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
