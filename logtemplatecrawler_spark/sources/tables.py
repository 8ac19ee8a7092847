"""Table IO helpers: parquet/CSV sources + idempotent append sinks.

* CSV source/sink (S6, crawler.py:128-153): the reference guards an
  append-only CSV with a file lock; Spark's per-job output commit makes the
  lock unnecessary — kept for interop with the reference's artifacts.
* Idempotent append (S7, ON CONFLICT DO NOTHING): anti-join against the
  existing table on the unique keys, then append (J3).  At warehouse scale
  the same semantics come from an Iceberg MERGE; this parquet variant keeps
  the engine self-contained in the sandbox.
"""

from __future__ import annotations

import os
from typing import List

from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def append_unique(df: DataFrame, path: str, unique_keys: List[str]) -> int:
    """INSERT … ON CONFLICT DO NOTHING: drop rows whose unique key already
    exists in the sink, then append.  Returns the number of appended rows.

    Each key column is checked independently (the reference's templates
    table has independent UNIQUE constraints on template and
    parsed_template, postgres_db.sql:236-261)."""
    spark = df.sparkSession
    if os.path.isdir(path) and any(
        name.endswith(".parquet") for name in os.listdir(path)
    ):
        existing = spark.read.parquet(path)
        for key in unique_keys:
            df = df.join(existing.select(key).distinct(), key, "left_anti")
    df = df.persist()
    n = df.count()
    if n:
        df.write.mode("append").parquet(path)
    df.unpersist()
    return n
