"""Table-format seam for checkpoint state (SURVEY §7 risk 6).

The crawl scheduler commits three kinds of state per round — the frontier
snapshot, the templates delta, and the cumulative negative-cache keys —
plus a commit marker that makes the round atomic ("a round without a
MANIFEST never happened").

This module is the thin interface between those semantics and the storage
format.  The in-sandbox implementation is plain parquet with a MANIFEST-last
commit protocol; at warehouse scale the SAME interface is implemented by an
ACID table format (the north rule names Iceberg):

* ``write_snapshot``  → Iceberg overwrite/MERGE (row-level deltas instead of
  full rewrites, snapshot lineage for time travel);
* ``commit_round`` / ``is_committed`` → the format's own atomic snapshot
  commit (the MANIFEST file disappears — Iceberg's metadata pointer swap IS
  the marker);
* ``read_snapshot`` → a snapshot-isolated scan.

The scheduler only calls these five methods, so swapping the format in
production is a constructor argument, not a rewrite.  Semantics required of
any implementation (pinned by tests/test_crawl.py::test_resume_equals_uninterrupted):

1. ``write_snapshot`` may be retried after a crash (idempotent overwrite);
2. ``commit_round`` is the LAST write of a round — after it returns,
   ``is_committed`` must be durably true;
3. a round directory whose ``commit_round`` never ran must read as absent.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "MANIFEST.json"


class ParquetManifestFormat:
    """Parquet snapshots + MANIFEST-last atomic round commits."""

    def write_snapshot(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)

    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def snapshot_exists(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            name.endswith(".parquet") or name == "_SUCCESS"
            for name in os.listdir(path)
        )

    def commit_round(self, round_dir: str, metrics: Optional[Dict] = None) -> None:
        if metrics is not None:
            with open(os.path.join(round_dir, "metrics.json"), "w") as fh:
                json.dump(metrics, fh)
        with open(os.path.join(round_dir, _MANIFEST), "w") as fh:
            json.dump({"complete": True}, fh)

    def is_committed(self, round_dir: str) -> bool:
        return os.path.exists(os.path.join(round_dir, _MANIFEST))
