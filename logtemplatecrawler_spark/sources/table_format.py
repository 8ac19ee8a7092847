"""Table-format seam for checkpoint state (SURVEY §7 risk 6).

The crawl scheduler commits three kinds of state per round — the frontier
(as per-round row deltas + periodic compacted snapshots), the templates
delta, and the negative-cache key delta — plus a commit marker that makes
the round atomic ("a round without a MANIFEST never happened").

This module is the thin interface between those semantics and the storage
format.  The in-sandbox implementation is plain parquet with a MANIFEST-last
commit protocol; at warehouse scale the SAME interface is implemented by an
ACID table format (the north rule names Iceberg):

* ``write_snapshot``  → Iceberg overwrite (full-table rewrite; used only for
  periodic frontier compaction and the per-round templates delta dir);
* ``write_delta``     → Iceberg MERGE/append of the CHANGED rows only — the
  reference's analog is a row-level UPDATE
  (/root/reference/dags/log2vec_process-repository.py:76-79 flips one
  ``locked`` flag); per-round durable bytes are O(|touched rows|), not
  O(|table|);
* ``read_deltas``     → an incremental snapshot-isolated scan: ONE read path
  (Spark lists the partition directories), partition-pruned by the ``round``
  partition column, so stale partitions from an uncommitted crashed round
  are never visible to readers;
* ``commit_round`` / ``is_committed`` → the format's own atomic snapshot
  commit (the MANIFEST file disappears — Iceberg's metadata pointer swap IS
  the marker);
* ``read_snapshot`` → a snapshot-isolated scan.

The scheduler only calls these methods, so swapping the format in
production is a constructor argument, not a rewrite.  Semantics required of
any implementation (pinned by tests/test_crawl.py::test_resume_equals_uninterrupted
and ::test_frontier_commits_are_deltas):

1. ``write_snapshot``/``write_delta`` may be retried after a crash
   (idempotent overwrite of the target — a rerun of an uncommitted round
   recomputes the identical delta and overwrites only its own partition);
2. ``commit_round`` is the LAST write of a round — after it returns,
   ``is_committed`` must be durably true;
3. a round directory whose ``commit_round`` never ran must read as absent,
   and a delta partition whose round never committed must be excluded by
   the reader's ``max_round`` filter.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "MANIFEST.json"


class ParquetManifestFormat:
    """Parquet snapshots + round-partitioned deltas + MANIFEST-last commits."""

    def write_snapshot(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)

    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def snapshot_exists(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            name.endswith(".parquet") or name == "_SUCCESS"
            for name in os.listdir(path)
        )

    # -- per-round delta commits (the Iceberg-MERGE stand-in) ---------------

    def write_delta(self, df: DataFrame, base_dir: str, rnd: int) -> None:
        """Commit one round's changed rows under ``base_dir/round=NNNN``.

        Overwrites only that round's partition — a crashed round's rerun
        replaces its own (deterministic) delta and nothing else.
        """
        df.write.mode("overwrite").parquet(self._delta_path(base_dir, rnd))

    def read_deltas(self, spark: SparkSession, base_dir: str,
                    max_round: int, min_round_exclusive: int = -1
                    ) -> Optional[DataFrame]:
        """All delta rows with ``min_round_exclusive < round <= max_round``.

        ONE read path: Spark lists ``base_dir``'s partition directories and
        the ``round`` filter is partition-pruned, so per-read cost tracks the
        partitions actually selected — never O(rounds) separate reads
        (VERDICT r01 item 4).  Stale partitions above ``max_round`` (an
        uncommitted crashed round) are pruned out.  Returns None when no
        delta has ever been committed.  The ``round`` partition column is
        dropped — rows come back in the writer's schema.
        """
        if not self.deltas_exist(base_dir):
            return None
        df = spark.read.option("basePath", base_dir).parquet(base_dir)
        df = df.where(
            (F.col("round") > min_round_exclusive)
            & (F.col("round") <= max_round)
        )
        return df.drop("round")

    def deltas_exist(self, base_dir: str) -> bool:
        return os.path.isdir(base_dir) and any(
            name.startswith("round=") for name in os.listdir(base_dir)
        )

    def delta_rounds(self, base_dir: str):
        """Committed-or-not delta partition rounds present on disk."""
        if not os.path.isdir(base_dir):
            return []
        return sorted(
            int(name.split("=")[1])
            for name in os.listdir(base_dir)
            if name.startswith("round=")
        )

    @staticmethod
    def _delta_path(base_dir: str, rnd: int) -> str:
        return os.path.join(base_dir, f"round={rnd:04d}")

    # -- atomic round commit -------------------------------------------------

    def commit_round(self, round_dir: str, metrics: Optional[Dict] = None) -> None:
        if metrics is not None:
            with open(os.path.join(round_dir, "metrics.json"), "w") as fh:
                json.dump(metrics, fh)
        with open(os.path.join(round_dir, _MANIFEST), "w") as fh:
            json.dump({"complete": True}, fh)

    def is_committed(self, round_dir: str) -> bool:
        return os.path.exists(os.path.join(round_dir, _MANIFEST))
