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
import shutil
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "MANIFEST.json"


def _atomic_write_json(path: str, payload) -> None:
    """Write JSON via tmp-file + ``os.replace`` — the POSIX rename is the
    atomic pointer swap (readers see the old or the new metadata, never a
    torn write).  Iceberg's metadata-location swap is the same primitive."""
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)


class ParquetManifestFormat:
    """Parquet snapshots + round-partitioned deltas + MANIFEST-last commits."""

    def write_snapshot(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").parquet(path)

    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(path)

    def read_snapshots(self, spark: SparkSession, paths: List[str]) -> DataFrame:
        """Union of several snapshots in ONE multi-path read (used by the
        one-time export / legacy-rebuild paths, never the round loop)."""
        return spark.read.parquet(*paths)

    def snapshot_exists(self, path: str) -> bool:
        # _SUCCESS is the completeness marker Spark writes LAST — a
        # crash-truncated snapshot (parquet files present, no _SUCCESS)
        # must read as absent, or readers (and the offline compaction's
        # skip-if-exists) would trust partial data.  DEPENDENCY: requires
        # mapreduce.fileoutputcommitter.marksuccessfuljobs=true (object-store
        # profiles often disable it); session.build_session pins it on.
        return os.path.isdir(path) and "_SUCCESS" in os.listdir(path)

    def drop_snapshot(self, path: str) -> None:
        """Expire a superseded snapshot (offline-compaction history GC)."""
        shutil.rmtree(path, ignore_errors=True)

    # -- per-round delta commits (the Iceberg-MERGE stand-in) ---------------

    def write_delta(self, df: DataFrame, base_dir: str, rnd: int) -> None:
        """Commit one round's changed rows under ``base_dir/round=NNNN``.

        Overwrites only that round's partition — a crashed round's rerun
        replaces its own (deterministic) delta and nothing else.  The write
        lands in a dot-prefixed staging dir (hidden from Spark's partition
        discovery) and is PUBLISHED with one atomic directory rename, so a
        crash mid-write can never leave a half-partition that readers
        mistake for committed rows — the round-loop's MANIFEST protocol
        already covers its own deltas, but out-of-protocol writers (the
        legacy neg-cache backfill at an ALREADY-committed round) have no
        MANIFEST to hide behind.
        """
        if "round" in df.columns:  # would collide with the partition column
            raise ValueError("delta rows must not carry a 'round' column")
        staging = os.path.join(base_dir, f".staging-round={rnd:04d}")
        shutil.rmtree(staging, ignore_errors=True)
        df.write.mode("overwrite").parquet(staging)
        final = self._delta_path(base_dir, rnd)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(staging, final)

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

    def prune_deltas(self, base_dir: str, up_to_round: int) -> int:
        """Drop delta partitions with ``round <= up_to_round`` (after their
        rows were folded into a compacted snapshot — Iceberg's
        ``expire_snapshots``/``rewrite_data_files`` maintenance analog).
        Returns the number of partitions removed."""
        removed = 0
        for rnd in self.delta_rounds(base_dir):
            if rnd <= up_to_round:
                shutil.rmtree(self._delta_path(base_dir, rnd), ignore_errors=True)
                removed += 1
        if os.path.isdir(base_dir):  # sweep crashed staging leftovers
            for name in os.listdir(base_dir):
                if name.startswith(".staging-round="):
                    shutil.rmtree(os.path.join(base_dir, name), ignore_errors=True)
        return removed

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


class BucketedParquetFormat(ParquetManifestFormat):
    """ParquetManifestFormat whose FRONTIER snapshots are Spark bucketed
    tables, CLUSTERED/SORTED BY ``url`` (VERDICT r03 item 1).

    Why: ``load_frontier``'s MERGE-on-read anti-joins the full base snapshot
    against the (small) delta set on ``url``, and the round loop's seen
    anti-join / fetch join also key on ``url``.  Over plain parquet Spark
    must hash-exchange the whole frontier for those joins — the single
    biggest per-round network cost at the 10^10-row design point.  A
    bucketed table scan reports ``HashPartitioning(url, n_buckets)``, so
    those joins compile exchange-free on the base side (only the small side
    shuffles) — Iceberg merges MOR file-locally against clustered data for
    exactly this reason.  Machine-checked:
    tests/test_scale_plans.py::test_mor_reconstruction_base_side_no_exchange.

    Mechanics (all public Spark API):

    * ``write_snapshot`` pre-repartitions by the bucket expression (so each
      task owns exactly one bucket → one file per bucket, preserving the
      SORTED BY metadata's usefulness) and writes via
      ``bucketBy(n, 'url').sortBy('url').saveAsTable`` with an explicit
      ``path`` (external table).  A ``_BUCKETS.json`` marker records the
      spec — bucket metadata lives in the session catalog, which does not
      survive a restart, so…
    * ``read_snapshot`` re-registers the table on a fresh session with
      ``CREATE TABLE … USING PARQUET CLUSTERED BY (url) SORTED BY (url)
      INTO n BUCKETS LOCATION path`` (bucket ids are encoded in the file
      names Spark wrote, so the re-registered table reads bucket-aware) and
      returns ``spark.table(name)``.
    * Non-frontier snapshots (templates, neg keys) fall through to the
      plain parquet base class — bucketing them buys nothing.
    * Deltas stay round-partitioned plain parquet (they are the SMALL,
      always-shuffled side of every merge).

    ``n_buckets`` is the cluster knob: at warehouse scale size it so one
    bucket ≈ one task's worth of frontier (e.g. 4096 buckets at 10^10 rows
    ≈ 2.4M rows/bucket).  It is fixed for a snapshot's life but NOT for the
    checkpoint's (VERDICT r04 nit 4): ``target_buckets`` is the grow-only
    resize policy — offline compaction (``compact_checkpoint``) rewrites
    the snapshot at the scaled count when the frontier outgrows
    ``rows_per_bucket``, the same amortized doubling as the URL-seen
    bloom's scalable policy.  NOTE: Spark's
    ``DisableUnnecessaryBucketedScan`` planner rule falls back to a plain
    scan (still correct, just not exchange-free) when the bucket count is
    below the session's shuffle partitions — keep ``n_buckets >=
    spark.sql.shuffle.partitions``; reads/writes below that cliff warn
    (:meth:`_warn_bucket_cliff`).
    """

    _BUCKET_MARKER = "_BUCKETS.json"
    _BUCKET_COL = "url"
    # a snapshot is "frontier-shaped" iff it has these columns
    _FRONTIER_COLS = {"url", "url_hash", "state", "updated_round"}

    def __init__(self, n_buckets: int = 32, rows_per_bucket: int = 2_000_000):
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        if rows_per_bucket < 1:
            raise ValueError("rows_per_bucket must be >= 1")
        self.n_buckets = n_buckets
        self.rows_per_bucket = rows_per_bucket

    def target_buckets(self, n_rows: int) -> int:
        """Grow-only power-of-two bucket count keeping ≤ ``rows_per_bucket``
        rows per bucket.  Shrinking is deliberately not done: a shrunk
        count would churn every file for no exchange win, and power-of-two
        growth keeps rewrites amortized O(log n) over a crawl's life."""
        need = -(-max(1, n_rows) // self.rows_per_bucket)
        return max(self.n_buckets, 1 << (need - 1).bit_length())

    @staticmethod
    def _warn_bucket_cliff(spark: SparkSession, n_buckets: int) -> None:
        """Surface the DisableUnnecessaryBucketedScan cliff (CLAUDE.md trap,
        VERDICT r04 nit 4): below the session's shuffle-partition count the
        bucketed scan silently degrades to a plain scan — still correct,
        but the exchange-free MOR property is gone, which at the design
        point is the difference between a local merge and shuffling 10^10
        rows."""
        import warnings

        try:
            parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return
        if n_buckets < parts:
            warnings.warn(
                f"BucketedParquetFormat: n_buckets={n_buckets} < "
                f"spark.sql.shuffle.partitions={parts}; Spark's "
                "DisableUnnecessaryBucketedScan will fall back to a plain "
                "scan and the MERGE-on-read base side will shuffle — raise "
                "n_buckets (or compact with a larger rows_per_bucket-derived "
                "count) or lower spark.sql.shuffle.partitions",
                RuntimeWarning,
                stacklevel=3,
            )

    @staticmethod
    def _table_name(path: str) -> str:
        import hashlib

        digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
        return f"ckpt_snap_{digest}"

    def write_snapshot(self, df: DataFrame, path: str) -> None:
        if not self._FRONTIER_COLS <= set(df.columns):
            super().write_snapshot(df, path)
            return
        name = self._table_name(path)
        spark = df.sparkSession
        self._warn_bucket_cliff(spark, self.n_buckets)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(path, ignore_errors=True)
        (
            df.repartition(self.n_buckets, self._BUCKET_COL)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", path)
            .bucketBy(self.n_buckets, self._BUCKET_COL)
            .sortBy(self._BUCKET_COL)
            .saveAsTable(name)
        )
        _atomic_write_json(
            os.path.join(path, self._BUCKET_MARKER),
            {"n_buckets": self.n_buckets, "bucket_col": self._BUCKET_COL,
             # the resize policy is a property of the CHECKPOINT's life,
             # not the session — persist it so detect_format restores it
             "rows_per_bucket": self.rows_per_bucket},
        )

    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        marker = os.path.join(path, self._BUCKET_MARKER)
        if not os.path.exists(marker):
            return super().read_snapshot(spark, path)
        with open(marker) as fh:
            spec = json.load(fh)
        self._warn_bucket_cliff(spark, spec["n_buckets"])
        name = self._table_name(path)
        if not spark.catalog.tableExists(name):
            schema = spark.read.parquet(path).schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({spec['bucket_col']}) "
                f"SORTED BY ({spec['bucket_col']}) "
                f"INTO {spec['n_buckets']} BUCKETS "
                f"LOCATION '{os.path.abspath(path)}'"
            )
        return spark.table(name)

    def drop_snapshot(self, path: str) -> None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            spark.sql(f"DROP TABLE IF EXISTS {self._table_name(path)}")
        super().drop_snapshot(path)


def detect_format(checkpoint_dir: str):
    """Infer the table format of an EXISTING checkpoint from its on-disk
    commit markers (``MANIFEST.json`` → parquet+manifest, ``_commit.json``
    → commit-log), falling back to the delta-directory markers
    (``_log.json`` → commit-log, ``round=`` partition dirs → parquet) for a
    checkpoint that crashed before its first round commit (ADVICE r03 —
    defaulting such a dir to parquet made read_deltas choke on commit-log
    data dirs).  Returns None for a fresh (or absent) directory — callers
    choose a default for new checkpoints; see :func:`require_format` for
    the strict variant."""
    if not os.path.isdir(checkpoint_dir):
        return None
    manifest_seen = False
    for name in sorted(os.listdir(checkpoint_dir)):
        if name.startswith("round="):
            rdir = os.path.join(checkpoint_dir, name)
            # a bucketed frontier snapshot marks the whole checkpoint as
            # BucketedParquetFormat (compaction must keep rewriting
            # snapshots bucketed, not silently downgrade to plain parquet)
            bmark = os.path.join(
                rdir, "frontier", BucketedParquetFormat._BUCKET_MARKER
            )
            if os.path.exists(bmark):
                with open(bmark) as fh:
                    spec = json.load(fh)
                return BucketedParquetFormat(
                    spec["n_buckets"],
                    rows_per_bucket=spec.get(
                        "rows_per_bucket",
                        BucketedParquetFormat().rows_per_bucket,
                    ),
                )
            if os.path.exists(os.path.join(rdir, _MANIFEST)):
                manifest_seen = True
            if os.path.exists(os.path.join(rdir, CommitLogFormat._COMMIT)):
                return CommitLogFormat()
    if manifest_seen:
        return ParquetManifestFormat()
    for sub in ("frontier_deltas", "neg_keys"):
        d = os.path.join(checkpoint_dir, sub)
        if os.path.exists(os.path.join(d, CommitLogFormat._LOG)):
            return CommitLogFormat()
        if os.path.isdir(d) and any(
            n.startswith("round=") or n.startswith(".staging-round=")
            for n in os.listdir(d)
        ):
            return ParquetManifestFormat()
    return None


def require_format(checkpoint_dir: str):
    """Strict auto-detection for resume paths: None only when the directory
    is fresh (absent or empty); a NON-EMPTY unrecognizable directory raises
    instead of silently defaulting to a format that would misread it."""
    fmt = detect_format(checkpoint_dir)
    if fmt is not None:
        return fmt
    if os.path.isdir(checkpoint_dir) and os.listdir(checkpoint_dir):
        raise ValueError(
            f"{checkpoint_dir} is non-empty but carries no recognizable "
            "checkpoint markers (MANIFEST.json/_commit.json/_log.json/"
            "round= partitions); refusing to guess a table format — pass "
            "--format explicitly or point at a fresh directory"
        )
    return None


class CommitLogFormat:
    """Second seam implementation — Iceberg-shaped metadata over parquet.

    Exists to PROVE the scheduler's claim that swapping the table format is
    a constructor argument (tests/test_table_format_contract.py runs the
    full crawl + resume under both formats and asserts identical results).
    Physical differences from :class:`ParquetManifestFormat`:

    * snapshots are VERSIONED: each ``write_snapshot`` lands in a fresh
      ``v%06d`` data dir and then atomically swaps a ``_meta.json`` pointer
      (``os.replace`` — readers see old or new, never torn).  Overwrite
      does not touch the previous version's files → snapshot isolation,
      exactly Iceberg's metadata-location swap;
    * readers NEVER list directories: the data location always comes from
      the metadata pointer / commit log (Iceberg's manifests);
    * deltas append an entry to ``_log.json`` (round → data dir); a retried
      round REPLACES its own entry (old dir garbage-collected best-effort),
      so a crashed rerun is idempotent; ``read_deltas`` resolves the
      selected dirs from the log and issues ONE multi-path read (the
      ``round`` value is materialized as a data column at write, so the
      range filter prunes on row-group stats);
    * the commit marker is ``_commit.json`` written with the same atomic
      replace — proving the scheduler depends only on
      ``commit_round``/``is_committed`` semantics, not on MANIFEST naming;
    * superseded snapshot versions are RETAINED (``retained_versions``,
      default 2 = current + previous) so a concurrent reader that resolved
      the old pointer just before an overwrite still finds its files —
      Iceberg keeps history until ``expire_snapshots`` for the same reason.
      ``expire_versions`` is the offline maintenance call (run by
      ``compact_checkpoint``, a single-writer window) that trims history
      down to the newest ``keep`` versions.  Pinned by
      tests/test_table_format_contract.py::test_commitlog_version_retention.
    """

    _META = "_meta.json"
    _LOG = "_log.json"
    _COMMIT = "_commit.json"

    def __init__(self, retained_versions: int = 2):
        if retained_versions < 1:
            raise ValueError("retained_versions must be >= 1")
        self.retained_versions = retained_versions

    # -- snapshots -----------------------------------------------------------

    @staticmethod
    def _version_dirs(path: str):
        """Snapshot version data dirs under ``path``, oldest first.
        Sorted NUMERICALLY — lexicographic order breaks past v999999 and
        would GC the live version (r4 review finding)."""
        return sorted(
            (name for name in os.listdir(path)
             if name.startswith("v") and name[1:].isdigit()),
            key=lambda name: int(name[1:]),
        )

    def write_snapshot(self, df: DataFrame, path: str) -> None:
        meta_path = os.path.join(path, self._META)
        version = 0
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                version = json.load(fh)["version"] + 1
        data = f"v{version:06d}"
        df.write.mode("overwrite").parquet(os.path.join(path, data))
        _atomic_write_json(meta_path, {"version": version, "data": data})
        # GC versions beyond the retention window; the newest
        # ``retained_versions`` (current included) stay readable for
        # concurrent readers holding a just-superseded pointer.
        for name in self._doomed_versions(path, self.retained_versions):
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)

    def _doomed_versions(self, path: str, keep: int):
        """Version dirs eligible for GC: everything except the dir the
        ``_meta.json`` pointer resolves to (ALWAYS retained — numeric order
        alone would, after a crash between the parquet write and the meta
        swap, rank the orphan vNNNNNN newest and delete the live pointed-to
        version, leaving ``read_snapshot`` resolving to a deleted dir —
        ADVICE r04) plus the newest ``keep - 1`` other dirs."""
        live = os.path.basename(self._resolve(path))
        others = [d for d in self._version_dirs(path) if d != live]
        return others[: -(keep - 1) or None]

    def expire_versions(self, path: str, keep: int = 1) -> int:
        """Offline history expiry (single-writer maintenance window): drop
        all but the meta-pointed live version and the newest ``keep - 1``
        other version dirs.  Returns dirs removed."""
        if keep < 1:
            raise ValueError("keep must be >= 1")
        doomed = self._doomed_versions(path, keep)
        for name in doomed:
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
        return len(doomed)

    def _resolve(self, path: str) -> str:
        with open(os.path.join(path, self._META)) as fh:
            return os.path.join(path, json.load(fh)["data"])

    def read_snapshot(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.parquet(self._resolve(path))

    def read_snapshots(self, spark: SparkSession, paths: List[str]) -> DataFrame:
        return spark.read.parquet(*[self._resolve(p) for p in paths])

    def snapshot_exists(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, self._META))

    def drop_snapshot(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    # -- per-round delta commits ---------------------------------------------

    def _read_log(self, base_dir: str) -> Dict:
        log_path = os.path.join(base_dir, self._LOG)
        if not os.path.exists(log_path):
            return {"serial": 0, "entries": {}}
        with open(log_path) as fh:
            return json.load(fh)

    def write_delta(self, df: DataFrame, base_dir: str, rnd: int) -> None:
        if "round" in df.columns:  # reserved for the range filter
            raise ValueError("delta rows must not carry a 'round' column")
        log = self._read_log(base_dir)
        prev = log["entries"].get(str(rnd))
        data = f"r{rnd:04d}_{log['serial']:04d}"
        df.withColumn("round", F.lit(rnd)).write.mode("overwrite").parquet(
            os.path.join(base_dir, data)
        )
        log["entries"][str(rnd)] = data
        log["serial"] += 1
        _atomic_write_json(os.path.join(base_dir, self._LOG), log)
        if prev is not None and prev != data:
            shutil.rmtree(os.path.join(base_dir, prev), ignore_errors=True)

    def read_deltas(self, spark: SparkSession, base_dir: str,
                    max_round: int, min_round_exclusive: int = -1
                    ) -> Optional[DataFrame]:
        entries = self._read_log(base_dir)["entries"]
        if not entries:
            return None
        dirs = [
            os.path.join(base_dir, d)
            for r, d in entries.items()
            if min_round_exclusive < int(r) <= max_round
        ]
        if not dirs:
            # selection empty but the table exists: derive the (writer)
            # schema from any committed delta, return it empty
            any_dir = os.path.join(base_dir, next(iter(entries.values())))
            return spark.read.parquet(any_dir).where(F.lit(False)).drop("round")
        df = spark.read.parquet(*dirs)
        df = df.where(
            (F.col("round") > min_round_exclusive)
            & (F.col("round") <= max_round)
        )
        return df.drop("round")

    def deltas_exist(self, base_dir: str) -> bool:
        return bool(self._read_log(base_dir)["entries"])

    def delta_rounds(self, base_dir: str):
        return sorted(int(r) for r in self._read_log(base_dir)["entries"])

    def prune_deltas(self, base_dir: str, up_to_round: int) -> int:
        """Drop log entries (and their data dirs) with ``round <=
        up_to_round``: rewrite the commit log first (atomic pointer swap —
        readers never see a log entry whose files are gone), then GC.
        Also sweeps ORPHANED data dirs (present on disk, absent from the
        log) left by a crash between a previous log swap and its rmtree —
        safe because pruning is a single-writer maintenance operation, so
        no in-flight write_delta can own an unlogged dir concurrently."""
        log = self._read_log(base_dir)
        doomed = {r: d for r, d in log["entries"].items()
                  if int(r) <= up_to_round}
        log["entries"] = {r: d for r, d in log["entries"].items()
                          if r not in doomed}
        if doomed:
            _atomic_write_json(os.path.join(base_dir, self._LOG), log)
        live = set(log["entries"].values())
        if os.path.isdir(base_dir):
            for name in os.listdir(base_dir):
                full = os.path.join(base_dir, name)
                if (name not in live and name != self._LOG
                        and not name.endswith(".tmp") and os.path.isdir(full)):
                    shutil.rmtree(full, ignore_errors=True)
        return len(doomed)

    # -- atomic round commit -------------------------------------------------

    def commit_round(self, round_dir: str, metrics: Optional[Dict] = None) -> None:
        os.makedirs(round_dir, exist_ok=True)
        if metrics is not None:
            with open(os.path.join(round_dir, "metrics.json"), "w") as fh:
                json.dump(metrics, fh)
        _atomic_write_json(os.path.join(round_dir, self._COMMIT), {"complete": True})

    def is_committed(self, round_dir: str) -> bool:
        return os.path.exists(os.path.join(round_dir, self._COMMIT))
