#!/usr/bin/env python
"""spark-submit maintenance entry point: compact a crawl checkpoint.

Folds all committed frontier deltas into a snapshot at the last complete
round and prunes the folded delta partitions (Iceberg's
``rewrite_data_files`` + ``expire_snapshots`` analog).  Safe to run between
crawls or from a maintenance cron; crash-safe and idempotent (see
``crawl.scheduler.compact_checkpoint``).

Usage:
    spark-submit --py-files pkg.zip scripts/compact_checkpoint.py \
        --checkpoint /path/to/ckpt [--format parquet|commitlog] [--master ...]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--format", choices=["auto", "parquet", "commitlog",
                                         "bucketed"],
                    default="auto",
                    help="auto (default) infers the format from the "
                         "checkpoint's commit markers — prefer it: an "
                         "explicit --format parquet on a BUCKETED "
                         "checkpoint would rewrite the compacted snapshot "
                         "unbucketed and permanently downgrade the layout")
    ap.add_argument("--buckets", type=int, default=32,
                    help="bucket count for --format bucketed")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from logtemplatecrawler_spark.crawl.scheduler import (
        CrawlConfig,
        compact_checkpoint,
    )
    from logtemplatecrawler_spark.session import build_session
    from logtemplatecrawler_spark.sources.table_format import (
        BucketedParquetFormat,
        CommitLogFormat,
        ParquetManifestFormat,
        detect_format,
    )

    if args.format == "auto":
        fmt = detect_format(args.checkpoint)
        if fmt is None:
            ap.error(f"no recognizable committed round under {args.checkpoint} "
                     "(nothing to compact; pass --format to override detection)")
    elif args.format == "parquet":
        fmt = ParquetManifestFormat()
    elif args.format == "bucketed":
        fmt = BucketedParquetFormat(n_buckets=args.buckets)
    else:
        fmt = CommitLogFormat()
    spark = build_session("compact_checkpoint", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cfg = CrawlConfig(checkpoint_dir=args.checkpoint, table_format=fmt)
        print(json.dumps(compact_checkpoint(spark, cfg)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
