#!/usr/bin/env python
"""spark-submit entry point: run (or resume) a crawl against a pages table.

Usage:
    spark-submit --py-files pkg.zip scripts/run_crawl.py \
        --pages /path/to/pages.parquet --checkpoint /path/to/ckpt \
        [--seeds /path/to/seeds.parquet] [--robots /path/to/robots.parquet] \
        [--budget 2] [--rounds 100] [--fixture-pages 400]

Without --pages, deterministic fixture pages/seeds/robots (seed=42) are
generated in-session — handy for smoke runs and benchmarks.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages")
    ap.add_argument("--seeds")
    ap.add_argument("--robots")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--budget", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--fixture-pages", type=int, default=400)
    ap.add_argument("--master", default=None)
    ap.add_argument("--format", choices=["auto", "parquet", "commitlog",
                                         "bucketed"],
                    default="auto",
                    help="checkpoint table format: auto (default) infers an "
                         "existing checkpoint's format from its commit "
                         "markers and uses parquet for a fresh one; "
                         "bucketed = parquet with frontier snapshots as "
                         "CLUSTERED BY (url) bucketed tables (exchange-free "
                         "MERGE-on-read)")
    ap.add_argument("--buckets", type=int, default=32,
                    help="bucket count for --format bucketed")
    args = ap.parse_args()

    from logtemplatecrawler_spark.session import build_session
    from logtemplatecrawler_spark.crawl.scheduler import CrawlConfig, run_crawl
    from logtemplatecrawler_spark.sources import fixtures
    from logtemplatecrawler_spark.sources.table_format import (
        BucketedParquetFormat,
        CommitLogFormat,
        ParquetManifestFormat,
        require_format,
    )

    spark = build_session("crawl", master=args.master)
    if args.pages:
        if not args.seeds:
            ap.error("--seeds is required when --pages is given "
                     "(a crawl over an external pages table needs its seed list)")
        pages = spark.read.parquet(args.pages)
        seeds = spark.read.parquet(args.seeds)
        robots = (
            spark.read.parquet(args.robots)
            if args.robots
            else spark.createDataFrame([], schema=fixtures.ROBOTS_DDL)
        )
    else:
        rows = fixtures.generate_pages(args.fixture_pages, seed=42)
        pages = fixtures.pages_df(spark, args.fixture_pages, seed=42)
        seeds = fixtures.seeds_df(spark, rows, seed=42)
        robots = fixtures.robots_df(spark, rows, seed=42)

    if args.format == "auto":
        # require_format raises on a non-empty unrecognizable checkpoint
        # instead of silently defaulting to a format that would misread it
        # (ADVICE r03); a genuinely fresh dir starts on parquet.
        fmt = require_format(args.checkpoint) or ParquetManifestFormat()
    elif args.format == "parquet":
        fmt = ParquetManifestFormat()
    elif args.format == "bucketed":
        fmt = BucketedParquetFormat(n_buckets=args.buckets)
    else:
        fmt = CommitLogFormat()
    cfg = CrawlConfig(
        checkpoint_dir=args.checkpoint,
        host_budget=args.budget,
        max_rounds=args.rounds,
        table_format=fmt,
    )
    metrics = run_crawl(spark, pages, seeds, robots, cfg)
    for m in metrics:
        print(json.dumps(m))
    total_popped = sum(m["popped"] for m in metrics)
    total_templates = sum(m["templates"] for m in metrics)
    total_elapsed = sum(m["elapsed_sec"] for m in metrics)
    print(json.dumps({
        "rounds": len(metrics),
        "total_popped": total_popped,
        "total_templates": total_templates,
        "total_elapsed_sec": round(total_elapsed, 3),
        "frontier_urls_per_sec": round(total_popped / total_elapsed, 2) if total_elapsed else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
