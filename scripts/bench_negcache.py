#!/usr/bin/env python
"""Negative-cache check microbench: the per-round committed-key check of a
small template batch against N cumulative keys.

Compares the r5 inverted formulation (crawl/scheduler.anti_join_committed:
broadcast semi-join probes — the big table streams, zero exchange) against
the r3-r4 direct anti-join-with-distinct (shuffles + hash-aggregates the
big side twice per round).  Standalone so it can run min-of-N quickly
without the full frontier suite.

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000,
                    help="cumulative committed keys")
    ap.add_argument("--batch", type=int, default=5_000,
                    help="round batch size (half already committed)")
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3,
                    help="interleaved passes; min is reported")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.crawl.scheduler import anti_join_committed
    from logtemplatecrawler_spark.session import build_session

    spark = build_session("bench_negcache", master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_negcache_")
    try:
        # generation, off the clock
        neg_path = os.path.join(work, "neg_keys")
        (spark.range(args.rows).select(
            F.concat(F.lit("tpl "), F.col("id").cast("string")).alias(
                "template"),
            F.concat(F.lit("ptpl "), F.col("id").cast("string")).alias(
                "parsed_template"),
        ).write.mode("overwrite").parquet(neg_path))
        neg = spark.read.parquet(neg_path)
        batch = spark.range(args.rows - args.batch // 2,
                            args.rows + args.batch // 2).select(
            F.concat(F.lit("tpl "), F.col("id").cast("string")).alias(
                "template"),
            F.concat(F.lit("ptpl "), F.col("id").cast("string")).alias(
                "parsed_template"),
            F.lit("raw text").alias("raw"),
        ).localCheckpoint()  # like the round loop's persisted UDF output
        neg.limit(8).count()  # warm readers off the clock

        def timed(make_df) -> float:
            t0 = time.monotonic()
            make_df().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0

        def direct():
            return (
                batch.join(neg.select("template").distinct(),
                           "template", "left_anti")
                .join(neg.select("parsed_template").distinct(),
                      "parsed_template", "left_anti")
            )

        inv_runs, dir_runs = [], []
        for _ in range(args.runs):  # interleaved min-of-N (BASELINE.md)
            inv_runs.append(timed(lambda: anti_join_committed(batch, neg)))
            dir_runs.append(timed(direct))

        n_surv = anti_join_committed(batch, neg).count()
        assert n_surv == args.batch // 2, (n_surv, args.batch)

        t_inv, t_dir = min(inv_runs), min(dir_runs)
        result = {
            "job": "neg_cache_check",
            "rows": args.rows,
            "batch": args.batch,
            "cores": args.cores,
            "runs": args.runs,
            "sec": {"inverted_r5": round(t_inv, 3),
                    "direct_r4": round(t_dir, 3)},
            "runs_inverted_sec": [round(t, 3) for t in inv_runs],
            "runs_direct_sec": [round(t, 3) for t in dir_runs],
            "speedup": round(t_dir / t_inv, 2),
            "neg_keys_per_sec_inverted": round(args.rows / t_inv, 1),
        }
        print(json.dumps(result))
        if args.out:
            with open(args.out, "w") as fh:
                json.dump(result, fh, indent=2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
