#!/usr/bin/env python
"""spark-submit entry point: one-shot template extraction (no frontier).

    spark-submit --py-files pkg.zip scripts/run_pipeline.py \
        --pages /path/to/pages_parquet --out /path/to/templates \
        [--no-dedup] [--master local[32]]

Equivalent of the reference's batch extract-and-parse DAG (EP3) over a whole
pages table at once.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from logtemplatecrawler_spark.session import build_session
    from logtemplatecrawler_spark.plans.template_pipeline import extract_templates

    spark = build_session("pipeline", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.pages)
    t0 = time.monotonic()
    out = extract_templates(pages, dedup=not args.no_dedup)
    out.write.mode("overwrite").parquet(args.out)
    elapsed = time.monotonic() - t0
    n_pages = pages.count()
    n_templates = spark.read.parquet(args.out).count()
    print(json.dumps({
        "pages": n_pages,
        "templates": n_templates,
        "elapsed_sec": round(elapsed, 3),
        "pages_per_sec": round(n_pages / elapsed, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
