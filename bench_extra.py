#!/usr/bin/env python
"""Round-6 optimization instrumentation (bench.py is FROZEN for measurement).

Per-query isolation bench + physical-plan capture, per the optimization
guide §1: each query is timed alone via the noop sink (computation only,
no driver collect), jobs are labeled, and ``.explain("formatted")`` output
can be dumped to plans/r06/ for before/after evidence.

Usage:
  python bench_extra.py time  [query ...]      # min-of-N per-query seconds
  python bench_extra.py plan  [query ...]      # write plans/r06/<q>_<TAG>.txt
  python bench_extra.py both  [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), BENCH_EXTRA_RUNS (default 3), BENCH_EXTRA_TAG (plan file
suffix, default "before").  Timings print as one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
    tag = os.environ.get("BENCH_EXTRA_TAG", "before")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from logtemplatecrawler_spark.session import build_session
    from logtemplatecrawler_spark.plans import harness

    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or list(harness.QUERIES)

    spark = build_session("bench_extra", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    if mode in ("plan", "both"):
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = harness.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{tag}.txt", "w") as fh:
                fh.write(txt)
            print(f"plan: {name} -> plans/r06/{name}_{tag}.txt")

    if mode in ("time", "both"):
        timings: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(n_runs):
            for name in names:
                spark.sparkContext.setJobDescription(f"r06:{name}")
                t0 = time.monotonic()
                harness.QUERIES[name](spark, sf_dir).write.format(
                    "noop").mode("overwrite").save()
                timings[name].append(time.monotonic() - t0)
                spark.sparkContext.setJobDescription(None)
        out = {
            "sf_dir": sf_dir, "cpus": int(cpus), "runs": n_runs, "tag": tag,
            "queries_min": {n: round(min(v), 3) for n, v in timings.items()},
            "queries_all": {n: [round(x, 3) for x in v]
                            for n, v in timings.items()},
        }
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
