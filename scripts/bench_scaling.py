#!/usr/bin/env python
"""Two-parallelism-level scaling measurement (the north-rule criterion).

No real cluster exists in this sandbox, so N vs 4N executors is evidenced by
running the SAME job on the SAME input at local[N_CORES] and local[4*N_CORES]
in two fresh JVMs, reporting throughput at both plus scaling efficiency:

    efficiency = (T_small / T_big) / (cores_big / cores_small)

The measured job is the engine's real workload: the full template pipeline
(scan → native filters → Arrow UDFs → window dedup) over a parquet pages
corpus, executed via the noop sink.  JVM/session startup is excluded; each
level runs a warmup pass then `repeats` timed passes, keeping the best
(steady-state throughput, least noise).

Machine ceiling: this sandbox VM is a heavily time-shared guest — /proc/stat
shows ~20-25% CPU-steal during load, arriving in multi-second bursts, and
pure-CPU multiprocessing reaches only ~2.2-2.8× from 8→32 workers.  Two
mitigations make the measurement meaningful anyway:

* levels are run INTERLEAVED (small, big, small, big, …) and each level's
  time is the MINIMUM across repeats — the host-contention spikes hit both
  levels equally often and the min captures each level's uncontended
  capability;
* the box is calibrated with a multiprocessing burn at both worker counts;
  ``efficiency_vs_ceiling`` = job speedup / machine-achievable speedup is
  reported alongside the raw core-ratio efficiency.  On a real cluster the
  two coincide.

Usage: python scripts/bench_scaling.py [--pages 6000] [--small 8] [--big 32]
       [--repeats 3] [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from logtemplatecrawler_spark.session import build_session
from logtemplatecrawler_spark.plans.template_pipeline import extract_templates

spark = build_session("scaling", master="local[{cores}]", shuffle_partitions={cores})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages_path!r})

# warmup (JIT, Python worker pool spin-up) — off the clock
extract_templates(pages, dedup=True).write.format("noop").mode("overwrite").save()

times = []
for _ in range(2):
    t0 = time.monotonic()
    extract_templates(pages, dedup=True).write.format("noop").mode("overwrite").save()
    times.append(round(time.monotonic() - t0, 3))
n = pages.count()
print("RESULT " + json.dumps({{"cores": {cores}, "times": times, "pages": n}}))
spark.stop()
"""


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def calibrate(workers: int, n: int = 3_000_000, tasks_per_worker: int = 3) -> float:
    """Machine ceiling probe: wall seconds for workers×tasks_per_worker fixed
    CPU units on `workers` processes; returns work-units per second."""
    import multiprocessing as mp
    import time

    with mp.Pool(workers) as pool:
        t0 = time.monotonic()
        pool.map(_burn, [n] * (workers * tasks_per_worker))
        dt = time.monotonic() - t0
    return workers * tasks_per_worker / dt


def _run_child(repo: str, pages_path: str, cores: int) -> dict:
    code = _CHILD.format(repo=repo, cores=cores, pages_path=pages_path)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cores}]:\n{proc.stdout}\n{proc.stderr[-2000:]}")


def run_level_interleaved(repo: str, pages_path: str, small: int, big: int,
                          rounds: int) -> tuple:
    """Alternate small/big children; min over all samples per level."""
    samples = {small: [], big: []}
    pages = None
    for _ in range(rounds):
        for cores in (small, big):
            res = _run_child(repo, pages_path, cores)
            samples[cores].extend(res["times"])
            pages = res["pages"]

    def summarize(cores):
        best = min(samples[cores])
        return {
            "cores": cores, "sec": best, "samples": samples[cores],
            "pages": pages, "pages_per_sec": round(pages / best, 2),
        }

    return summarize(small), summarize(big)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=6000)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--big", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dense", action="store_true",
                    help="realistic-size source pages (8-16 functions × 3-6 "
                         "statements) instead of the small test pages — "
                         "raises per-page CPU so the parallel fraction "
                         "dominates per-job fixed costs")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    density = ((8, 16), (3, 6)) if args.dense else ((1, 3), (1, 4))
    tag = "dense_" if args.dense else ""
    pages_dir = os.path.join(tempfile.gettempdir(), f"scaling_pages_{tag}{args.pages}")
    pages_path = os.path.join(pages_dir, "pages")
    if not os.path.exists(pages_path):
        os.makedirs(pages_dir, exist_ok=True)
        if args.pages <= 120_000:
            from logtemplatecrawler_spark.sources.fixtures import write_pages_parquet
            write_pages_parquet(pages_path, args.pages, seed=42, n_files=64,
                                methods=density[0], stmts=density[1])
        else:
            # big corpora: synthesize in Spark (sources/distributed_fixtures)
            from logtemplatecrawler_spark.session import build_session
            from logtemplatecrawler_spark.sources.distributed_fixtures import (
                write_distributed_pages,
            )
            gen = build_session("genpages")
            gen.sparkContext.setLogLevel("ERROR")
            write_distributed_pages(gen, pages_path, args.pages, seed=42,
                                    methods=density[0], stmts=density[1])
            gen.stop()

    small, big = run_level_interleaved(repo, pages_path, args.small, args.big,
                                       args.repeats)
    core_ratio = args.big / args.small
    speedup = small["sec"] / big["sec"]
    cal_small = calibrate(args.small)
    cal_big = calibrate(args.big)
    ceiling = cal_big / cal_small
    result = {
        "job": "template_pipeline(noop sink)",
        "pages": args.pages,
        "small": small,
        "big": big,
        "speedup": round(speedup, 3),
        "core_ratio": core_ratio,
        "scaling_efficiency": round(speedup / core_ratio, 3),
        "machine_ceiling_speedup": round(ceiling, 3),
        "machine_cpu_units_per_sec": {
            str(args.small): round(cal_small, 1),
            str(args.big): round(cal_big, 1),
        },
        "efficiency_vs_ceiling": round(speedup / ceiling, 3),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
