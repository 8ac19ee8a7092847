#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_suite_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": <sf>, ...extras}

Headline set = the flagship template pipeline over a parquet pages corpus
(the engine's real workload: scan → native filters → Arrow UDFs → dedup),
one crawl scheduling round shape (politeness pop), and the heavy relational/
training-data operators from the harness registry.

Each query executes to completion via the noop sink (full pipeline, no
driver collect).  Extras report pages/sec and statements/sec for the
pipeline — the metrics BASELINE.md tracks.
"""

from __future__ import annotations

import json
import os
import time


def _ensure_bench_pages(spark, n_pages: int, path: str):
    marker = os.path.join(path, "_BUILT_V2")
    if not os.path.exists(marker):
        from logtemplatecrawler_spark.sources.fixtures import write_pages_parquet
        os.makedirs(path, exist_ok=True)
        # pyarrow writer (multi-file dir) — generation happens once, off the clock.
        write_pages_parquet(os.path.join(path, "pages"), n_pages, seed=42, n_files=32)
        with open(marker, "w") as fh:
            fh.write("ok")
    return spark.read.parquet(os.path.join(path, "pages"))


def _run_thunk(make_df) -> float:
    """Time plan CONSTRUCTION + execution — builders may materialize
    eagerly (localCheckpoint'd index tables), and that cost is part of the
    query."""
    t0 = time.monotonic()
    make_df().write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    n_pages = int(os.environ.get("BENCH_PAGES", "10000"))

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from logtemplatecrawler_spark.session import build_session
    from logtemplatecrawler_spark.plans.template_pipeline import extract_templates
    from logtemplatecrawler_spark.plans import harness
    from logtemplatecrawler_spark.crawl.politeness import pop_per_host
    from logtemplatecrawler_spark.functions.columns import url_host
    from pyspark.sql import functions as F

    spark = build_session("bench", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = os.environ.get("BENCH_PAGES_DIR", f"/tmp/bench_pages_{n_pages}")
    pages = _ensure_bench_pages(spark, n_pages, pages_path)

    # warm the JVM/Python workers off the clock
    pages.limit(8).count()

    # crawl pop shape: per-host politeness window over the page corpus
    frontier_like = pages.select(
        "url", url_host(F.col("url")).alias("host"),
        (F.xxhash64("url") % 1000).alias("priority"),
        F.pmod(F.xxhash64("url"), F.lit(8)).cast("int").alias("salt"),
    )
    # heavy relational / training-data operators at the sf dir (set kept
    # identical to r1-r3 for cross-round comparability; `value` sums these)
    headline = [
        "s10_export_union_sample",
        "a1_mode_majority_vote",
        "w1_politeness_queue",
        "dedup_exact_hash",
        "dedup_minhash_signatures",
        "dedup_lsh_candidate_pairs",
        "ann_cosine_topk",
        "text_quality_score",
        "mm_binary_meta",
    ]
    # r4 additions (VERDICT r03 item 8): the production-shaped dedup/ANN
    # entries join the suite; reported in `value_full_suite` alongside the
    # r1-r3-comparable `value` (see BASELINE.md "bench set versions")
    headline_v2_extra = [
        "dedup_lsh_pairs_tuned",
        "ann_ivf_search",
        "ann_lsh_bucket_search",
        "crawl_frontier_mor",
    ]
    # r5 additions (VERDICT r04 items 2-4): the composed dedup pipeline,
    # the engine politeness pop, and the multi-probe recall knobs; summed
    # into `value_r5_suite` so `value` (r1-r3 set) and `value_full_suite`
    # (r4 set) stay cross-round comparable.
    headline_v3_extra = [
        "dedup_lsh_cluster_canonical",
        "w1_politeness_pop_salted",
        "ann_lsh_multiprobe_search",
        "ann_ivf_search_nprobe2",
        "text_tfidf_topk",
        "dedup_repeated_ngram_spans",
    ]
    # r5 tail additions: the train->serve ANN path, the embedding- and
    # simhash-leg clustered dedups, and the end-to-end curation export.
    # Also summed into `value_r5_suite` (BASELINE.md records both the
    # 21-query and the current-definition totals).
    headline_v4_extra = [
        "ann_ivf_kmeans_refine",
        "ann_ivf_search_trained",
        "dedup_embedding_cosine_canonical",
        "dedup_simhash_hamming_pairs",
        "dedup_simhash_canonical",
        "curation_export_pipeline",
    ]
    # r5 wave-3 additions: IVF-PQ serving (codes + ADC), winnowing near-dup
    # pairs, and the engine seed-ingest/canonicalize path.  Summed ONLY into
    # `value_r5w3_suite` so `value`, `value_full_suite`, and the 27-query
    # `value_r5_suite` all stay cross-round comparable.
    headline_v5_extra = [
        "ann_ivfpq_search",
        "dedup_winnow_pairs",
        "crawl_seed_ingest_canonicalize",
        "crawl_discover_outlinks",
        "crawl_frontier_pending_view",
        "stream_windowed_metrics_drain",
        "s3_fetch_join_size_gate",
        "w2_politeness_pacing_rounds",
        "curation_decontaminate_ngram",
        "stream_content_dedup_drain",
    ]

    # r5 wave-5 additions: LM quality scoring, full-table semantic dedup
    # (SemDeDup shape), lexicon scrubbing, sequence packing, split
    # assignment.  Summed ONLY into `value_r5w5_suite`; all earlier suite
    # definitions stay cross-round comparable.
    headline_v6_extra = [
        "text_lm_bigram_score",
        "dedup_semantic_clustered_canonical",
        "text_pii_scrub",
        "curation_pack_sequences",
        "curation_split_assign",
        "text_repetition_stats",
        "curation_domain_mix_sample",
    ]

    # r5 wave-6 additions: the host-graph iterative operators (fixed-point
    # PageRank crawl prioritization, delta-frontier BFS depth).  Summed
    # ONLY into `value_r5w6_suite`; every earlier suite definition stays
    # cross-round comparable.
    headline_v7_extra = [
        "crawl_host_rank",
        "crawl_bfs_depth",
        "crawl_pop_by_host_rank",
    ]

    def one_pass():
        t = {}
        t["template_pipeline"] = _run_thunk(lambda: extract_templates(pages, dedup=True))
        t["politeness_pop"] = _run_thunk(lambda: pop_per_host(frontier_like, budget=2))
        for name in (headline + headline_v2_extra + headline_v3_extra
                     + headline_v4_extra + headline_v5_extra
                     + headline_v6_extra + headline_v7_extra):
            # construct INSIDE the timed region: query builders may
            # materialize eagerly (localCheckpoint'd index/signature
            # tables), and excluding that would silently flatter the
            # per-query number vs earlier rounds
            t[name] = _run_thunk(lambda n=name: harness.QUERIES[n](spark, sf_dir))
        old_set = ["template_pipeline", "politeness_pop"] + headline
        v2_set = old_set + headline_v2_extra
        r5_set = v2_set + headline_v3_extra + headline_v4_extra
        r5w3_set = r5_set + headline_v5_extra
        r5w5_set = r5w3_set + headline_v6_extra
        return (t, sum(t[k] for k in old_set), sum(t[k] for k in v2_set),
                sum(t[k] for k in r5_set), sum(t[k] for k in r5w3_set),
                sum(t[k] for k in r5w5_set), sum(t.values()))

    # Min-of-N: this VM's CPU steal arrives in multi-second bursts that
    # evade /proc/stat (BASELINE.md), so a single-pass number is a coin
    # flip; the min over interleaved passes is the honest estimator and
    # matches how BASELINE.md's quiet-window records are produced
    # (VERDICT r02 item 8 — compare like with like).
    n_runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    runs = []
    runs_full = []
    runs_r5 = []
    runs_r5w3 = []
    runs_r5w5 = []
    runs_r5w6 = []
    per_query = []
    for _ in range(n_runs):
        t, tot_old, tot_full, tot_r5, tot_r5w3, tot_r5w5, tot_r5w6 = one_pass()
        per_query.append(t)
        runs.append(tot_old)
        runs_full.append(tot_full)
        runs_r5.append(tot_r5)
        runs_r5w3.append(tot_r5w3)
        runs_r5w5.append(tot_r5w5)
        runs_r5w6.append(tot_r5w6)
    timings = {k: min(t[k] for t in per_query) for k in per_query[0]}
    total = min(runs)

    # pipeline throughput extras
    n_stmt = extract_templates(pages, dedup=False).count()
    out = {
        "metric": "headline_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "value_full_suite": round(min(runs_full), 3),
        "value_r5_suite": round(min(runs_r5), 3),
        "value_r5w3_suite": round(min(runs_r5w3), 3),
        "value_r5w5_suite": round(min(runs_r5w5), 3),
        "value_r5w6_suite": round(min(runs_r5w6), 3),
        "runs_sec": [round(r, 3) for r in runs],
        "runs_full_sec": [round(r, 3) for r in runs_full],
        "runs_r5_sec": [round(r, 3) for r in runs_r5],
        "runs_r5w3_sec": [round(r, 3) for r in runs_r5w3],
        "runs_r5w5_sec": [round(r, 3) for r in runs_r5w5],
        "runs_r5w6_sec": [round(r, 3) for r in runs_r5w6],
        "sf": sf,
        "bench_pages": n_pages,
        "pages_per_sec": round(n_pages / timings["template_pipeline"], 2),
        "statements_parsed": n_stmt,
        "statements_per_sec": round(n_stmt / timings["template_pipeline"], 2),
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
