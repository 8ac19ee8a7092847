"""Machine-checked physical-plan shapes for the scale claims in docs/SCALE.md.

Each test pins a claim the docs make about what Catalyst actually emits —
column pruning at the scan, native filters ahead of the opaque Python
stages, broadcast on the small join side, map-side window group limits, and
the bucketed-frontier join needing only ONE exchange (the candidate side).
A plan regression (e.g. a refactor that moves a filter behind a UDF, or a
projection that drags ``html`` through the scan) fails here long before it
shows up as a 100 TB bill.
"""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from logtemplatecrawler_spark.crawl.frontier import with_frontier_keys
from logtemplatecrawler_spark.crawl.politeness import pop_per_host
from logtemplatecrawler_spark.crawl.robots import with_robots_blocked
from logtemplatecrawler_spark.plans.template_pipeline import extract_templates
from logtemplatecrawler_spark.sources.fixtures import write_pages_parquet


def _explain(df, mode="simple"):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scale_plans") / "pages")
    write_pages_parquet(path, 60, seed=11)
    return path


def test_scan_prunes_html(spark, pages_parquet):
    """docs/SCALE.md: ``html`` is projected away at the first select, so the
    parquet ReadSchema must not contain it (html is the biggest column — at
    100 TB reading it would double the scan)."""
    plan = _explain(
        extract_templates(spark.read.parquet(pages_parquet)), "formatted"
    )
    read_schemas = re.findall(r"ReadSchema: (.+)", plan)
    assert read_schemas, plan
    for rs in read_schemas:
        assert "html" not in rs, rs
        assert "warc_ts" not in rs, rs


def test_native_filters_precede_python_stages(spark, pages_parquet):
    """The rlike detect filter must sit BELOW (deeper than, i.e. executed
    before) the first ArrowEvalPython stage — Catalyst does not reorder
    predicates through opaque UDFs, so the declared order is physical."""
    plan = _explain(
        extract_templates(spark.read.parquet(pages_parquet)), "simple"
    )
    lines = plan.splitlines()
    arrow_idx = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    # the detect filter runs on the raw `text` column; the statement
    # pre-filter (F6, also rlike) legitimately sits between the two Python
    # stages because it filters the *extracted* raws
    detect_idx = [
        i for i, l in enumerate(lines) if "Filter" in l and "RLIKE(text" in l
    ]
    assert arrow_idx and detect_idx, plan
    # simple-mode explain prints parents first: deeper = executed earlier =
    # LARGER line index.  The detect filter must be deeper than every
    # Python stage.
    assert min(detect_idx) > max(arrow_idx), plan
    # exactly two fused Python stages (extract; parse+formalize) — a third
    # means a UDF stage stopped fusing
    assert len(arrow_idx) == 2, plan


def test_dedup_uses_window_group_limit(spark, pages_parquet):
    """The keep-first dedup (row_number == 1) must compile to
    WindowGroupLimit — the map-side top-1 prune that keeps the only wide
    stage from shuffling every row of every group."""
    plan = _explain(
        extract_templates(spark.read.parquet(pages_parquet)), "simple"
    )
    assert "WindowGroupLimit" in plan, plan


def test_politeness_pop_uses_window_group_limit(spark):
    """Both phases of the salted pop (local top-k per (host,salt), global
    top-k per host) must compile to WindowGroupLimit so each task sorts at
    most its slice's budget survivors."""
    pending = with_frontier_keys(
        spark.range(1000).select(
            F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                     F.lit(".example.org/p/"), "id").alias("url")
        )
    ).withColumn("priority", F.lit(1))
    plan = _explain(pop_per_host(pending, budget=3), "simple")
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_robots_gate_shuffle_fallback(spark):
    """VERDICT r03 item 5: host lists too big to broadcast take a shuffle
    join; the fallback must plan without a broadcast AND produce identical
    results to the broadcast path."""
    frontier = with_frontier_keys(
        spark.range(1000).select(
            F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                     F.lit(".example.org/p/"), "id").alias("url")
        )
    )
    robots = spark.createDataFrame(
        [("h1.example.org", "/private"), ("h2.example.org", "/"),
         ("h3.example.org", "/p")],
        "host string, disallow_prefix string",
    )
    shuffled = with_robots_blocked(frontier, robots, broadcast=False)
    plan = _explain(shuffled, "simple")
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    got = {(r["url"], r["robots_blocked"]) for r in shuffled.collect()}
    want = {(r["url"], r["robots_blocked"])
            for r in with_robots_blocked(frontier, robots, broadcast=True).collect()}
    assert got == want
    assert any(b for _, b in got)  # the gate actually blocks something


def test_robots_broadcast_decision_is_byte_sized(spark):
    """ADVICE r04: Spark's broadcast cap is in BYTES — a few hosts carrying
    thousands of long Disallow rules must fall back to the shuffle join
    even though the row count is tiny, while a genuinely small table still
    broadcasts."""
    from logtemplatecrawler_spark.crawl.robots import (
        broadcast_fits, robots_prefixes,
    )

    fat = spark.range(4).select(
        F.concat(F.lit("h"), "id", F.lit(".example.org")).alias("host"),
        F.explode(
            F.expr("transform(sequence(1, 2000), i ->"
                   " concat('/very/long/disallowed/path/prefix/', i))")
        ).alias("disallow_prefix"),
    )
    # 4 hosts × 2000 × ~40-byte prefixes ≈ 320 KiB of strings + overhead
    assert not broadcast_fits(robots_prefixes(fat), byte_budget=100_000)
    assert broadcast_fits(robots_prefixes(fat))  # default budget: fine
    slim = spark.createDataFrame(
        [("h1.example.org", "/private")], "host string, disallow_prefix string"
    )
    assert broadcast_fits(robots_prefixes(slim), byte_budget=100_000)
    # row-count cap still applies independently of bytes
    assert not broadcast_fits(robots_prefixes(fat), max_hosts=2)


def test_seed_rank_has_no_single_partition_stage(spark):
    """VERDICT r03 item 2: the seed-ranking cursor must not funnel the whole
    seed list through one task — no global Window, no SinglePartition
    exchange; the only wide op is the range partitioning."""
    from logtemplatecrawler_spark.crawl.frontier import frontier_from_seeds
    from logtemplatecrawler_spark.crawl.scheduler import with_seed_rank

    seeds = spark.range(5_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 11).cast("string"),
                 F.lit(".example.org/s/"), "id").alias("url"),
        (F.col("id") % 7).cast("int").alias("priority"),
    )
    ranked, total, cache = with_seed_rank(spark, frontier_from_seeds(seeds))
    try:
        plan = _explain(ranked, "simple")
        assert "SinglePartition" not in plan, plan
        assert "Window" not in plan, plan
        assert "rangepartitioning" in plan, plan
        assert total == 5_000
    finally:
        cache.unpersist()


def test_robots_gate_broadcasts(spark):
    """The per-host prefix table joins as a broadcast — the frontier side
    must not shuffle for the robots gate."""
    frontier = with_frontier_keys(
        spark.range(1000).select(
            F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                     F.lit(".example.org/p/"), "id").alias("url")
        )
    )
    robots = spark.createDataFrame(
        [("h1.example.org", "/private"), ("h2.example.org", "/")],
        "host string, disallow_prefix string",
    )
    plan = _explain(with_robots_blocked(frontier, robots), "simple")
    assert "BroadcastHashJoin" in plan, plan
    # no SortMergeJoin / ShuffledHashJoin anywhere in the gate
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_mor_reconstruction_base_side_no_exchange(spark, tmp_path):
    """VERDICT r03 item 1: ``load_frontier``'s MERGE-on-read must not
    hash-exchange the full frontier.  Over a BucketedParquetFormat snapshot
    the anti-join's base side compiles exchange-free (one fewer Exchange
    than the plain-parquet plan of the identical merge); with the small
    delta side broadcastable, the base never shuffles at all."""
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.crawl.scheduler import merge_on_read
    from logtemplatecrawler_spark.sources.table_format import (
        BucketedParquetFormat,
    )

    front = (
        with_frontier_keys(
            spark.range(20_000).select(
                F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                         F.lit(".example.org/p/"), "id").alias("url")
            )
        )
        .withColumn("priority", F.lit(1))
        .withColumn("depth", F.lit(0))
        .withColumn("state", F.lit("pending"))
        .withColumn("round_added", F.lit(0))
        .withColumn("updated_round", F.lit(0))
        .drop("id")
    )
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fmt = BucketedParquetFormat(n_buckets=n_buckets)
    path = str(tmp_path / "frontier_snap")
    fmt.write_snapshot(front, path)
    base_bucketed = fmt.read_snapshot(spark, path)
    base_plain = spark.read.parquet(path)
    deltas = (
        front.where(F.pmod(F.xxhash64("url"), F.lit(50)) == 0)
        .withColumn("state", F.lit("done"))
        .withColumn("updated_round", F.lit(1))
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = _explain(merge_on_read(base_plain, deltas), "simple")
        bucketed = _explain(merge_on_read(base_bucketed, deltas), "simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "Bucketed: true" in bucketed, bucketed
    assert plain.count("Exchange") - bucketed.count("Exchange") == 1, (
        plain, bucketed,
    )
    # with broadcast on (the common case: deltas ≤ compact_every × touched
    # rows), the base side never shuffles regardless of layout
    broadcasted = _explain(merge_on_read(base_plain, deltas), "simple")
    assert "BroadcastHashJoin" in broadcasted, broadcasted
    # merged result is the keep-latest merge (sanity, not just plan shape)
    merged = merge_on_read(base_bucketed, deltas)
    assert merged.count() == 20_000
    assert merged.where(F.col("state") == "done").count() == deltas.count()


def test_pending_view_skips_main_snapshot(spark, tmp_path):
    """VERDICT r04 item 1 done-criterion: the pending view's INPUT FILES
    come only from the pending-only sidecar + delta partitions — the
    mostly-done main snapshot contributes zero files to the per-round
    pending read (bucketed-by-url files can't row-group-skip on state, so
    at 10^10 rows the old ``where(state='pending')`` re-read everything)."""
    from logtemplatecrawler_spark.crawl.scheduler import (
        CrawlConfig,
        _frontier_delta_dir,
        load_frontier,
        load_frontier_pending,
        write_frontier_snapshots,
    )
    from logtemplatecrawler_spark.sources.table_format import (
        BucketedParquetFormat,
    )

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cfg = CrawlConfig(
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_format=BucketedParquetFormat(n_buckets=n_buckets),
    )
    front = (
        with_frontier_keys(
            spark.range(20_000).select(
                F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                         F.lit(".example.org/p/"), "id").alias("url")
            )
        )
        .withColumn("priority", F.lit(1))
        .withColumn("depth", F.lit(0))
        # 95% done at the base snapshot — the design-point shape
        .withColumn("state", F.when(F.pmod(F.xxhash64("url"), F.lit(20)) == 0,
                                    F.lit("pending")).otherwise(F.lit("done")))
        .withColumn("round_added", F.lit(0))
        .withColumn("updated_round", F.lit(0))
        .drop("id")
    )
    write_frontier_snapshots(spark, cfg, front, 0)
    # round 1 delta: half the pending rows transition, plus new admissions
    flips = (
        front.where((F.col("state") == "pending")
                    & (F.pmod(F.xxhash64("url"), F.lit(2)) == 0))
        .withColumn("state", F.lit("done"))
        .withColumn("updated_round", F.lit(1))
    )
    admits = (
        with_frontier_keys(
            spark.range(300).select(
                F.concat(F.lit("https://new.example.org/p/"), "id").alias("url")
            )
        )
        .withColumn("priority", F.lit(0))
        .withColumn("depth", F.lit(1))
        .withColumn("state", F.lit("pending"))
        .withColumn("round_added", F.lit(1))
        .withColumn("updated_round", F.lit(1))
        .drop("id")
    )
    cfg.table_format.write_delta(
        flips.unionByName(admits), _frontier_delta_dir(cfg), 1
    )
    pend = load_frontier_pending(spark, cfg, 1)
    files = pend.inputFiles()
    assert files
    assert any("/frontier_pending/" in f for f in files), files
    assert not any("/frontier/" in f for f in files), files
    # and the pruned view equals the full-scan filter exactly
    got = {(r["url"], r["updated_round"]) for r in pend.collect()}
    want = {(r["url"], r["updated_round"])
            for r in load_frontier(spark, cfg, 1).collect()
            if r["state"] == "pending"}
    assert got == want and len(got) > 0


def test_bucketed_frontier_join_is_one_sided(spark, tmp_path):
    """docs/SCALE.md: at warehouse scale the frontier is bucketed by
    ``url_hash`` so the seen anti-join / fetch join exchanges only the small
    candidate side.  Demonstrated here over a native bucketed table: the
    bucketed join plan must contain exactly one fewer Exchange than the
    unbucketed plan of the same join."""
    frontier = spark.range(20_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        (F.col("id") % 5).alias("state"),
    )
    cands = spark.range(700).select(
        F.xxhash64((F.col("id") * 3).cast("string")).alias("url_hash")
    )
    spark.sql("DROP TABLE IF EXISTS frontier_bucketed")
    (
        frontier.write.mode("overwrite")
        .option("path", str(tmp_path / "frontier_bucketed"))
        .bucketBy(8, "url_hash")
        .sortBy("url_hash")
        .saveAsTable("frontier_bucketed")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = _explain(cands.join(frontier, "url_hash", "left_anti"), "simple")
        bucketed = _explain(
            cands.join(spark.table("frontier_bucketed"), "url_hash", "left_anti"),
            "simple",
        )
        assert plain.count("Exchange") - bucketed.count("Exchange") == 1, (
            plain, bucketed,
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS frontier_bucketed")


def test_neg_cache_check_never_shuffles_committed_keys(spark, tmp_path):
    """r5: ``anti_join_committed`` must stream the cumulative committed-key
    table through broadcast probes — no SortMergeJoin, no hash-distinct of
    the big side.  With auto-broadcast disabled (so only the EXPLICIT hints
    can produce broadcasts) the plan holds four BroadcastHashJoins (semi +
    anti per key) and strictly fewer Exchanges than the direct
    anti-join-with-distinct formulation it replaces; and on overlapping
    data the two formulations agree row-for-row."""
    from logtemplatecrawler_spark.crawl.scheduler import anti_join_committed

    neg = spark.range(50_000).select(
        F.concat(F.lit("tpl "), F.col("id").cast("string")).alias("template"),
        F.concat(F.lit("ptpl "), F.col("id").cast("string")).alias(
            "parsed_template"
        ),
    )
    path = str(tmp_path / "neg_keys")
    neg.write.parquet(path)
    neg = spark.read.parquet(path)
    # batch overlaps neg on template for ids 49_990-49_999 and on
    # parsed_template (ids shifted by -10) for ids ≤ 50_009 — both
    # constraints bind; 30 rows survive
    batch = spark.range(49_990, 50_040).select(
        F.concat(F.lit("tpl "), F.col("id").cast("string")).alias("template"),
        F.concat(F.lit("ptpl "), (F.col("id") - 10).cast("string")).alias(
            "parsed_template"
        ),
        F.lit("raw").alias("raw"),
    )
    old = batch.join(
        neg.select("template").distinct(), "template", "left_anti"
    ).join(
        neg.select("parsed_template").distinct(), "parsed_template", "left_anti"
    )
    new = anti_join_committed(batch, neg)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        old_plan = _explain(old, "simple")
        new_plan = _explain(new, "simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" not in new_plan, new_plan
    assert new_plan.count("BroadcastHashJoin") == 4, new_plan
    # the ONLY shuffles are the two distincts over the small batch; the old
    # formulation also shuffles the committed-key table (distinct + SMJ)
    new_shuffles = new_plan.count("Exchange hashpartitioning")
    old_shuffles = old_plan.count("Exchange hashpartitioning")
    assert new_shuffles == 2, new_plan
    assert new_shuffles < old_shuffles, (old_plan, new_plan)
    # semantic equivalence: ids 49_990-49_999 conflict on template, ids
    # 49_990-50_009 (parsed ids ≤ 49_999) on parsed_template → 30 survivors
    got = sorted(r["template"] for r in new.collect())
    want = sorted(r["template"] for r in old.collect())
    assert got == want and len(got) == 30, (len(got), got[:5])
    # bounded broadcast: a batch too large to hash-relation must fall back
    # to the direct shuffled anti-join (same robots-gate discipline) and
    # still agree row-for-row
    fb = anti_join_committed(batch, neg, n_batch=50, max_broadcast_keys=10)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fb_plan = _explain(fb, "simple")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastHashJoin" not in fb_plan, fb_plan
    assert sorted(r["template"] for r in fb.collect()) == want


def test_training_ops_plan_shapes(spark):
    """r5 training-data entries keep their scale shapes: the TF-IDF top-k
    window group-limits map-side (no full sort per doc), its corpus-size
    scalar joins as a broadcast (never a CartesianProduct), and the
    repeated-ngram span scorer is aggregation-only — no pairwise joins."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    sf = "/root/testdata/sf0.001"
    tfidf = _explain(QUERIES["text_tfidf_topk"](spark, sf), "simple")
    assert "WindowGroupLimit" in tfidf, tfidf
    assert "CartesianProduct" not in tfidf, tfidf
    spans = _explain(QUERIES["dedup_repeated_ngram_spans"](spark, sf), "simple")
    assert "CartesianProduct" not in spans, spans
    assert "BroadcastNestedLoopJoin" not in spans, spans


def test_kmeans_refine_broadcasts_centroids(spark):
    """`ann_ivf_kmeans_refine`'s two assignment half-iterations each join
    the long-form vectors against a ≤ k·dims centroid table — both must
    compile as BroadcastHashJoins (the centroid side is tiny by
    construction), and nothing in the plan may fall back to a cartesian or
    nested-loop product."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    plan = _explain(
        QUERIES["ann_ivf_kmeans_refine"](spark, "/root/testdata/sf0.001"),
        "simple",
    )
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_simhash_pairs_plan_shape(spark):
    """`dedup_simhash_hamming_pairs` must generate candidates by band-key
    EQUI-joins (hash or sort-merge on the shifted band key), never a
    cartesian or nested-loop product, and the signature table feeding all
    four band joins plus the verify must be the one materialized scan
    (localCheckpoint), not four recomputations of the explode+agg tree."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    df = QUERIES["dedup_simhash_hamming_pairs"](spark, "/root/testdata/sf0.001")
    plan = _explain(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # 4 band joins + 2 verify joins, all equi-joins over the checkpointed
    # signatures: the explode/agg pipeline (posexplode of the text split)
    # must not appear in the final plan at all.
    assert plan.count("Scan ExistingRDD") >= 1, plan
    assert "Generate" not in plan, plan


def test_lsh_capped_plan_shape(spark):
    """`dedup_lsh_pairs_capped`: the bucket-count guard must be a window
    over the band key (no second scan-and-join of the signature table per
    band in the Spark plan) and candidates must come from equi-joins —
    never a cartesian or nested-loop product."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    plan = _explain(
        QUERIES["dedup_lsh_pairs_capped"](spark, "/root/testdata/sf0.001"),
        "simple",
    )
    assert "Window" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivfpq_plan_shape(spark):
    """`ann_ivfpq_search`: the codebook joins (encode + coarse assign +
    LUT build) and the 64-row LUT join against the codes must all compile
    as broadcast equi-joins — never a cartesian or nested-loop product;
    the ADC scan touches only (vec_id, m, code) rows."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    plan = _explain(
        QUERIES["ann_ivfpq_search"](spark, "/root/testdata/sf0.001"), "simple"
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_winnow_plan_shapes(spark):
    """`text_winnow_fingerprint` is ONE window pass — no join anywhere in
    its plan (the scale property: fingerprint selection is per-document,
    embarrassingly parallel).  The pairs entry joins only by fingerprint
    equality — no cartesian/nested-loop fallback."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    fp_plan = _explain(
        QUERIES["text_winnow_fingerprint"](spark, "/root/testdata/sf0.001"),
        "simple",
    )
    assert "Window" in fp_plan, fp_plan
    assert "Join" not in fp_plan, fp_plan
    pairs_plan = _explain(
        QUERIES["dedup_winnow_pairs"](spark, "/root/testdata/sf0.001"), "simple"
    )
    assert "CartesianProduct" not in pairs_plan, pairs_plan
    assert "BroadcastNestedLoopJoin" not in pairs_plan, pairs_plan


def test_wave5_curation_plan_shapes(spark):
    """Wave-5 entries keep the shapes their docstrings claim: scrub and
    split are shuffle-free per-row expressions; packing's only exchange is
    the shard hash partitioning (no single-partition window); the LM
    scorer's count-table joins all broadcast; and the semantic dedup's
    within-cell pair join is an equi-join, never a cartesian/nested-loop
    product."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("text_pii_scrub", "curation_split_assign"):
        plan = _explain(QUERIES[name](spark, sf), "simple")
        # r6: the only allowed exchange is `_t`'s scan spread (the
        # single-row-group fixture files cap scans at one task; the
        # repartition fires only below defaultParallelism, so at warehouse
        # scale these stay shuffle-free per-row expressions)
        n_exchanges = plan.count("Exchange")
        n_spread = plan.count("REPARTITION_BY_NUM")
        assert n_exchanges == n_spread, (name, plan)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
            name, plan,
        )

    pack = _explain(QUERIES["curation_pack_sequences"](spark, sf), "simple")
    assert "SinglePartition" not in pack, pack
    assert "hashpartitioning(shard" in pack, pack

    lm = _explain(QUERIES["text_lm_bigram_score"](spark, sf), "simple")
    # bigram + two unigram roles + the corpus-total scalar = 4 broadcasts
    assert lm.count("BroadcastHashJoin") >= 3, lm
    assert "CartesianProduct" not in lm, lm
    # the lag window must partition by doc_id — never a global window (the
    # only single-partition exchange allowed is the one-row corpus total)
    assert "hashpartitioning(doc_id" in lm, lm

    sem = _explain(QUERIES["dedup_semantic_clustered_canonical"](spark, sf),
                   "simple")
    assert "CartesianProduct" not in sem, sem
    assert "BroadcastNestedLoopJoin" not in sem, sem


def test_wave5_tail_plan_shapes(spark):
    """`text_repetition_stats` is pure per-doc aggregation (no cartesian,
    no Python stages); `curation_domain_mix_sample` windows BY LANG (never
    a global window) and takes the quota as a broadcast."""
    from logtemplatecrawler_spark.plans.harness import QUERIES

    sf = "/root/testdata/sf0.001"
    rep = _explain(QUERIES["text_repetition_stats"](spark, sf), "simple")
    assert "CartesianProduct" not in rep, rep
    assert "ArrowEvalPython" not in rep and "BatchEvalPython" not in rep, rep

    mix = _explain(QUERIES["curation_domain_mix_sample"](spark, sf), "simple")
    assert "hashpartitioning(lang" in mix, mix
    assert "CartesianProduct" not in mix, mix
    assert "BroadcastNestedLoopJoin" in mix or "BroadcastExchange" in mix, mix


def test_wave6_graph_plan_shapes(spark):
    """`crawl_host_rank` (fixed-point PageRank) must broadcast the
    host-sized tables (ranks/outdeg/contrib) onto the edge table — one
    BroadcastHashJoin per iteration on the edges side plus the nodes-side
    rank rebuild — and never emit a cartesian product (the only
    nested-loop joins allowed are the 1-row dangling-mass / node-count
    scalars).  `crawl_bfs_depth`'s per-round expansion joins the frontier
    broadcast against edges and anti-joins the visited set without a
    shuffle on the broadcast side."""
    from logtemplatecrawler_spark.plans.harness import (
        QUERIES, _host_rank_edges, _PR_ITERS,
    )

    sf = "/root/testdata/sf0.001"
    pr = _explain(QUERIES["crawl_host_rank"](spark, sf), "simple")
    assert "CartesianProduct" not in pr, pr
    # edges⋈contrib and nodes⋈inc both broadcast.  r6: iterations before
    # the last are eagerly checkpointed (constant-depth plan — without it
    # the plan embeds each previous round twice and grows ~3^iters), so
    # the returned frame's plan shows the LAST iteration's join shape;
    # earlier rounds ran the same plan at checkpoint time.
    assert pr.count("BroadcastHashJoin") >= 2, pr

    # one BFS expansion round, built from the same graph helpers
    edges = _host_rank_edges(spark, sf)
    frontier = (
        edges.select(F.col("src").alias("host"))
        .distinct()
        .where(F.col("host") % 10 == 0)
        .select("host", F.lit(0).cast("bigint").alias("depth"))
    )
    new = (
        edges.join(F.broadcast(frontier), edges["src"] == frontier["host"])
        .select(F.col("dst").alias("host"),
                (F.col("depth") + 1).cast("bigint").alias("depth"))
        .groupBy("host").agg(F.min("depth").alias("depth"))
        .join(F.broadcast(frontier.select("host")), "host", "left_anti")
    )
    plan = _explain(new, "simple")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
