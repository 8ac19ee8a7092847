"""Crawl scheduler invariants: ordering, URL-seen set, resume, robots, bloom.

The oracle is a sequential pure-Python simulator implementing the documented
round semantics (same seed list, same politeness budget — the north-rule
comparison contract).
"""

import os
import re
from collections import defaultdict

import pytest

from logtemplatecrawler_spark.core.pipeline import dedup_rows, process_page
from logtemplatecrawler_spark.crawl.frontier import canonicalize_url_py
from logtemplatecrawler_spark.crawl.scheduler import (
    OUTLINK_RE,
    CrawlConfig,
    last_complete_round,
    load_frontier,
    load_frontier_pending,
    read_all_templates,
    run_crawl,
)
from logtemplatecrawler_spark.crawl.seen import HashBloom
from logtemplatecrawler_spark.sources.fixtures import (
    generate_pages,
    generate_robots,
    generate_seeds,
    pages_df,
    robots_df,
    seeds_df,
)

N_PAGES = 150
BUDGET = 2
MAX_ROUNDS = 12


def oracle_crawl(pages, seeds, robots, budget=BUDGET, max_rounds=MAX_ROUNDS,
                 min_page_bytes=255, seeds_per_round=None):
    """Sequential simulator of the documented round semantics."""
    page_by_url = {canonicalize_url_py(p["url"]): p for p in pages}
    robots_by_host = defaultdict(list)
    for r in robots:
        robots_by_host[r["host"]].append(r["disallow_prefix"])

    # collapse duplicate seed urls to max priority, then rank them
    seed_prio = {}
    for s in seeds:
        u = canonicalize_url_py(s["url"])
        seed_prio[u] = max(seed_prio.get(u, -1), s["priority"])
    ranked_seeds = sorted(seed_prio.items(), key=lambda kv: (-kv[1], kv[0]))

    frontier = {}  # url -> dict(priority, state, depth)

    def admit_seeds(lo, hi):
        for u, prio in ranked_seeds[lo:hi]:
            if u not in frontier:
                frontier[u] = {"priority": prio, "state": "pending", "depth": 0}

    if seeds_per_round is None:
        admit_seeds(0, len(ranked_seeds))
    else:
        admit_seeds(0, seeds_per_round)

    seen_template, seen_parsed = set(), set()
    pop_order = []          # [(round, url)]
    all_templates = []
    link_re = re.compile(OUTLINK_RE)

    for rnd in range(max_rounds):
        if seeds_per_round is not None and rnd > 0:
            admit_seeds(rnd * seeds_per_round, (rnd + 1) * seeds_per_round)
        seeds_remain = (
            seeds_per_round is not None
            and (rnd + 1) * seeds_per_round < len(ranked_seeds)
        )
        pending = [u for u, v in frontier.items() if v["state"] == "pending"]
        blocked, eligible = [], []
        for u in pending:
            host = u.split("/")[2]
            path = "/" + u.split("/", 3)[3] if u.count("/") >= 3 else "/"
            if any(path.startswith(p) for p in robots_by_host.get(host, [])):
                blocked.append(u)
            else:
                eligible.append(u)
        by_host = defaultdict(list)
        for u in eligible:
            by_host[u.split("/")[2]].append(u)
        popped = []
        for host, urls in by_host.items():
            urls.sort(key=lambda u: (-frontier[u]["priority"], u))
            popped.extend(urls[:budget])
        if not popped and not blocked and not seeds_remain:
            break
        for u in blocked:
            frontier[u]["state"] = "blocked"

        round_rows = []
        fetched_pages = []
        for u in popped:
            page = page_by_url.get(u)
            if page is None:
                frontier[u]["state"] = "missing"
            elif len(page["html"]) <= min_page_bytes:
                frontier[u]["state"] = "too_small"
            else:
                frontier[u]["state"] = "done"
                fetched_pages.append(page)
                round_rows.extend(process_page(u, page["text"], page["lang"]))
        round_rows = dedup_rows(round_rows)
        kept = []
        for r in round_rows:
            if r["template"] in seen_template or r["parsed_template"] in seen_parsed:
                continue
            kept.append(r)
        for r in kept:
            seen_template.add(r["template"])
            seen_parsed.add(r["parsed_template"])
            r["round"] = rnd
        all_templates.extend(kept)

        for page in fetched_pages:
            for link in link_re.findall(page["text"]):
                u = canonicalize_url_py(link)
                if u not in frontier:
                    frontier[u] = {"priority": 0, "state": "pending", "depth": rnd + 1}
        pop_order.extend((rnd, u) for u in sorted(popped))
        if not any(v["state"] == "pending" for v in frontier.values()) and not seeds_remain:
            break
    return frontier, pop_order, all_templates


@pytest.fixture(scope="module")
def corpus():
    pages = generate_pages(N_PAGES, seed=42)
    return pages, generate_seeds(pages, seed=42), generate_robots(pages, seed=42)


@pytest.fixture(scope="module")
def crawl_result(spark, corpus, tmp_path_factory):
    pages, seeds, robots = corpus
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET,
                      max_rounds=MAX_ROUNDS)
    metrics = run_crawl(
        spark, pages_df(spark, N_PAGES, seed=42),
        seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg
    )
    return cfg, metrics


def test_final_state_matches_oracle(spark, corpus, crawl_result):
    pages, seeds, robots = corpus
    cfg, metrics = crawl_result
    oracle_frontier, _, _ = oracle_crawl(pages, seeds, robots)

    last = last_complete_round(cfg)
    got = {
        r["url"]: (r["state"], r["priority"])
        for r in load_frontier(spark, cfg, last).collect()
    }
    want = {u: (v["state"], v["priority"]) for u, v in oracle_frontier.items()}
    assert got == want  # URL-seen set AND states match exactly


def test_crawl_ordering_matches_oracle(spark, corpus, crawl_result):
    """(round, url) pop order — the north-rule crawl-ordering invariant.
    Popped = rows whose state left 'pending' that round; recovered from the
    per-round frontier snapshots."""
    pages, seeds, robots = corpus
    cfg, _ = crawl_result
    _, oracle_order, _ = oracle_crawl(pages, seeds, robots)

    got_order = []
    last = last_complete_round(cfg)
    prev_states = {}
    for rnd in range(last + 1):
        snap = {r["url"]: r["state"] for r in load_frontier(spark, cfg, rnd).collect()}
        for url, state in snap.items():
            was = prev_states.get(url, "pending")
            if was == "pending" and state in ("done", "missing", "too_small"):
                got_order.append((rnd, url))
        prev_states = snap
    assert sorted(got_order) == sorted(oracle_order)


def test_templates_match_oracle(spark, corpus, crawl_result):
    pages, seeds, robots = corpus
    cfg, _ = crawl_result
    _, _, oracle_templates = oracle_crawl(pages, seeds, robots)

    got = read_all_templates(spark, cfg).select(
        "url", "file", "stmt_idx", "raw", "parsed_template", "template", "round"
    ).collect()
    got_set = {(r["url"], r["stmt_idx"], r["raw"], r["parsed_template"],
                r["template"], r["round"]) for r in got}
    want_set = {(r["url"], r["stmt_idx"], r["raw"], r["parsed_template"],
                 r["template"], r["round"]) for r in oracle_templates}
    assert got_set == want_set


def test_resume_equals_uninterrupted(spark, corpus, tmp_path_factory, crawl_result):
    """Kill after 3 rounds; resume; final state equals the full run."""
    pages, seeds, robots = corpus
    full_cfg, _ = crawl_result

    ckpt = str(tmp_path_factory.mktemp("crawl_resume"))
    part_cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET, max_rounds=3)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), part_cfg)
    assert last_complete_round(part_cfg) == 2

    resume_cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET, max_rounds=MAX_ROUNDS)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), resume_cfg)

    last_full = last_complete_round(full_cfg)
    last_resumed = last_complete_round(resume_cfg)
    assert last_resumed == last_full
    a = {(r["url"], r["state"]) for r in load_frontier(spark, full_cfg, last_full).collect()}
    b = {(r["url"], r["state"]) for r in load_frontier(spark, resume_cfg, last_resumed).collect()}
    assert a == b
    ta = {(r["url"], r["stmt_idx"], r["template"])
          for r in read_all_templates(spark, full_cfg).collect()}
    tb = {(r["url"], r["stmt_idx"], r["template"])
          for r in read_all_templates(spark, resume_cfg).collect()}
    assert ta == tb


def test_pending_view_matches_full_filter(spark, crawl_result):
    """VERDICT r04 item 1: the sidecar+delta pending reconstruction must
    equal the full-frontier ``state = 'pending'`` filter at EVERY committed
    round (including rounds between compactions, where the view folds
    multiple delta partitions over the round-0 sidecar)."""
    cfg, _ = crawl_result
    last = last_complete_round(cfg)
    for rnd in range(last + 1):
        got = {
            (r["url"], r["priority"], r["updated_round"])
            for r in load_frontier_pending(spark, cfg, rnd).collect()
        }
        want = {
            (r["url"], r["priority"], r["updated_round"])
            for r in load_frontier(spark, cfg, rnd).collect()
            if r["state"] == "pending"
        }
        assert got == want, rnd


def test_robots_blocked_never_fetched(spark, corpus, crawl_result):
    pages, seeds, robots = corpus
    cfg, _ = crawl_result
    fully_blocked = {r["host"] for r in robots if r["disallow_prefix"] == "/"}
    if not fully_blocked:
        pytest.skip("fixture produced no fully-blocked hosts")
    last = last_complete_round(cfg)
    rows = load_frontier(spark, cfg, last).collect()
    for r in rows:
        if r["host"] in fully_blocked:
            assert r["state"] in ("blocked", "pending"), (r["url"], r["state"])
            assert r["state"] != "done"


def test_seed_paging_matches_oracle(spark, corpus, tmp_path_factory):
    """EP1: paged seed admission (cursor) — final state matches the oracle."""
    pages, seeds, robots = corpus
    ckpt = str(tmp_path_factory.mktemp("crawl_paged"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET,
                      max_rounds=MAX_ROUNDS, seeds_per_round=10)
    metrics = run_crawl(
        spark, pages_df(spark, N_PAGES, seed=42),
        seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg
    )
    assert metrics[0]["seed_cursor"] == 10
    oracle_frontier, _, _ = oracle_crawl(pages, seeds, robots, seeds_per_round=10)
    last = last_complete_round(cfg)
    got = {r["url"]: (r["state"], r["priority"])
           for r in load_frontier(spark, cfg, last).collect()}
    want = {u: (v["state"], v["priority"]) for u, v in oracle_frontier.items()}
    assert got == want


def test_seed_rank_matches_global_window(spark):
    """The distributed two-phase seed rank (range partition + per-slice
    offsets) must equal the r3 global-window formulation exactly —
    including heavy priority ties spanning partition boundaries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.crawl.frontier import frontier_from_seeds
    from logtemplatecrawler_spark.crawl.scheduler import with_seed_rank

    seeds = spark.range(3_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 13).cast("string"),
                 F.lit(".example.org/s/"), "id").alias("url"),
        # only 3 distinct priorities over 3000 rows → every range partition
        # boundary falls inside a tie run
        (F.col("id") % 3).cast("int").alias("priority"),
    )
    base = frontier_from_seeds(seeds)
    ranked, total, cache = with_seed_rank(spark, base)
    try:
        # bigint, not int32: ~2.1B+ seeds must not wrap negative (ADVICE r04)
        assert dict(ranked.dtypes)["_seed_rank"] == "bigint"
        got = {r["url"]: r["_seed_rank"] for r in ranked.collect()}
        w = Window.orderBy(F.col("priority").desc(), F.col("url").asc())
        want = {
            r["url"]: r["_seed_rank"]
            for r in base.withColumn(
                "_seed_rank", F.row_number().over(w)).collect()
        }
        assert total == 3_000 == len(got)
        assert got == want
        # deterministic across a second evaluation of the same frame
        again = {r["url"]: r["_seed_rank"] for r in ranked.collect()}
        assert again == got
    finally:
        cache.unpersist()


def test_bloom_exactness():
    hashes = [(i * 2654435761) % (1 << 64) for i in range(2000)]
    bloom = HashBloom(hashes)
    assert all(bloom.might_contain(h) for h in hashes)  # no false negatives
    other = [(i * 0x9E3779B97F4A7C15 + 12345) % (1 << 64) for i in range(5000, 9000)]
    fp = sum(bloom.might_contain(h) for h in other if h not in set(hashes))
    assert fp / 4000 < 0.05  # reasonable false-positive rate


def test_canonicalize_twins(spark):
    cases = [
        "https://Host01.Example.org/src/A.java#frag",
        "http://h.example.org:80/x",
        "https://h.example.org:443/",
        "https://h.example.org",
        "HTTPS://H.EXAMPLE.ORG/Path/File.C",
        # multi-slash: idempotence regression (ADVICE r01 — '/$' stripped one
        # slash per application, so double-canonicalized outlinks diverged)
        "https://h.example.org/a//",
        "https://h.example.org///",
        "https://h.example.org/a/b/////",
        "http://h.example.org:80//",
    ]
    # Python twin is idempotent
    for c in cases:
        assert canonicalize_url_py(c) == canonicalize_url_py(canonicalize_url_py(c))
    # Spark twin matches the Python twin, and re-application is a no-op
    from pyspark.sql import functions as F
    from logtemplatecrawler_spark.crawl.frontier import canonicalize_url

    df = spark.createDataFrame([(c,) for c in cases], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("u"))
    twice = once.select(canonicalize_url(F.col("u")).alias("u"))
    got_once = [r["u"] for r in once.collect()]
    got_twice = [r["u"] for r in twice.collect()]
    assert got_once == [canonicalize_url_py(c) for c in cases]
    assert got_once == got_twice


def test_neg_cache_cumulative_matches_deltas(spark, crawl_result):
    """Each committed round appends ONE neg_keys delta partition holding
    only that round's keys; the cumulative set — one partition-pruned read
    of the directory — equals the union of all committed template-delta
    keys.  Durable bytes per round are O(|round keys|), not O(|cumulative|)
    (VERDICT r02 item 2), and the loop still reads one path per round
    (VERDICT r01: per-round unions of R paths were O(R²) file-opens)."""
    import os

    from logtemplatecrawler_spark.crawl.scheduler import (
        _neg_dir, _round_dir, last_complete_round, load_neg_keys,
    )

    cfg, metrics = crawl_result
    last = last_complete_round(cfg)
    assert last is not None and last >= 1  # multi-round crawl
    fmt = cfg.table_format
    for rnd in range(last + 1):
        assert fmt.is_committed(_round_dir(cfg, rnd))
    # exactly one delta partition per committed round
    assert fmt.delta_rounds(_neg_dir(cfg)) == list(range(last + 1))
    deltas = [
        os.path.join(_round_dir(cfg, r), "templates") for r in range(last + 1)
    ]
    want = {
        (r["template"], r["parsed_template"])
        for r in spark.read.parquet(*deltas).collect()
    }
    got = {
        (r["template"], r["parsed_template"])
        for r in load_neg_keys(spark, cfg, last).collect()
    }
    assert got == want
    # bytes-written shape: partition r holds ONLY round r's keys (the old
    # cumulative layout held sum(rounds 0..r) rows in every snapshot)
    for m in metrics:
        rnd = m["round"]
        part = fmt.read_deltas(
            spark, _neg_dir(cfg), max_round=rnd, min_round_exclusive=rnd - 1
        )
        assert part.count() == m["templates"]


def test_frontier_commits_are_deltas(spark, crawl_result):
    """Non-compaction rounds durably write ONLY the rows touched that round
    (state transitions + new admissions) — per-round bytes are
    O(|touched|), not O(|frontier|) (VERDICT r02 item 1) — and the
    MERGE-on-read reconstruction returns exactly the full-snapshot state
    the oracle tests pin."""
    import os

    from logtemplatecrawler_spark.crawl.scheduler import (
        _frontier_delta_dir, _round_dir, last_complete_round, load_frontier,
    )

    cfg, _ = crawl_result
    fmt = cfg.table_format
    last = last_complete_round(cfg)
    assert last is not None and last >= 2
    for rnd in range(1, last + 1):
        if rnd % cfg.compact_every == 0:
            continue
        # no full snapshot for delta rounds
        assert not fmt.snapshot_exists(os.path.join(_round_dir(cfg, rnd), "frontier"))
        delta = fmt.read_deltas(
            spark, _frontier_delta_dir(cfg), max_round=rnd,
            min_round_exclusive=rnd - 1,
        )
        full = load_frontier(spark, cfg, rnd)
        touched = {
            r["url"]: (r["state"], r["updated_round"])
            for r in full.collect() if r["updated_round"] == rnd
        }
        got = {r["url"]: (r["state"], r["updated_round"]) for r in delta.collect()}
        assert got == touched
    # the delta is a strict subset of the frontier once the crawl has state
    n_frontier = load_frontier(spark, cfg, last).count()
    n_last_delta = fmt.read_deltas(
        spark, _frontier_delta_dir(cfg), max_round=last,
        min_round_exclusive=last - 1,
    ).count()
    assert n_last_delta < n_frontier


def test_compaction_rounds_match_oracle(spark, corpus, tmp_path_factory):
    """With compact_every=3 the crawl interleaves compacted snapshots and
    delta rounds; the final reconstructed state must match the oracle and
    snapshots must exist exactly at the compaction rounds."""
    import os

    from logtemplatecrawler_spark.crawl.scheduler import _round_dir

    pages, seeds, robots = corpus
    ckpt = str(tmp_path_factory.mktemp("crawl_compact"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET,
                      max_rounds=MAX_ROUNDS, compact_every=3)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg)
    oracle_frontier, _, _ = oracle_crawl(pages, seeds, robots)
    last = last_complete_round(cfg)
    got = {r["url"]: (r["state"], r["priority"])
           for r in load_frontier(spark, cfg, last).collect()}
    want = {u: (v["state"], v["priority"]) for u, v in oracle_frontier.items()}
    assert got == want
    for rnd in range(last + 1):
        has_snap = cfg.table_format.snapshot_exists(
            os.path.join(_round_dir(cfg, rnd), "frontier"))
        assert has_snap == (rnd % 3 == 0)


def test_bloom_path_crawl_matches_oracle(spark, corpus, tmp_path_factory):
    """Force the bloom prune on at fixture scale (bloom_min_keys=0): the
    final URL-seen set must be unchanged — the exact anti-join stays the
    decider, the bloom only splits its input."""
    pages, seeds, robots = corpus
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt_bloom"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET, max_rounds=4,
                      bloom_min_keys=0)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg)
    oracle_frontier, _, _ = oracle_crawl(pages, seeds, robots, max_rounds=4)
    last = last_complete_round(cfg)
    got = {r["url"]: r["state"] for r in load_frontier(spark, cfg, last).collect()}
    want = {u: v["state"] for u, v in oracle_frontier.items()}
    assert got == want


def test_resume_without_neg_keys_rebuilds_cache(spark, corpus, tmp_path_factory):
    """Checkpoints written before neg_keys existed must still resume: the
    cache falls back to a one-time rebuild from the committed deltas
    (scheduler._load_neg_cache), and the finished crawl matches the oracle."""
    import shutil

    pages, seeds, robots = corpus
    ckpt = str(tmp_path_factory.mktemp("crawl_ckpt_legacy"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET, max_rounds=3)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg)
    # simulate a pre-neg_keys checkpoint (delete the delta directory)
    shutil.rmtree(os.path.join(ckpt, "neg_keys"), ignore_errors=True)
    cfg2 = CrawlConfig(checkpoint_dir=ckpt, host_budget=BUDGET,
                       max_rounds=MAX_ROUNDS)
    run_crawl(spark, pages_df(spark, N_PAGES, seed=42),
              seeds_df(spark, pages, seed=42), robots_df(spark, pages, seed=42), cfg2)

    _, _, oracle_templates = oracle_crawl(pages, seeds, robots)
    got = {
        (r["url"], r["stmt_idx"], r["template"])
        for r in read_all_templates(spark, cfg2).collect()
    }
    want = {(r["url"], r["stmt_idx"], r["template"]) for r in oracle_templates}
    assert got == want
