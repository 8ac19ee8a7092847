"""Fixture generator determinism + coverage checks."""

from logtemplatecrawler_spark.core.pipeline import process_page
from logtemplatecrawler_spark.sources.fixtures import (
    generate_pages,
    generate_robots,
    generate_seeds,
)


def test_pages_deterministic():
    a = generate_pages(120, seed=42)
    b = generate_pages(120, seed=42)
    assert a == b
    c = generate_pages(120, seed=7)
    assert a != c


def test_pages_schema_and_langs():
    rows = generate_pages(200, seed=42)
    assert len(rows) == 200
    langs = {r["lang"] for r in rows}
    assert {"java", "c"} <= langs
    for r in rows[:20]:
        assert r["url"].startswith("https://")
        assert isinstance(r["html"], bytes)
        assert isinstance(r["text"], str)


def test_host_skew_is_zipfian():
    rows = generate_pages(400, seed=42)
    from collections import Counter
    counts = Counter(r["url"].split("/")[2] for r in rows)
    top = counts.most_common()
    # Heavy head: the most common host should hold several times the median.
    assert top[0][1] >= 5 * sorted(c for _, c in top)[len(top) // 2]


def test_pipeline_yields_templates_from_fixtures():
    rows = generate_pages(200, seed=42)
    produced = []
    for r in rows:
        produced.extend(process_page(r["url"], r["text"], r["lang"]))
    # A healthy fraction of pages must survive the full pipeline…
    assert len(produced) > 50
    # …and exercise java + c parsing and typed placeholders.
    frameworks = {p["framework"] for p in produced}
    assert "slf4j" in frameworks or "log4j" in frameworks
    assert any("Placeholder}" in p["template"] for p in produced)
    c_rows = [p for p in produced if p["url"].endswith(".c")]
    assert c_rows, "C pages must contribute templates"


def test_distributed_equals_local(spark):
    from logtemplatecrawler_spark.sources.distributed_fixtures import distributed_pages

    local = generate_pages(120, seed=42)
    dist = distributed_pages(spark, 120, seed=42, partitions=4).collect()
    got = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"]) for r in dist
    )
    want = sorted(
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in local
    )
    assert got == want


def test_seeds_and_robots():
    pages = generate_pages(200, seed=42)
    seeds = generate_seeds(pages, seed=42)
    robots = generate_robots(pages, seed=42)
    assert 20 < len(seeds) < 120
    page_urls = {p["url"] for p in pages}
    assert all(s["url"] in page_urls for s in seeds)
    assert all(0 <= s["priority"] <= 1000 for s in seeds)
    assert any(r["disallow_prefix"] == "/" for r in robots)
