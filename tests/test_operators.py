"""Operator-level tests: encoding-fallback decode (U14), politeness windows,
seen-filter exactness with bloom on/off."""

import pytest
from pyspark.sql import functions as F

from logtemplatecrawler_spark.crawl.frontier import with_frontier_keys
from logtemplatecrawler_spark.crawl.politeness import pop_per_host
from logtemplatecrawler_spark.crawl.seen import HashBloom, filter_unseen
from logtemplatecrawler_spark.operators.decode import decode_bytes, decode_html


def test_decode_fallback_chain():
    # utf-8 first …
    assert decode_bytes("héllo".encode("utf-8")) == "héllo"
    # … bytes invalid as utf-8 fall through to latin1 (which never fails).
    latin = "caf\xe9".encode("latin1")
    assert decode_bytes(latin) == "caf\xe9"
    assert decode_bytes(None) is None
    assert decode_bytes(b"") == ""


def test_decode_udf_matches_python(spark):
    rows = [
        (1, "plain ascii".encode("utf-8")),
        (2, "unicode höla".encode("utf-8")),
        (3, "latin \xe9\xe8".encode("latin1")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, html binary")
    got = {r["id"]: r["txt"] for r in df.select("id", decode_html("html").alias("txt")).collect()}
    want = {i: decode_bytes(b) for i, b in rows}
    assert got == want


def test_pop_per_host_salted_equals_unsalted(spark):
    """The two-phase salted pop must equal the single-window plan exactly."""
    rows = [
        (f"https://h{i % 5}.org/p{i}_{j}", f"h{i % 5}.org", (i * 7 + j) % 4, 100 - j, )
        for i in range(10) for j in range(20)
    ]
    df = spark.createDataFrame(rows, "url string, host string, salt int, priority int")
    a = {tuple(r) for r in pop_per_host(df, 3, salted=True).collect()}
    b = {tuple(r) for r in pop_per_host(df, 3, salted=False).collect()}
    assert a == b
    per_host = {}
    for r in a:
        per_host[r[1]] = per_host.get(r[1], 0) + 1
    assert all(v <= 3 for v in per_host.values())


def test_filter_unseen_bloom_equals_exact(spark):
    seen = spark.createDataFrame(
        [(f"https://s.org/{i}",) for i in range(200)], "url string"
    )
    seen = with_frontier_keys(seen)
    cand = spark.createDataFrame(
        [(f"https://s.org/{i}",) for i in range(150, 350)], "url string"
    )
    cand = with_frontier_keys(cand)
    bloom = HashBloom([r[0] for r in seen.select("url_hash").collect()])
    no_bloom = {r["url"] for r in filter_unseen(cand, seen, None).collect()}
    with_bloom = {r["url"] for r in filter_unseen(cand, seen, bloom).collect()}
    assert no_bloom == with_bloom == {f"https://s.org/{i}" for i in range(200, 350)}
