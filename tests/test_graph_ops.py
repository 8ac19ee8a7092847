"""Independent pure-Python oracles for the wave-6 host-graph operators.

The driver parity for `crawl_host_rank` / `crawl_bfs_depth` /
`crawl_pop_by_host_rank` compares Spark against DuckDB SQL twins that are
GENERATED from the same constants as the Spark plans — a bug shared by both
generators would hash-match.  These tests re-derive the expected results
from scratch (plain dict/set Python, no shared code path beyond the
constants themselves) and pin the Spark output against them.
"""

import duckdb
import pytest

from logtemplatecrawler_spark.plans.harness import (
    QUERIES, _BFS_ROUNDS, _POP_BUDGET, _POP_TOP_HOSTS, _PR_HOSTS, _PR_ITERS,
    _PR_SCALE, _PR_SRC_CAP,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def graph():
    """(edges, nodes, outdeg) derived independently from the events table."""
    con = duckdb.connect()
    ev = [r[0] for r in con.execute(
        f"SELECT event_id FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()]
    con.close()
    edges = set()
    for e in ev:
        s = e % _PR_HOSTS
        dsts = [(e * 7 + 3) % _PR_HOSTS]
        if e % 3 == 0:
            dsts.append((e * 13 + 5) % _PR_HOSTS)
        for d in dsts:
            if s < _PR_SRC_CAP and s != d:
                edges.add((s, d))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    return edges, nodes, outdeg, ev


def _python_pagerank(edges, nodes, outdeg):
    n = len(nodes)
    pr = {h: _PR_SCALE for h in nodes}
    for _ in range(_PR_ITERS):
        dang = sum(pr[h] for h in nodes if h not in outdeg)
        contrib = {h: pr[h] // outdeg[h] for h in nodes if h in outdeg}
        inc = {h: 0 for h in nodes}
        for s, d in edges:
            inc[d] += contrib[s]
        base = ((15 * (n * _PR_SCALE)) // 100) // n
        pr = {h: base + (85 * (inc[h] + dang // n)) // 100 for h in nodes}
    return pr


def test_host_rank_matches_pure_python(spark, graph):
    edges, nodes, outdeg, _ = graph
    expect = _python_pagerank(edges, nodes, outdeg)
    got = {r["host"]: r["pr"] for r in
           QUERIES["crawl_host_rank"](spark, SF_DIR).collect()}
    assert got == expect
    # total mass is conserved up to the truncation remainders: each round
    # loses < 100 units per node to the three floor divisions
    n = len(nodes)
    total = sum(got.values())
    assert n * _PR_SCALE - total < _PR_ITERS * n * 300
    assert total <= n * _PR_SCALE


def test_bfs_depth_matches_pure_python(spark, graph):
    edges, nodes, _, _ = graph
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    from collections import deque

    dist = {h: 0 for h in nodes if h % 10 == 0}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= _BFS_ROUNDS:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    got = {r["host"]: r["depth"] for r in
           QUERIES["crawl_bfs_depth"](spark, SF_DIR).collect()}
    assert got == dist
    # the graph genuinely exercises multi-hop discovery
    assert max(dist.values()) >= 2


def test_pop_by_host_rank_matches_pure_python(spark, graph):
    edges, nodes, outdeg, ev = graph
    pr = _python_pagerank(edges, nodes, outdeg)
    top = sorted(pr, key=lambda h: (-pr[h], h))[:_POP_TOP_HOSTS]
    per_host = {}
    for e in ev:
        h = e % _PR_HOSTS
        if h in top:
            per_host.setdefault(h, []).append(
                f"https://h{h}.example.org/p/{e}"
            )
    expect = set()
    for h, urls in per_host.items():
        for u in sorted(urls)[:_POP_BUDGET]:
            expect.add((h, u, pr[h]))
    got = {(r["host"], r["url"], r["priority"]) for r in
           QUERIES["crawl_pop_by_host_rank"](spark, SF_DIR).collect()}
    assert got == expect
