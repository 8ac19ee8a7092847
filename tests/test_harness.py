"""Driver-harness parity: every Spark query ≡ its DuckDB oracle at sf0.001.

Mimics the driver's CORRECTNESS check (row count + column names + order-
insensitive value comparison) so regressions surface here first.
"""

import math
import os

import duckdb
import pytest

from logtemplatecrawler_spark.plans.harness import ORACLES, QUERIES

SF_DIR = os.environ.get("HARNESS_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", round(v, 9)))
            else:
                vals.append(("v", v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _normalize(srows, scols) == _normalize(drows, dcols), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle must at least run, be deterministic
    across two executions, and return a stable schema."""
    df1 = QUERIES[name](spark, SF_DIR)
    df2 = QUERIES[name](spark, SF_DIR)
    r1 = sorted(repr(tuple(r)) for r in df1.collect())
    r2 = sorted(repr(tuple(r)) for r in df2.collect())
    assert df1.columns == df2.columns
    assert r1 == r2
    assert len(r1) > 0


def test_mm_frame_sample_non_ascii(spark, tmp_path):
    """Frames are CHARACTER slices on both engines: a non-ASCII corpus must
    agree in frame count and frame_sig (ADVICE r02 — the pandas stage used
    to slice utf-8 bytes while DuckDB substr slices characters)."""
    rows = [
        (1, "héllo wörld — naïve café " * 8),
        (2, "日本語のテキストです。" * 15),
        (3, "plain ascii words only here " * 5),
        (4, "mixed ascii → ünïcode ↔ text " * 6),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1) \
        .write.parquet(d + "/documents.parquet")
    sdf = QUERIES["mm_frame_sample"](spark, d)
    srows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(ORACLES["mm_frame_sample"]).fetchall())
    con.close()
    assert len(srows) > 4
    assert srows == drows


def test_lsh_tuned_s_curve(spark):
    """Property test (VERDICT r02 item 7): the threshold-parameterized LSH
    candidates follow the banding S-curve against EXACT bigram-shingle
    Jaccard on the bounded doc_id<200 slice — identical pairs are always
    candidates (s=1 ⇒ every band agrees, a theorem), pairs well above the
    τ=0.7 target are mostly candidates, pairs well below mostly are not."""
    from logtemplatecrawler_spark.operators.minhash import (
        candidate_probability, lsh_banding,
    )
    from logtemplatecrawler_spark.plans.harness import (
        _TUNED_PERMS, _TUNED_THRESHOLD,
    )

    bands, rows = lsh_banding(_TUNED_PERMS, _TUNED_THRESHOLD)
    assert bands * rows == _TUNED_PERMS
    assert abs((1 / bands) ** (1 / rows) - _TUNED_THRESHOLD) < 0.05
    assert candidate_probability(1.0, bands, rows) == 1.0

    # exact shingle Jaccard, pure python (the exactness oracle)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " WHERE doc_id < 200"
    ).fetchall()
    con.close()
    shingle_sets = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        if len(ws) >= 2:
            shingle_sets[doc_id] = {f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)}
    ids = sorted(shingle_sets)
    exact = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(shingle_sets[a] & shingle_sets[b])
            if inter:
                exact[(a, b)] = inter / len(shingle_sets[a] | shingle_sets[b])

    cand = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_lsh_pairs_tuned"](spark, SF_DIR).collect()
        if r["doc_a"] < 200 and r["doc_b"] < 200
    }
    # fixture near-dups sit at s∈[0.9, 0.99]; everything else at s ≤ ~0.15
    high = {p for p, s in exact.items() if s >= 0.9}
    low = {p for p, s in exact.items() if s <= 0.3}
    assert high and high <= cand  # full recall above τ (P≥0.998 per pair)
    assert low and len(cand & low) / len(low) <= 0.01  # ~no candidates below τ
