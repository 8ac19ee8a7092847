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
