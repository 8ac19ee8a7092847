"""Frontier table: schema, URL canonicalization, seed ingestion.

Scale design (10^10-URL design point):
* ``url_hash`` = ``xxhash64(canonical url)`` — a compact 64-bit shuffle/sort
  key; exact-match joins still use ``url`` itself (hash collisions must not
  drop URLs), but bucketing/sorting by the hash keeps exchanges cheap.
* ``salt`` = ``pmod(url_hash, n_salts)`` — breaks mega-host hot spots: the
  politeness pop runs a two-phase window (per (host,salt) top-k, then
  per-host top-k of the k·n_salts survivors) so no single task ever sorts a
  whole mega-host (see crawl/politeness.py).
* states: pending → done | missing | blocked | too_small.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FRONTIER_DDL = (
    "url string, url_hash bigint, host string, salt int, priority int, "
    "depth int, state string, round_added int, updated_round int"
)

STATE_PENDING = "pending"
STATE_DONE = "done"
STATE_MISSING = "missing"
STATE_BLOCKED = "blocked"
STATE_TOO_SMALL = "too_small"


def canonicalize_url(url: Column) -> Column:
    """Native URL canonicalization: drop the fragment, lowercase the
    scheme://host authority, drop a default :80/:443 port, strip ALL
    trailing slashes.

    Must be IDEMPOTENT — discovered outlinks are canonicalized once at
    harvest and again inside :func:`with_frontier_keys`, so a second
    application must be a no-op or the frontier key diverges from the pages
    table's (ADVICE r01: ``/$`` stripped one slash per application, so
    ``…//`` URLs fetched as 'missing').  Property-tested in
    tests/test_crawl.py.

    Twin: :func:`canonicalize_url_py` (used by the oracle simulator);
    parity asserted in tests/test_crawl.py.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    auth_raw = F.regexp_extract(no_frag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    authority = F.regexp_replace(F.lower(auth_raw), ":(80|443)$", "")
    # r6: the matched authority is an anchored PREFIX, so "everything after
    # the match" is a character-offset substring — one fewer full-string
    # regex per row than the r5 regexp_replace (exact for every input: on
    # no-match regexp_extract yields '' and the substring is the whole
    # string, matching the unreplaced original).
    rest = F.substring(no_frag, F.length(auth_raw) + 1, F.lit(2147483647))
    joined = F.concat(authority, rest)
    return F.regexp_replace(joined, "/+$", "")


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin of :func:`canonicalize_url`."""
    no_frag = re.sub(r"#.*$", "", url)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", no_frag)
    if m:
        authority = re.sub(r":(80|443)$", "", m.group(1).lower())
        rest = no_frag[m.end():]
        joined = authority + rest
    else:
        joined = no_frag
    return re.sub(r"/+$", "", joined)


def with_frontier_keys(df: DataFrame, url_col: str = "url", n_salts: int = 8) -> DataFrame:
    """Add canonical url, url_hash, host, salt columns."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.withColumn(url_col, canon)
        .withColumn("url_hash", F.xxhash64(F.col(url_col)))
        .withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))
        .withColumn("salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))
    )


def frontier_from_seeds(seeds: DataFrame, n_salts: int = 8) -> DataFrame:
    """seeds(url, priority) → initial frontier (all pending, depth 0, round 0).

    Seed priority models the reference's stars/size admission heuristics
    (airflow/plugins/operators.py:112-116); duplicate seed urls collapse to
    their max priority (deterministic).
    """
    seeded = with_frontier_keys(seeds.select("url", "priority"), n_salts=n_salts)
    seeded = seeded.groupBy("url", "url_hash", "host", "salt").agg(
        F.max("priority").alias("priority")
    )
    return seeded.select(
        "url", "url_hash", "host", "salt", "priority",
        F.lit(0).alias("depth"),
        F.lit(STATE_PENDING).alias("state"),
        F.lit(0).alias("round_added"),
        F.lit(0).alias("updated_round"),
    )
