"""Per-host politeness: the salted windowed priority queue (W1/W2/O4).

The reference serializes work with a `locked` flag + ``LIMIT 1/20`` leases on
cron ticks (dags/log2vec_process-repository.py:62-79; O4) — "k work units per
interval".  Here the per-round per-host fetch budget IS the politeness
contract: a round pops at most ``budget`` URLs per host, highest priority
first, deterministic tie-break on url.

Skew: a mega-host (Zipf head) would funnel its whole pending set through one
window task.  The pop therefore runs in two phases:

  phase 1 — window over (host, salt): each of the host's ``n_salts`` slices
            keeps its local top-``budget`` (tasks see ~1/n_salts of the host);
  phase 2 — window over (host): the ≤ budget·n_salts survivors (tiny) are
            re-ranked and the global per-host top-``budget`` wins.

Top-k of a union of per-slice top-ks equals global top-k, so the result is
identical to the single-window plan — AQE's skew handling catches whatever
residual imbalance remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pop_per_host(pending: DataFrame, budget: int, salted: bool = True) -> DataFrame:
    """Select up to ``budget`` URLs per host, priority-desc, url-asc."""
    order = [F.col("priority").desc(), F.col("url").asc()]
    if salted:
        local = Window.partitionBy("host", "salt").orderBy(*order)
        pending = (
            pending.withColumn("_lrn", F.row_number().over(local))
            .where(F.col("_lrn") <= budget)
            .drop("_lrn")
        )
    final = Window.partitionBy("host").orderBy(*order)
    return (
        pending.withColumn("_rn", F.row_number().over(final))
        .where(F.col("_rn") <= budget)
        .drop("_rn")
    )
