"""URL-seen filtering: exact anti-join decider + bloom pre-filter prune.

Correctness: a candidate URL is "new" iff it does not appear in the frontier
(any state).  The decider is an exact LEFT ANTI join on the canonical url
string (J3) — joining on ``url_hash`` alone would wrongly drop URLs on hash
collision (~3 expected collisions at 10^10 × 64-bit), so the hash is a
shuffle/bucket key, never the equality key.

Prune: a bloom filter over the frontier's ``url_hash`` splits candidates
exactly:

* bloom MISS → the hash was never inserted → the URL is DEFINITELY new
  (blooms have no false negatives) → skips the anti-join shuffle entirely;
* bloom HIT → possibly seen (false positives included) → decided by the
  exact anti-join.

In a steady-state crawl most discovered links point at already-seen pages,
so the anti-join input shrinks to (seen ∪ false positives) and the shuffle
cost tracks the true-new rate.  The driver-built pure-Python bloom below is
the local[k] stand-in; at cluster scale the same split comes from Spark's
``bloom_filter_agg``/``might_contain`` or Iceberg bloom write-properties —
either way the anti-join stays the decider and results cannot change.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HashBloom:
    """Tiny pure-Python blocked bloom over 64-bit hashes (4 derived probes).

    Built on the driver from the frontier's url_hash column; shipped to
    executors by closure capture (a compact bytes object).
    """

    __slots__ = ("bits", "mask")

    def __init__(self, hashes: List[int], bits_per_key: int = 12):
        size = max(64, 1 << (max(1, len(hashes)) * bits_per_key).bit_length())
        self.mask = size - 1
        bits = bytearray(size // 8)
        for h in hashes:
            for probe in self._probes(h):
                bits[probe >> 3] |= 1 << (probe & 7)
        self.bits = bytes(bits)

    def _probes(self, h: int):
        h &= (1 << 64) - 1
        h1 = h & 0xFFFFFFFF
        h2 = (h >> 32) | 1
        for i in range(4):
            yield (h1 + i * h2) & self.mask

    def might_contain(self, h: int) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._probes(h))


def build_bloom(frontier: DataFrame, max_keys: int = 2_000_000) -> Optional[HashBloom]:
    """Driver-side bloom over the frontier's url hashes; None if too large
    to build locally (callers then rely on the anti-join alone)."""
    if frontier.limit(max_keys + 1).count() > max_keys:
        return None
    hashes = [r[0] for r in frontier.select("url_hash").collect()]
    return HashBloom(hashes)


def filter_unseen(candidates: DataFrame, frontier: DataFrame,
                  bloom: Optional[HashBloom] = None) -> DataFrame:
    """Candidates (url, url_hash, …) not present in the frontier (exact)."""
    if bloom is None:
        return candidates.join(frontier.select("url"), on="url", how="left_anti")

    b = bloom

    @F.udf("boolean")
    def _might(h):
        return b.might_contain(h)

    flagged = candidates.withColumn("_maybe_seen", _might("url_hash"))
    definitely_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    needs_check = flagged.where(F.col("_maybe_seen")).drop("_maybe_seen")
    checked = needs_check.join(frontier.select("url"), on="url", how="left_anti")
    return definitely_new.unionByName(checked)
