"""Pure (Spark-free) 60-bit SimHash — the row-local twin of the batch
signature computation in ``plans/harness.py`` (`_simhash_frame` /
`_simhash_cte`): split on single spaces, term-frequency-weighted sign-sum
of md5-derived word-hash bits, bit set iff its sum is strictly positive.

Kept bit-identical with the batch DataFrame aggregation (pinned by
tests/test_stateful_streaming.py::test_simhash60_matches_batch_frame) so
the streaming content-dedup operator and the batch dedup family share one
signature space: a doc admitted by the stream and a doc deduped in batch
agree on what "near-duplicate" means.
"""

from __future__ import annotations

import hashlib
from collections import Counter

SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15
SIMHASH_BAND_MASK = (1 << SIMHASH_BAND_BITS) - 1
SIMHASH_HAMMING = SIMHASH_BANDS - 1


def simhash60(text: str) -> int:
    """60-bit simhash of ``text``; exact twin of the Spark aggregation."""
    sums = [0] * SIMHASH_BITS
    for w, tf in Counter(text.split(" ")).items():
        hw = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
        for i in range(SIMHASH_BITS):
            sums[i] += tf if (hw >> i) & 1 else -tf
    return sum(1 << i for i in range(SIMHASH_BITS) if sums[i] > 0)


def band_keys(sig: int) -> list:
    """The 4×15-bit band keys of a signature (pigeonhole: two sigs within
    Hamming ≤ 3 share at least one)."""
    return [
        (sig >> (b * SIMHASH_BAND_BITS)) & SIMHASH_BAND_MASK
        for b in range(SIMHASH_BANDS)
    ]
