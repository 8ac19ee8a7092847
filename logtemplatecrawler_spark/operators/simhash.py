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


# word → 60-bit hash memo for the batched signature path.  The md5 of a
# word is immutable, so caching is semantics-free; the cap bounds worker
# memory on open-vocabulary corpora (guide §4.5: amortize heavyweight
# per-item work across batches in a reused worker).
_HW_CACHE: dict = {}
_HW_CACHE_CAP = 1_000_000


def simhash60_batch(texts) -> "list[int]":
    """Vectorized twin of `simhash60` for pandas batches — bit-identical.

    Integer-exact restatement: per distinct word, the sign-sum adds
    ``tf * (2·bit − 1)`` which equals ``±tf``; the 60-bit loop runs as one
    numpy broadcast per document instead of 60 Python iterations per word.
    All arithmetic is int64 (no floats), so the result equals the scalar
    oracle exactly — pinned by
    tests/test_stateful_streaming.py::test_simhash60_batch_matches_scalar."""
    import numpy as np

    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    out = []
    for text in texts:
        cnt = Counter(text.split(" "))
        hws = np.empty(len(cnt), dtype=np.uint64)
        tfs = np.empty(len(cnt), dtype=np.int64)
        for i, (w, tf) in enumerate(cnt.items()):
            hw = _HW_CACHE.get(w)
            if hw is None:
                hw = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                if len(_HW_CACHE) < _HW_CACHE_CAP:
                    _HW_CACHE[w] = hw
            hws[i] = hw
            tfs[i] = tf
        bits = ((hws[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        sums = (tfs[:, None] * (2 * bits - 1)).sum(axis=0)
        out.append(int(((sums > 0).astype(np.uint64) << shifts).sum()))
    return out


def band_keys(sig: int) -> list:
    """The 4×15-bit band keys of a signature (pigeonhole: two sigs within
    Hamming ≤ 3 share at least one)."""
    return [
        (sig >> (b * SIMHASH_BAND_BITS)) & SIMHASH_BAND_MASK
        for b in range(SIMHASH_BANDS)
    ]
