"""MinHash permutation + LSH banding parameter derivation.

The fixed 8-perm / 4-band × 2-row scheme in ``plans/harness.py`` is a
fixture-scale demonstrator; production near-dup thresholds need the
(bands, rows) split DERIVED from the target Jaccard threshold.  Standard
LSH banding theory (Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch. 3 — public):

* a pair with true Jaccard similarity ``s`` agrees on one fixed minhash
  with probability ``s``;
* with signatures split into ``b`` bands of ``r`` rows, the pair becomes a
  candidate iff some band agrees on ALL ``r`` rows:
  ``P(candidate) = 1 - (1 - s^r)^b`` — an S-curve whose transition
  midpoint sits near ``(1/b)^(1/r)``;
* choosing (b, r) with midpoint ≈ the target threshold concentrates
  recall above it and precision below it.

``lsh_banding`` picks the divisor split of ``n_perms`` whose midpoint is
closest to the target.  ``minhash_coefficients`` generates the universal-
hash coefficients ``(a_i, b_i)`` deterministically (consecutive primes) so
the Spark aggregation and the DuckDB oracle SQL are generated from the
SAME constants (the harness pattern used for simhash/hyperplane LSH).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

MINHASH_P = 2147483647  # 2^31 - 1, Mersenne prime: (hw % P) * a + b stays in int64

# shingle string → 60-bit md5-prefix hash memo, shared across batches in a
# reused Python worker (guide §4.5); the cap bounds worker memory on
# open-vocabulary corpora.  The md5 of a string is immutable, so caching is
# semantics-free.
_HW_CACHE: dict = {}
_HW_CACHE_CAP = 1_000_000


def doc_shingle_hashes(text: str) -> Optional[list]:
    """Per-document DISTINCT word-bigram shingle hashes, ascending — the
    row-local twin of the harness's shingle pipeline (split on single
    spaces, bigram join with one space, first 15 hex chars of md5 as a
    60-bit int, distinct applied to shingle STRINGS before hashing, so an
    md5-prefix collision between two distinct shingles keeps both hashes —
    exactly the relational ``SELECT DISTINCT doc_id, w … md5(w)`` order of
    operations).  Returns None for documents with fewer than two tokens
    (the oracle's ``array_length(ws) >= 2`` gate)."""
    ws = text.split(" ")
    if len(ws) < 2:
        return None
    out = []
    seen = set()
    for i in range(len(ws) - 1):
        s = ws[i] + " " + ws[i + 1]
        if s in seen:
            continue
        seen.add(s)
        hw = _HW_CACHE.get(s)
        if hw is None:
            hw = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            if len(_HW_CACHE) < _HW_CACHE_CAP:
                _HW_CACHE[s] = hw
        out.append(hw)
    out.sort()
    return out


def make_sig_and_array_fn(coefs: List[Tuple[int, int]]):
    """mapInPandas body: (doc_id, text) batches → (doc_id, mh0..mhN, hws)
    rows — the minhash signature AND the sorted distinct-shingle hash
    array from ONE pass over each document (the LSH-then-verify
    composition needs both; computing them together halves the kernel
    passes and checkpoints one combined table)."""
    def fn(batches):
        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in coefs], dtype=np.int64)[None, :]
        B = np.array([b for _, b in coefs], dtype=np.int64)[None, :]
        for pdf in batches:
            ids, mins, arrs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hws = doc_shingle_hashes(text)
                if hws is None:
                    continue
                h = np.asarray(hws, dtype=np.int64)[:, None] % MINHASH_P
                ids.append(doc_id)
                mins.append(((h * A + B) % MINHASH_P).min(axis=0))
                arrs.append(hws)
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            m = (np.stack(mins) if mins
                 else np.empty((0, len(coefs)), dtype=np.int64))
            for i in range(len(coefs)):
                out[f"mh{i}"] = pd.Series(m[:, i], dtype="int64")
            out["hws"] = pd.Series(arrs, dtype="object")
            yield pd.DataFrame(out)

    return fn


def make_minhash_sig_fn(coefs: List[Tuple[int, int]]):
    """mapInPandas body: (doc_id, text) batches → (doc_id, mh0..mhN) minhash
    signature rows.  mh_i = min over the doc's shingle hashes of
    ((hw % P) * a_i + b_i) % P — min over the DISTINCT hash set equals min
    over the occurrence multiset, so this matches both stated forms.  All
    arithmetic stays int64-exact ((P-1) * max(a) + max(b) < 2^42)."""
    def fn(batches):
        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in coefs], dtype=np.int64)[None, :]
        B = np.array([b for _, b in coefs], dtype=np.int64)[None, :]
        for pdf in batches:
            ids = []
            mins = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                hws = doc_shingle_hashes(text)
                if hws is None:
                    continue
                h = np.asarray(hws, dtype=np.int64)[:, None] % MINHASH_P
                ids.append(doc_id)
                mins.append(((h * A + B) % MINHASH_P).min(axis=0))
            out = {"doc_id": pd.Series(ids, dtype="int64")}
            m = (np.stack(mins) if mins
                 else np.empty((0, len(coefs)), dtype=np.int64))
            for i in range(len(coefs)):
                out[f"mh{i}"] = pd.Series(m[:, i], dtype="int64")
            yield pd.DataFrame(out)

    return fn


def _primes(n: int) -> List[int]:
    out: List[int] = []
    x = 2
    while len(out) < n:
        if all(x % p for p in out if p * p <= x):
            out.append(x)
        x += 1
    return out


def minhash_coefficients(n_perms: int) -> List[Tuple[int, int]]:
    """(a_i, b_i) for mh_i = ((hw % P) * a_i + b_i) % P — deterministic,
    shared verbatim by the Spark plan and the SQL oracle generator."""
    ps = _primes(2 * n_perms)
    return [(ps[i], ps[n_perms + i]) for i in range(n_perms)]


def candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(pair with Jaccard s becomes an LSH candidate) = 1 - (1 - s^r)^b."""
    return 1.0 - (1.0 - s ** rows) ** bands


def lsh_banding(n_perms: int, threshold: float) -> Tuple[int, int]:
    """(bands, rows) with bands*rows == n_perms whose S-curve midpoint
    (1/b)^(1/r) is closest to the target Jaccard threshold."""
    best = None
    for rows in range(1, n_perms + 1):
        if n_perms % rows:
            continue
        bands = n_perms // rows
        midpoint = (1.0 / bands) ** (1.0 / rows)
        score = abs(midpoint - threshold)
        if best is None or score < best[0]:
            best = (score, bands, rows)
    assert best is not None
    return best[1], best[2]
