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

from typing import List, Tuple

MINHASH_P = 2147483647  # 2^31 - 1, Mersenne prime: (hw % P) * a + b stays in int64


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
