"""Exact shingle-intersection kernel for the LSH verify stage (guide §4.2).

The r5 verify computed, per candidate pair, the shingle-set intersection
size by EXPANDING the pair stream against the per-doc hash table twice
(`cand ⋈ hashes(doc_a) ⋈ hashes(doc_b, hw)` + groupBy) — ~53 rows per
candidate per side, a 53 M-row join pipeline at the sf1-shaped bench.

This kernel attaches each doc's SORTED hash array once (collect_list +
sort_array — one groupBy over the hash table) and counts matches per pair
with binary search.  The count replicates the join-count semantics
EXACTLY, including duplicate hashes (md5-prefix collisions): the join
yields one row per (occurrence_a, occurrence_b) match, i.e.
Σ_hw cnt_a(hw)·cnt_b(hw), and summing `searchsorted(b, a, 'right') −
searchsorted(b, a, 'left')` over a's occurrences computes the same sum —
all-integer arithmetic, no float anywhere, so the result is equal by
construction for every input.  The Jaccard threshold itself stays in the
JVM as the original, unchanged predicate over (i, na, nb).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

INTER_SCHEMA = ("doc_a bigint, doc_b bigint, i bigint, "
                "na bigint, nb bigint")


def intersect_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas fn over (doc_a, doc_b, hwa, hwb) rows → match counts.

    ``hwa``/``hwb`` must be SORTED arrays of the docs' shingle hashes.
    Emits one row per input pair with the exact multiset match count and
    both multiset sizes."""
    import numpy as np

    for pdf in batches:
        n = len(pdf)
        out_i = np.empty(n, dtype=np.int64)
        out_na = np.empty(n, dtype=np.int64)
        out_nb = np.empty(n, dtype=np.int64)
        hwa_col = pdf["hwa"].to_numpy()
        hwb_col = pdf["hwb"].to_numpy()
        for j in range(n):
            a = np.asarray(hwa_col[j], dtype=np.int64)
            b = np.asarray(hwb_col[j], dtype=np.int64)
            out_na[j] = len(a)
            out_nb[j] = len(b)
            if len(a) > len(b):      # search the shorter side's elements
                a, b = b, a          # (match count is symmetric)
            out_i[j] = int(
                (np.searchsorted(b, a, "right")
                 - np.searchsorted(b, a, "left")).sum()
            )
        yield pd.DataFrame({
            "doc_a": pdf["doc_a"].to_numpy(),
            "doc_b": pdf["doc_b"].to_numpy(),
            "i": out_i, "na": out_na, "nb": out_nb,
        })
