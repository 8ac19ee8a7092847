"""Within-cell semantic near-dup pair kernel (guide §4.2: batch native code
inside the Python boundary instead of per-row JVM expression trees).

`dedup_semantic_clustered_canonical` needs, per IVF cell, every vector pair
(vec_a < vec_b) whose 6-dp-rounded cosine clears a threshold.  The r5 plan
expressed the dot product as ``aggregate(zip_with(a, b, *), 0.0, +)`` over a
self-join on ``cell`` — 8 distinct join keys (parallelism collapse) and one
interpreted higher-order-function fold per candidate pair: ~25M folds × 64
dims at the sf1.0 bench scale, 134 s in BENCH_r05.

This kernel computes the same dot products in numpy, ONE task per cell,
bit-identically to the JVM fold:

* float32 → float64 casts are exact in both engines;
* per-dimension products are IEEE doubles in both;
* the accumulation loops over dimensions IN ORDER (``acc += prod[:, i]``),
  so every intermediate double equals the JVM's sequential
  ``((0.0 + p0) + p1) + …`` fold — numpy and the JVM both execute
  correctly-rounded IEEE-754 double adds, hence identical bits.

The kernel does NOT decide the threshold: it emits (doc_a, doc_b, dot, na,
nb) for every pair whose unrounded cosine is within ``margin`` of the
threshold, and the caller re-applies the ORIGINAL JVM predicate
``round(dot / (na * nb), 6) >= tau`` on those columns.  Since rounding moves
a value by at most 5e-7, a 1e-6 margin makes the emitted set a strict
superset of the qualifying set — the JVM filter then decides each pair with
exactly the same arithmetic as the r5 plan, so the query result is
unchanged by construction (not merely "close").

Pairs are generated in row-blocks (``block`` a-rows at a time) so per-task
memory is O(block × |cell|) doubles regardless of cell size.

Within-cell SALTING (r6, guide §2.5): the quadratic work of a cell is a
skewed key — with few (or one hot) cells, ``groupBy(cell)`` caps
parallelism at the cell count while every other core idles.  With
``stride > 1`` the caller replicates each cell row to ``stride``
(cell, blk) groups and the kernel computes ONLY the pairs whose a-row
satisfies ``vec_id % stride == blk``: the (cell, blk) groups partition the
cell's pair set exactly (each pair is owned by its a-row's residue class),
and each pair's dot product is the same dimension-ordered fold regardless
of which group computes it, so the union across groups is bit-identical to
the unsalted kernel — only the task geometry changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

PAIR_SCHEMA = "doc_a bigint, doc_b bigint, dot double, na double, nb double"


def make_cell_pair_fn(tau: float, margin: float = 1e-6, block: int = 256,
                      stride: int = 1):
    """Grouped-map fn for ``groupBy(cell).applyInPandas`` (or, with
    ``stride > 1``, ``groupBy(cell, blk)``): emits candidate pairs
    (vec_a < vec_b) with unrounded cosine >= tau - margin."""
    cut = tau - margin

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id", ignore_index=True)
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "dot": pd.Series(dtype="float64"),
                 "na": pd.Series(dtype="float64"),
                 "nb": pd.Series(dtype="float64")})
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        nrm = pdf["nrm"].to_numpy(dtype="float64")
        # float32 parquet values cast exactly to float64 — same as the JVM's
        # element-wise cast inside zip_with.
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        dims = mat.shape[1]
        if stride > 1:
            # this group owns the pairs whose a-row is in its residue class
            apos = np.flatnonzero(
                (ids % stride) == int(pdf["blk"].iloc[0])
            )
            apos = apos[apos < n - 1]            # last row has no b > a
        else:
            apos = np.arange(n - 1)
        prod = np.empty((min(block, max(len(apos), 1)), n), dtype=np.float64)
        out_a, out_b, out_dot, out_na, out_nb = [], [], [], [], []
        for lo in range(0, len(apos), block):
            sel = apos[lo:lo + block]
            if not len(sel):
                continue
            blk_rows = mat[sel]                  # (b, dims)
            acc = np.zeros((len(sel), n), dtype=np.float64)
            buf = prod[:len(sel)]
            for i in range(dims):                # sequential dim order ==
                np.multiply(blk_rows[:, i:i + 1], mat[None, :, i], out=buf)
                acc += buf                       # the JVM fold
            cos = acc / (nrm[sel, None] * nrm[None, :])
            # upper triangle only: global row index > a-row's index
            cols = np.arange(n)[None, :]
            keep = (cols > sel[:, None]) & (cos >= cut)
            ai, bi = np.nonzero(keep)
            if len(ai):
                out_a.append(ids[sel[ai]])
                out_b.append(ids[bi])
                out_dot.append(acc[ai, bi])
                out_na.append(nrm[sel[ai]])
                out_nb.append(nrm[bi])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"),
                 "doc_b": pd.Series(dtype="int64"),
                 "dot": pd.Series(dtype="float64"),
                 "na": pd.Series(dtype="float64"),
                 "nb": pd.Series(dtype="float64")})
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b),
            "dot": np.concatenate(out_dot),
            "na": np.concatenate(out_na),
            "nb": np.concatenate(out_nb),
        })

    return fn
