"""Vectorized similarity operators over embedding columns.

Random-hyperplane LSH bucketing for ANN candidate generation: each vector
gets an ``n_planes``-bit signature (one sign bit per hyperplane); search then
touches only same-bucket candidates instead of all vectors — the scale path
that replaces the brute-force cosine oracle at 100 TB.

Design (VERDICT r01 items 5/6 — the previous version chained 8×64 getItem
terms into one Catalyst expression, which dies at real embedding dims):

* the dot products run as ONE Arrow-batched pandas UDF — a numpy int64
  matmul against the plane matrix — so the plan cost is O(1) expressions
  regardless of dimensionality (tested at dim 768);
* planes are deterministic (md5-seeded integer coefficients in [-1000,
  1000]), derived from the batch's own dimensionality, so the operator
  needs no fitted state and any two runs agree;
* embeddings are quantized to ``floor(x * 1000)`` int64 before the matmul:
  float32→float64 is exact and ×1000 stays within the 53-bit mantissa, so
  the quantization — and hence the integer dot product — is EXACTLY
  order-independent and reproducible across engines (numpy, Spark, DuckDB),
  which is what lets the harness pin this operator to a SQL oracle instead
  of a rows-only check.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

N_PLANES = 8
QUANT = 1000


def plane_coefficients(n_planes: int, dims: int) -> list[list[int]]:
    """Deterministic integer hyperplane coefficients in [-1000, 1000]."""
    return [
        [
            int(hashlib.md5(f"plane{p}|{d}".encode()).hexdigest()[:8], 16) % 2001
            - 1000
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


@lru_cache(maxsize=8)
def _plane_matrix(dims: int, n_planes: int = N_PLANES) -> np.ndarray:
    return np.asarray(plane_coefficients(n_planes, dims), dtype=np.int64)


def make_lsh_bucket(n_planes: int = N_PLANES):
    """Build the bucketing UDF for a given signature width: fewer planes →
    wider buckets (higher recall, more candidates per probe); more planes →
    narrower buckets (the dedup-leaning end)."""

    @F.pandas_udf(IntegerType())
    def lsh_bucket(emb: pd.Series) -> pd.Series:
        """array<float> embedding → n_planes-bit LSH bucket id (int32)."""
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        mat = np.vstack(emb.to_numpy())
        quant = np.floor(mat.astype(np.float64) * QUANT).astype(np.int64)
        planes = _plane_matrix(quant.shape[1], n_planes)
        dots = quant @ planes.T
        pow2 = 1 << np.arange(planes.shape[0], dtype=np.int64)
        return pd.Series(((dots > 0) @ pow2).astype("int32"))

    return lsh_bucket


lsh_bucket = make_lsh_bucket(N_PLANES)
