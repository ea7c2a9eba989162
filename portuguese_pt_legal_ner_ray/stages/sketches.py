"""Mergeable sketches: KMV (k-minimum-values) approximate distinct count.

The decomposable-aggregate pattern for when exact distinct (a full shuffle,
see stages/shuffle.grouped_count) is too expensive at 10^12 rows: each
batch keeps the k smallest md5 hashes of its values (a combiner), partial
sketches merge by keeping the global k smallest — order-free and exact
under union, so the estimate is identical at any parallelism. Estimator:
(k-1) / kth_min_normalized (standard KMV).
"""

from __future__ import annotations

import hashlib
import heapq

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_MAX32 = float(1 << 32)


def _hash_values(values: list) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
         for v in values),
        dtype=np.uint64, count=len(values),
    )


def approx_distinct(ds: Dataset, col: str, k: int = 1024) -> float:
    """KMV estimate of the number of distinct values in ``col``."""

    def partial(batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_values(batch[col].to_pylist()))
        smallest = h[:k] if len(h) <= k else np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(np.sort(smallest), pa.uint64())})

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    uniq = np.unique(merged["h"].to_numpy())
    if len(uniq) < k:
        return float(len(uniq))  # saw everything: exact
    kth = float(np.sort(uniq)[k - 1])
    return (k - 1) / (kth / _MAX32)


def merge_kmv(sketches: list[np.ndarray], k: int) -> np.ndarray:
    """Union of KMV sketches = k smallest of the union (mergeable proof)."""
    return np.array(sorted(heapq.nsmallest(k, set().union(*map(set, sketches)))),
                    dtype=np.uint64)
