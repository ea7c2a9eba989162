"""Shuffle helpers: pre-aggregated (combiner-style) grouped count/agg.

Scale-safe replacements for ``ds.groupby(cols).aggregate(...)`` on
high-cardinality string keys:

1. per-batch Arrow ``Table.group_by`` (C++ hash aggregation) — the
   *combiner*: the shuffle moves partial aggregates, never raw rows;
2. partials are hash-bucketed (crc32 of the joined key — process-stable,
   unlike ``hash()``) so the all-to-all exchange range-partitions a small
   int key instead of multi-column strings;
3. one Arrow group_by per bucket merges the partials.

All aggregates used are decomposable (min/max/sum/count as sum), so results
are exact at any parallelism (each key hashes to exactly one bucket).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SEP = "\x1f"


def _bucket_col(tbl: pa.Table, cols: list[str], num_buckets: int) -> pa.Table:
    joined = pc.binary_join_element_wise(
        *[pc.cast(tbl[c], pa.string()) for c in cols], _SEP
    )
    buckets = np.fromiter(
        (zlib.crc32(s.encode()) % num_buckets for s in joined.to_pylist()),
        dtype=np.int64,
        count=len(tbl),
    )
    return tbl.append_column("__bucket", pa.array(buckets, pa.int64()))


def grouped_count(ds: Dataset, cols: list[str], alias: str = "count",
                  num_buckets: int = 64) -> Dataset:
    """Exact ``groupby(cols).count()`` with combiner + bucketed merge."""

    def preagg(batch: pa.Table) -> pa.Table:
        g = batch.group_by(cols).aggregate([(cols[0], "count")])
        g = g.rename_columns([*cols, alias])
        return _bucket_col(g, cols, num_buckets)

    def per_bucket(g: pa.Table) -> pa.Table:
        out = g.group_by(cols).aggregate([(alias, "sum")])
        return out.rename_columns([*cols, alias])

    return (
        ds.map_batches(preagg, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def grouped_agg(ds: Dataset, cols: list[str], agg_spec: dict[str, tuple[str, str]],
                num_buckets: int = 64, pre_aggregated: bool = False) -> Dataset:
    """Exact grouped aggregation via the same bucket pattern.

    ``agg_spec``: output_col -> (source_col, how); ``how`` must be
    decomposable (min / max / sum). ``pre_aggregated=True`` skips the
    combiner when the input already holds one partial row per (batch, key).
    """
    outs = list(agg_spec)

    def combine(batch: pa.Table, src: bool) -> pa.Table:
        aggs = [((s if src else o), h) for o, (s, h) in agg_spec.items()]
        g = batch.group_by(cols).aggregate(aggs)
        return g.rename_columns([*cols, *outs])

    def preagg(batch: pa.Table) -> pa.Table:
        return _bucket_col(combine(batch, src=True), cols, num_buckets)

    def bucketize_only(batch: pa.Table) -> pa.Table:
        # input columns carry source names; rename to output names first
        cols_order = [*cols, *[s for _, (s, _h) in agg_spec.items()]]
        t = batch.select(cols_order).rename_columns([*cols, *outs])
        return _bucket_col(t, cols, num_buckets)

    def per_bucket(g: pa.Table) -> pa.Table:
        aggs = [(o, h) for o, (_s, h) in agg_spec.items()]
        out = g.select([*cols, *outs]).group_by(cols).aggregate(aggs)
        return out.rename_columns([*cols, *outs])

    first = bucketize_only if pre_aggregated else preagg
    return (
        ds.map_batches(first, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
