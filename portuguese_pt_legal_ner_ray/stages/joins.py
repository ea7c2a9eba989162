"""Join helpers for Ray Data (SURVEY.md §2.4 — the reference has no joins;
the target pipeline adds broadcast lookups and a partitioned hash join).

* ``broadcast_map_batch`` — small-side lookup: the mapping dict is put in the
  object store ONCE (``ray.put`` on the driver) and resolved once per task
  from the local object store, never re-shipped per batch.
* ``hash_join`` — both-sides-large equi-join expressed as
  union-with-source-tag → bucketed ``groupby(__bucket).map_groups`` (an
  explicit hash-partitioned join; the portable pattern from the Ray
  guide). Inner join, one pandas merge per bucket. Single-column or
  composite (key list) keys — rows route by the hash of the key tuple.
* ``hash_left_join`` — LEFT OUTER variant; per-bucket Arrow native join so
  unmatched int64 payloads become typed nulls (never NaN-float-promoted).
* ``hash_anti_join`` / ``hash_semi_join`` — SQL NOT EXISTS / EXISTS; the
  probe side ships only per-batch-distinct key tuples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def put_broadcast(obj) -> "ray.ObjectRef":
    return ray.put(obj)


class BroadcastLookup:
    """map_batches callable: adds columns by dict lookup on a key column.

    ``mapping_ref`` is a ``ray.ObjectRef`` to a dict; fetched once per actor
    (zero-copy shared memory on one node; one transfer per node in a
    cluster).
    """

    def __init__(self, mapping_ref, key_col: str, out_col: str, default=None):
        self.mapping = ray.get(mapping_ref)
        if any(v is None for v in self.mapping.values()):
            raise ValueError("BroadcastLookup mapping values must be non-null "
                             "(None is indistinguishable from a missing key)")
        self.key_col = key_col
        self.out_col = out_col
        self.default = default

        _I64_MIN, _I64_MAX = np.iinfo(np.int64).min, np.iinfo(np.int64).max

        def _is_i64(x) -> bool:
            return (isinstance(x, (int, np.integer)) and not isinstance(x, bool)
                    and _I64_MIN <= int(x) <= _I64_MAX)

        # all-int64-range mapping: precompute sorted key/value arrays so
        # lookups run as exact int64 searchsorted — Series.map would
        # round-trip found values through float64 (NaN promote), silently
        # corrupting integers above 2^53 (hash/fingerprint ids). Out-of-
        # int64-range ints (raw uint64 hashes) fall back to the map path.
        self._k_arr = self._v_arr = None
        if (self.mapping and (default is None or _is_i64(default))
                and all(_is_i64(k) for k in self.mapping)
                and all(_is_i64(v) for v in self.mapping.values())):
            items = sorted(self.mapping.items())
            self._k_arr = np.array([k for k, _ in items], dtype=np.int64)
            self._v_arr = np.array([v for _, v in items], dtype=np.int64)
        # map-path dtype restore is only exact below 2^53 (float64 mantissa)
        self._small_int_values = all(
            isinstance(v, (int, np.integer)) and not isinstance(v, bool)
            and abs(int(v)) < 2 ** 53
            for v in self.mapping.values()
        ) if self.mapping else False
        # int values beyond 2^53 that the searchsorted path can't serve
        # (e.g. raw uint64 hashes > int64 max) would be corrupted by the
        # pandas float64 round-trip: serve them with an exact object loop
        self._need_exact_loop = self._k_arr is None and any(
            isinstance(v, (int, np.integer)) and not isinstance(v, bool)
            and abs(int(v)) >= 2 ** 53
            for v in self.mapping.values()
        )

    @staticmethod
    def _is_uint64(keys: pd.Series) -> bool:
        arr = keys.to_numpy()
        return arr.dtype.kind == "u" and arr.dtype.itemsize == 8

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[self.key_col]
        if (pd.api.types.is_integer_dtype(keys) and not keys.isna().any()
                and self._is_uint64(keys)):
            # uint64-keyed batches ALWAYS take the exact loop and emit a
            # uint64 column: the searchsorted fast path's to_numpy(int64)
            # silently WRAPS keys above 2^63 (a wrapped key misses the
            # mapping — or spuriously equals a negative mapping key — and
            # the identity fallback emits the wrapped negative value), and
            # deciding per batch would give wrapping and non-wrapping
            # blocks of one Dataset different output dtypes (int64 vs
            # uint64), breaking block-schema agreement downstream.
            m, d = self.mapping, self.default
            vals = [m.get(int(k), int(k) if d is None else d) for k in keys]
            if all(isinstance(v, (int, np.integer)) and not isinstance(v, bool)
                   for v in vals):
                if any(int(v) < 0 for v in vals):
                    raise ValueError(
                        "BroadcastLookup: negative mapping/default values "
                        "are not representable in the uint64 output column "
                        "that uint64 keys require (mixed-sign output has "
                        "no exact integer dtype)")
                batch[self.out_col] = np.array(vals, dtype=np.uint64)
            else:  # non-integer payload values: keep exact objects
                batch[self.out_col] = vals
            return batch
        if (self._k_arr is not None and pd.api.types.is_integer_dtype(keys)
                and not keys.isna().any()):  # nullable Int64 NA -> map path
            kn = keys.to_numpy(dtype=np.int64)
            idx = np.clip(np.searchsorted(self._k_arr, kn), 0, len(self._k_arr) - 1)
            hit = self._k_arr[idx] == kn
            fb = kn if self.default is None else np.int64(self.default)
            batch[self.out_col] = np.where(hit, self._v_arr[idx], fb)
            return batch
        if self._need_exact_loop:
            m, d = self.mapping, self.default
            batch[self.out_col] = [m.get(k, k if d is None else d) for k in keys]
            return batch
        mapped = keys.map(self.mapping)  # vectorized dict lookup (object values)
        miss = mapped.isna()
        if miss.any():
            mapped = mapped.where(~miss, keys if self.default is None else self.default)
            int_fallback = ((self.default is None and pd.api.types.is_integer_dtype(keys))
                            or (isinstance(self.default, (int, np.integer))
                                and not isinstance(self.default, bool)))
            if self._small_int_values and int_fallback:
                mapped = mapped.astype(np.int64)  # undo the NaN float64 promote
        batch[self.out_col] = mapped
        return batch


def _key_list(key) -> list[str]:
    """Normalize ``key`` (one column name or a list for composite-key
    equi-joins, e.g. ``["url", "para_idx"]``) to a list."""
    return [key] if isinstance(key, str) else list(key)


def _bucket_hash(t: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    """hash(joined key cols) % num_buckets — the same kernel as
    ``shuffle.bucket_by`` (single definition of separator + hash) so every
    occurrence of a composite key co-locates regardless of which stage
    routed it. For a single key the join is the identity, so single-key
    routing is byte-identical to the pre-composite behavior."""
    import pyarrow.compute as pc

    from .shuffle import _SEP, hash_strings

    joined = pc.binary_join_element_wise(
        *[pc.cast(t[k], pa.string()) for k in keys], _SEP
    )
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return (hash_strings(joined) % np.uint64(num_buckets)).astype(np.int64)


def hash_join(ds_a, ds_b, key, num_buckets: int = 64, bucket_post=None):
    """Inner equi-join of two Datasets on ``key`` (a column name, or a LIST
    of names for a composite key) via a bucketed hash shuffle.

    Used when neither side fits a broadcast (e.g. canonical-id application at
    10^12-doc scale). Rows are routed by ``hash(key) % num_buckets`` and each
    bucket is joined with ONE vectorized ``pandas.merge`` — the shuffle key
    is a small int and the join UDF runs once per bucket, not once per
    distinct key (a per-key ``map_groups`` costs a Python call + pandas
    slice per key, which dominated profiles at ~100k keys). Payload
    (non-key) column names must be disjoint. Both sides are reindexed to one
    shared schema before the union so every block agrees on layout.

    ``bucket_post``: optional ``pd.DataFrame -> pa.Table`` applied to each
    bucket's merged frame INSIDE the join stage — fuses a post-join
    transform (filter/projection) so wide joined payloads (e.g. both texts
    of a candidate pair) are consumed where they were joined instead of
    being re-blocked and shipped to a separate stage. The callback owns the
    output schema (emit a metadata-free table, see join_bucket).
    """
    def _fields(ds):
        sch = ds.schema()
        out = {}
        for n, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(np.dtype(t))
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()  # pandas object dtype -> string payloads
            out[n] = t
        return out

    keys = _key_list(key)
    fa, fb = _fields(ds_a), _fields(ds_b)
    missing = [k for k in keys if k not in fa or k not in fb]
    if missing:
        raise ValueError(f"hash_join key columns missing from a side: {missing}")
    a_cols = [c for c in fa if c not in keys]
    b_cols = [c for c in fb if c not in keys]
    overlap = set(a_cols) & set(b_cols)
    if overlap:
        raise ValueError(f"hash_join payload columns must be disjoint: {overlap}")
    out_schema = pa.schema(
        [(k, fa[k]) for k in keys] + [(c, fa[c]) for c in a_cols]
        + [(c, fb[c]) for c in b_cols]
    )

    import pyarrow.compute as pc

    # one shared tagged schema both sides reindex to (missing payload
    # columns become typed nulls), so union blocks agree on layout
    tagged_schema = pa.schema(
        [(k, fa[k]) for k in keys] + [(c, fa[c]) for c in a_cols]
        + [(c, fb[c]) for c in b_cols]
        + [("__src", pa.int8()), ("__bucket", pa.int64())]
    )

    def tag(src: int, own_cols: list[str]):
        # Arrow-native tag: no pandas copy per batch; the bucket is the
        # shared vectorized string hash of the (composite) key columns
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            buckets = _bucket_hash(t, keys, num_buckets)
            cols = []
            for field in tagged_schema:
                if field.name == "__src":
                    cols.append(pa.array(np.full(n, src, dtype=np.int8)))
                elif field.name == "__bucket":
                    cols.append(pa.array(buckets, pa.int64()))
                elif field.name in keys or field.name in own_cols:
                    cols.append(pc.cast(t[field.name], field.type))
                else:
                    cols.append(pa.nulls(n, field.type))
            return pa.table(dict(zip(tagged_schema.names, cols)))

        return f

    def join_bucket(g: pa.Table) -> pa.Table:
        # filter sides in Arrow FIRST so each side's pandas view has no
        # nulls (a null-bearing int64 column would float64-promote and
        # corrupt ids above 2^53 in the merge)
        left = g.filter(pc.equal(g["__src"], 0)).select([*keys, *a_cols]).to_pandas()
        right = g.filter(pc.equal(g["__src"], 1)).select([*keys, *b_cols]).to_pandas()
        merged = left.merge(right, on=keys, how="inner")
        if bucket_post is not None:
            return bucket_post(merged)
        # explicit schema so empty groups still emit typed Arrow blocks;
        # strip the b'pandas' schema metadata from_pandas attaches — it is a
        # plain (unhashable) dict on this pyarrow, which defeats Ray's
        # schema-dedup hash and floods logs with hash-failure warnings
        return pa.Table.from_pandas(
            merged, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    a_tagged = ds_a.map_batches(tag(0, a_cols), batch_format="pyarrow")
    b_tagged = ds_b.map_batches(tag(1, b_cols), batch_format="pyarrow")
    return a_tagged.union(b_tagged).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def hash_anti_join(ds_a, ds_b, key, num_buckets: int = 64):
    """Rows of ``ds_a`` whose ``key`` (one column or a composite key list)
    appears NOWHERE in ``ds_b`` (SQL ``NOT EXISTS`` / anti equi-join).

    Same bucketed exchange as :func:`hash_join` — both sides routed by the
    vectorized ``hash(key) % num_buckets`` so every occurrence of a key
    co-locates — but the probe side ships ONLY its per-batch-distinct key
    column(s) (an anti join never reads right payloads), and each bucket is
    resolved with one Arrow ``is_in`` mask over the joined key string: no
    pandas, no per-key work. Exact at any parallelism.
    """
    return _semi_or_anti(ds_a, ds_b, key, num_buckets, keep_matching=False)


def _semi_or_anti(ds_a, ds_b, key, num_buckets: int, keep_matching: bool):
    """Shared kernel for :func:`hash_anti_join` (keep keys ABSENT from
    ds_b) and :func:`hash_semi_join` (keep keys PRESENT in ds_b)."""
    import pyarrow.compute as pc

    from .shuffle import _SEP

    keys = _key_list(key)
    sch = ds_a.schema()
    a_fields = list(zip(sch.names, sch.types))
    a_names = [n for n, _ in a_fields]
    a_types = dict(a_fields)
    missing = [k for k in keys if k not in a_types]
    if missing:
        raise ValueError(f"hash_anti_join key columns missing from ds_a: {missing}")
    tagged_schema = pa.schema(
        a_fields + [("__src", pa.int8()), ("__bucket", pa.int64())]
    )

    def tag_a(t: pa.Table) -> pa.Table:
        buckets = _bucket_hash(t, keys, num_buckets)
        cols = [pc.cast(t[n], ty) for n, ty in a_fields]
        cols.append(pa.array(np.zeros(len(t), dtype=np.int8)))
        cols.append(pa.array(buckets, pa.int64()))
        return pa.table(dict(zip(tagged_schema.names, cols)))

    def tag_b(t: pa.Table) -> pa.Table:
        # per-batch distinct key tuples only: the anti side's payload never
        # crosses the wire, and repeats collapse before the shuffle
        kt = pa.table(
            {k: pc.cast(t[k], a_types[k]) for k in keys}
        ).group_by(keys).aggregate([])
        buckets = _bucket_hash(kt, keys, num_buckets)
        cols = []
        for n, ty in a_fields:
            cols.append(kt[n].combine_chunks() if n in keys
                        else pa.nulls(len(kt), ty))
        cols.append(pa.array(np.ones(len(kt), dtype=np.int8)))
        cols.append(pa.array(buckets, pa.int64()))
        return pa.table(dict(zip(tagged_schema.names, cols)))

    def _joined_key(t: pa.Table):
        if len(keys) == 1:
            return t[keys[0]].combine_chunks()
        j = pc.binary_join_element_wise(
            *[pc.cast(t[k], pa.string()) for k in keys], _SEP
        )
        return j.combine_chunks() if isinstance(j, pa.ChunkedArray) else j

    def anti_bucket(g: pa.Table) -> pa.Table:
        left = g.filter(pc.equal(g["__src"], 0))
        right = g.filter(pc.equal(g["__src"], 1))
        keep = pc.is_in(_joined_key(left), value_set=_joined_key(right).unique())
        if not keep_matching:
            keep = pc.invert(keep)
        return left.filter(keep).select(a_names)

    return (
        ds_a.map_batches(tag_a, batch_format="pyarrow")
        .union(ds_b.map_batches(tag_b, batch_format="pyarrow"))
        .groupby("__bucket")
        .map_groups(anti_bucket, batch_format="pyarrow")
    )


def hash_left_join(ds_a, ds_b, key, num_buckets: int = 64):
    """LEFT OUTER equi-join on ``key`` (single column or composite list):
    every ``ds_a`` row survives, matched ``ds_b`` payloads attach, misses
    get typed nulls.

    Same bucketed exchange as :func:`hash_join`, but each bucket resolves
    with Arrow's native ``Table.join(join_type="left outer")`` instead of
    a pandas merge — pandas would float64-promote unmatched int64 payloads
    (NaN), corrupting ids above 2^53; Arrow emits typed nulls directly.
    """
    import pyarrow.compute as pc

    keys = _key_list(key)

    def _fields(ds):
        sch = ds.schema()
        out = {}
        for n, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(np.dtype(t))
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()
            out[n] = t
        return out

    fa, fb = _fields(ds_a), _fields(ds_b)
    missing = [k for k in keys if k not in fa or k not in fb]
    if missing:
        raise ValueError(f"hash_left_join key columns missing from a side: {missing}")
    a_cols = [c for c in fa if c not in keys]
    b_cols = [c for c in fb if c not in keys]
    overlap = set(a_cols) & set(b_cols)
    if overlap:
        raise ValueError(f"hash_left_join payload columns must be disjoint: {overlap}")
    out_names = [*keys, *a_cols, *b_cols]

    tagged_schema = pa.schema(
        [(k, fa[k]) for k in keys] + [(c, fa[c]) for c in a_cols]
        + [(c, fb[c]) for c in b_cols]
        + [("__src", pa.int8()), ("__bucket", pa.int64())]
    )

    def tag(src: int, own_cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            buckets = _bucket_hash(t, keys, num_buckets)
            cols = []
            for field in tagged_schema:
                if field.name == "__src":
                    cols.append(pa.array(np.full(n, src, dtype=np.int8)))
                elif field.name == "__bucket":
                    cols.append(pa.array(buckets, pa.int64()))
                elif field.name in keys or field.name in own_cols:
                    cols.append(pc.cast(t[field.name], field.type))
                else:
                    cols.append(pa.nulls(n, field.type))
            return pa.table(dict(zip(tagged_schema.names, cols)))

        return f

    def join_bucket(g: pa.Table) -> pa.Table:
        left = g.filter(pc.equal(g["__src"], 0)).select([*keys, *a_cols])
        right = g.filter(pc.equal(g["__src"], 1)).select([*keys, *b_cols])
        out = left.combine_chunks().join(
            right.combine_chunks(), keys=keys, join_type="left outer"
        )
        return out.select(out_names).replace_schema_metadata(None)

    a_tagged = ds_a.map_batches(tag(0, a_cols), batch_format="pyarrow")
    b_tagged = ds_b.map_batches(tag(1, b_cols), batch_format="pyarrow")
    return a_tagged.union(b_tagged).groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def hash_semi_join(ds_a, ds_b, key, num_buckets: int = 64):
    """Rows of ``ds_a`` whose ``key`` (single or composite) appears at
    least once in ``ds_b`` (SQL ``EXISTS`` / semi equi-join) — the
    complement of :func:`hash_anti_join`, with the same probe-side
    contract: ``ds_b`` ships only per-batch-distinct key tuples.
    """
    return _semi_or_anti(ds_a, ds_b, key, num_buckets, keep_matching=True)
