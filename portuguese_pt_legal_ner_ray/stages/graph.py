"""Graph materialization: nodes and edges tables (SURVEY.md §7 step 7).

nodes = one row per canonical entity: ``(entity_id, canonical_surface,
label, n_mentions)`` — groupby(component) with Min/Sum aggregates (order-free
reducers, never first-seen).
edges = exact-dedup of canonicalized triples with count as weight:
``(subj_id, pred, obj_id, weight)`` — the groupby([subj,pred,obj]).count()
pattern from SURVEY.md §2.5.

Canonical-id application is a broadcast small-side lookup (``ray.put`` once,
dict read per actor) by default, or two partitioned hash_joins when the
mapping outgrows the driver (stages/joins.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ..functions.normalize import entity_key
from .joins import hash_join


def build_nodes(mentions_ds: Dataset, comp_ds: Dataset) -> Dataset:
    """(key,label,surface,n) ⋈ (key,comp) -> canonical node rows."""
    joined = hash_join(mentions_ds, comp_ds, key="key")
    nodes = joined.groupby("comp").aggregate(
        Min("surface", alias_name="canonical_surface"),
        Sum("n", alias_name="n_mentions"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        # Arrow-native "LABEL|surface" -> "LABEL": split at the first '|'.
        label = pc.list_element(
            pc.split_pattern(batch["comp"], pattern="|", max_splits=1), 0
        )
        return pa.table(
            {
                "entity_id": batch["comp"],
                "canonical_surface": batch["canonical_surface"],
                "label": pc.cast(label, pa.string()),
                "n_mentions": batch["n_mentions"],
            }
        )

    return nodes.map_batches(finish, batch_format="pyarrow")


def _add_entity_keys(batch: pd.DataFrame) -> pd.DataFrame:
    batch["subj_key"] = [
        entity_key(l, s) for l, s in zip(batch["subj_label"], batch["subj"])
    ]
    batch["obj_key"] = [
        entity_key(l, s) for l, s in zip(batch["obj_label"], batch["obj"])
    ]
    return batch


def make_canonize(mapping_ref):
    """Task fn: (subj, pred, obj, labels) -> (subj_id, pred, obj_id).

    The broadcast mapping is fetched lazily via ``ray.get`` inside the task
    (zero-copy from the node-local object store — one transfer per node, not
    per batch). Normalization (unicode NFKD) dominated this stage's profile;
    surfaces repeat HEAVILY, so each column is Arrow dictionary-encoded and
    the key/lookup runs once per DISTINCT (label, surface) of the batch
    (memoized across batches per worker) — the per-row work is a vectorized
    ``take``, no Python in the row loop.
    """
    state: dict = {}

    def canonize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _ray

        mapping = state.get("m")
        if mapping is None:
            mapping = state["m"] = _ray.get(mapping_ref)
            state["cache"] = {}
        cache = state["cache"]

        def _id(joined_key: str) -> str:
            k = cache.get(joined_key)
            if k is None:
                label, surface = joined_key.split("\x00", 1)
                ek = entity_key(label, surface)
                k = cache[joined_key] = mapping.get(ek, ek)
            return k

        def col_ids(labels, surfaces) -> pa.Array:
            joined = pc.binary_join_element_wise(
                labels.combine_chunks() if isinstance(labels, pa.ChunkedArray) else labels,
                surfaces.combine_chunks() if isinstance(surfaces, pa.ChunkedArray) else surfaces,
                "\x00",
            )
            enc = joined.dictionary_encode()
            mapped = pa.array([_id(u) for u in enc.dictionary.to_pylist()],
                              pa.string())
            return pc.take(mapped, enc.indices)

        return pa.table(
            {
                "subj_id": col_ids(batch["subj_label"], batch["subj"]),
                "pred": batch["pred"],
                "obj_id": col_ids(batch["obj_label"], batch["obj"]),
            }
        )

    return canonize


def build_edges(triples_ds: Dataset, mapping_ref=None, comp_ds: Dataset | None = None) -> Dataset:
    """Canonicalized, weighted edge table from flat triple rows.

    ``mapping_ref``: ObjectRef to the key->comp dict (broadcast path);
    ``comp_ds``: (key, comp) Dataset (distributed path). Exactly one given.
    """
    if mapping_ref is not None:
        # plain tasks (not an actor pool): the broadcast ref resolves from the
        # local object store inside each task, and skipping actor startup
        # latency matters more than cross-batch memoization here
        keyed = triples_ds.map_batches(make_canonize(mapping_ref), batch_format="pyarrow")
    else:
        keyed = triples_ds.map_batches(_add_entity_keys, batch_format="pandas")
        sc = comp_ds.map_batches(
            lambda t: pa.table({"subj_key": t["key"], "subj_id": t["comp"]}),
            batch_format="pyarrow",
        )
        oc = comp_ds.map_batches(
            lambda t: pa.table({"obj_key": t["key"], "obj_id": t["comp"]}),
            batch_format="pyarrow",
        )
        keyed = hash_join(hash_join(keyed, sc, key="subj_key"), oc, key="obj_key")
    from .shuffle import grouped_count

    return grouped_count(keyed, ["subj_id", "pred", "obj_id"], alias="weight")
