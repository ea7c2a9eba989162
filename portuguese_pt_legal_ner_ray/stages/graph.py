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
from ray.data import Dataset
from ray.data.aggregate import Min, Sum

from ..functions.normalize import entity_key
from .joins import BroadcastLookup, hash_join


def build_nodes(mentions_ds: Dataset, comp_ds: Dataset) -> Dataset:
    """(key,label,surface,n) ⋈ (key,comp) -> canonical node rows."""
    joined = hash_join(mentions_ds, comp_ds, key="key")
    nodes = joined.groupby("comp").aggregate(
        Min("surface", alias_name="canonical_surface"),
        Sum("n", alias_name="n_mentions"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        comps = batch["comp"].to_pylist()
        return pa.table(
            {
                "entity_id": batch["comp"],
                "canonical_surface": batch["canonical_surface"],
                "label": pa.array([c.split("|", 1)[0] for c in comps], pa.string()),
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


def build_edges(triples_ds: Dataset, mapping_ref=None, comp_ds: Dataset | None = None) -> Dataset:
    """Canonicalized, weighted edge table from flat triple rows.

    ``mapping_ref``: ObjectRef to the key->comp dict (broadcast path);
    ``comp_ds``: (key, comp) Dataset (distributed path). Exactly one given.
    """
    keyed = triples_ds.map_batches(_add_entity_keys, batch_format="pandas")
    if mapping_ref is not None:
        keyed = keyed.map_batches(
            BroadcastLookup, batch_format="pandas",
            fn_constructor_kwargs=dict(mapping_ref=mapping_ref, key_col="subj_key", out_col="subj_id"),
            concurrency=(1, 8),
        ).map_batches(
            BroadcastLookup, batch_format="pandas",
            fn_constructor_kwargs=dict(mapping_ref=mapping_ref, key_col="obj_key", out_col="obj_id"),
            concurrency=(1, 8),
        )
    else:
        sc = comp_ds.map_batches(
            lambda t: pa.table({"subj_key": t["key"], "subj_id": t["comp"]}),
            batch_format="pyarrow",
        )
        oc = comp_ds.map_batches(
            lambda t: pa.table({"obj_key": t["key"], "obj_id": t["comp"]}),
            batch_format="pyarrow",
        )
        keyed = hash_join(hash_join(keyed, sc, key="subj_key"), oc, key="obj_key")
    return (
        keyed.groupby(["subj_id", "pred", "obj_id"])
        .count()
        .map_batches(
            lambda t: t.rename_columns(["subj_id", "pred", "obj_id", "weight"]),
            batch_format="pyarrow",
        )
    )
