"""Distributed connected components via min-label propagation.

Used when the distinct-entity graph exceeds driver memory
(stages/linking.py DRIVER_CC_MAX_KEYS). Pure Dataset algebra — each
iteration is ONE streamed plan with two groupby shuffles:

1. ``groupby(node)`` over the union of comp rows ``(node, comp)`` and edge
   rows ``(node=src, dst)`` — every group holds a node's current component
   id and its out-neighbors, and emits ``(dst, comp)`` messages plus its own
   assignment (an explicit join-free message-passing step);
2. ``groupby(node).Min(comp)`` — the min-label reduce.

Convergence = assignment checksum unchanged (a cheap sum job per round),
bounded by ``max_iters``; components here are shallow same-as variant
clusters, so rounds ≈ component diameter. Component id converges to the
lexicographic-min key of each component — the same contract as the driver
union-find (SURVEY.md §7 "what's hard" #1/#2), so both paths agree exactly.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min


def _checksum(comp: Dataset) -> int:
    def partial(batch: pa.Table) -> pa.Table:
        s = 0
        for k, c in zip(batch["node"].to_pylist(), batch["comp"].to_pylist()):
            s += zlib.crc32(f"{k}->{c}".encode())
        return pa.table({"crc": pa.array([s], pa.int64())})

    return comp.map_batches(partial, batch_format="pyarrow").sum("crc")


def connected_components_distributed(
    keys_ds: Dataset, pairs_ds: Dataset, max_iters: int = 15
) -> Dataset:
    """keys_ds: (key), pairs_ds: (a, b) -> Dataset of (key, comp)."""
    comp = keys_ds.map_batches(
        lambda t: pa.table({"node": t["key"], "comp": t["key"],
                            "dst": pa.nulls(len(t), pa.string())}),
        batch_format="pyarrow",
    ).materialize()  # small: one row per distinct key

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = pa.chunked_array([batch["a"], batch["b"]]).combine_chunks()
        dst = pa.chunked_array([batch["b"], batch["a"]]).combine_chunks()
        return pa.table({"node": src, "comp": pa.nulls(len(src), pa.string()), "dst": dst})

    edges = pairs_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return comp.map_batches(
            lambda t: pa.table({"key": t["node"], "comp": t["comp"]}),
            batch_format="pyarrow",
        )

    def emit_messages(g: pd.DataFrame) -> pa.Table:
        own = g["comp"].dropna()
        comp_val = own.min()  # exactly one non-null in a well-formed group
        dsts = g["dst"].dropna().tolist()
        nodes = [g["node"].iloc[0], *dsts]
        return pa.table(
            {
                "node": pa.array(nodes, pa.string()),
                "comp": pa.array([comp_val] * len(nodes), pa.string()),
            }
        )

    last_crc = _checksum(
        comp.map_batches(lambda t: pa.table({"node": t["node"], "comp": t["comp"]}),
                         batch_format="pyarrow")
    )
    for _ in range(max_iters):
        new_comp = (
            comp.union(edges)
            .groupby("node")
            .map_groups(emit_messages, batch_format="pandas")
            .groupby("node")
            .aggregate(Min("comp", alias_name="comp"))
            .map_batches(
                lambda t: pa.table({"node": t["node"], "comp": t["comp"],
                                    "dst": pa.nulls(len(t), pa.string())}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        crc = _checksum(
            new_comp.map_batches(
                lambda t: pa.table({"node": t["node"], "comp": t["comp"]}),
                batch_format="pyarrow",
            )
        )
        comp = new_comp
        if crc == last_crc:
            break
        last_crc = crc
    return comp.map_batches(
        lambda t: pa.table({"key": t["node"], "comp": t["comp"]}),
        batch_format="pyarrow",
    )
