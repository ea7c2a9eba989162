"""Scale-path evidence benches (VERDICT r3 items #1 and #2 done-criteria).

1. ``--ivf``: ivf_topk compute must scale with the probed corpus fraction
   (nprobe/n_cells), not corpus size. Times the query over a synthetic
   512k x 64 vector table at nprobe in {1, 4, 16, 64} with n_cells=64 and
   1024 queries (enough that the query matmul dominates the fixed
   read + cell-assignment cost) — sublinear pruning shows as wall time
   growing with nprobe while the fixed costs stay flat.
2. ``--cc``: the bucket-vectorized distributed-CC fallback vs the previous
   per-node ``groupby(node).map_groups`` message passing, on a 200k-node /
   150k-edge chain graph (50k chains of 4, diameter 3). The new path runs
   to convergence and is asserted equal to driver union-find; the old/new
   speed comparison times ONE propagation iteration each (the loop body is
   what changed — per-node costs one Python call per distinct key per
   iteration, so a full converged run of the old path would take tens of
   minutes at this size, which is exactly the point).

3. ``--edges-skew``: the edges ``grouped_count`` under adversarial key
   skew (one exact triple / one hub entity at 40% of 5M rows) vs a uniform
   baseline — the combiner + full-composite-key bucket hash should keep
   the delta under 2x (VERDICT r4 #5; see bench_edges_skew docstring).
4. ``--ann-index``: persisted-index query set vs one-shot ivf_topk at the
   same nprobe on 512k vectors (VERDICT r4 #2 done-criterion; see
   bench_ann_index_vs_oneshot docstring for the small-table caveat).

Results are recorded in BASELINE.md. Owns its Ray session (script entry).

    python scripts/bench_scale_paths.py --ivf --cc --edges-skew [--cpus 32]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHM = Path("/dev/shm/kgray_scalebench")


def ensure_vectors(n: int = 512_000, dim: int = 64) -> Path:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = SHM / f"vectors_{n}x{dim}.parquet"
    if path.exists():
        return path
    SHM.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    flat = pa.array(mat.ravel(), pa.float32())
    offs = pa.array(np.arange(n + 1, dtype=np.int32) * dim)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })
    pq.write_table(tbl, path)
    return path


def bench_ivf(cpus: int) -> dict:
    import ray

    from portuguese_pt_legal_ner_ray.sources.parquet import sized_read_parquet
    from portuguese_pt_legal_ner_ray.stages.similarity import ivf_topk, make_query_ref

    path = ensure_vectors()
    out: dict = {}
    n_cells = 64
    for nprobe in (1, 4, 16, 64):
        vecs = sized_read_parquet(str(path), min_blocks=cpus)
        qref = make_query_ref(vecs, list(range(1024)))
        t0 = time.time()
        n = ivf_topk(vecs, qref, k=10, n_cells=n_cells, nprobe=nprobe).count()
        out[f"nprobe_{nprobe}"] = round(time.time() - t0, 2)
        assert n > 0
    out["n_cells"] = n_cells
    return out


def _cc_inputs():
    """50k chains of 4 nodes: 200k keys, 150k undirected pair rows."""
    import pyarrow as pa
    import ray

    keys = [f"k{i:06d}" for i in range(200_000)]
    a, b = [], []
    for i in range(0, 200_000, 4):
        for j in range(3):
            a.append(keys[i + j])
            b.append(keys[i + j + 1])
    keys_ds = ray.data.from_arrow(
        pa.table({"key": pa.array(keys, pa.string())})).repartition(32)
    pairs_ds = ray.data.from_arrow(
        pa.table({"a": pa.array(a, pa.string()),
                  "b": pa.array(b, pa.string())})).repartition(32)
    return keys_ds, pairs_ds


def _cc_per_node_reference(keys_ds, pairs_ds, max_iters: int = 1):
    """The round-3 implementation: one map_groups UDF call PER NODE per
    iteration — kept here (test/bench only) as the comparison baseline."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Min

    from portuguese_pt_legal_ner_ray.state.components import _checksum

    comp = keys_ds.map_batches(
        lambda t: pa.table({"node": t["key"], "comp": t["key"],
                            "dst": pa.nulls(len(t), pa.string())}),
        batch_format="pyarrow",
    ).materialize()

    def edge_rows(batch: pa.Table) -> pa.Table:
        src = pa.chunked_array([batch["a"], batch["b"]]).combine_chunks()
        dst = pa.chunked_array([batch["b"], batch["a"]]).combine_chunks()
        return pa.table({"node": src, "comp": pa.nulls(len(src), pa.string()),
                         "dst": dst})

    edges = pairs_ds.map_batches(edge_rows, batch_format="pyarrow").materialize()

    def emit_messages(g: pd.DataFrame) -> pa.Table:
        own = g["comp"].dropna()
        comp_val = own.min()
        dsts = g["dst"].dropna().tolist()
        nodes = [g["node"].iloc[0], *dsts]
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "comp": pa.array([comp_val] * len(nodes), pa.string())})

    last = _checksum(comp.map_batches(
        lambda t: pa.table({"node": t["node"], "comp": t["comp"]}),
        batch_format="pyarrow"))
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
                batch_format="pyarrow")
            .materialize()
        )
        crc = _checksum(new_comp.map_batches(
            lambda t: pa.table({"node": t["node"], "comp": t["comp"]}),
            batch_format="pyarrow"))
        comp = new_comp
        if crc == last:
            break
        last = crc
    return comp.map_batches(
        lambda t: pa.table({"key": t["node"], "comp": t["comp"]}),
        batch_format="pyarrow")


def bench_cc() -> dict:
    from portuguese_pt_legal_ner_ray.oracle import _UnionFind
    from portuguese_pt_legal_ner_ray.state.components import (
        connected_components_distributed,
    )

    keys_ds, pairs_ds = _cc_inputs()
    # correctness: converged bucket-vectorized CC == driver union-find
    t0 = time.time()
    new = connected_components_distributed(keys_ds, pairs_ds).to_pandas()
    t_new_converged = round(time.time() - t0, 2)
    uf = _UnionFind()
    pairs_df = pairs_ds.to_pandas()
    for k in keys_ds.to_pandas()["key"]:
        uf.find(k)
    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        uf.union(a, b)
    want = {k: uf.find(k) for k in new["key"]}
    got = dict(zip(new["key"], new["comp"]))
    assert got == want, "bucket-vectorized CC diverged from union-find"
    # speed: one propagation iteration, old per-node vs new per-bucket
    from portuguese_pt_legal_ner_ray.state import components as comp_mod

    t0 = time.time()
    comp_mod.connected_components_distributed(keys_ds, pairs_ds, max_iters=1)\
        .to_pandas()
    t_new_1iter = round(time.time() - t0, 2)
    t0 = time.time()
    _cc_per_node_reference(keys_ds, pairs_ds, max_iters=1).to_pandas()
    t_old_1iter = round(time.time() - t0, 2)
    return {"bucket_vectorized_converged_sec": t_new_converged,
            "bucket_vectorized_1iter_sec": t_new_1iter,
            "per_node_1iter_sec": t_old_1iter,
            "speedup_per_iter": round(t_old_1iter / t_new_1iter, 2),
            "nodes": 200_000, "components": len(set(want.values()))}


def bench_ann_index_vs_oneshot(cpus: int) -> dict:
    """Indexed query set vs one-shot ivf_topk at the SAME nprobe (VERDICT
    r4 #2 done-criterion). 512k x 64 vectors, 1024 queries, nprobe=4 of 64
    cells: the one-shot path pays the full-corpus assignment matmul per
    call; ivf_query reads only the 4 probed cell partitions. At the
    sf0.1 embeddings table (2,000 vectors, one block) the index CANNOT
    win — file-planning overhead exceeds a single-block scan, measured
    and recorded honestly in BASELINE.md — the crossover needs a corpus
    larger than one block, which this table provides.
    """
    import tempfile

    from portuguese_pt_legal_ner_ray.sources.parquet import sized_read_parquet
    from portuguese_pt_legal_ner_ray.stages.similarity import (
        ivf_build,
        ivf_query,
        ivf_topk,
        make_query_ref,
    )

    path = ensure_vectors()
    vecs = sized_read_parquet(str(path), columns=["vec_id", "embedding"])
    qref = make_query_ref(vecs, list(range(1024)))
    idx = tempfile.mkdtemp(prefix="ann_cmp512k_")
    t0 = time.time()
    ivf_build(vecs, idx, n_cells=64)
    build = time.time() - t0
    ivf_query(idx, qref, k=10, nprobe=4).count()  # warm the read path
    t0 = time.time()
    ivf_query(idx, qref, k=10, nprobe=4).count()
    t_index = time.time() - t0
    t0 = time.time()
    ivf_topk(vecs, qref, k=10, n_cells=64, nprobe=4).count()
    t_oneshot = time.time() - t0
    return {"vectors": 512_000, "queries": 1024, "nprobe": 4, "n_cells": 64,
            "build_sec": round(build, 2),
            "indexed_query_sec": round(t_index, 2),
            "one_shot_sec": round(t_oneshot, 2),
            "speedup": round(t_oneshot / t_index, 2)}


def bench_edges_skew(n_rows: int = 5_000_000, hot_frac: float = 0.4) -> dict:
    """Skewed-key evidence for the edges grouped_count (VERDICT r4 #5).

    The edges stage is ``grouped_count(triples, [subj_id, pred, obj_id])``.
    Two adversarial skews vs a uniform baseline, same row count:

    * ``hot_dup`` — ONE exact triple occupies ``hot_frac`` of all rows (a
      mega-popular fact). The per-block Arrow combiner collapses it to one
      partial per block, so the exchange carries ~n_blocks rows for that
      key regardless of its multiplicity.
    * ``hot_entity`` — one SUBJECT occupies ``hot_frac`` of rows but with
      distinct objects (a hub node). Groups stay distinct, and the bucket
      hash runs over the FULL composite key, so the hub's groups spread
      across all buckets — no hot bucket forms.

    Neither skew should regress the phase >2x vs uniform; if it ever does,
    salt the combiner key. Results recorded in BASELINE.md.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from portuguese_pt_legal_ner_ray.sources.parquet import sized_read_parquet
    from portuguese_pt_legal_ner_ray.stages.shuffle import grouped_count

    rng = np.random.default_rng(7)
    n_entities = 100_000
    preds = np.array(["cites", "amends", "mentions", "located_in"])

    def make(variant: str) -> Path:
        path = SHM / f"triples_{variant}_{n_rows}.parquet"
        if path.exists():
            return path
        SHM.mkdir(parents=True, exist_ok=True)
        subj = rng.integers(0, n_entities, n_rows)
        obj = rng.integers(0, n_entities, n_rows)
        pred = preds[rng.integers(0, len(preds), n_rows)]
        n_hot = int(n_rows * hot_frac)
        hot_rows = rng.choice(n_rows, n_hot, replace=False)
        if variant == "hot_dup":
            subj[hot_rows] = 0
            obj[hot_rows] = 1
            pred[hot_rows] = "cites"
        elif variant == "hot_entity":
            subj[hot_rows] = 0  # hub subject, objects stay distinct
        tbl = pa.table({
            "subj_id": pa.array(np.char.add("ORGANIZACAO|e", subj.astype(str))),
            "pred": pa.array(pred),
            "obj_id": pa.array(np.char.add("LEGISLACAO|e", obj.astype(str))),
        })
        pq.write_table(tbl, path)
        return path

    out: dict = {"rows": n_rows, "hot_frac": hot_frac}
    for variant in ("uniform", "hot_dup", "hot_entity"):
        path = make(variant)
        t0 = time.time()
        n_edges = grouped_count(
            sized_read_parquet(str(path)),
            ["subj_id", "pred", "obj_id"], alias="weight",
        ).count()
        out[variant] = {"sec": round(time.time() - t0, 2), "edges": n_edges}
    base = out["uniform"]["sec"]
    for variant in ("hot_dup", "hot_entity"):
        out[variant]["vs_uniform"] = round(out[variant]["sec"] / base, 2)
    return out


def main():
    import json

    import ray

    cpus = 32
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out: dict = {"num_cpus": cpus}
    if "--ivf" in sys.argv:
        out["ivf_topk_512k"] = bench_ivf(cpus)
    if "--cc" in sys.argv:
        out["distributed_cc_200k"] = bench_cc()
    if "--edges-skew" in sys.argv:
        out["edges_skew_5m"] = bench_edges_skew()
    if "--ann-index" in sys.argv:
        out["ann_index_vs_oneshot_512k"] = bench_ann_index_vs_oneshot(cpus)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
