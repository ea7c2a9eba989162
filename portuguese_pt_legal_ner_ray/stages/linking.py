"""Entity linking + canonicalization (the pipeline's wide/shuffle section).

SURVEY.md §7 step 6, target-spec mandated (no counterpart in the reference):

1. mention aggregation — partial combine inside ``map_batches`` (per-batch
   dict groupby) THEN a small global ``groupby(key)`` — so the all-to-all
   shuffle moves distinct keys, not raw mentions (pre-aggregation pattern);
2. minhash band keys per distinct entity (stateful ``MinHasher`` built once
   per actor);
3. ``groupby(label, band_key)`` -> deterministic salted sorted-neighborhood
   candidate pairs (functions/blocking.py — pure function of the member set,
   so results are parallelism-independent);
4. stateless Jaccard verification;
5. connected components: driver-side union-find when the (tiny, distinct)
   entity graph fits the driver — the normal case even at corpus scale,
   since distinct surfaces ≪ mentions — with a fully distributed
   min-label-propagation fallback (``state/components.py``) for when it
   doesn't;
6. canonical-id application to triples via broadcast dict (``ray.put`` once),
   falling back to the partitioned ``hash_join`` at scale.

Component id = lexicographic-min member key — order-free determinism
(SURVEY.md §4: never "first wins").
"""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset

from ..config import LINK_LABELS, LinkingConfig
from ..functions.blocking import pairs_for_block
from ..functions.minhash import MinHasher, jaccard, shingles
from ..functions.normalize import entity_key

# Above this many distinct entity keys, CC + canonical application switch to
# the distributed path (label propagation + hash_join). The distinct-entity
# graph at web scale is orders of magnitude smaller than the corpus, so the
# driver path covers realistic runs; the distributed path is exercised by
# tests via a tiny override.
DRIVER_CC_MAX_KEYS = 2_000_000


class MentionPartial:
    """Per-batch combiner: span rows -> partial (key, label, surface, n).

    Actor state = a (label, surface) -> entity_key memo cache; surfaces
    repeat heavily, so normalization (unicode NFKD) runs once per distinct
    surface per actor instead of once per span.
    """

    def __init__(self):
        self.cache: dict[tuple[str, str], str] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        cache = self.cache
        agg: dict[str, list] = {}
        for label, surf in zip(batch["label"].to_pylist(), batch["surface"].to_pylist()):
            key = cache.get((label, surf))
            if key is None:
                key = entity_key(label, surf)
                cache[(label, surf)] = key
            cur = agg.get(key)
            if cur is None:
                agg[key] = [label, surf, 1]
            else:
                cur[2] += 1
                if surf < cur[1]:
                    cur[1] = surf
        return pa.table(
            {
                "key": pa.array(list(agg.keys()), pa.string()),
                "label": pa.array([v[0] for v in agg.values()], pa.string()),
                "surface": pa.array([v[1] for v in agg.values()], pa.string()),
                "n": pa.array([v[2] for v in agg.values()], pa.int64()),
            }
        )


_TASK_PARTIAL: MentionPartial | None = None


def mention_partial_task(batch: pa.Table) -> pa.Table:
    """Task-mode combiner (bench path): per-worker memo via module global."""
    global _TASK_PARTIAL
    if _TASK_PARTIAL is None:
        _TASK_PARTIAL = MentionPartial()
    return _TASK_PARTIAL(batch)


def spans_to_mentions(spans_ds: Dataset) -> Dataset:
    """Span rows -> distinct (key, label, surface=min, n=sum).

    Combiner inside ``map_batches`` (MentionPartial, memoized normalization)
    then a bucketed exact merge (stages/shuffle.grouped_agg) — the shuffle
    moves partial rows hashed on a small int bucket key, never raw spans.
    """
    from .shuffle import grouped_agg

    cpus = int(ray.cluster_resources().get("CPU", 8))
    partials = spans_ds.map_batches(
        MentionPartial, batch_format="pyarrow", concurrency=(1, max(2, cpus))
    )
    return grouped_agg(
        partials,
        ["key"],
        {"label": ("label", "min"), "surface": ("surface", "min"), "n": ("n", "sum")},
        pre_aggregated=True,
    )


class BandStage:
    """mentions -> (label, band_key, norm) rows for linkable labels."""

    def __init__(self, cfg: LinkingConfig):
        self.cfg = cfg
        self.hasher = MinHasher(cfg.num_hashes, cfg.shingle_k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels_out, bands_out, norms_out = [], [], []
        for key, label in zip(batch["key"].to_pylist(), batch["label"].to_pylist()):
            if label not in LINK_LABELS:
                continue
            norm = key.split("|", 1)[1]
            for bk in self.hasher.band_keys(norm, self.cfg.num_bands):
                labels_out.append(label)
                bands_out.append(bk)
                norms_out.append(norm)
        return pa.table(
            {
                "label": pa.array(labels_out, pa.string()),
                "band_key": pa.array(bands_out, pa.string()),
                "norm": pa.array(norms_out, pa.string()),
            }
        )


def candidate_pairs(bands_ds: Dataset, cfg: LinkingConfig) -> Dataset:
    """Per-block deterministic pairing, then global pair dedup + verify.

    Blocks are routed by ``hash(label, band_key) % 64`` and paired with ONE
    UDF call per bucket (a pandas groupby loop inside), never one Ray UDF
    call per distinct band — at web scale there are ~num_bands × distinct
    entities bands, and Ray's per-group ``map_groups`` pays per-key task
    overhead (the trap measured in scripts/bench_scale_paths.py for CC).
    The pair dedup is the bucketed ``grouped_count`` for the same reason.
    """
    from .shuffle import bucket_by, grouped_count

    def bucket_block_pairs(g: "pa.Table") -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "label": g["label"].to_pandas(),
            "band_key": g["band_key"].to_pandas(),
            "norm": g["norm"].to_pandas(),
        })
        a_out: list[str] = []
        b_out: list[str] = []
        for (label, _bk), grp in df.groupby(["label", "band_key"], sort=False):
            for x, y in pairs_for_block(grp["norm"].tolist(), cfg):
                a_out.append(f"{label}|{x}")
                b_out.append(f"{label}|{y}")
        return pa.table({"a": pa.array(a_out, pa.string()),
                         "b": pa.array(b_out, pa.string())})

    pairs = (
        bands_ds.map_batches(lambda t: bucket_by(t, ["label", "band_key"]),
                             batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_block_pairs, batch_format="pyarrow")
    )
    # a pair found in several bands must be verified once: exact dedup shuffle
    deduped = grouped_count(pairs, ["a", "b"]).select_columns(["a", "b"])

    def verify(batch: pa.Table) -> pa.Table:
        k = cfg.shingle_k
        thr = cfg.jaccard_threshold
        keep = []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            na, nb = a.split("|", 1)[1], b.split("|", 1)[1]
            keep.append(jaccard(shingles(na, k), shingles(nb, k)) >= thr)
        return batch.filter(pa.array(keep, pa.bool_()))

    return deduped.map_batches(verify, batch_format="pyarrow")


def connected_components_driver(keys: list[str], pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find on the driver; component id = min member key."""
    from ..oracle import _UnionFind

    uf = _UnionFind()
    for k in keys:
        uf.find(k)
    for a, b in pairs:
        uf.union(a, b)
    return {k: uf.find(k) for k in keys}


def canonicalize(
    mentions_ds: Dataset,
    verified_pairs_ds: Dataset,
    cfg: LinkingConfig,
    force_distributed: bool = False,
) -> tuple[Dataset, "ray.ObjectRef | None"]:
    """-> (comp_ds with rows (key, comp), broadcast dict ref or None).

    Driver path: the distinct-entity graph (keys + verified same-as pairs) is
    small relative to the corpus — collect it, union-find, broadcast the
    mapping once. Distributed path: min-label propagation over Datasets
    (state/components.py) with no driver materialization.
    """
    n_keys = mentions_ds.count()
    if not force_distributed and n_keys <= DRIVER_CC_MAX_KEYS:
        keys = mentions_ds.select_columns(["key"]).to_pandas()["key"].tolist()
        pairs_df = verified_pairs_ds.to_pandas()
        pairs = list(zip(pairs_df["a"], pairs_df["b"]))
        mapping = connected_components_driver(keys, pairs)
        comp_ds = ray.data.from_arrow(
            pa.table(
                {
                    "key": pa.array(list(mapping.keys()), pa.string()),
                    "comp": pa.array(list(mapping.values()), pa.string()),
                }
            )
        )
        # broadcast only non-identity entries (dicts deserialize per task);
        # consumers default missing keys to identity
        return comp_ds, ray.put({k: v for k, v in mapping.items() if k != v})
    from ..state.components import connected_components_distributed

    comp_ds = connected_components_distributed(
        mentions_ds.select_columns(["key"]), verified_pairs_ds
    )
    return comp_ds, None
