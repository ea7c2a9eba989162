"""Single-process oracle pipeline (reference-faithful, no Ray).

Mirrors the reference's sequential execution shape — whole document in
memory, paragraph loop, per-paragraph extraction (reference
src/inference.py:116-166) — extended with the target spec's triple/linking/
graph stages. The Ray pipeline must reproduce these outputs exactly
(SURVEY.md §5 test 1: byte-identical text per (url, para_idx); triple-set
P/R, expected 1.0 with the shared deterministic tagger).

Linking here uses a plain union-find; the Ray path uses distributed
min-label propagation — two independent implementations of the same
contract (component id = lexicographic-min entity key).
"""

from __future__ import annotations

import os
from collections import Counter
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from .config import LINK_LABELS, LinkingConfig
from .corpus import ensure_webpages
from .functions.blocking import pairs_for_block
from .functions.html import html_to_text
from .functions.minhash import MinHasher, jaccard, shingles
from .functions.normalize import entity_key
from .functions.paragraphs import split_paragraphs
from .functions.tagger import RegexGazetteerTagger
from .functions.triples import extract_triples

GOLDEN_TABLES = ("extracted", "paragraphs", "spans", "triples", "nodes", "edges")


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-lexicographic root keeps the component id order-free
            lo, hi = sorted((ra, rb))
            self.parent[hi] = lo


def link_entities(mentions: dict[str, tuple[str, str, int]],
                  cfg: LinkingConfig = LinkingConfig()) -> dict[str, str]:
    """key -> canonical component id (lexicographic-min member key).

    ``mentions``: entity_key -> (label, min_original_surface, n_mentions).
    Only LINK_LABELS keys go through minhash blocking; the rest are their own
    canonical id.
    """
    hasher = MinHasher(cfg.num_hashes, cfg.shingle_k)
    blocks: dict[tuple[str, str], set[str]] = {}
    for key, (label, _surf, _n) in mentions.items():
        if label not in LINK_LABELS:
            continue
        norm = key.split("|", 1)[1]
        for bk in hasher.band_keys(norm, cfg.num_bands):
            blocks.setdefault((label, bk), set()).add(norm)

    uf = _UnionFind()
    for key in mentions:
        uf.find(key)
    seen_pairs: set[tuple[str, str]] = set()
    for (label, _bk), norms in blocks.items():
        for a, b in pairs_for_block(norms, cfg):
            if (label, a) > (label, b):
                a, b = b, a
            pk = (f"{label}|{a}", f"{label}|{b}")
            if pk in seen_pairs:
                continue
            seen_pairs.add(pk)
            if jaccard(shingles(a, cfg.shingle_k), shingles(b, cfg.shingle_k)) >= cfg.jaccard_threshold:
                uf.union(*pk)
    return {key: uf.find(key) for key in mentions}


def run_oracle(pages: pa.Table, cfg: LinkingConfig = LinkingConfig()) -> dict[str, pa.Table]:
    """Full oracle pipeline over a web-pages table -> golden tables."""
    tagger = RegexGazetteerTagger()
    urls = pages["url"].to_pylist()
    htmls = pages["html"].to_pylist()
    langs = pages["lang"].to_pylist()

    ext_rows = {"url": [], "text": []}
    par_rows = {"url": [], "lang": [], "para_idx": [], "para_text": []}
    span_rows = {"url": [], "para_idx": [], "start": [], "end": [], "label": [], "surface": []}
    tri_rows = {"subj": [], "pred": [], "obj": [], "subj_label": [], "obj_label": [],
                "url": [], "para_idx": []}
    mention_counts: Counter[str] = Counter()
    key_meta: dict[str, tuple[str, str]] = {}  # key -> (label, min surface)

    for url, html, lang in zip(urls, htmls, langs):
        text = html_to_text(html)
        ext_rows["url"].append(url)
        ext_rows["text"].append(text)
        for idx, para in enumerate(split_paragraphs(text)):
            par_rows["url"].append(url)
            par_rows["lang"].append(lang)
            par_rows["para_idx"].append(idx)
            par_rows["para_text"].append(para)
            if lang != "pt":
                continue  # language gate: NER only on pt rows (north_star)
            spans = tagger.tag_paragraph(para)
            for sp in spans:
                surf = para[sp.start : sp.end]
                span_rows["url"].append(url)
                span_rows["para_idx"].append(idx)
                span_rows["start"].append(sp.start)
                span_rows["end"].append(sp.end)
                span_rows["label"].append(sp.label)
                span_rows["surface"].append(surf)
                key = entity_key(sp.label, surf)
                mention_counts[key] += 1
                old = key_meta.get(key)
                key_meta[key] = (sp.label, surf if old is None else min(old[1], surf))
            for subj, pred, obj, sl, ol in extract_triples(para, spans):
                tri_rows["subj"].append(subj)
                tri_rows["pred"].append(pred)
                tri_rows["obj"].append(obj)
                tri_rows["subj_label"].append(sl)
                tri_rows["obj_label"].append(ol)
                tri_rows["url"].append(url)
                tri_rows["para_idx"].append(idx)

    mentions = {k: (key_meta[k][0], key_meta[k][1], mention_counts[k]) for k in mention_counts}
    canon = link_entities(mentions, cfg)

    # nodes: one row per component — id, lexicographic-min surface, label, mentions
    comp: dict[str, dict] = {}
    for key, cid in canon.items():
        label, surf, n = mentions[key]
        c = comp.setdefault(cid, {"label": label, "surface": surf, "n": 0})
        c["n"] += n
        c["surface"] = min(c["surface"], surf)
    node_rows = {
        "entity_id": list(comp.keys()),
        "canonical_surface": [c["surface"] for c in comp.values()],
        "label": [c["label"] for c in comp.values()],
        "n_mentions": [c["n"] for c in comp.values()],
    }

    # edges: exact dedup with weight over canonicalized triples
    edge_counts: Counter[tuple[str, str, str]] = Counter()
    for subj, pred, obj, sl, ol in zip(tri_rows["subj"], tri_rows["pred"], tri_rows["obj"],
                                       tri_rows["subj_label"], tri_rows["obj_label"]):
        edge_counts[(canon[entity_key(sl, subj)], pred, canon[entity_key(ol, obj)])] += 1
    edge_rows = {
        "subj_id": [k[0] for k in edge_counts],
        "pred": [k[1] for k in edge_counts],
        "obj_id": [k[2] for k in edge_counts],
        "weight": list(edge_counts.values()),
    }

    return {
        "extracted": pa.table({"url": pa.array(ext_rows["url"], pa.string()),
                               "text": pa.array(ext_rows["text"], pa.string())}),
        "paragraphs": pa.table({"url": pa.array(par_rows["url"], pa.string()),
                                "lang": pa.array(par_rows["lang"], pa.string()),
                                "para_idx": pa.array(par_rows["para_idx"], pa.int32()),
                                "para_text": pa.array(par_rows["para_text"], pa.string())}),
        "spans": pa.table({"url": pa.array(span_rows["url"], pa.string()),
                           "para_idx": pa.array(span_rows["para_idx"], pa.int32()),
                           "start": pa.array(span_rows["start"], pa.int32()),
                           "end": pa.array(span_rows["end"], pa.int32()),
                           "label": pa.array(span_rows["label"], pa.string()),
                           "surface": pa.array(span_rows["surface"], pa.string())}),
        "triples": pa.table({k: pa.array(v, pa.int32() if k == "para_idx" else pa.string())
                             for k, v in tri_rows.items()}),
        "nodes": pa.table({"entity_id": pa.array(node_rows["entity_id"], pa.string()),
                           "canonical_surface": pa.array(node_rows["canonical_surface"], pa.string()),
                           "label": pa.array(node_rows["label"], pa.string()),
                           "n_mentions": pa.array(node_rows["n_mentions"], pa.int64())}),
        "edges": pa.table({"subj_id": pa.array(edge_rows["subj_id"], pa.string()),
                           "pred": pa.array(edge_rows["pred"], pa.string()),
                           "obj_id": pa.array(edge_rows["obj_id"], pa.string()),
                           "weight": pa.array(edge_rows["weight"], pa.int64())}),
    }


def ensure_goldens(sf: float, root: str = "/tmp/kgray_corpus") -> Path:
    """Synthesize the corpus (if needed), run the oracle, write golden parquet."""
    d = ensure_webpages(sf, root)
    gdir = d / "golden"
    done = gdir / "_DONE"
    if done.exists():
        return gdir
    import pyarrow.dataset as pads

    pages = pads.dataset(sorted((d / "webpages").glob("part-*.parquet"))).to_table()
    goldens = run_oracle(pages)
    import tempfile

    from .corpus import atomic_publish

    # unique per-process staging dir + atomic publish (see corpus.atomic_publish)
    tmp = Path(tempfile.mkdtemp(dir=d, prefix="golden.tmp."))
    for name, tbl in goldens.items():
        pq.write_table(tbl, tmp / f"{name}.parquet")
    (tmp / "_DONE").write_text("ok")
    atomic_publish(tmp, gdir)
    return gdir
