"""End-to-end KG construction pipeline (the flagship; SURVEY.md §3 EP1
generalized per BASELINE.json north_star).

Layout under ``out_dir``::

    extracted/part=<p>/   url, lang, text          (stage "extract_text")
    extraction/part=<p>/  nested paragraph rows     (stage "ner")
    graph/{spans,triples,paragraphs,mentions,nodes,edges}/   (stage "graph")
    _manifest/            per-(stage, partition) checkpoint rows

Partitioning: input parquet fragments are grouped into ``num_partitions``
groups; each group runs as one streamed Ray Data job and checkpoints
independently — a failed run resumes by skipping partitions whose manifest
row exists (kill-and-resume test in tests/test_resume.py). At 100 TB the
partition is the unit of retry (~TB-scale file groups), while Ray's
streaming executor parallelizes freely *within* each group.

The wide section (linking + graph) runs once over all extraction output —
its inputs (distinct entities, triples) are orders of magnitude smaller than
the corpus.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pyarrow as pa
import ray
from ray.data import Dataset

from ..config import PipelineConfig
from ..stages.extract import (
    NerTripleStage,
    explode_batch,
    extract_text_batch,
    flatten_spans,
    flatten_triples,
)
from ..stages.graph import build_edges, build_nodes
from ..stages.linking import BandStage, candidate_pairs, canonicalize, spans_to_mentions
from ..state.manifest import Manifest, parquet_row_count

GRAPH_TABLES = ("spans", "triples", "nodes", "edges")


def _partition_files(input_dir: str | Path, num_partitions: int) -> list[list[str]]:
    files = sorted(str(p) for p in Path(input_dir).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    n = min(num_partitions, len(files))
    return [files[i::n] for i in range(n)]


def extract_partition(files: list[str], out_dir: Path, part: str,
                      cfg: PipelineConfig) -> dict:
    """One partition's linear section: read → text → explode → NER → write."""
    ext_dir = out_dir / "extracted" / f"part={part}"
    ner_dir = out_dir / "extraction" / f"part={part}"
    # a partition whose manifest row is missing may hold partial output from
    # a killed run — idempotent rewrite requires a clean slate
    for d in (ext_dir, ner_dir):
        if d.exists():
            shutil.rmtree(d)
    # pass A: html -> text (columns pruned at the read: url, html, lang only)
    (
        ray.data.read_parquet(files, columns=["url", "html", "lang"])
        .map_batches(extract_text_batch, batch_format="pyarrow", zero_copy_batch=True)
        .write_parquet(str(ext_dir))
    )
    # pass B: text -> paragraphs -> spans+triples (reads columnar text back,
    # so a resume never re-parses HTML)
    (
        ray.data.read_parquet(str(ext_dir))
        .map_batches(explode_batch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            NerTripleStage,
            batch_format="pyarrow",
            batch_size=cfg.ner_batch_size,
            concurrency=cfg.ner_concurrency,
            fn_constructor_kwargs=dict(cfg=cfg),
        )
        .write_parquet(str(ner_dir))
    )
    return {
        "input_files": files,
        "pages": parquet_row_count(ext_dir),
        "paragraphs": parquet_row_count(ner_dir),
    }


def graph_stage(out_dir: Path, cfg: PipelineConfig,
                force_distributed_cc: bool = False) -> dict:
    """The wide section: flatten → mentions → blocking → CC → nodes/edges."""
    if (out_dir / "graph").exists():
        shutil.rmtree(out_dir / "graph")
    extraction = ray.data.read_parquet(str(out_dir / "extraction"))
    spans = extraction.map_batches(flatten_spans, batch_format="pyarrow")
    triples = extraction.map_batches(flatten_triples, batch_format="pyarrow")

    spans.write_parquet(str(out_dir / "graph" / "spans"))
    triples.write_parquet(str(out_dir / "graph" / "triples"))

    spans = ray.data.read_parquet(str(out_dir / "graph" / "spans"))
    triples = ray.data.read_parquet(str(out_dir / "graph" / "triples"))

    mentions = spans_to_mentions(spans).materialize()  # small: distinct keys
    bands = mentions.map_batches(
        BandStage, batch_format="pyarrow",
        fn_constructor_kwargs=dict(cfg=cfg.linking), concurrency=(1, 4),
    )
    pairs = candidate_pairs(bands, cfg.linking)
    comp_ds, mapping_ref = canonicalize(
        mentions, pairs, cfg.linking, force_distributed=force_distributed_cc
    )
    nodes = build_nodes(mentions, comp_ds)
    edges = build_edges(triples, mapping_ref=mapping_ref,
                        comp_ds=None if mapping_ref is not None else comp_ds)
    nodes.write_parquet(str(out_dir / "graph" / "nodes"))
    edges.write_parquet(str(out_dir / "graph" / "edges"))
    return {
        "mentions": mentions.count(),
        "nodes": parquet_row_count(out_dir / "graph" / "nodes"),
        "edges": parquet_row_count(out_dir / "graph" / "edges"),
        "triples": parquet_row_count(out_dir / "graph" / "triples"),
        "cc_path": "driver" if mapping_ref is not None else "distributed",
    }


def run_kg_pipeline(
    input_dir: str | Path,
    out_dir: str | Path,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 8,
    force_distributed_cc: bool = False,
    fail_after_partitions: int | None = None,
) -> Manifest:
    """Full pipeline with per-partition checkpoint/resume.

    ``fail_after_partitions`` injects a crash after N extract partitions —
    used by the kill-and-resume test only.
    """
    cfg = cfg or PipelineConfig()
    out_dir = Path(out_dir)
    manifest = Manifest(out_dir)
    done_parts = 0
    for i, files in enumerate(_partition_files(input_dir, num_partitions)):
        part = f"{i:05d}"
        if manifest.is_done("extract", part):
            continue
        if fail_after_partitions is not None and done_parts >= fail_after_partitions:
            raise RuntimeError("injected failure for resume test")
        meta = extract_partition(files, out_dir, part, cfg)
        manifest.mark_done("extract", part, **meta)
        done_parts += 1
    if not manifest.is_done("graph", "all"):
        meta = graph_stage(out_dir, cfg, force_distributed_cc)
        manifest.mark_done("graph", "all", **meta)
    return manifest


def read_graph_table(out_dir: str | Path, name: str) -> Dataset:
    sub = {"spans": "graph/spans", "triples": "graph/triples",
           "nodes": "graph/nodes", "edges": "graph/edges",
           "extracted": "extracted", "extraction": "extraction"}[name]
    return ray.data.read_parquet(str(Path(out_dir) / sub))
