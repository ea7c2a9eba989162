"""Per-stage / per-partition checkpoint manifests (resume discipline).

Generalizes the reference's checkpointing (HF save_steps/save_total_limit +
tracker status, reference src/cli.py:154-156, src/config.py:131-132,
src/tracking.py:317-319): every (stage, partition) that completes writes a
JSON manifest row recording its input files, output directory, row counts
and engine version. ``resume`` = re-plan only the partitions whose manifest
is missing (SURVEY.md §4). Writes are atomic (tmp + rename) so a mid-write
kill never yields a corrupt "done" marker.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any

from .. import __version__


class Manifest:
    def __init__(self, out_dir: str | Path):
        self.dir = Path(out_dir) / "_manifest"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, stage: str, partition: str) -> Path:
        return self.dir / f"{stage}__{partition}.json"

    def is_done(self, stage: str, partition: str) -> bool:
        return self._path(stage, partition).exists()

    def read(self, stage: str, partition: str) -> dict[str, Any] | None:
        p = self._path(stage, partition)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def mark_done(self, stage: str, partition: str, **meta: Any) -> None:
        rec = {
            "stage": stage,
            "partition": partition,
            "engine_version": __version__,
            "completed_at": time.time(),
            **meta,
        }
        p = self._path(stage, partition)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(rec, indent=1, sort_keys=True))
        os.replace(tmp, p)

    def all_records(self) -> list[dict[str, Any]]:
        return [json.loads(p.read_text()) for p in sorted(self.dir.glob("*.json"))]


def model_artifact_sig(model_dir: str | Path) -> dict[str, Any]:
    """Identity of a saved model checkpoint directory (S7 contract).

    The reference saves model+tokenizer with ``save_pretrained`` into
    ``{output_dir}/{experiment_name}`` (reference src/models.py:176-211) and
    records only the path; here the manifest additionally pins WHICH bytes
    were at that path: per file (relpath, size, mtime_ns, md5 of the first
    and last 64 KiB) — content-sensitive without reading multi-GB weight
    files end-to-end (a retrained tensor payload differs in the sampled
    blocks in practice, and metadata-preserving copies like ``cp -p`` /
    ``rsync -a`` cannot defeat the block hashes), plus the version the
    checkpoint declares in its ``config.json`` (``model_version``, falling
    back to the HF ``_name_or_path``/``name_or_path`` fields). A changed
    signature invalidates resume state, so a retrained checkpoint at the
    SAME path re-runs partitions instead of silently mixing model
    generations in one output. Caveat: a rewrite that is byte-identical in
    both sampled blocks AND size AND mtime is indistinguishable — full
    content hashing is the only stronger guarantee and costs a full read
    of the artifact.
    """
    import hashlib

    _BLK = 64 * 1024

    def _block_md5(p: Path, size: int) -> str:
        h = hashlib.md5()
        with open(p, "rb") as f:
            h.update(f.read(_BLK))
            if size > _BLK:
                f.seek(max(_BLK, size - _BLK))
                h.update(f.read(_BLK))
        return h.hexdigest()

    root = Path(model_dir)
    if not root.is_dir():
        raise FileNotFoundError(f"model_dir is not a directory: {root}")
    rows = []
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        st = p.stat()
        rows.append([str(p.relative_to(root)), st.st_size, st.st_mtime_ns,
                     _block_md5(p, st.st_size)])
    version = None
    cfg_path = root / "config.json"
    if cfg_path.exists():
        try:
            c = json.loads(cfg_path.read_text())
            version = (c.get("model_version") or c.get("_name_or_path")
                       or c.get("name_or_path"))
        except (json.JSONDecodeError, OSError):
            version = None
    return {
        "path": str(root),
        "sig": hashlib.md5(json.dumps(rows).encode()).hexdigest(),
        "version": version,
        "n_files": len(rows),
    }


def parquet_row_count(path: str | Path) -> int:
    """Cheap metadata-only row count of a parquet directory."""
    import pyarrow.parquet as pq

    total = 0
    for f in sorted(Path(path).rglob("*.parquet")):
        total += pq.ParquetFile(f).metadata.num_rows
    return total
