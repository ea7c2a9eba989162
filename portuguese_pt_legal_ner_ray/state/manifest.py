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


def parquet_row_count(path: str | Path) -> int:
    """Cheap metadata-only row count of a parquet directory."""
    import pyarrow.parquet as pq

    total = 0
    for f in sorted(Path(path).rglob("*.parquet")):
        total += pq.ParquetFile(f).metadata.num_rows
    return total
