"""Plain-text / JSONL / CSV document sources (reference S2/S3 parity).

The reference reads whole text files (src/inference.py:152-154) and
line-oriented raw corpora (``DataLoader.load_pretraining_data``,
src/data.py:297-348: one text per non-empty line, file or directory of
*.txt). Here those become Ray Data sources that stream at scale:

* ``read_text_corpus``  — one row per non-empty line across files
  (``ray.data.read_text`` + vectorized trim/filter), with file provenance.
* ``read_whole_documents`` — one row per file (driver-listed paths, content
  read inside tasks; for many-small-file corpora prefer packing into
  Parquet first).
* ``read_jsonl_docs`` / ``read_csv_docs`` — thin typed wrappers over
  ``ray.data.read_json`` / ``read_csv``.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _expand(paths: str | Path | list) -> list[str]:
    if isinstance(paths, (str, Path)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            out.extend(str(f) for f in sorted(p.glob("*.txt")))  # reference glob
        else:
            out.append(str(p))
    return out


def read_text_corpus(paths: str | Path | list) -> Dataset:
    """One row per non-empty stripped line: (text). Reference semantics:
    ``[line.strip() for line in f if line.strip()]`` (src/data.py:311-315)."""
    ds = ray.data.read_text(_expand(paths))

    def clean(batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch["text"])
        keep = pc.not_equal(trimmed, "")
        return pa.table({"text": pc.filter(trimmed, keep)})

    return ds.map_batches(clean, batch_format="pyarrow")


def read_whole_documents(paths: str | Path | list) -> Dataset:
    """One row per file: (url=file uri, text=entire contents)."""
    files = _expand(paths)
    items = ray.data.from_items([{"path": f} for f in files])

    def load(batch: pa.Table) -> pa.Table:
        ps = batch["path"].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"file://{p}" for p in ps], pa.string()),
                "text": pa.array(
                    [Path(p).read_text(encoding="utf-8") for p in ps], pa.string()
                ),
            }
        )

    return items.map_batches(load, batch_format="pyarrow")


def read_jsonl_docs(paths: str | Path | list) -> Dataset:
    return ray.data.read_json(_expand(paths))


def read_csv_docs(paths: str | Path | list) -> Dataset:
    return ray.data.read_csv(_expand(paths))
