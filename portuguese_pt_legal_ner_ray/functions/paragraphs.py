"""Paragraph splitting — the byte-level contract of the reference.

Reference semantics (src/inference.py:171-183): ``text.split("\\n")``, strip
each piece, drop empties; non-empty paragraphs are the unit of inference and
are kept in the output even with zero entities (src/inference.py:120-127).
``para_idx`` is the 0-based position among the *kept* paragraphs of a url.

``split_paragraphs`` is the scalar oracle path; ``explode_paragraphs_arrow``
is the vectorized Ray path (Arrow list kernels + numpy, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def split_paragraphs(text: str) -> list[str]:
    """Scalar contract: [p.strip() for p in text.split("\\n") if p.strip()]."""
    return [p.strip() for p in text.split("\n") if p.strip()]


def explode_paragraphs_arrow(batch: pa.Table, text_col: str = "text",
                             keep_cols: tuple[str, ...] = ("url",)) -> pa.Table:
    """Explode a web-pages batch to one row per non-empty paragraph.

    Output columns: ``keep_cols + (para_idx: int32, para_text: string)``.
    Vectorized: split_pattern -> list flatten with parent indices ->
    trim/drop-empty mask -> per-parent running index via numpy.
    """
    lists = pc.split_pattern(batch[text_col], pattern="\n").combine_chunks()
    # parent row index of every flattened element
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    trimmed = pc.utf8_trim_whitespace(flat)
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)

    parent_kept = parent[keep]
    # running index within each parent: positions are grouped & ascending
    if len(parent_kept):
        starts = np.flatnonzero(np.diff(parent_kept, prepend=parent_kept[0] - 1))
        para_idx = np.arange(len(parent_kept)) - np.repeat(
            np.arange(len(parent_kept))[starts], np.diff(np.append(starts, len(parent_kept)))
        )
    else:
        para_idx = np.empty(0, dtype=np.int64)

    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for c in keep_cols:
        cols[c] = pc.take(batch[c], pa.array(parent_kept, type=pa.int64()))
    cols["para_idx"] = pa.array(para_idx.astype(np.int32), type=pa.int32())
    cols["para_text"] = pc.filter(trimmed, pa.array(keep))
    return pa.table(cols)
