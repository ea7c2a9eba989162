"""Distributed evaluation: span-set P/R/F1 and confusion (G1/G2/G3 parity).

Reference semantics (seqeval micro metrics, reference src/training.py:46-101):
entities are the unit, a hit is an EXACT (position, type) match. Here spans
are identified by (url, para_idx, start, end) and typed by ``label``.

Implementation is the partial+final pattern: per-batch combiners emit
(key, pred_count, gold_count) partials; one bucketed shuffle merges them;
per-label tp/fp/fn reduce to a 9-row table on the driver. The confusion
matrix counts (gold_label, pred_label) for spans matching on position, with
a deterministic sorted label axis — deliberately NOT reproducing the
reference's nondeterministic ``set()`` axis order (src/training.py:207;
SURVEY.md §7 "bugs not to replicate").
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .shuffle import grouped_agg

_KEY_COLS = ["url", "para_idx", "start", "end"]


def _tagged(spans: Dataset, col: str) -> Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "url": batch["url"],
                "para_idx": pa.compute.cast(batch["para_idx"], pa.int64()),
                "start": pa.compute.cast(batch["start"], pa.int64()),
                "end": pa.compute.cast(batch["end"], pa.int64()),
                f"{col}_label": batch["label"],
                "pred_n": pa.array([1 if col == "pred" else 0] * n, pa.int64()),
                "gold_n": pa.array([1 if col == "gold" else 0] * n, pa.int64()),
            }
        )

    return spans.map_batches(tag, batch_format="pyarrow")


def span_eval(pred_spans: Dataset, gold_spans: Dataset) -> pd.DataFrame:
    """-> per-label + micro rows: (label, tp, fp, fn, precision, recall, f1).

    Inputs: span datasets with columns (url, para_idx, start, end, label).
    """
    pred = _tagged(pred_spans, "pred").map_batches(
        lambda t: t.append_column("gold_label", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    gold = _tagged(gold_spans, "gold").map_batches(
        lambda t: t.append_column("pred_label", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    merged = grouped_agg(
        pred.union(gold),
        _KEY_COLS,
        {
            "pred_label": ("pred_label", "max"),  # "" loses to any real label
            "gold_label": ("gold_label", "max"),
            "pred_n": ("pred_n", "sum"),
            "gold_n": ("gold_n", "sum"),
        },
    ).to_pandas()

    counts: dict[str, list[int]] = {}
    for r in merged.itertuples():
        if r.pred_n and r.gold_n and r.pred_label == r.gold_label:
            counts.setdefault(r.gold_label, [0, 0, 0])[0] += 1  # tp
        else:
            if r.pred_n:
                counts.setdefault(r.pred_label, [0, 0, 0])[1] += 1  # fp
            if r.gold_n:
                counts.setdefault(r.gold_label, [0, 0, 0])[2] += 1  # fn

    rows = []
    tot = [0, 0, 0]
    for label in sorted(counts):
        tp, fp, fn = counts[label]
        tot = [a + b for a, b in zip(tot, (tp, fp, fn))]
        rows.append(_metric_row(label, tp, fp, fn))
    rows.append(_metric_row("micro", *tot))
    return pd.DataFrame(rows)


def _metric_row(label: str, tp: int, fp: int, fn: int) -> dict:
    p = tp / max(1, tp + fp)
    r = tp / max(1, tp + fn)
    f1 = 2 * p * r / max(1e-12, p + r)
    return {"label": label, "tp": tp, "fp": fp, "fn": fn,
            "precision": p, "recall": r, "f1": f1}


def confusion_matrix(pred_spans: Dataset, gold_spans: Dataset) -> pd.DataFrame:
    """(gold_label, pred_label, n) for position-matched spans, sorted axes."""
    pred = _tagged(pred_spans, "pred").map_batches(
        lambda t: t.append_column("gold_label", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    gold = _tagged(gold_spans, "gold").map_batches(
        lambda t: t.append_column("pred_label", pa.array([""] * len(t), pa.string())),
        batch_format="pyarrow",
    )
    merged = grouped_agg(
        pred.union(gold),
        _KEY_COLS,
        {
            "pred_label": ("pred_label", "max"),
            "gold_label": ("gold_label", "max"),
            "pred_n": ("pred_n", "sum"),
            "gold_n": ("gold_n", "sum"),
        },
    ).to_pandas()
    both = merged[(merged["pred_n"] > 0) & (merged["gold_n"] > 0)]
    out = (
        both.groupby(["gold_label", "pred_label"], sort=True)
        .size()
        .reset_index(name="n")
    )
    return out.sort_values(["gold_label", "pred_label"]).reset_index(drop=True)
