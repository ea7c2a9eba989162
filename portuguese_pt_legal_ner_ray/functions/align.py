"""Token/label alignment with first-subword labeling and -100 masking.

Reference parity for ``tokenize_and_align_labels`` (reference
src/data.py:156-206): the label id goes to the FIRST subword of each word;
continuation subwords and special tokens get ``-100``; sequences are
truncated to ``max_length``. The reference uses an HF tokenizer; this
engine substitutes a deterministic subword splitter (fixed-width chunks)
so the alignment semantics — the part that matters to span decoding — are
testable without model downloads. Plug a real tokenizer by passing
``subword_fn``.
"""

from __future__ import annotations

from collections.abc import Callable

from ..config import LABEL_TO_ID

IGNORE_ID = -100
CLS, SEP = "[CLS]", "[SEP]"


def chunk_subwords(word: str, width: int = 4) -> list[str]:
    """Deterministic stand-in for a WordPiece split: fixed-width chunks,
    continuations prefixed '##' (so ['processo'] -> ['proc', '##esso'])."""
    if len(word) <= width:
        return [word]
    return [word[:width]] + [f"##{word[i:i+width]}" for i in range(width, len(word), width)]


def tokenize_and_align_labels(
    words: list[str],
    labels: list[str],
    max_length: int = 512,
    subword_fn: Callable[[str], list[str]] = chunk_subwords,
    label_to_id: dict[str, int] = LABEL_TO_ID,
) -> dict[str, list]:
    """-> {tokens, word_ids, label_ids} with reference masking semantics."""
    tokens: list[str] = [CLS]
    word_ids: list[int | None] = [None]
    label_ids: list[int] = [IGNORE_ID]  # special token -> -100
    for wi, (word, label) in enumerate(zip(words, labels)):
        for si, sub in enumerate(subword_fn(word)):
            tokens.append(sub)
            word_ids.append(wi)
            # first subword carries the label; continuations are masked
            label_ids.append(label_to_id[label] if si == 0 else IGNORE_ID)
    tokens.append(SEP)
    word_ids.append(None)
    label_ids.append(IGNORE_ID)
    if len(tokens) > max_length:  # truncation=True semantics
        tokens = tokens[: max_length - 1] + [SEP]
        word_ids = word_ids[: max_length - 1] + [None]
        label_ids = label_ids[: max_length - 1] + [IGNORE_ID]
    return {"tokens": tokens, "word_ids": word_ids, "label_ids": label_ids}


def strip_masked(gold_ids: list[int], pred_ids: list[int],
                 id_to_label: dict[int, str]) -> tuple[list[str], list[str]]:
    """Argmax-decode companion (reference src/training.py:61-72): drop
    positions where the gold label is -100, map ids back to tag names."""
    gold, pred = [], []
    for g, p in zip(gold_ids, pred_ids):
        if g == IGNORE_ID:
            continue
        gold.append(id_to_label[g])
        pred.append(id_to_label[p])
    return gold, pred
