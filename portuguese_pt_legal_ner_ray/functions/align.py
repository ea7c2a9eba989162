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


# ---------------------------------------------------------------------------
# MLM data prep (reference M5 + the MLM side of A4)
# ---------------------------------------------------------------------------

MASK_ID = 4  # conventional special-token slot for [MASK]
_SPECIAL_IDS = 16  # ids 0..15 reserved (pad/cls/sep/unk/mask/...)
PAD_ID = 0
VOCAB_SIZE = 32_000


def _word_id(word: str) -> int:
    """Deterministic hash vocab id (stand-in for a real WordPiece vocab)."""
    import hashlib

    h = int.from_bytes(hashlib.md5(word.lower().encode()).digest()[:4], "big")
    return _SPECIAL_IDS + h % (VOCAB_SIZE - _SPECIAL_IDS)


def mlm_mask_batch(batch, text_col: str = "text", mask_prob: float = 0.15,
                   max_length: int = 512, seed: str = "kgray-mlm"):
    """Masked-LM batch prep: the Ray data-op equivalent of the reference's
    MLM tokenizer + ``DataCollatorForLanguageModeling(mlm_probability=0.15)``
    (reference src/data.py:336-345 trunc/pad tokenize; src/models.py:170-172
    collator).

    Per HF collator semantics: ~``mask_prob`` of tokens are selected; of
    those, 80% become [MASK], 10% a random vocab id, 10% stay unchanged;
    ``labels`` holds the original id at selected positions and -100
    elsewhere; sequences truncate at ``max_length`` and pad to the batch
    max (``attention_mask`` 0 on padding). Selection uses a position-keyed
    md5 draw instead of the collator's RNG, so the masking is a pure
    function of (text, position, seed) — identical at any parallelism,
    reproducible across runs (SURVEY.md §4 determinism contract; the
    reference's seeded-RNG masking is order-dependent by construction).
    """
    import hashlib

    import pyarrow as pa

    from .tagger import tokenize_with_offsets

    texts = batch[text_col].to_pylist()
    rows = []
    for text in texts:
        words = [text[s:e] for s, e in tokenize_with_offsets(text)[:max_length]]
        ids = [_word_id(w) for w in words]
        # hash the document once; per-position draws reuse the digest so the
        # masking stays a pure function of (text, position, seed) at
        # O(n_tokens) instead of O(n_tokens x len(text)) hashed bytes
        tdig = hashlib.md5(f"{seed}|{text}".encode()).hexdigest()
        inp, labels = [], []
        for pos, tid in enumerate(ids):
            d = int.from_bytes(
                hashlib.md5(f"{tdig}|{pos}".encode()).digest()[:8], "big")
            draw = (d % 10_000) / 10_000.0
            if draw < mask_prob:
                labels.append(tid)
                sub = d >> 32
                if draw < mask_prob * 0.8:          # 80%: [MASK]
                    inp.append(MASK_ID)
                elif draw < mask_prob * 0.9:        # 10%: random id
                    inp.append(_SPECIAL_IDS + sub % (VOCAB_SIZE - _SPECIAL_IDS))
                else:                                # 10%: unchanged
                    inp.append(tid)
            else:
                labels.append(IGNORE_ID)
                inp.append(tid)
        rows.append((inp, labels))
    lmax = max((len(r[0]) for r in rows), default=1)
    input_ids, attention, labels_col = [], [], []
    for inp, lab in rows:
        pad = lmax - len(inp)
        input_ids.append(inp + [PAD_ID] * pad)
        attention.append([1] * len(inp) + [0] * pad)
        labels_col.append(lab + [IGNORE_ID] * pad)
    return pa.table({
        "input_ids": pa.array(input_ids, pa.list_(pa.int32())),
        "attention_mask": pa.array(attention, pa.list_(pa.int8())),
        "labels": pa.array(labels_col, pa.list_(pa.int32())),
    })
