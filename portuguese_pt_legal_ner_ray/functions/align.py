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


def _fmix64(x):
    """murmur3 finalizer over a uint64 numpy array (full avalanche)."""
    import numpy as np

    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _word_id(word: str) -> int:
    """Deterministic hash vocab id (stand-in for a real WordPiece vocab).

    Single-word form of the vectorized batch path — routed through the
    SAME ``pc.utf8_lower`` + ``hash_strings`` kernels as
    :func:`mlm_mask_batch` (Python ``str.lower`` diverges from utf8proc on
    full-case-mapping codepoints, so sharing the kernel is what keeps the
    documented equivalence true). Test/debug helper; the batch path never
    calls it."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.shuffle import hash_strings

    h = int(hash_strings(pc.utf8_lower(pa.array([word], pa.string())))[0])
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
    hash draw instead of the collator's RNG, so the masking is a pure
    function of (text, position, seed) — identical at any parallelism,
    reproducible across runs (SURVEY.md §4 determinism contract; the
    reference's seeded-RNG masking is order-dependent by construction).

    Fully vectorized (this is pretraining data prep — THE hot path at
    100 TB of text): one ``hash_strings`` pass over the batch's words for
    vocab ids, one over ``seed|text`` for per-doc digests, and a numpy
    ``fmix64(doc_digest ^ fmix64(position))`` for every per-position draw —
    no per-token Python or md5 anywhere.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.shuffle import hash_strings
    from .tagger import tokenize_with_offsets

    texts = batch[text_col].to_pylist()
    n = len(texts)
    words_flat: list[str] = []
    lens = np.zeros(n, dtype=np.int64)
    for i, text in enumerate(texts):
        spans = tokenize_with_offsets(text)[:max_length]
        lens[i] = len(spans)
        words_flat.extend(text[s:e] for s, e in spans)
    total = int(lens.sum())

    # vocab ids: ONE vectorized hash over every word in the batch
    if total:
        wh = hash_strings(pc.utf8_lower(pa.array(words_flat, pa.string())))
    else:
        wh = np.empty(0, dtype=np.uint64)
    ids = (_SPECIAL_IDS
           + (wh % np.uint64(VOCAB_SIZE - _SPECIAL_IDS))).astype(np.int64)

    # per-doc digest (pure function of seed|text), repeated per token, mixed
    # with the within-doc position for the per-position draw
    tcol = batch[text_col]
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    tdig = hash_strings(
        pc.binary_join_element_wise(pa.array([seed] * n, pa.string()), tcol, "|")
    )
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    d = _fmix64(np.repeat(tdig, lens) ^ _fmix64(pos.astype(np.uint64)))
    draw = (d % np.uint64(10_000)).astype(np.float64) / 10_000.0
    sub = d >> np.uint64(32)

    sel = draw < mask_prob
    as_mask = draw < mask_prob * 0.8                       # 80%: [MASK]
    as_rand = (draw >= mask_prob * 0.8) & (draw < mask_prob * 0.9)  # 10%
    inp = ids.copy()
    inp[as_mask] = MASK_ID
    inp[as_rand] = (_SPECIAL_IDS
                    + sub[as_rand] % np.uint64(VOCAB_SIZE - _SPECIAL_IDS)
                    ).astype(np.int64)
    labels = np.where(sel, ids, IGNORE_ID)

    # pad to the batch max via one [n, lmax] scatter; list arrays are built
    # from the flat buffer + uniform offsets (no per-row Python lists)
    lmax = int(lens.max()) if n else 1
    inp_mat = np.full((n, lmax), PAD_ID, dtype=np.int32)
    att_mat = np.zeros((n, lmax), dtype=np.int8)
    lab_mat = np.full((n, lmax), IGNORE_ID, dtype=np.int32)
    row_idx = np.repeat(np.arange(n), lens)
    inp_mat[row_idx, pos] = inp
    att_mat[row_idx, pos] = 1
    lab_mat[row_idx, pos] = labels
    offsets = pa.array(np.arange(n + 1, dtype=np.int32) * lmax)

    def _list(mat: np.ndarray, typ) -> pa.ListArray:
        return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), typ))

    return pa.table({
        "input_ids": _list(inp_mat, pa.int32()),
        "attention_mask": _list(att_mat, pa.int8()),
        "labels": _list(lab_mat, pa.int32()),
    })
