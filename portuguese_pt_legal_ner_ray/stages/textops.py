"""Text-analysis operators over a document table (training-data pipeline ops).

All stateless, vectorized ``map_batches`` transforms using
``pyarrow.compute`` regex-count kernels — no per-row Python in hot paths.
Semantics are written to be replicable in ANSI SQL (DuckDB) so every
operator gets a hash-checked oracle in ``__ray_entry__.oracle_sql``:

* token counting    — # of maximal ``\\S+`` runs (whitespace tokenization)
* quality scoring   — n_chars / n_tokens / n_punct / upper-token count
* language ID       — per-language stopword hit counts, argmax with
  deterministic alphabetical tie-break (n-gram-free heuristic)
* fingerprinting    — md5 of the normalized text (exact-dup key), plus a
  64-bit simhash over whitespace tokens (near-dup key; not SQL-expressible)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# keep in sync with the SQL strings in __ray_entry__.py
PUNCT_PATTERN = r"[.,;:!?]"
TOKEN_PATTERN = r"\S+"
UPPER_TOKEN_PATTERN = r"\b[A-Z][a-z]+\b"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "pt": ["o", "a", "os", "as", "do", "da", "em", "para", "não", "uma"],
}


def stopword_regex(lang: str) -> str:
    return r"\b(?:" + "|".join(STOPWORDS[lang]) + r")\b"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(
                pc.count_substring_regex(batch[text_col], TOKEN_PATTERN), pa.int64()
            ),
        }
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch[text_col]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64()),
            "n_punct": pc.cast(pc.count_substring_regex(text, PUNCT_PATTERN), pa.int64()),
            "n_capitalized": pc.cast(
                pc.count_substring_regex(text, UPPER_TOKEN_PATTERN), pa.int64()
            ),
        }
    )


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-hit argmax language ID; ties break alphabetically."""
    lowered = pc.utf8_lower(batch[text_col])
    langs = sorted(STOPWORDS)
    counts = np.stack(
        [
            pc.count_substring_regex(lowered, stopword_regex(l))
            .combine_chunks().to_numpy(zero_copy_only=False)
            for l in langs
        ]
    )  # [lang, row]
    best = counts.argmax(axis=0)  # first max wins == alphabetical tie-break
    pred = np.array(langs, dtype=object)[best]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(list(pred), pa.string()),
            "n_hits": pa.array(counts.max(axis=0), pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex of lower(trim(text)) — matches DuckDB md5(lower(trim(text)))."""
    normed = pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col])).to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(
                [hashlib.md5(s.encode()).hexdigest() for s in normed], pa.string()
            ),
        }
    )


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit simhash over token hashes (md5-stable)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for t in tokens:
        h = np.uint64(int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big"))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = pc.utf8_lower(batch[text_col]).to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([simhash64(t.split()) for t in texts], pa.uint64()),
        }
    )
