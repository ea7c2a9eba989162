"""Minhash / LSH primitives over character shingles (plain Python + numpy).

Used for (a) entity-linking blocking keys in the KG pipeline (SURVEY.md §7
step 6) and (b) document-level near-dup detection. Hash family is
md5-seeded universal hashing so signatures are identical across processes,
platforms and parallelism levels (determinism per SURVEY.md §4).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64((1 << 32) - 1)


def _hash_params(num_hashes: int, seed: str = "kgray") -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) coefficient vectors for h_i(x) = (a_i*x+b_i) mod p."""
    a = np.empty(num_hashes, dtype=np.uint64)
    b = np.empty(num_hashes, dtype=np.uint64)
    for i in range(num_hashes):
        d = hashlib.md5(f"{seed}|{i}".encode()).digest()
        a[i] = (int.from_bytes(d[:8], "big") % (_MERSENNE - 1)) + 1
        b[i] = int.from_bytes(d[8:], "big") % _MERSENNE
    return a, b


_SH_BASE = np.uint64(1099511628211)  # FNV-64 prime as polynomial base


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """uint32[n_grams] — vectorized polynomial hash of every char k-gram.

    One numpy pass over the codepoint array (sliding windows × base powers,
    fmix64 finalizer) instead of an md5 call PER GRAM: this runs once per
    document in banding and once per candidate doc in verification, so the
    per-gram Python/md5 loop dominated the whole near-dup profile.
    Process-stable: pure integer math mod 2^64, no interpreter hash seed.
    """
    if not text:
        return np.empty(0, dtype=np.uint32)
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cp) < k:
        win = cp[None, :]
        pw = _SH_BASE ** np.arange(len(cp), dtype=np.uint64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(cp, k)
        pw = _SH_BASE ** np.arange(k, dtype=np.uint64)
    h = (win * pw[None, :]).sum(axis=1, dtype=np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def shingles(text: str, k: int = 3) -> set[int]:
    """Stable 32-bit hashes of char k-grams (vectorized, process-stable)."""
    return set(np.unique(_gram_hashes(text, k)).tolist())


class MinHasher:
    """Fixed-family minhasher; build once per actor, call per string."""

    def __init__(self, num_hashes: int = 16, shingle_k: int = 3, seed: str = "kgray"):
        self.num_hashes = num_hashes
        self.k = shingle_k
        self.a, self.b = _hash_params(num_hashes, seed)

    def signature(self, text: str) -> np.ndarray:
        """uint32[num_hashes] minhash signature of the char-shingle set."""
        x = np.unique(_gram_hashes(text, self.k)).astype(np.uint64)
        if len(x) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint32)
        # (a*x + b) mod p, vectorized over shingles for every hash function
        hv = (x[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return (hv.min(axis=1) & _MAXH).astype(np.uint32)

    def band_keys(self, text: str, num_bands: int) -> list[str]:
        """LSH band keys: md5 of each band's signature rows (hex8)."""
        sig = self.signature(text)
        r = self.num_hashes // num_bands
        keys = []
        for bi in range(num_bands):
            band = sig[bi * r : (bi + 1) * r].tobytes()
            keys.append(f"{bi}:{hashlib.md5(band).hexdigest()[:12]}")
        return keys


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)
