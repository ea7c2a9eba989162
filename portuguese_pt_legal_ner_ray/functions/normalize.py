"""Surface normalization for entity canonicalization (stateless, shared by
oracle and Ray stages). Added by the target spec; the reference has no
linking stage — determinism discipline follows SURVEY.md §4 (order-free,
pure function of row content).
"""

from __future__ import annotations

import unicodedata

_STRIP_CHARS = " \t.,;:!?\"'()[]"


def normalize_surface(surface: str) -> str:
    """Lowercase, strip diacritics (NFKD, drop combining marks), collapse
    internal whitespace, trim edge punctuation. Pure and deterministic."""
    s = unicodedata.normalize("NFKD", surface)
    s = "".join(c for c in s if not unicodedata.combining(c))
    s = s.lower().strip(_STRIP_CHARS)
    return " ".join(s.split())


def entity_key(label: str, surface: str) -> str:
    """Node identity before linking: label-scoped normalized surface."""
    return f"{label}|{normalize_surface(surface)}"
