"""Rule-based (subj, pred, obj) triple extraction over NER spans.

Added by the target spec (BASELINE.json north_star); the reference stops at
span emission (src/inference.py:119-128). Rules are a config table keyed by
(subject_label, object_label); a rule fires for every ordered span pair in a
paragraph where the subject span starts before the object span. Pair
generation is capped (MAX_PAIRS_PER_PARAGRAPH) so a pathological paragraph
cannot go quadratic — the skew guard from SURVEY.md §7.

Shared verbatim by the oracle and the Ray stage.
"""

from __future__ import annotations

from ..config import MAX_PAIRS_PER_PARAGRAPH, TRIPLE_RULES
from .tagger import Span


def extract_triples(
    text: str,
    spans: list[Span],
    rules: dict[tuple[str, str], str] = TRIPLE_RULES,
    max_pairs: int = MAX_PAIRS_PER_PARAGRAPH,
) -> list[tuple[str, str, str, str, str]]:
    """-> [(subj_surface, pred, obj_surface, subj_label, obj_label)].

    Spans are processed in start order; emission order is deterministic but
    downstream comparison is set-based (SURVEY.md §1 ordering semantics).
    """
    out: list[tuple[str, str, str, str, str]] = []
    ordered = sorted(spans, key=lambda s: (s.start, s.end, s.label))
    n = len(ordered)
    budget = max_pairs
    for i in range(n):
        if budget <= 0:
            break
        si = ordered[i]
        for j in range(i + 1, n):
            if budget <= 0:
                break
            sj = ordered[j]
            pred = rules.get((si.label, sj.label))
            budget -= 1
            if pred is not None:
                out.append(
                    (text[si.start : si.end], pred, text[sj.start : sj.end],
                     si.label, sj.label)
                )
    return out
