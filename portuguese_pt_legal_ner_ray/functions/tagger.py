"""Deterministic surrogate NER tagger with reference-faithful BIO decoding.

Plays the role of the reference's HF ``pipeline("ner",
aggregation_strategy="simple")`` (reference src/inference.py:86-94) but with a
gazetteer/regex model so the sandbox needs no GPU or network. The decode path
mirrors HF "simple" aggregation semantics exactly (new group on ``B-`` or on a
type change; group score = mean of member token scores; char span = first
token start → last token end), then applies the reference's confidence filter
``score >= threshold`` (src/inference.py:203) and span-validity filter
``0 <= start < end <= len(text)`` (src/inference.py:209).

This module is plain Python — shared verbatim by the single-process oracle
and the Ray actor stage, so the parity tests exercise the distributed
plumbing rather than model behavior (SURVEY.md §7 "pluggable tagger").
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

from ..config import (
    BIO_LABELS,
    CONFIDENCE_THRESHOLD,
    FIRST_NAMES,
    ID_TO_LABEL,
    LABEL_TO_ID,
    LAST_NAMES,
    LOCS,
    MAX_LENGTH,
    ORGS,
    PT_MONTHS,
)

# Word-level tokenizer: words or single punctuation marks, like a WordPiece
# pre-tokenizer, so spans exclude adjacent punctuation (matching the golden
# example INFERENCE_README.md:74 — "Lisboa," yields span end at the comma).
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def tokenize_with_offsets(text: str) -> list[tuple[int, int]]:
    """Return [(start, end)] char offsets of word/punct tokens."""
    return [m.span() for m in _TOKEN_RE.finditer(text)]


import functools


@functools.lru_cache(maxsize=1 << 17)
def surface_score(label: str, surface: str, weak: bool = False) -> float:
    """Deterministic pseudo-confidence, stable across processes (md5-based).

    Strong (gazetteer/regex) matches score in [0.50, 0.99] — including exact
    0.50, which the reference *keeps* (``>=`` at src/inference.py:203).
    Weak matches (ambiguous single surnames) score in [0.30, 0.50]; most are
    filtered, a deterministic few land exactly on the 0.50 boundary —
    exercising the confidence filter in both directions end-to-end.
    """
    h = int.from_bytes(hashlib.md5(f"{label}|{surface}".encode()).digest()[:4], "big")
    if weak:
        return 0.30 + (h % 21) / 100.0
    return 0.50 + (h % 50) / 100.0


def _alt(words: list[str]) -> str:
    # longest-first so "Supremo Tribunal de Justiça" beats any prefix
    return "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True))


def prefilter_pattern() -> str:
    """Cheap vectorized CAN-MATCH gate (strict superset of matchability).

    Every pattern in :func:`build_patterns` requires a digit or ``@``
    (E-MAIL/CEP/MAT/TEL/DAT/IDP) or a gazetteer word (ORG/PER/LOC/weak
    surname), so a paragraph matching NONE of these alternatives cannot
    yield any span. Run as one Arrow ``match_substring_regex`` over the
    whole batch before the per-paragraph Python tagger — the standard
    "vectorized gate before the expensive model" shape (cf. the lang gate).
    """
    words = [*ORGS, *LOCS, *FIRST_NAMES, *LAST_NAMES]
    return "[0-9@]|" + "|".join(re.escape(w) for w in words)


def build_patterns() -> list[tuple[str, re.Pattern, bool]]:
    """(label, compiled_pattern, weak) in priority order; earlier wins overlaps."""
    per = rf"(?:{_alt(FIRST_NAMES)}) (?:{_alt(LAST_NAMES)})"
    months = "|".join(PT_MONTHS)
    return [
        ("E-MAIL", re.compile(r"\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b"), False),
        ("CEP", re.compile(r"\b\d{4}-\d{3}\b"), False),
        ("MAT", re.compile(r"\b[A-Z]{2}-\d{2}-[A-Z]{2}\b"), False),
        ("TEL", re.compile(r"\+351 \d{3} \d{3} \d{3}|\b9\d{8}\b"), False),
        ("DAT", re.compile(rf"\b\d{{2}}/\d{{2}}/\d{{4}}\b|\b\d{{1,2}} de (?:{months}) de \d{{4}}\b"), False),
        ("IDP", re.compile(r"\b\d{3,6}/\d{4}\b"), False),
        ("ORG", re.compile(rf"\b(?:{_alt(ORGS)})\b"), False),
        ("PER", re.compile(rf"\b{per}\b"), False),
        ("LOC", re.compile(rf"\b(?:{_alt(LOCS)})\b"), False),
        # ambiguous standalone surname -> low-confidence PER (mostly filtered)
        ("PER", re.compile(rf"\b(?:{_alt(LAST_NAMES)})\b"), True),
    ]


@dataclass(frozen=True)
class Span:
    start: int
    end: int
    label: str
    score: float


class Tagger:
    """Pluggable tagger interface (SURVEY.md §7): one method, paragraph in,
    filtered spans out. Implementations: :class:`RegexGazetteerTagger`
    (deterministic surrogate, used by tests/benches and the oracle) and
    :class:`HFTagger` (real checkpoint; requires transformers)."""

    def tag_paragraph(self, text: str) -> list["Span"]:  # pragma: no cover
        raise NotImplementedError


class HFTagger(Tagger):
    """HF token-classification checkpoint behind the same decode path.

    Reference-faithful chain (src/inference.py:65-96, 185-216): tokenizer
    with ``return_offsets_mapping=True``, batched forward pass with dynamic
    padding (sub-batches planned by ``length_sorted_batches`` so
    ``len(batch) × max_len`` stays under a token budget), softmax + argmax
    per token, then the SHARED ``decode_simple`` ("simple" aggregation:
    new group on ``B-``/type change, score = mean member score, char span =
    first token start → last token end) + the reference's confidence
    ``>=`` (src/inference.py:203) and span-validity (src/inference.py:209)
    filters — so swapping the model never changes decode semantics.
    Decode runs at the tokenizer's (subword) token level; consecutive
    subwords of one entity merge in ``decode_simple`` by type continuity.

    Needs the ``transformers`` package and a local checkpoint (no network);
    in environments without them, construction raises with guidance. The
    glue is exercised in-sandbox by tests with a stubbed ``transformers``
    module, asserted span-identical to ``LogitsTagger`` on the golden
    example (INFERENCE_README.md:74).
    """

    def __init__(self, model_path: str,
                 confidence_threshold: float = CONFIDENCE_THRESHOLD,
                 max_length: int = MAX_LENGTH, token_budget: int = 8192):
        try:
            from transformers import (
                AutoModelForTokenClassification,
                AutoTokenizer,
            )
        except ImportError as exc:
            raise NotImplementedError(
                "HFTagger needs the 'transformers' package and a local "
                "checkpoint; use RegexGazetteerTagger in this environment"
            ) from exc
        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModelForTokenClassification.from_pretrained(model_path)
        self.model.eval()
        # label map from the checkpoint config (falls back to the engine's)
        cfg = getattr(self.model, "config", None)
        id2label = getattr(cfg, "id2label", None)
        self.id_to_label = ({int(k): v for k, v in id2label.items()}
                            if id2label else ID_TO_LABEL)
        self.threshold = confidence_threshold
        self.max_length = max_length
        self.token_budget = token_budget
        self.can_match_pattern = None  # a real checkpoint defeats the gate

    @staticmethod
    def _np(x):
        """torch tensor | numpy -> numpy (keeps the stub torch-free)."""
        import numpy as np

        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x)

    def _forward(self, enc):
        """model(**enc).logits with no_grad when torch is available."""
        try:
            import torch

            ctx = torch.no_grad()
        except ImportError:  # stubbed-transformers tests
            import contextlib

            ctx = contextlib.nullcontext()
        with ctx:
            return self.model(**enc).logits

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        import numpy as np

        out: list[list[Span]] = [[] for _ in texts]
        for grp in length_sorted_batches(texts, self.token_budget):
            sub = [texts[i] for i in grp]
            enc = self.tokenizer(
                sub, return_offsets_mapping=True, truncation=True,
                max_length=self.max_length, padding=True, return_tensors="pt",
            )
            offsets = self._np(enc.pop("offset_mapping"))
            attn = self._np(enc["attention_mask"])
            logits = self._np(self._forward(enc))
            shifted = logits - logits.max(axis=-1, keepdims=True)
            probs = np.exp(shifted)
            probs /= probs.sum(axis=-1, keepdims=True)
            ids = probs.argmax(axis=-1)
            for row, ti in enumerate(grp):
                text = texts[ti]
                # keep attended, non-special tokens (specials/pads map to
                # the empty (0, 0) char range by HF convention)
                keep = (attn[row] == 1) & (offsets[row, :, 0] != offsets[row, :, 1])
                offs = [tuple(map(int, o)) for o in offsets[row][keep]]
                tags = [self.id_to_label[int(i)] for i in ids[row][keep]]
                scores = np.round(
                    probs[row][keep][np.arange(int(keep.sum())), ids[row][keep]], 6
                ).tolist()
                spans = []
                for sp in RegexGazetteerTagger.decode_simple(offs, tags, scores):
                    if (sp.score >= self.threshold
                            and 0 <= sp.start < sp.end <= len(text)):
                        spans.append(sp)
                out[ti] = spans
        return out

    def tag_paragraph(self, text: str) -> list[Span]:
        return self.tag_batch([text])[0]


def length_sorted_batches(texts: list[str], token_budget: int = 8192):
    """Dynamic-padding batch plan: indices sorted by token length, grouped
    so each sub-batch's ``len(batch) * max_len`` stays under the budget —
    the padding-waste minimizer a real model forward pass needs (reference's
    dead ``batch_size: 16`` config replaced by true batching, SURVEY.md
    §2.3 A1). Returns a list of index lists; order within the caller's
    output must be restored by the caller (semantics-neutral).
    """
    lengths = [len(tokenize_with_offsets(t)) for t in texts]
    order = sorted(range(len(texts)), key=lambda i: (lengths[i], i))
    batches: list[list[int]] = []
    cur: list[int] = []
    cur_max = 0
    for i in order:
        new_max = max(cur_max, max(1, lengths[i]))
        if cur and (len(cur) + 1) * new_max > token_budget:
            batches.append(cur)
            cur, cur_max = [], 0
            new_max = max(1, lengths[i])
        cur.append(i)
        cur_max = new_max
    if cur:
        batches.append(cur)
    return batches


class RegexGazetteerTagger(Tagger):
    """Token-level BIO tagger + "simple"-aggregation decoder.

    ``__init__`` compiles all patterns once (per actor, in the Ray stage);
    ``tag_paragraph`` is the per-record hot path.
    """

    def __init__(self, confidence_threshold: float = CONFIDENCE_THRESHOLD,
                 max_length: int = MAX_LENGTH):
        self.patterns = build_patterns()
        self.threshold = confidence_threshold
        self.max_length = max_length
        # sound for THIS tagger: a non-matching paragraph yields no span
        self.can_match_pattern = prefilter_pattern()

    # -- token-level tagging -------------------------------------------------
    def _token_tags(
        self, text: str, offsets: list[tuple[int, int]]
    ) -> tuple[list[str], list[float]]:
        from bisect import bisect_left, bisect_right

        tags = ["O"] * len(offsets)
        scores = [0.0] * len(offsets)
        taken = [False] * len(offsets)
        starts = [s for s, _ in offsets]
        ends = [e for _, e in offsets]
        for label, pat, weak in self.patterns:
            for m in pat.finditer(text):
                ms, me = m.span()
                # covering tokens: end > ms and start < me (offsets are sorted)
                lo = bisect_right(ends, ms)
                hi = bisect_left(starts, me)
                if lo >= hi or any(taken[i] for i in range(lo, hi)):
                    continue  # earlier (higher-priority) match keeps the tokens
                sc = surface_score(label, m.group(), weak)
                for k, i in enumerate(range(lo, hi)):
                    taken[i] = True
                    tags[i] = ("B-" if k == 0 else "I-") + label
                    scores[i] = sc
        return tags, scores

    # -- HF "simple" aggregation decode --------------------------------------
    @staticmethod
    def decode_simple(
        offsets: list[tuple[int, int]], tags: list[str], scores: list[float]
    ) -> list[Span]:
        """Group consecutive B-/I- tokens of one type into char spans.

        Faithful to transformers' ``aggregation_strategy="simple"`` as invoked
        by the reference (src/inference.py:86-94): a new group starts on
        ``B-`` or when the entity type changes; an ``I-`` without a matching
        open group also starts one; group score = mean of token scores.
        """
        spans: list[Span] = []
        cur: list[int] | None = None  # token indices of the open group
        cur_type = ""

        def close():
            nonlocal cur
            if cur is not None:
                s = offsets[cur[0]][0]
                e = offsets[cur[-1]][1]
                sc = sum(scores[i] for i in cur) / len(cur)
                spans.append(Span(s, e, cur_type, sc))
                cur = None

        for i, tag in enumerate(tags):
            if tag == "O":
                close()
                continue
            prefix, etype = tag.split("-", 1)
            if prefix == "B" or cur is None or etype != cur_type:
                close()
                cur = [i]
                cur_type = etype
            else:
                cur.append(i)
        close()
        return spans

    # -- public per-paragraph API -------------------------------------------
    def tag_paragraph(self, text: str) -> list[Span]:
        """All filtered entity spans of one paragraph.

        Applies the reference's two output filters: confidence
        ``score >= threshold`` (src/inference.py:203, kept at equality) and
        validity ``0 <= start < end <= len(text)`` (src/inference.py:209),
        after truncating to ``max_length`` tokens (src/data.py:179-184
        ``truncation=True, max_length=512``) — entities whose tokens fall
        past the window are dropped, as a real checkpoint would.

        Decode-equivalence shortcut (the NER hot path at bench scale):
        every accepted regex match tags its covering tokens ``B- I- ... I-``
        of one type, so ``decode_simple`` reconstructs EXACTLY one group
        per match — span = (first covered token start, last covered token
        end), score = the match's surface score. The span is therefore
        emitted directly, skipping the per-token tag materialization and
        BIO re-grouping; equivalence to the full logits → BIO → decode
        chain is continuously checked by the LogitsTagger parity tests
        (``FakeLogitsModel`` derives its logits from ``_token_tags`` and
        decodes through ``decode_simple``). Output order is token order
        (sorted by start), exactly as the decode emits it.
        """
        from bisect import bisect_left, bisect_right

        offsets = tokenize_with_offsets(text)[: self.max_length]
        if not offsets:
            return []
        starts = [s for s, _ in offsets]
        ends = [e for _, e in offsets]
        taken = bytearray(len(offsets))
        out: list[Span] = []
        n = len(text)
        for label, pat, weak in self.patterns:
            for m in pat.finditer(text):
                ms, me = m.span()
                lo = bisect_right(ends, ms)
                hi = bisect_left(starts, me)
                if lo >= hi or 1 in taken[lo:hi]:
                    continue  # earlier (higher-priority) match keeps tokens
                for i in range(lo, hi):
                    taken[i] = 1
                sc = surface_score(label, m.group(), weak)
                s, e = offsets[lo][0], offsets[hi - 1][1]
                if sc >= self.threshold and 0 <= s < e <= n:
                    out.append(Span(s, e, label, sc))
        out.sort(key=lambda sp: sp.start)
        return out


# ---------------------------------------------------------------------------
# Logits decode path (the real-model wire format, exercised without a model)
# ---------------------------------------------------------------------------


class FakeLogitsModel:
    """Deterministic per-token logits producer standing in for a HF forward
    pass (reference src/inference.py:96 ``model(**inputs).logits``).

    For each token it emits a ``[n_tokens, len(BIO_LABELS)]`` float64 logit
    matrix whose argmax class is the gazetteer tagger's BIO tag and whose
    softmax probability at the argmax equals the tagger's surface score
    (chosen-class logit ``log((K-1)·p / (1-p))``, all others 0). This makes
    the full logits → argmax → BIO → "simple"-aggregation decode path
    testable in-sandbox with known-truth outputs.
    """

    def __init__(self):
        self._ref = RegexGazetteerTagger()

    def forward(self, text: str, offsets: list[tuple[int, int]]):
        import numpy as np

        tags, scores = self._ref._token_tags(text, offsets)
        k = len(BIO_LABELS)
        logits = np.zeros((len(offsets), k), dtype=np.float64)
        for i, (tag, sc) in enumerate(zip(tags, scores)):
            p = sc if tag != "O" else 0.97  # O confidence never reaches a span
            p = min(max(p, 1e-6), 1 - 1e-6)
            logits[i, LABEL_TO_ID[tag]] = np.log((k - 1) * p / (1 - p))
        return logits

    def forward_batch(self, texts, offsets_list):
        """Dynamic-padding batched forward (one padded tensor per call —
        the wire shape ``length_sorted_batches`` plans for)."""
        return _pad_forward_batch(self, texts, offsets_list)


class LogitsTagger(Tagger):
    """Argmax decode over a per-token score matrix — the exact shape a real
    ``AutoModelForTokenClassification`` checkpoint produces.

    Reference-faithful chain (src/inference.py:65-96, 185-216 +
    src/data.py:179-184): truncate to ``max_length`` tokens → model forward
    (``model.forward(text, offsets) -> [n_tokens, n_labels]`` logits) →
    softmax → argmax id → BIO tag + probability → the SHARED
    ``RegexGazetteerTagger.decode_simple`` ("simple" aggregation) →
    confidence ``>=`` + span-validity filters. Swapping ``FakeLogitsModel``
    for a real checkpoint changes nothing downstream of the logit matrix.

    Token probabilities are rounded to 6 decimals before aggregation so the
    log/exp round-trip of the fake model cannot flip the inclusive
    ``score >= threshold`` boundary (a pure-float artifact a real model
    doesn't have).
    """

    def __init__(self, model=None, confidence_threshold: float = CONFIDENCE_THRESHOLD,
                 max_length: int = MAX_LENGTH):
        self.model = model or FakeLogitsModel()
        self.threshold = confidence_threshold
        self.max_length = max_length
        # the can-match gate is only sound when the logits provably derive
        # from the gazetteer patterns; a real checkpoint can find entities
        # the gate would skip, so it advertises none
        self.can_match_pattern = (
            prefilter_pattern() if isinstance(self.model, FakeLogitsModel) else None
        )

    def _decode(self, text: str, offsets, logits) -> list[Span]:
        import numpy as np

        logits = np.asarray(logits, dtype=np.float64)
        shifted = logits - logits.max(axis=1, keepdims=True)
        probs = np.exp(shifted)
        probs /= probs.sum(axis=1, keepdims=True)
        ids = probs.argmax(axis=1)
        tags = [ID_TO_LABEL[int(i)] for i in ids]
        scores = np.round(probs[np.arange(len(ids)), ids], 6).tolist()
        out = []
        for sp in RegexGazetteerTagger.decode_simple(offsets, tags, scores):
            if sp.score >= self.threshold and 0 <= sp.start < sp.end <= len(text):
                out.append(sp)
        return out

    def tag_paragraph(self, text: str) -> list[Span]:
        offsets = tokenize_with_offsets(text)[: self.max_length]
        if not offsets:
            return []
        return self._decode(text, offsets, self.model.forward(text, offsets))

    def tag_batch(self, texts: list[str]) -> list[list[Span]]:
        """Batched inference through the model's padded ``forward_batch`` —
        one padded tensor per call, per-text decode identical to
        ``tag_paragraph`` (padding is sliced off before decode, so batching
        is semantics-neutral by construction)."""
        offsets_list = [tokenize_with_offsets(t)[: self.max_length] for t in texts]
        keep = [i for i, o in enumerate(offsets_list) if o]
        fwd = getattr(self.model, "forward_batch", None)
        if fwd is None:
            mats = [self.model.forward(texts[i], offsets_list[i]) for i in keep]
        else:
            mats = fwd([texts[i] for i in keep], [offsets_list[i] for i in keep])
        out: list[list[Span]] = [[] for _ in texts]
        for i, m in zip(keep, mats):
            out[i] = self._decode(texts[i], offsets_list[i], m)
        return out


def _pad_forward_batch(model, texts, offsets_list):
    """Shared padded-batch plan: stack per-text logits into one zero-padded
    ``[B, L_max, K]`` tensor (exactly what a real checkpoint's batched
    forward produces under dynamic padding) and hand back per-text views
    with the padding sliced off."""
    import numpy as np

    mats = [model.forward(t, o) for t, o in zip(texts, offsets_list)]
    if not mats:
        return []
    k = len(BIO_LABELS)
    lmax = max((m.shape[0] for m in mats), default=0)
    batch = np.zeros((len(mats), max(lmax, 1), k), dtype=np.float64)
    for i, m in enumerate(mats):
        batch[i, : m.shape[0]] = m
    return [batch[i, : m.shape[0]] for i, m in enumerate(mats)]
