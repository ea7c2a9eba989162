"""Unit tests: tokenizer, BIO decode, filters — reference semantics
(src/inference.py:185-216, aggregation per src/inference.py:86-94)."""

from portuguese_pt_legal_ner_ray.config import CONFIDENCE_THRESHOLD
from portuguese_pt_legal_ner_ray.functions.tagger import (
    RegexGazetteerTagger,
    Span,
    surface_score,
    tokenize_with_offsets,
)


def test_tokenize_splits_punctuation():
    text = "em Lisboa, em 12/02/1990."
    toks = [text[s:e] for s, e in tokenize_with_offsets(text)]
    assert toks == ["em", "Lisboa", ",", "em", "12", "/", "02", "/", "1990", "."]


def test_golden_example_spans():
    # reference INFERENCE_README.md:53-76 canonical sentence
    text = "O réu João Silva foi notificado em Lisboa, em 12/02/1990."
    spans = RegexGazetteerTagger().tag_paragraph(text)
    got = {(s.start, s.end, s.label) for s in spans}
    assert (6, 16, "PER") in got
    assert text[6:16] == "João Silva"
    assert (35, 41, "LOC") in got and text[35:41] == "Lisboa"  # excludes comma
    assert (46, 56, "DAT") in got and text[46:56] == "12/02/1990"


def test_decode_simple_groups_and_mean_score():
    offsets = [(0, 2), (3, 5), (6, 8), (9, 11)]
    tags = ["B-PER", "I-PER", "O", "B-LOC"]
    scores = [0.8, 0.6, 0.0, 0.9]
    spans = RegexGazetteerTagger.decode_simple(offsets, tags, scores)
    assert [(s.start, s.end, s.label) for s in spans] == [(0, 5, "PER"), (9, 11, "LOC")]
    assert abs(spans[0].score - 0.7) < 1e-12 and spans[1].score == 0.9


def test_decode_simple_i_without_b_starts_group():
    spans = RegexGazetteerTagger.decode_simple([(0, 1), (2, 3)], ["I-ORG", "I-LOC"], [0.9, 0.9])
    assert [(s.start, s.end, s.label) for s in spans] == [(0, 1, "ORG"), (2, 3, "LOC")]


def test_decode_simple_b_breaks_group():
    spans = RegexGazetteerTagger.decode_simple(
        [(0, 1), (2, 3)], ["B-PER", "B-PER"], [0.9, 0.9]
    )
    assert len(spans) == 2


def test_confidence_threshold_is_inclusive():
    # score == threshold is KEPT (reference src/inference.py:203 uses >=)
    t = RegexGazetteerTagger(confidence_threshold=0.5)
    offsets = [(0, 4)]
    spans = [
        s
        for s in t.decode_simple(offsets, ["B-PER"], [0.5])
        if s.score >= t.threshold
    ]
    assert len(spans) == 1


def test_weak_surname_mostly_filtered():
    t = RegexGazetteerTagger()
    spans = t.tag_paragraph("O recurso apresentado por Pereira foi indeferido.")
    # surface_score("PER", "Pereira", weak=True) == 0.30 < 0.5 -> filtered
    assert surface_score("PER", "Pereira", weak=True) < CONFIDENCE_THRESHOLD
    assert all(s.label != "PER" for s in spans)


def test_full_name_beats_weak_surname():
    t = RegexGazetteerTagger()
    spans = t.tag_paragraph("João Silva compareceu.")
    assert [(s.start, s.end, s.label) for s in spans] == [(0, 10, "PER")]


def test_scores_deterministic():
    assert surface_score("ORG", "Banco de Portugal") == surface_score("ORG", "Banco de Portugal")
    assert 0.5 <= surface_score("ORG", "Banco de Portugal") <= 0.99


def test_logits_tagger_golden_example():
    """The full logits->argmax->BIO->simple-aggregation decode path must
    reproduce the reference's canonical output (INFERENCE_README.md:74)."""
    from portuguese_pt_legal_ner_ray.functions.tagger import LogitsTagger

    text = "O réu João Silva foi notificado em Lisboa, em 12/02/1990."
    got = {(s.start, s.end, s.label) for s in LogitsTagger().tag_paragraph(text)}
    assert (6, 16, "PER") in got
    assert (35, 41, "LOC") in got
    assert (46, 56, "DAT") in got


def test_logits_tagger_matches_regex_tagger_on_corpus():
    """Fake-logits argmax decode == direct gazetteer decode, span for span
    (same tags by construction; scores equal to softmax round-trip fuzz)."""
    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.functions.tagger import LogitsTagger

    lt, rt = LogitsTagger(), RegexGazetteerTagger()
    pages = gen_pages_shard(0, 0, 60)
    n_spans = 0
    for text, lang in zip(pages["text"].to_pylist(), pages["lang"].to_pylist()):
        if lang != "pt":
            continue
        for para in (p.strip() for p in text.split("\n") if p.strip()):
            a, b = lt.tag_paragraph(para), rt.tag_paragraph(para)
            assert [(s.start, s.end, s.label) for s in a] == [
                (s.start, s.end, s.label) for s in b
            ]
            assert all(abs(x.score - y.score) < 1e-6 for x, y in zip(a, b))
            n_spans += len(a)
    assert n_spans > 50  # the parity claim is vacuous on an empty sample


def test_max_length_truncation_drops_late_spans():
    """Entities past the 512-token window are dropped; entities inside are
    kept (reference src/data.py:179-184 truncation semantics)."""
    from portuguese_pt_legal_ner_ray.functions.tagger import LogitsTagger

    early = "João Silva compareceu."           # 4 tokens, PER at [0, 10)
    filler = " ".join(["palavra"] * 520)        # pushes the next entity past 512
    text = early + " " + filler + " " + "Ana Costa compareceu."
    for tagger in (RegexGazetteerTagger(), LogitsTagger()):
        spans = tagger.tag_paragraph(text)
        assert [(s.start, s.end, s.label) for s in spans] == [(0, 10, "PER")]
        # no truncation -> the late span IS found (proves the cap is the cause)
    untruncated = RegexGazetteerTagger(max_length=10_000).tag_paragraph(text)
    assert len(untruncated) == 2


def test_prefilter_is_superset_of_matchability():
    """The vectorized can-match gate may only skip paragraphs the tagger
    would return [] for — verified over corpus shards and adversarial
    near-miss strings."""
    import re

    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.functions.tagger import prefilter_pattern

    pat = re.compile(prefilter_pattern())
    t = RegexGazetteerTagger(confidence_threshold=0.0)  # keep even weak spans
    paras = []
    for shard in range(3):
        for text in gen_pages_shard(shard, shard * 100, 100)["text"].to_pylist():
            paras.extend(p.strip() for p in text.split("\n") if p.strip())
    paras += [
        "sem entidades aqui, apenas palavras comuns.",
        "Uma Frase Capitalizada Sem Gazetteer.",
        "email at example dot com",  # no @ -> no E-MAIL possible
        "",
    ]
    checked_skips = 0
    for p in paras:
        if not pat.search(p):
            assert t.tag_paragraph(p) == [], p
            checked_skips += 1
    assert checked_skips > 50  # the gate actually fires on real fillers


def test_hf_tagger_glue_with_stubbed_transformers(monkeypatch):
    """The HFTagger HF glue — tokenizer with return_offsets_mapping, padded
    batched forward, softmax/argmax, shared simple decode + filters
    (reference src/inference.py:65-96, 185-216) — must produce the same
    spans as LogitsTagger on the golden example, proven with a stubbed
    ``transformers`` module (subword tokenizer + logits model derived from
    the gazetteer truth; no torch/network needed)."""
    import sys
    import types

    import numpy as np

    from portuguese_pt_legal_ner_ray.config import BIO_LABELS, LABEL_TO_ID
    from portuguese_pt_legal_ner_ray.functions.tagger import LogitsTagger

    ref = RegexGazetteerTagger()
    state: dict = {}
    K = len(BIO_LABELS)

    class StubTokenizer:
        @classmethod
        def from_pretrained(cls, path):
            return cls()

        def __call__(self, texts, return_offsets_mapping=True, truncation=True,
                     max_length=512, padding=True, return_tensors=None):
            per = []
            for t in texts:
                offs = [(0, 0)]  # [CLS]
                for s, e in tokenize_with_offsets(t):
                    for cs in range(s, e, 4):  # fixed-width subword chunks
                        offs.append((cs, min(cs + 4, e)))
                offs = offs[: max_length - 1]
                offs.append((0, 0))  # [SEP]
                per.append(offs)
            lmax = max(len(o) for o in per)
            offsets = np.zeros((len(per), lmax, 2), dtype=np.int64)
            attn = np.zeros((len(per), lmax), dtype=np.int64)
            for i, o in enumerate(per):
                offsets[i, : len(o)] = o
                attn[i, : len(o)] = 1
            state["texts"], state["offsets"], state["attn"] = texts, offsets, attn
            return dict(input_ids=np.zeros_like(attn), attention_mask=attn,
                        offset_mapping=offsets)

    class StubModel:
        config = types.SimpleNamespace(
            id2label={i: lab for i, lab in enumerate(BIO_LABELS)})

        @classmethod
        def from_pretrained(cls, path):
            return cls()

        def eval(self):
            return self

        def __call__(self, input_ids=None, attention_mask=None, **kw):
            texts, offsets, attn = state["texts"], state["offsets"], state["attn"]
            logits = np.zeros((len(texts), offsets.shape[1], K))
            for i, t in enumerate(texts):
                woffs = tokenize_with_offsets(t)
                tags, scores = ref._token_tags(t, woffs)
                for j in range(offsets.shape[1]):
                    cs, ce = offsets[i, j]
                    if attn[i, j] == 0 or cs == ce:
                        continue  # special/pad: HFTagger must drop these
                    for (ws, we), tag, sc in zip(woffs, tags, scores):
                        if ws <= cs and ce <= we:
                            if tag == "O":
                                tg, p = "O", 0.97
                            elif cs == ws:  # word's first subword keeps B-/I-
                                tg, p = tag, sc
                            else:  # continuation subword
                                tg, p = "I-" + tag.split("-", 1)[1], sc
                            p = min(max(p, 1e-6), 1 - 1e-6)
                            logits[i, j, LABEL_TO_ID[tg]] = np.log(
                                (K - 1) * p / (1 - p))
                            break
            return types.SimpleNamespace(logits=logits)

    mod = types.ModuleType("transformers")
    mod.AutoTokenizer = StubTokenizer
    mod.AutoModelForTokenClassification = StubModel
    monkeypatch.setitem(sys.modules, "transformers", mod)

    from portuguese_pt_legal_ner_ray.functions.tagger import HFTagger

    hf = HFTagger("/fake/checkpoint")
    texts = [
        "O réu João Silva foi notificado em Lisboa, em 12/02/1990.",
        "Nada a assinalar aqui.",
        "Contacto: joao@mail.pt e CEP 1000-001 do Tribunal da Relação.",
    ]
    want = LogitsTagger().tag_batch(texts)
    got = hf.tag_batch(texts)
    for w_spans, g_spans in zip(want, got):
        assert ({(s.start, s.end, s.label) for s in w_spans}
                == {(s.start, s.end, s.label) for s in g_spans})
    # golden example exact check (INFERENCE_README.md:74)
    g0 = {(s.start, s.end, s.label) for s in got[0]}
    assert (6, 16, "PER") in g0 and (35, 41, "LOC") in g0
    # single-paragraph API goes through the same path
    assert ({(s.start, s.end, s.label) for s in hf.tag_paragraph(texts[0])}
            == g0)


def test_direct_span_path_equals_bio_decode_path():
    """The regex tagger's direct span emission must equal the full
    logits -> argmax -> BIO -> decode_simple chain on real corpus
    paragraphs (LogitsTagger's FakeLogitsModel derives from _token_tags,
    so it exercises the decode route end to end)."""
    from portuguese_pt_legal_ner_ray.corpus import gen_pages_shard
    from portuguese_pt_legal_ner_ray.functions.tagger import LogitsTagger

    direct = RegexGazetteerTagger()
    decode = LogitsTagger()
    pages = gen_pages_shard(0, 0, 150)
    n_spans = 0
    for text in pages["text"].to_pylist():
        for para in (p.strip() for p in text.split("\n") if p.strip()):
            a = direct.tag_paragraph(para)
            b = decode.tag_paragraph(para)
            assert [(s.start, s.end, s.label) for s in a] == \
                   [(s.start, s.end, s.label) for s in b], para
            for x, y in zip(a, b):
                assert abs(x.score - y.score) < 1e-5
            n_spans += len(a)
    assert n_spans > 100  # the sample must actually exercise the tagger
