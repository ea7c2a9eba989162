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
