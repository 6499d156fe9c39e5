"""OpenNLP GIS maxent tagger tests (SURVEY §7 hard-part #1 option (i)).

Model-dependent tests read the reference's public-format POS model and
skip when it is absent; format/unit tests always run."""

from __future__ import annotations

import os

import numpy as np
import pytest

from alix_spark.analysis import maxent
from alix_spark.analysis.chain import analyze
from alix_spark.corpus.webtext import text_to_html

MODEL = (
    "/root/reference/fr/src/resources/com/github/oeuvres/alix/fr/"
    "opennlp-fr-ud-gsd-pos-1.3-2.5.4.bin"
)
needs_model = pytest.mark.skipif(
    not os.path.exists(MODEL), reason="OpenNLP model not available"
)


# ------------------------------------------------------- token classes


@pytest.mark.parametrize(
    "tok,cls",
    [
        ("ville", "lc"),
        ("Ville", "ic"),
        ("VILLE", "ac"),
        ("V", "sc"),
        ("42", "2d"),
        ("2024", "4d"),
        ("A4", "an"),
        ("3-4", "2d"),     # digits()==2 precedes the hyphen branch
        ("1-23", "dd"),
        ("123/45", "ds"),
        ("3,14", "dc"),
        ("3.14", "dp"),
        ("12345", "num"),
        ("U.S.A.", "ic"),  # first-char-uppercase precedes the cp branch
        ("etc.", "cp"),
        ("—", "other"),
    ],
)
def test_token_class(tok, cls):
    assert maxent._token_class(tok) == cls


def test_sentence_features_shape():
    feats = maxent.sentence_features(["Le", "chat", "dort"], 0)
    assert "def" in feats and "w=le" in feats and "S=begin" in feats
    assert "n1w=chat" in feats and "n2w=dort" in feats
    assert "pre=L" in feats and "pre=Le" in feats
    assert "suf=e" in feats and "suf=Le" in feats
    assert "wc=ic" in feats and "w&c=le,ic" in feats
    feats2 = maxent.sentence_features(["Le", "chat", "dort"], 2)
    assert "p1w=chat" in feats2 and "p2w=le" in feats2 and "p2S=begin" in feats2


# --------------------------------------------------------- model-bound


@needs_model
def test_model_loads_and_probs_normalize():
    model, beam = maxent.GisModel.load_pos_model(MODEL)
    assert beam == 3
    assert "NOUN" in model.outcomes and "PUNCT" in model.outcomes
    p = model.eval(maxent.sentence_features(["ville"], 0))
    assert p.shape == (len(model.outcomes),)
    assert p.sum() == pytest.approx(1.0)
    assert (p >= 0).all()


@needs_model
def test_tagging_linguistic_sanity():
    tagger = maxent.load_tagger(MODEL)
    tags = tagger.tag("Le chat mange la souris .".split())
    assert tags == ["DET", "NOUN", "VERB", "DET", "NOUN", "PUNCT"]
    tags = tagger.tag("Victor Hugo écrit des romans .".split())
    assert tags[:2] == ["PROPN", "PROPN"]
    assert tags[2] == "VERB"


@needs_model
def test_tagging_deterministic():
    tagger = maxent.load_tagger(MODEL)
    s = "Les grandes villes de France sont belles .".split()
    assert tagger.tag(s) == tagger.tag(s)


@needs_model
def test_chain_with_maxent_tagger():
    html = text_to_html(
        "Titre simple\nLe roi voit la grande ville. Il aime les livres anciens."
    )
    out = analyze(html, tagger_path=MODEL)
    terms = [t[0] for t in out]
    # lemma projection driven by maxent tags still lands the canon forms
    assert "roi" in terms and "voir" in terms and "ville" in terms
    tags = {t[0]: t[2] for t in out}
    assert tags["roi"] == "NOUN"
    # chain still byte-stable run-to-run with the model
    assert analyze(html, tagger_path=MODEL) == out


@needs_model
def test_pos_specific_lemma_with_maxent():
    # "La porte" (NOUN) vs "il la porte" (VERB) homograph: maxent
    # disambiguates where the lexicon tagger cannot
    # (reference LemmaFilterTest.java:61-113 analogue)
    html1 = text_to_html("T\nLa porte est grande.")
    out1 = analyze(html1, tagger_path=MODEL)
    tags1 = {t[0]: t[2] for t in out1}
    assert tags1.get("porte") == "NOUN"


# -------------------------------------- synthetic OpenNLP model fixture
# Built byte-for-byte in the public OpenNLP serialization (zip with
# manifest.properties + pos.model, GIS DataOutputStream layout), so the
# reader, eval softmax, and beam decoder are validated end-to-end with
# hand-computable weights — the closest available check to tag-identity
# with OpenNLP in a sandbox without the real model binary.

import io
import struct
import zipfile


def _utf(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def _build_gis_bytes(outcomes, patterns, pred_names, pred_params) -> bytes:
    out = io.BytesIO()
    out.write(_utf("GIS"))
    out.write(struct.pack(">i", 1))       # correction constant
    out.write(struct.pack(">d", 0.0))     # correction param
    out.write(struct.pack(">i", len(outcomes)))
    for o in outcomes:
        out.write(_utf(o))
    out.write(struct.pack(">i", len(patterns)))
    for count, oids in patterns:
        out.write(_utf(" ".join([str(count)] + [str(i) for i in oids])))
    out.write(struct.pack(">i", len(pred_names)))
    for n in pred_names:
        out.write(_utf(n))
    for params in pred_params:
        for p in params:
            out.write(struct.pack(">d", p))
    return out.getvalue()


@pytest.fixture()
def toy_model(tmp_path):
    outcomes = ["NOUN", "DET"]
    # one pattern: every predicate parameterizes both outcomes
    pred = {
        "def": [0.0, 0.0],
        "w=le": [0.0, 2.0],      # strongly DET
        "w=chat": [2.0, 0.0],    # strongly NOUN
        "t=DET": [1.5, 0.0],     # after a DET, prefer NOUN
    }
    names = list(pred)
    patterns = [(len(names), [0, 1])]
    data = _build_gis_bytes(outcomes, patterns, names, [pred[n] for n in names])
    path = tmp_path / "toy-pos.bin"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("manifest.properties", "BeamSize=3\n")
        z.writestr("pos.model", data)
    return str(path), pred


def test_gis_reader_roundtrip(toy_model):
    path, pred = toy_model
    model, beam = maxent.GisModel.load_pos_model(path)
    assert beam == 3
    assert model.outcomes == ["NOUN", "DET"]
    assert set(model.pred_index) == set(pred)
    for name, params in pred.items():
        pid = model.pred_index[name]
        assert model.pred_outcomes[pid].tolist() == [0, 1]
        assert model.pred_params[pid].tolist() == params


def test_gis_eval_softmax_exact(toy_model):
    path, _ = toy_model
    model, _ = maxent.GisModel.load_pos_model(path)
    # features: def (0,0) + w=le (0,2) → softmax([0, 2])
    p = model.eval(["def", "w=le", "unknown=feature"])
    want = np.exp([0.0, 2.0]) / np.exp([0.0, 2.0]).sum()
    assert np.allclose(p, want)


def test_beam_decoder_uses_tag_history(toy_model):
    path, _ = toy_model
    tagger = maxent.load_tagger(path)
    tags = tagger.tag(["le", "chat"])
    assert tags == ["DET", "NOUN"]
    # tag-history check: a neutral token after "le" still leans NOUN
    # only through the t=DET feature
    tags2 = tagger.tag(["le", "xyz"])
    assert tags2 == ["DET", "NOUN"]
    # and with no DET before it, the same neutral token ties → outcome 0
    tags3 = tagger.tag(["xyz"])
    assert tags3 == ["NOUN"]


def test_legacy_correction_model_rejected():
    """Review batch 33: a GIS model with an ACTIVE slack correction
    (constant > 1 AND param != 0) evaluates under different math —
    loading must fail loudly, not tag wrong."""
    import struct

    import pytest

    from alix_spark.analysis.maxent import GisModel

    def _utf(s):
        raw = s.encode()
        return struct.pack(">H", len(raw)) + raw

    def _blob(const, param):
        return (
            _utf("GIS")
            + struct.pack(">i", const)
            + struct.pack(">d", param)
            + struct.pack(">i", 1) + _utf("NOUN")
            + struct.pack(">i", 1) + _utf("1 0")
            + struct.pack(">i", 1) + _utf("f=a")
            + struct.pack(">d", 0.5)
        )

    with pytest.raises(ValueError, match="correction"):
        GisModel.from_bytes(_blob(3, 0.7))
    # a zeroed correction param (modern OpenNLP, any constant) loads
    m = GisModel.from_bytes(_blob(3, 0.0))
    assert m.outcomes == ["NOUN"]


def test_train_gis_empty_events_raise():
    import pytest

    from alix_spark.analysis.gis_train import train_gis

    with pytest.raises(ValueError, match="cutoff"):
        train_gis([], iterations=3)
    with pytest.raises(ValueError, match="cutoff"):
        train_gis([(["rare=1"], "X")], iterations=3, cutoff=5)
