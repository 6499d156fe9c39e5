"""Production-artifact tag-identity probe (VERDICT r3 ask #6).

Skips unless ``SPARK_GRAFT_OPENNLP_POS_MODEL`` points at a real OpenNLP
POSModel ``.bin`` (e.g. the ``opennlp-fr-ud-gsd-pos`` artifact the
reference loads in FrenchAnalyzer.java:74-79, or any ``*-ud-*-pos``
sibling — none ships in this sandbox). When present:

- the zip loads through :class:`alix_spark.analysis.maxent.GisModel`
  (reader round-trip over the REAL artifact, not just our trained one),
- beam tagging returns one UD tag per token over the LemmaFilterTest
  homograph sentences (LemmaFilterTest.java:61-113),
- for an ENGLISH model (``en`` in the filename) the homographs must
  disambiguate exactly as the reference test expects: VERB/NOUN "saw",
  NOUN/VERB "rose", "dove", VERB/NOUN "shot" — the POS-sensitive lemma
  cases that silently depend on tagger fidelity.
"""

from __future__ import annotations

import os

import pytest

_MODEL = os.environ.get("SPARK_GRAFT_OPENNLP_POS_MODEL", "")

HOMOGRAPH_SENTENCES = [
    # (tokens, {index: expected UD tag}) — LemmaFilterTest.java:61-113
    (["I", "saw", "a", "saw", "."], {1: "VERB", 3: "NOUN"}),
    (["A", "rose", "rose", "."], {1: "NOUN", 2: "VERB"}),
    (["A", "dove", "dove", "."], {1: "NOUN", 2: "VERB"}),
    (["They", "shot", "the", "shot", "."], {1: "VERB", 3: "NOUN"}),
]


@pytest.mark.skipif(
    not (_MODEL and os.path.exists(_MODEL)),
    reason="no production OpenNLP POS artifact "
    "(set SPARK_GRAFT_OPENNLP_POS_MODEL to enable)",
)
def test_production_artifact_tag_identity():
    from alix_spark.analysis.maxent import load_tagger

    tagger = load_tagger(_MODEL)
    assert tagger.model.n_outcomes > 1
    english = "en" in os.path.basename(_MODEL).lower().split("-")
    for tokens, expect in HOMOGRAPH_SENTENCES:
        tags = tagger.tag(tokens)
        assert len(tags) == len(tokens)
        assert all(isinstance(t, str) and t for t in tags)
        if english:
            for i, tag in expect.items():
                assert tags[i] == tag, (tokens, i, tags)
