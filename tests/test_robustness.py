"""Edge-case robustness: the analysis chain and extractors must never
throw on degenerate web inputs (empty pages, bare text, broken markup,
exotic whitespace, huge tokens)."""

from __future__ import annotations

import pytest

from alix_spark.analysis.chain import analyze, extract_text
from alix_spark.analysis.tokenizer import tokenize

CASES = [
    "",
    " ",
    "\n\n\n",
    "<html></html>",
    "<p></p><p> </p>",
    "mot",
    "<",                      # lone angle bracket
    "<p>unclosed",
    "a < b mais a > c",       # raw comparison signs in text
    "<!-- comment only -->",
    "<script>alert('x')</script>",
    "&amp;&lt;&gt;&quot;&apos;",
    "&unknown; &gt",          # unknown / unterminated entities
    "mot­­coupé",   # soft hyphens
    "''''''",
    "......",
    "-",
    "--- --- ---",
    "1" * 500,                # huge number
    "a" * 1000,               # huge word (max-token clamp)
    "<p>" * 200 + "fin" + "</p>" * 200,
    "𐏿" if False else "texte normal",  # placeholder sane case
    "日本語のテキスト",        # non-Latin script
    "mixed 日本語 et français",
]


@pytest.mark.parametrize("src", CASES)
def test_analyze_never_throws(src):
    out = analyze(src)
    assert isinstance(out, list)
    for term, pos, tag, lemma in out:
        assert term != ""
        assert pos >= 0


@pytest.mark.parametrize("src", CASES)
def test_extract_never_throws(src):
    txt = extract_text(src)
    assert isinstance(txt, str)


def test_analyze_invalid_utf8_bytes():
    out = analyze(b"\xff\xfe le roi \xf0\x28")
    assert any(t[0] == "roi" for t in out)


def test_positions_strictly_increasing():
    out = analyze("<p>Le roi parle. La ville dort.</p>")
    positions = [t[1] for t in out]
    assert positions == sorted(positions)
    assert len(set(positions)) == len(positions)


def test_non_latin_tokens_dropped_by_cleanup():
    # reference CleanupFilter drops non-Latin-letter tokens (:313-358)
    out = analyze("texte 日本語 fin")
    terms = [t[0] for t in out]
    assert "texte" in terms and "fin" in terms
    assert all(not any("぀" <= c <= "鿿" for c in t) for t in terms)


def test_tokenizer_offsets_within_source():
    src = "<p>Tom &amp; Jerry dit-il.</p>"
    for t in tokenize(src):
        assert 0 <= t.start <= t.end <= len(src)
