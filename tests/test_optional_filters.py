"""The reference's four opt-in token filters (not in canonicChain):

- OCRGarbageFilter.java      → ocr_garbage_filter
- SentenceStartLowerCaseFilter.java → sentence_start_lower_filter
- fr/PersInitialFilter.java  → pers_initial_filter
- LineTokenizer.java         → line_tokenizer

Pure-python: no Spark session needed.
"""

from __future__ import annotations

from alix_spark.analysis import lexicons as lx
from alix_spark.analysis.filters import (
    Tok,
    W,
    _ocr_accept,
    line_tokenizer,
    ocr_garbage_filter,
    pers_initial_filter,
    run_chain,
    sentence_start_lower_filter,
)
from alix_spark.analysis.tokenizer import tokenize


def _w(term: str, pos_tag: str = "", flags: set | None = None,
       ttype: str = W) -> Tok:
    return Tok(term, 0, len(term), ttype, pos_tag, "", flags or set())


# ------------------------------------------------------------ OCR garbage


def test_ocr_accept_reference_cases():
    # trailing dot / hyphen rejected (OCRGarbageFilter.java:57-58)
    assert not _ocr_accept("abc.")
    assert not _ocr_accept("abc-")
    # ≥3 repeated letters, case-folded (java:76-82)
    assert not _ocr_accept("lllo")
    assert not _ocr_accept("AAAbb")
    assert _ocr_accept("aalen")  # 2 repeats fine
    # repeat counter resets across a separator (java:89-90)
    assert _ocr_accept("aa-aa")
    # only - ' ’ space . allowed as non-letters (java:87)
    assert not _ocr_accept("ab3c")
    assert not _ocr_accept("ab,c")
    assert _ocr_accept("don't")
    assert _ocr_accept("Jean-Luc")
    # non-Latin letters rejected (java:71)
    assert not _ocr_accept("Ωmega")
    # ≥2 letters required (java:95)
    assert not _ocr_accept("a")
    assert not _ocr_accept("")
    # no vowel requirement: the reference commented it out (java:100)
    assert _ocr_accept("xz")
    assert _ocr_accept("été")


def test_ocr_garbage_filter_gaps_and_keywords():
    toks = [_w("bonjour"), _w("l1l"), _w("etc."), _w("x,y", flags={"mwe"})]
    out = ocr_garbage_filter(toks)
    assert out[0].term == "bonjour"
    # rejected tokens become position gaps, not silent deletions
    assert out[1].term == "" and "gap" in out[1].flags
    assert out[2].term == "" and "gap" in out[2].flags
    # keyword analogue always preserved (java:53)
    assert out[3].term == "x,y"


# ------------------------------------------------ sentence-start decap


def test_sentence_start_lowercase_at_boundaries():
    assert "le" in lx.POS  # the rewrite needs a lexicon hit
    toks = [
        _w("Le", pos_tag="DET"),          # stream start = sentence start
        _w("chat", pos_tag="NOUN"),
        _w(".", pos_tag=lx.PUNCT_SENT, ttype="S"),
        _w("Le", pos_tag="DET"),          # after sentence punct
        _w("Paris", pos_tag="PROPN"),     # mid-sentence: untouched
    ]
    out = sentence_start_lower_filter(toks)
    assert out[0].term == "le"
    assert out[3].term == "le"
    assert out[4].term == "Paris"


def test_sentence_start_clause_and_xml_do_not_consume():
    # XML and PUNCTclause pass through without consuming the pending
    # state (SentenceStartLowerCaseFilter.java:117-121)
    toks = [
        _w("<i>", ttype="X"),
        _w(",", pos_tag=lx.PUNCT_CLAUSE, ttype="C"),
        _w("Le", pos_tag="DET"),
    ]
    out = sentence_start_lower_filter(toks)
    assert out[2].term == "le"


def test_sentence_start_keyword_consumes_but_not_rewritten():
    # keyword prevents rewriting but not the state transition (java:66)
    toks = [
        _w("Le", pos_tag="DET", flags={"kw"}),
        _w("Le", pos_tag="DET"),
    ]
    out = sentence_start_lower_filter(toks)
    assert out[0].term == "Le"   # protected
    assert out[1].term == "Le"   # state already consumed


def test_sentence_start_unknown_word_kept():
    toks = [_w("Zorglub", pos_tag="PROPN")]
    assert sentence_start_lower_filter(toks)[0].term == "Zorglub"


def test_sentence_start_gap_does_not_consume():
    # an upstream-deleted token (term == "", e.g. uppercase_filter
    # garbage) never reaches the reference's filter — it must not eat
    # the pending sentence-start state
    gap = _w("", flags={"gap"})
    toks = [gap, _w("Le", pos_tag="DET")]
    out = sentence_start_lower_filter(toks)
    assert out[1].term == "le"


# -------------------------------------------------------- pers initial


def test_pers_initial_merges_dotted_and_bare():
    out = pers_initial_filter([_w("E."), _w("Meyerson")])
    assert [t.term for t in out] == ["E. Meyerson"]
    out = pers_initial_filter([_w("E"), _w("Meyerson")])
    assert [t.term for t in out] == ["E. Meyerson"]
    # merged token spans both sources and is keyword-protected
    a, b = Tok("E.", 10, 12, W), Tok("Meyerson", 13, 21, W)
    (m,) = pers_initial_filter([a, b])
    assert (m.start, m.end) == (10, 21) and "kw" in m.flags


def test_pers_initial_folds_accent_and_skips_monsieur():
    # É → E (PersInitialFilter.java:194); M. = Monsieur, never merged
    out = pers_initial_filter([_w("É"), _w("Meyerson")])
    assert [t.term for t in out] == ["E. Meyerson"]
    out = pers_initial_filter([_w("M."), _w("Dupont")])
    assert [t.term for t in out] == ["M.", "Dupont"]


def test_pers_initial_requires_adjacent_family_name():
    # lowercase follower: no merge (isFamilyName, java:158-176)
    out = pers_initial_filter([_w("E."), _w("et")])
    assert [t.term for t in out] == ["E.", "et"]
    # intervening PUNCTUATION blocks the merge (a real position)
    out = pers_initial_filter([_w("E."), _w(",", ttype="C"), _w("Meyerson")])
    assert [t.term for t in out] == ["E.", ",", "Meyerson"]
    # end of stream: initial emitted as-is (java:104-108)
    out = pers_initial_filter([_w("E.")])
    assert [t.term for t in out] == ["E."]
    # two initials in a row: first can't merge, second could
    out = pers_initial_filter([_w("J."), _w("K."), _w("Rowling")])
    assert [t.term for t in out] == ["J.", "K. Rowling"]


def test_pers_initial_skips_tags_and_folds_unmerged(  # ADVICE r3
):
    # an XML tag is position-less: 'E. <span>Meyerson' merges across it
    # (reference comment java:111 'offset gap is not relevant'); the
    # tag token stays in the stream
    out = pers_initial_filter([_w("E."), _w("<i>", ttype="X"), _w("Meyerson")])
    assert [t.term for t in out] == ["E. Meyerson", "<i>"]
    # an unmerged candidate still folds its initial (java:194 folds
    # before the merge decision)
    out = pers_initial_filter([_w("É."), _w("et")])
    assert [t.term for t in out] == ["E.", "et"]
    out = pers_initial_filter([_w("É")])
    assert [t.term for t in out] == ["E"]


# ------------------------------------------------------- line tokenizer


def test_line_tokenizer_crlf():
    # CRLF endings: \r is neither part of the token nor a token itself
    toks = line_tokenizer("abc\r\n\r\ndef\r\n")
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("abc", 0, 3), ("def", 7, 10)
    ]


def test_line_tokenizer_offsets_skip_empty_lines():
    toks = line_tokenizer("a\n\nbb\n")
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("a", 0, 1), ("bb", 3, 5)
    ]
    assert line_tokenizer("") == []
    assert line_tokenizer("\n\n") == []
    # no trailing newline
    toks = line_tokenizer("x\ny")
    assert [(t.term, t.start, t.end) for t in toks] == [
        ("x", 0, 1), ("y", 2, 3)
    ]


# -------------------------------------------------- run_chain plumbing


def test_run_chain_optional_switches():
    html = "<p>E. Meyerson parle de lll1 choses.</p>"
    toks = tokenize(html)
    default = [t[0] for t in run_chain(toks)]
    merged = [t[0] for t in run_chain(toks, pers_initials=True,
                                      ocr_garbage=True)]
    # default chain unchanged (goldens pinned to it)
    assert "E. Meyerson" not in default
    # opt-in: the merged name survives as one keyword token
    assert "E. Meyerson" in merged
    # positions still strictly increasing
    pos = [t[1] for t in run_chain(toks, pers_initials=True,
                                   ocr_garbage=True)]
    assert pos == sorted(pos)


def test_merged_names_survive_downstream_filters():
    # the kw flag must protect merged names from clitic re-splitting
    # ('-Le' is a clitic suffix), uppercase decap, and the short
    # all-caps deletion rule
    for text, want in [
        ("E. Nguyen-Le arrive.", "E. Nguyen-Le"),
        ("E. DUPONT parle.", "E. DUPONT"),
        ("E. HO parle.", "E. HO"),
        ("E. O'Brien parle.", "E. O'Brien"),
    ]:
        out = [t[0] for t in run_chain(tokenize(text), pers_initials=True)]
        assert want in out, (text, out)
