"""Unit tests for the analysis chain — the reference's test style
re-expressed as pytest (SURVEY.md §5: analyzer components tested with
hand-built inputs and exact token-sequence assertions; reference
tests: LemmaFilterTest.java, FrenchCliticTokenizerTest.java,
DetaggerTest.java, MarkupTokenizerDemo)."""

from __future__ import annotations

from alix_spark.analysis.chain import analyze, extract_text
from alix_spark.analysis.filters import run_chain
from alix_spark.analysis.tokenizer import tokenize
from alix_spark.corpus.webtext import text_to_html


def terms(src: str) -> list[str]:
    return [t[0] for t in run_chain(tokenize(src))]


def raw(src: str) -> list[str]:
    return [t.term for t in tokenize(src)]


# ------------------------------------------------------------ tokenizer


def test_words_and_punct():
    assert raw("Le roi parle, et voit.") == [
        "Le", "roi", "parle", ",", "et", "voit", ".",
    ]


def test_entities_decoded_in_words():
    # reference MarkupTokenizer.java:239-258 — 5 XML entities
    assert raw("Tom &amp; Jerry") == ["Tom", "&", "Jerry"]
    assert raw("x &lt; y &gt; z") == ["x", "<", "y", ">", "z"]


def test_curly_apostrophe_normalized():
    # reference :576-581
    assert raw("l’homme") == ["l'homme"]


def test_soft_hyphen_removed():
    assert raw("cons­titution") == ["constitution"]


def test_numbers():
    # reference :613-641, :803-805
    assert raw("3,14 et 1.250 et -42") == ["3,14", "et", "1.250", "et", "-42"]


def test_number_dangling_separator_detached():
    assert raw("42, rue") == ["42", ",", "rue"]


def test_xml_tags_are_tokens_then_dropped():
    toks = tokenize("<p>mot</p>")
    assert [t.ttype for t in toks] == ["X", "W", "X"]


def test_sentence_punct_runs():
    assert raw("Quoi ?!") == ["Quoi", "?!"]
    assert raw("Fin…") == ["Fin", "…"]


def test_brevidot_kept():
    # reference brevidot classes: configured list (:414-546)
    assert raw("M. Hugo, etc. dit") == ["M.", "Hugo", ",", "etc.", "dit"]


def test_initials_and_acronyms():
    assert raw("J.-J. Rousseau et U.S.A.") == ["J.-J.", "Rousseau", "et", "U.S.A."]


def test_titlecase_word_before_dot_not_merged():
    # 3-letter titlecase word at sentence end is NOT an abbreviation
    assert raw("avec Tom. Il dort.") == ["avec", "Tom", ".", "Il", "dort", "."]


def test_script_style_head_excluded():
    toks = raw("<head><title>T</title></head><body>mot <script>var x = 2;</script>fin</body>")
    assert "var" not in toks and "T" not in toks
    assert "mot" in toks and "fin" in toks


def test_max_token_len():
    long = "a" * 500
    assert len(raw(long)[0]) == 256


# --------------------------------------------------------- clitic split


def test_clitic_prefixes():
    # reference FrenchCliticSplitFilter.java:127-144 (stop+cleanup will
    # drop function words later; test at the raw chain level via terms
    # of a full run on content words)
    from alix_spark.analysis.filters import annotate, clitic_filter

    def split(s):
        return [t.term for t in clitic_filter(annotate(tokenize(s)))]

    assert split("c'est") == ["ce", "est"]
    assert split("l'homme") == ["l'", "homme"]
    assert split("qu'il") == ["que", "il"]
    assert split("jusqu'à") == ["jusque", "à"]
    assert split("lorsqu'on") == ["lorsque", "on"]
    assert split("puisqu'il") == ["puisque", "il"]
    assert split("quoiqu'elle") == ["quoique", "elle"]


def test_clitic_suffixes():
    from alix_spark.analysis.filters import annotate, clitic_filter

    def split(s):
        return [t.term for t in clitic_filter(annotate(tokenize(s)))]

    assert split("dit-il") == ["dit", "il"]
    assert split("allez-vous") == ["allez", "vous"]
    # -t- epenthetic dropped (reference :158-185)
    assert split("a-t-on") == ["a", "on"]
    assert split("va-t-en") == ["va", "en"]
    # -ci / -là dropped
    assert split("celui-ci") == ["celui"]
    assert split("ceux-là") == ["ceux"]


def test_clitic_keep_as_is():
    # reference :103-124 lexicalized forms
    assert terms("aujourd'hui") == ["aujourd'hui"]
    assert terms("presqu'île") == ["presqu'île"]
    assert terms("quelqu'un") == ["quelqu'un"]


def test_genitive_s_dropped():
    from alix_spark.analysis.filters import annotate, clitic_filter

    got = [t.term for t in clitic_filter(annotate(tokenize("John's")))]
    assert got == ["John"]


def test_hyphen_compound_not_split():
    from alix_spark.analysis.filters import annotate, clitic_filter

    got = [t.term for t in clitic_filter(annotate(tokenize("grand-père")))]
    assert got == ["grand-père"]


# ----------------------------------------------------------- uppercase


def test_allcaps_protected_and_deleted():
    # reference UppercaseFilter.java:19-99: protected ucwords pass;
    # unprotected all-caps < 4 letters deleted (position gap)
    out = run_chain(tokenize("CNRS et ABC et UNESCO"))
    assert [t[0] for t in out] == ["CNRS", "UNESCO"]
    # ABC consumed a position (gap) between them
    positions = [t[1] for t in out]
    assert positions == [0, 4]


def test_allcaps_long_decapitalized():
    out = terms("CONSTITUTION nouvelle")
    assert out[0] == "Constitution"


def test_allcaps_hyphen_recapitalized():
    out = terms("JEAN-PAUL parle")
    assert out[0] == "Jean-Paul"


# ---------------------------------------------------------------- lemma


def test_lemma_projection():
    # reference CleanupFilter.java:346-349 lemma projected into term
    assert terms("il aime les villes") == ["aimer", "ville"]
    assert terms("elle écrit des histoires") == ["écrire", "histoire"]


def test_lemma_pos_specific():
    # homograph: "la" DET → le (stopword anyway); verb forms
    assert terms("il voit") == ["voir"]


def test_propn_protected():
    assert terms("Paris et Rousseau") == ["Paris", "Rousseau"]


def test_unknown_titlecase_sentence_initial_lowercased():
    # "Grande" at sentence start: retry lowercase hits lemma grand
    assert terms("Grande ville") == ["grand", "ville"]


# ----------------------------------------------------------------- mwe


def test_mwe_compounding():
    assert terms("le chemin de fer est grand") == ["chemin de fer", "grand"]
    assert terms("une pomme de terre") == ["pomme de terre"]
    assert terms("il va tout à fait bien") == ["aller", "tout à fait"]


def test_mwe_longest_match():
    assert terms("au fur et à mesure") == ["au fur et à mesure"]


def test_mwe_after_clitic_split():
    # "coup d'œil": clitic splits d' → de, MWE key is post-split
    assert terms("un coup d'œil") == ["coup d'œil"]


# ----------------------------------------------------------- stop/gaps


def test_stopword_gap_positions():
    # reference TermStats invariant docTokens ≤ docWidths
    # (TermStats.java:44-49): stop words leave position holes
    out = run_chain(tokenize("le roi de la ville"))
    assert [(t[0], t[1]) for t in out] == [("roi", 1), ("ville", 4)]


def test_numbers_not_indexed():
    assert terms("il a 42 livres") == ["livre"]


# ------------------------------------------------------- extract_text


def test_extract_roundtrip():
    text = "Titre un\nC'est l'histoire de M. Hugo & la «guerre».\nFin de tout."
    assert extract_text(text_to_html(text)) == text


def test_extract_excludes_head_script_style():
    html = (
        "<html><head><title>SECRET</title><style>p{}</style></head>"
        "<body><h1>Titre</h1><p>Un mot.</p>"
        "<script>var SECRET2;</script></body></html>"
    )
    got = extract_text(html)
    assert "SECRET" not in got
    assert got == "Titre\nUn mot."


def test_extract_entities():
    assert extract_text("<p>a &amp; b &lt; c</p>") == "a & b < c"


def test_analyze_bytes_input():
    out = analyze("le roi parle".encode("utf-8"))
    assert [t[0] for t in out] == ["roi", "parler"]


def test_include_zone_tokenization():
    # reference MarkupZoneFilter INCLUDE mode (obs fields,
    # FrenchAnalyzer.java:413-421)
    src = ('<p>hors zone</p>'
           '<div data-tei-type="observation">le roi parle</div>'
           '<p>aussi hors</p>')
    toks = [t.term for t in tokenize(src, include_zone=("div", "data-tei-type", "observation"))
            if t.ttype == "W"]
    assert toks == ["le", "roi", "parle"]
