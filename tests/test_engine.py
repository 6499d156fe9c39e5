"""AlixEngine facade: every reference query operation end-to-end on a
built webtext index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.corpus import webtext
from alix_spark.engine import AlixEngine


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    corpus = webtext.webtext(spark, 100, seed=17, partitions=4).persist()
    corpus.count()
    idx = str(tmp_path_factory.mktemp("eng") / "ix")
    return AlixEngine.build(spark, corpus, idx, n_shards=4)


def test_search_bare_terms(engine):
    hits = engine.search("ville roi")
    assert 0 < len(hits) <= 10
    scores = [s for _, s in hits]
    assert scores == sorted(scores, reverse=True)


def test_search_analyzed_query(engine):
    # clitics split + lemma projection: "l'homme" → homme; "aime" → aimer
    assert engine.search("l'homme") == engine.search("homme")


def test_search_wildcard(engine):
    # guerr* expands to the OR of its matches — including the
    # case-flipped alternative's (reference jokerClause semantics)
    hits = engine.search("guerr*")
    assert hits == engine.search("(guerre Guerre)")
    assert len(hits) > 0


def test_wildcard_leading_case_flip(engine):
    """SpanQueryParser.java:327-374: a joker term also expands with its
    first letter's case flipped — 'Guerr*' matches the lowercase
    vocabulary, and both spellings expand identically (union)."""
    from alix_spark.engine import _flip_leading_case

    assert _flip_leading_case("Ville") == "ville"
    assert _flip_leading_case("ville") == "Ville"
    assert _flip_leading_case("1ere") is None
    assert _flip_leading_case("") is None

    low = engine._expand("guerr*")
    assert "guerre" in low and "Guerre" in low  # both spellings found
    # typed spelling leads, union identical either way
    assert low[0] == "guerre"
    up = engine._expand("Guerr*")
    assert up[0] == "Guerre" and set(up) == set(low)
    assert engine.search("Guerr*") == engine.search("guerr*")


def test_search_or_group(engine):
    hits = engine.search("(guerre paix)")
    assert len(hits) > 0


def test_search_unknown(engine):
    assert engine.search("zzzzz") == []


def test_search_quoted_phrase_serving_path(engine):
    """A quoted phrase routes through the serving-path evaluator and
    must equal the Spark phrase matcher's scoring."""
    from alix_spark.query import parser, wand

    clauses = parser.parse('"petit livre"')
    assert len(clauses) == 1 and isinstance(clauses[0], parser.PhraseClause)
    ph = clauses[0]
    got = engine.search('"petit livre"')
    rows = wand.phrase_topk(
        engine.spark, engine.index_dir, ph.terms,
        slop=ph.slop, ordered=ph.ordered, k=10,
    ).collect()
    want = [(r["doc_id"], r["score"]) for r in rows]
    assert got == want
    assert len(got) > 0


def _brute_mixed(engine, clause_termsets, k=10):
    """Doc-level oracle for clause-wise search: AND of clauses, score =
    Σ clause BM25 contributions, computed from the token table."""
    import math

    from alix_spark.query.bm25 import B, K1

    tok = engine.tokens().select("doc_id", "pos", "term")
    rows = tok.collect()
    dl = {}
    tf: dict[tuple[int, str], int] = {}
    for r in rows:
        dl[r["doc_id"]] = dl.get(r["doc_id"], 0) + 1
        tf[(r["doc_id"], r["term"])] = tf.get((r["doc_id"], r["term"]), 0) + 1
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1

    def bm25(d, t):
        if (d, t) not in tf:
            return None
        idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        f = tf[(d, t)]
        return idf * f * (K1 + 1) / (f + K1 * (1 - B + B * dl[d] / avgdl))

    out = []
    for d in dl:
        total = 0.0
        ok = True
        for terms in clause_termsets:
            contrib = [bm25(d, t) for t in terms]
            contrib = [c for c in contrib if c is not None]
            if not contrib:
                ok = False
                break
            total += sum(contrib)
        if ok:
            out.append((d, __import__("math").floor(total * 1e6 + 0.5) / 1e6))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_search_mixed_term_plus_or_group(engine):
    """ADVICE r1: mixed queries must run clause-wise — a term AND an OR
    group, scored as Σ clause contributions, not flattened into one
    conjunctive bag."""
    got = engine.search("homme (guerre paix)")
    want = _brute_mixed(engine, [["homme"], ["guerre", "paix"]])
    assert got == want
    assert len(got) > 0


def test_search_mixed_wildcard_and_term(engine):
    """The module docstring's own example shape: wildcard + bare term.
    The wildcard OR group must not require every expansion to co-occur."""
    got = engine.search("homme v*")
    expansions = engine._expand("v*")
    assert len(expansions) > 1  # ville, vie, …: a real multi-term group
    want = _brute_mixed(engine, [["homme"], expansions])
    assert got == want
    assert len(got) > 0


def test_concordance(engine):
    rows = engine.concordance("ville", width=3, limit=10).collect()
    assert 0 < len(rows) <= 10
    assert set(rows[0].asDict()) == {"doc_id", "pos", "left_ctx", "right_ctx"}


def test_terms_theme_and_keyness(engine):
    theme = engine.terms(top=10).collect()
    assert len(theme) == 10
    key = engine.terms(focus=F.col("lang") == "fr", top=10).collect()
    assert len(key) == 10


def test_chrono(engine):
    rows = engine.chrono().collect()
    assert sum(r["docs"] for r in rows) == 100


def test_terms_chrono_partitioned(engine):
    """OpTerms branch 3: day-of-year focus interval -> Partition.build
    + LogLikelihoodTail contrastive terms."""
    rows = engine.terms(start=100, end=200, top=10).collect()
    assert rows
    assert set(rows[0].asDict()) == {"term", "score"}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError):
        engine.terms(start=100)  # end missing


def test_cooc(engine):
    rows = engine.cooc("ville", top=10).collect()
    assert len(rows) > 0


def test_clades(engine):
    pdf = engine.clades(top_terms=15)
    assert len(pdf) == 15
    assert "axis1" in pdf.columns and "axis2" in pdf.columns


def test_suggest(engine):
    rows = engine.suggest("vil").collect()
    assert any(r["term"] == "ville" for r in rows)


def test_suggest_caches_folded_vocab(engine):
    """Per-keystroke serving must not re-materialize + re-fold the full
    vocabulary on every call (review finding): the folded frame is
    cached per publish token in the SHARED suggest_local backend (also
    used by SQL alix_suggest)."""
    from alix_spark.lexicometry import suggest as suggest_mod

    first = engine.suggest("vil").collect()
    cached = suggest_mod._VOCAB_CACHE[engine.index_dir][1]
    again = engine.suggest("vi").collect()
    assert suggest_mod._VOCAB_CACHE[engine.index_dir][1] is cached
    assert len(again) >= len(first) > 0
    # k<=0 yields no rows on the shared path
    assert suggest_mod.suggest_local(engine.index_dir, "vil", top=0) == []


def test_rail_equals_chain_tokens(engine):
    """The index-decoded rail (segments.decoded_rail) is row-for-row
    the token table the index was built from — lexicometry served from
    the frozen index equals lexicometry over the analyzed corpus."""
    a = sorted(map(tuple, engine.rail().collect()))
    b = sorted(
        map(tuple, engine.tokens().select("doc_id", "pos", "term").collect())
    )
    assert a == b and len(a) > 0


def test_lexicometry_from_index_without_corpus(engine):
    """VERDICT r2 #5: terms/cooc/concordance serve from the index, not
    by re-analyzing the corpus. An engine opened with NO corpus table
    structurally cannot run the analysis chain — every lexicometry op
    must still work and match the corpus-backed engine."""
    import pytest as _pytest

    from alix_spark.engine import AlixEngine as _E

    eng2 = _E(engine.spark, engine.index_dir, corpus=None)
    with _pytest.raises(ValueError):
        eng2.tokens()
    assert eng2.terms(top=10).collect() == engine.terms(top=10).collect()
    assert (
        eng2.cooc("ville", top=10).collect()
        == engine.cooc("ville", top=10).collect()
    )
    assert (
        eng2.concordance("ville", width=3, limit=10).collect()
        == engine.concordance("ville", width=3, limit=10).collect()
    )
    assert eng2.search("ville roi") == engine.search("ville roi")


def test_terms_index_path_equals_chain_path(engine):
    """Index-served theme ranking == the same scorer fed from the
    chain token table through the simple builders."""
    from alix_spark.index import simple
    from alix_spark.lexicometry import theme as theme_mod

    tok = engine.tokens().select("doc_id", "pos", "term")
    want = theme_mod.theme_weights(
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
        top=10,
    ).collect()
    assert engine.terms(top=10).collect() == want


def test_ascii_variant_field(spark, tmp_path):
    """Derived *_ascii TEXT field (reference AlixLuceneConsumer.java:
    185-204): same analyzed content re-indexed with diacritics folded;
    accent-insensitive queries hit it."""
    from alix_spark.corpus import webtext

    corpus = webtext.webtext(spark, 60, seed=29, partitions=4).persist()
    corpus.count()
    idx = str(tmp_path / "ix")
    eng = AlixEngine.build(spark, corpus, idx, n_shards=4, ascii_variant=True)
    want = eng.search("liberté")  # accented term in the main field
    got = eng.search("liberte", ascii=True, k=100)
    assert want and got
    # the folded+lowercased field merges case/accent variants
    # ("Liberté"/"liberté" → "liberte"), so the unfolded hits are a
    # subset of the ascii-field hits
    assert {d for d, _ in want} <= {d for d, _ in got}
    # folded, unfolded, and capitalized query spellings are the same
    # term in the ascii field
    assert eng.search("liberté", ascii=True, k=100) == got
    assert eng.search("Liberté", ascii=True, k=100) == got


def test_suggest_population_scoped(engine):
    """TermSuggest.java:141: with a population predicate, completions
    rank by the population's freq, not global cf."""
    from pyspark.sql import functions as F

    pop = engine.suggest("vi", population=F.col("lang") == "fr")
    rows = [r.asDict() for r in pop.collect()]
    assert rows, "population suggest returned nothing"
    freqs = [r["cf"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_theme_weights_cached_once(engine):
    w1 = engine.theme_weights()
    assert engine.theme_weights() is w1  # same persisted handle
    # facade terms() serves from the cache with the same tie-break
    top = [r["term"] for r in engine.terms(top=10).collect()]
    assert len(top) == 10


def test_engine_suggest_no_spark_job_matches_folded(engine):
    """engine.suggest's global path (pyarrow term_stats scan) ranks
    identically to lexicometry.suggest_folded on the same stats."""
    import os

    from alix_spark.lexicometry import suggest as sg

    ts = engine.spark.read.parquet(
        os.path.join(engine.index_dir, "term_stats")
    )
    for q in ["vi", "gue", "a"]:
        want = [tuple(r) for r in sg.suggest_folded(ts, q, top=10).collect()]
        got = [tuple(r) for r in engine.suggest(q, top=10).collect()]
        assert got == want, q


def test_engine_index_only_guards(spark, engine):
    """Index-only handles raise a clear ValueError on corpus ops."""
    from pyspark.sql import functions as F

    from alix_spark.engine import AlixEngine

    bare = AlixEngine(spark, engine.index_root)
    for call in (
        lambda: bare.chrono(),
        lambda: bare.clades(),
        lambda: bare.terms(focus=F.col("lang") == "fr"),
        lambda: bare.suggest("vi", population=F.col("lang") == "fr"),
    ):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="corpus"):
            call()


def test_null_html_rows_build_cleanly(spark, tmp_path):
    """A failed-fetch row (html NULL) yields zero tokens instead of
    killing the build (review regression)."""
    from alix_spark.analysis.chain import analyze, extract_text
    from alix_spark.engine import AlixEngine

    assert analyze(None) == [] and extract_text(None) == ""
    from pyspark.sql import functions as FF

    from alix_spark.corpus import webtext

    corpus = webtext.webtext(spark, 10, seed=2, partitions=2)
    # one deterministic failed-fetch row
    nulled = corpus.withColumn(
        "html",
        FF.when(FF.col("url").endswith("1"), FF.lit(None)).otherwise(
            FF.col("html")
        ),
    )
    eng = AlixEngine.build(spark, nulled, str(tmp_path / "nullix"), n_shards=2)
    assert eng.meta["corpus_docs"] > 0


def test_prefix_upper_bound_codepoint_edges():
    """Wildcard pushdown range bound at codepoint boundaries (review
    batch 31): incrementing into the surrogate block or past U+10FFFF
    must not produce an unencodable filter literal or a ValueError."""
    from alix_spark.engine import _prefix_upper_bound

    # U+D7FF + 1 would be a lone surrogate: skip to U+E000
    assert _prefix_upper_bound("ab\ud7ff") == "ab\ue000"
    # U+10FFFF has no successor: carry into the previous char
    assert _prefix_upper_bound("a\U0010ffff") == "b"
    # no valid bound at all: fall back to >=-only filtering
    assert _prefix_upper_bound("\U0010ffff") is None


def test_terms_rejects_focus_with_chrono_interval(engine):
    """focus + start/end would silently drop the predicate and answer
    a different question (review batch 31)."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="focus"):
        engine.terms(focus=F.col("lang") == "fr", start=10, end=20)


def test_close_releases_token_cache(spark, tmp_path):
    """close() must release the persisted analyzed token table, not
    just the theme-weights cache (review batch 31) — one leaked
    corpus-sized cache per republish otherwise."""
    corpus = webtext.webtext(spark, 30, seed=3, partitions=2)
    idx = str(tmp_path / "ix_close")
    eng = AlixEngine.build(spark, corpus, idx, n_shards=2)
    tok = eng.tokens()
    assert tok.storageLevel.useMemory or tok.storageLevel.useDisk
    eng.close()
    assert not (tok.storageLevel.useMemory or tok.storageLevel.useDisk)
    # handle stays usable: caches rebuild on demand
    assert eng.tokens().count() > 0
    eng.close()
