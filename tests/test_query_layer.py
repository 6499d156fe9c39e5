"""Query-layer tests: parser semantics, index-side phrase/near,
driver fast path vs the Spark WAND executor."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from alix_spark.index import segments, simple
from alix_spark.query import parser, wand


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    tok = simple.tokens(docs)
    idx = str(tmp_path_factory.mktemp("qidx") / "ix")
    segments.build_index(spark, tok, idx, n_shards=4)
    return idx, tok


# --------------------------------------------------------------- parser


def test_parse_bare_terms():
    plan = parser.parse("guerre paix")
    assert [c.term for c in plan] == ["guerre", "paix"]


def test_parse_quoted_phrase_mwe_collapses():
    # "chemin de fer" is an MWE → single indexed term (reference
    # SpanQueryParser.java:24-48: multiword term)
    plan = parser.parse('"chemin de fer"')
    assert isinstance(plan[0], parser.TermClause)
    assert plan[0].term == "chemin de fer"


def test_parse_quoted_phrase():
    plan = parser.parse('"grande ville profonde"')
    assert isinstance(plan[0], parser.PhraseClause)
    assert plan[0].terms == ["grand", "ville", "profond"]  # lemma-projected


def test_parse_or_group_and_wildcard():
    plan = parser.parse("(guerre paix) vil*")
    assert isinstance(plan[0], parser.OrClause)
    assert plan[0].terms == ["guerre", "paix"]
    assert isinstance(plan[1], parser.WildcardClause)


def test_wildcard_trailing_punctuation_stripped():
    """Review batch 35: a wildcard pattern with trailing punctuation
    the analyzer would shed from a bare term (ellipsis, guillemets,
    quotes, brackets) must strip it — otherwise the pattern expands to
    [] and the empty-clause DROP silently WIDENS the AND query. '?'
    stays: it is a wildcard metacharacter."""
    for raw, want in [
        ("pari*\u2026", "pari*"),
        ("pari*\u00bb", "pari*"),
        ("pari*)", "pari*"),
        ("livre?", "livre?"),
    ]:
        cl = parser.parse(raw)
        assert len(cl) == 1 and isinstance(cl[0], parser.WildcardClause), raw
        assert cl[0].pattern == want, raw


def test_parse_stopwords_dropped():
    plan = parser.parse("le la roi")
    assert [c.term for c in plan] == ["roi"]


def test_parse_clitics_analyzed():
    plan = parser.parse("l'homme qu'il aime")
    assert [c.term for c in plan] == ["homme", "aimer"]


def test_resolve_drops_unknown_and_expands():
    vocab = {"ville", "villes", "village", "guerre", "roi"}
    plan = parser.parse("(guerre zzz) vil* zzz roi")
    res = parser.resolve(plan, vocab)
    # OR group collapses to single surviving term (reference
    # single-clause collapse, SpanQueryParser.java:211-224)
    assert isinstance(res[0], parser.TermClause) and res[0].term == "guerre"
    assert isinstance(res[1], parser.OrClause)
    assert sorted(res[1].terms) == ["village", "ville", "villes"]
    assert isinstance(res[2], parser.TermClause) and res[2].term == "roi"


def test_wildcard_expansion_cap():
    vocab = [f"t{i:04d}" for i in range(1000)]
    hits = parser.expand_wildcard("t*", vocab)
    assert len(hits) == parser.MAX_EXPANSIONS


# ----------------------------------------------------- phrase executor


def test_phrase_topk_matches_dataframe_matcher(spark, built):
    idx, tok = built
    ph = wand.phrase_topk(spark, idx, ["order", "fast"], slop=0, ordered=True, k=1000).collect()
    t1 = tok.filter(F.col("term") == "order").select("doc_id", F.col("pos").alias("p1"))
    t2 = tok.filter(F.col("term") == "fast").select("doc_id", F.col("pos").alias("p2"))
    want = {
        r["doc_id"]
        for r in t1.join(t2, "doc_id").filter(F.col("p2") == F.col("p1") + 1)
        .select("doc_id").distinct().collect()
    }
    assert {r["doc_id"] for r in ph} == want
    # scores strictly positive, sorted desc
    scores = [r["score"] for r in ph]
    assert scores == sorted(scores, reverse=True)


def test_near_unordered_matches_dataframe(spark, built):
    idx, tok = built
    near = wand.phrase_topk(spark, idx, ["window", "join"], slop=2, ordered=False, k=1000).collect()
    t1 = tok.filter(F.col("term") == "window").select("doc_id", F.col("pos").alias("p1"))
    t2 = tok.filter(F.col("term") == "join").select("doc_id", F.col("pos").alias("p2"))
    want = {
        r["doc_id"]
        for r in t1.join(t2, "doc_id").filter(F.abs(F.col("p2") - F.col("p1")) <= 3)
        .select("doc_id").distinct().collect()
    }
    assert {r["doc_id"] for r in near} == want


def test_phrase_missing_term_empty(spark, built):
    idx, _ = built
    assert wand.phrase_topk(spark, idx, ["order", "zzzz"], k=10).count() == 0


# ------------------------------------------------------- fast path


@pytest.mark.parametrize(
    "terms,mode",
    [(["hash", "join"], "and"), (["stream", "vector"], "or"), (["merge"], "and")],
)
def test_query_local_identical_to_spark_wand(spark, built, terms, mode):
    idx, _ = built
    fp = wand.query_local(idx, terms, k=10, mode=mode)
    sp = [(r["doc_id"], r["score"])
          for r in wand.wand_topk(spark, idx, terms, k=10, mode=mode).collect()]
    assert fp == sp


def test_query_local_unknown_term(built):
    idx, _ = built
    assert wand.query_local(idx, ["zzzz"], mode="and") == []


# ------------------------------------- §2.6 alternate similarities


def test_mode_validation_and_empty_terms_oracle():
    """Review batch 35: an unknown mode silently fell through to OR
    semantics; an empty term list rendered `term IN ()` — a DuckDB
    syntax error — while the engine returned an empty frame."""
    import duckdb
    import pytest as _pytest

    from alix_spark.query import bm25 as bm25_mod
    from alix_spark.query import similarities as sim_mod

    with _pytest.raises(ValueError, match="mode"):
        bm25_mod.bm25_topk(None, None, None, None, ["a"], mode="AND")
    with _pytest.raises(ValueError, match="mode"):
        sim_mod.alt_topk(None, None, None, None, ["a"], mode="all")
    for sql in (
        bm25_mod.bm25_oracle_sql([]),
        sim_mod.alt_oracle_sql([], "chi2"),
    ):
        assert duckdb.connect().execute(sql).fetchall() == []


def test_alt_similarities_semantics(spark):
    """chi2/g give NEGATIVE scores for docs where the term is rarer
    than expected (the reference's 'most repulsed doc'); freq is raw tf
    (SimilarityChi2.java:54-71, SimilarityG.java:55-74)."""
    from alix_spark.index import simple
    from alix_spark.query import similarities

    rows = [(0, ("x " * 50 + "y " * 50).strip()),
            (1, ("x " * 99 + "y").strip()),
            (2, ("y " * 99 + "x").strip())]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tok = simple.tokens(docs)
    args = (
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok),
    )
    chi2 = {r["doc_id"]: r["score"]
            for r in similarities.alt_topk(*args, ["x"], sim="chi2", k=10).collect()}
    # doc 1 is x-rich (attracted, positive), doc 2 x-poor (repulsed, negative)
    assert chi2[1] > 0 > chi2[2]
    g = {r["doc_id"]: r["score"]
         for r in similarities.alt_topk(*args, ["x"], sim="g", k=10).collect()}
    assert g[1] > 0 > g[2]
    freq = {r["doc_id"]: r["score"]
            for r in similarities.alt_topk(*args, ["x"], sim="freq", k=10).collect()}
    assert freq == {0: 50.0, 1: 99.0, 2: 1.0}


def test_expand_wildcard_case_flip():
    """The in-memory expander applies the leading-case-flip alternative
    like the pushdown one: 'pari*' finds titlecase-indexed 'Paris'."""
    from alix_spark.query.parser import expand_wildcard, flip_leading_case

    vocab = ["Paris", "parier", "part"]
    assert set(expand_wildcard("pari*", vocab)) == {"Paris", "parier"}
    assert set(expand_wildcard("Pari*", vocab)) == {"Paris", "parier"}
    assert flip_leading_case("1a") is None


def test_hunspell_flag_long_mode():
    """FLAG long (Dicollecte-style 2-char flags) derives affix roots;
    per-character flag reads would silently derive none."""
    from alix_spark.query.hunspell import Hunspell

    aff = """
FLAG long
SFX a0 Y 1
SFX a0 0 s .
"""
    dic = """1
chat/a0b1
"""
    h = Hunspell.loads(aff, dic)
    assert h.flag_mode == "long"
    assert h.words["chat"] == {"a0", "b1"}
    assert h.roots("chats") == ["chat"]


def test_hilite_case_sensitive():
    """hilite matches the indexed form exactly — no lowercased
    side-channel that the search layer cannot see."""
    from alix_spark.query.snippets import hilite

    src = "<p>Paris est grande.</p>"
    assert "<mark>" not in hilite(src, ["paris"])
    assert "<mark>Paris</mark>" in hilite(src, ["Paris"])


def test_phrase_interior_stopword_gets_slop():
    """'chat et chien' indexes as chat@p, chien@p+2 (the stopword hole
    keeps its position); the parsed phrase must budget that hole as
    slop or the exact phrase never matches its own source text
    (review regression)."""
    (p,) = parser.parse('"chat et chien"')
    assert isinstance(p, parser.PhraseClause)
    assert p.terms == ["chat", "chien"] and p.slop == 1


def test_wildcard_pattern_as_typed():
    """The pattern keeps its case (engine._expand tries as-typed plus
    the leading-case flip — lowercasing made interior capitals
    unreachable) and sheds trailing punctuation like a bare term
    (review regressions)."""
    w1, w2 = parser.parse("Jean-P* pari*,")
    assert w1.pattern == "Jean-P*" and w2.pattern == "pari*"


def test_phrase_narrows_instead_of_vanishing():
    """A phrase term absent from the index drops THAT term (reference
    :510-513), not the whole clause — wholesale dropping silently
    widened the query (review regression)."""
    clauses = parser.parse('chien "chat zzzqqq absent"')
    res = parser.resolve(clauses, {"chien", "chat", "absent"})
    phrases = [c for c in res if isinstance(c, parser.PhraseClause)]
    assert len(phrases) == 1
    assert phrases[0].terms == ["chat", "absent"]
    assert phrases[0].slop == 1  # the dropped term's hole


def test_wildcard_trailing_question_mark_kept():
    """'?' is a wildcard metacharacter: stripping it as trailing
    punctuation rewrote 'livre?' into a bare exact term (ADVICE r3)."""
    (w,) = parser.parse("livre?")
    assert isinstance(w, parser.WildcardClause) and w.pattern == "livre?"
    (w2,) = parser.parse("livre?,")
    assert w2.pattern == "livre?"
    (w3,) = parser.parse("pari*.")
    assert w3.pattern == "pari*"


def test_phrase_edge_holes_earn_no_slop():
    """A dropped leading/trailing phrase term leaves no gap BETWEEN the
    kept terms; crediting its hole as slop widened matches — '"zzz chat
    chien"' must not match 'chat X chien' (ADVICE r3)."""
    for q in ('"zzzqqq chat chien"', '"chat chien zzzqqq"'):
        res = parser.resolve(parser.parse(q), {"chat", "chien"})
        (p,) = [c for c in res if isinstance(c, parser.PhraseClause)]
        assert p.terms == ["chat", "chien"] and p.slop == 0, q
    # interior hole still budgets slop
    res = parser.resolve(parser.parse('"chat zzzqqq chien"'), {"chat", "chien"})
    (p,) = [c for c in res if isinstance(c, parser.PhraseClause)]
    assert p.slop == 1


def test_phrase_multi_root_slot_becomes_disjunction():
    """A slot whose Hunspell roots yield several indexed alternatives
    keeps them ALL as a per-slot tuple — the reference's per-slot
    SpanOr (SpanQueryParser.java:482-518) — not just the first."""
    vocab = {"chanter", "chant", "fort"}
    roots = {"chantais": ["chanter", "chant"]}
    res = parser.resolve_with(
        [parser.PhraseClause(["chantais", "fort"], slop=0)],
        vocab.__contains__, lambda p: [], roots=lambda t: roots.get(t, []),
    )
    (p,) = res
    assert isinstance(p, parser.PhraseClause)
    assert p.terms == [("chanter", "chant"), "fort"]
    # a single surviving multi-root slot collapses to an OR clause
    res = parser.resolve_with(
        [parser.PhraseClause(["chantais", "zzqq"], slop=0)],
        vocab.__contains__, lambda p: [], roots=lambda t: roots.get(t, []),
    )
    (c,) = res
    assert isinstance(c, parser.OrClause) and set(c.terms) == {"chanter", "chant"}


def test_phrase_slot_disjunction_matches_both_alternatives(spark, tmp_path):
    """Index-side execution of a tuple slot: docs matching via EITHER
    alternative are hits, scored as one synthetic phrase term."""
    docs = spark.createDataFrame(
        [(1, "alpha bravo"), (2, "alpha charlie"), (3, "alpha delta"),
         (4, "bravo alpha")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "slotix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=1)
    hits = wand.phrase_topk(
        spark, idx, ["alpha", ("bravo", "charlie")], slop=0, ordered=True, k=5
    ).collect()
    assert sorted(r["doc_id"] for r in hits) == [1, 2]
    # serving path agrees
    local = wand.query_local_mixed(
        idx, [parser.PhraseClause(["alpha", ("bravo", "charlie")], slop=0)], k=5
    )
    assert sorted(d for d, _ in local) == [1, 2]


def test_unordered_greedy_vectorized_parity(spark, tmp_path):
    """The round-based vectorized unordered-near kernel reproduces the
    scalar greedy multi-cursor walk exactly (VERDICT r3 ask #4)."""
    import random

    rng = random.Random(7)
    rows = []
    for d in range(60):
        n = rng.randint(1, 14)
        rows.append(
            (d, " ".join(rng.choice(["aa", "bb", "cc", "p1", "p2"])
                         for _ in range(n)))
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "fuzzix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=2)
    terms = ["aa", "bb", "cc"]
    slop = 2
    width = len(terms) - 1 + slop
    blocks = wand._load_blocks(idx, terms, positions=True)
    got = {d: tf for d, tf, _dl
           in wand.phrase_shard_matches(blocks, terms, slop, ordered=False)}
    want = {}
    for d, text in rows:
        pls = {t: [p for p, w in enumerate(text.split()) if w == t]
               for t in terms}
        if any(not pls[t] for t in terms):
            continue
        idxs = {t: 0 for t in terms}
        n = 0
        while all(idxs[t] < len(pls[t]) for t in terms):
            vals = [pls[t][idxs[t]] for t in terms]
            if max(vals) - min(vals) <= width:
                n += 1
                for t in terms:
                    idxs[t] += 1
            else:
                idxs[terms[vals.index(min(vals))]] += 1
        if n:
            want[d] = n
    assert got == want and want


class TestMoreLikeThis:
    """Lucene-MLT parity semantics: frequency gates on term selection,
    source self-exclusion, term-count cap."""

    def _tables(self, spark, rows):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(rows, "doc_id long, text string")
        post = simple.postings(simple.tokens(df))
        dstats = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        tstats = post.groupBy("term").agg(F.count("*").alias("df"))
        cstats = post.agg(
            F.countDistinct("doc_id").alias("corpus_docs"),
            F.sum("tf").alias("corpus_tokens"),
        ).select(
            "corpus_docs",
            "corpus_tokens",
            (F.col("corpus_tokens") / F.col("corpus_docs")).alias("avgdl"),
        )
        return df, post, dstats, tstats, cstats

    def test_gates_self_exclusion_and_ranking(self, spark):
        from alix_spark.query import mlt

        rows = [
            (0, "apple apple banana"),      # source: apple stf=2 ok,
            (1, "apple apple apple zebra"),  # banana stf=1 gated out
            (2, "apple pie"),
            (3, "banana only text"),
            (4, "nothing relevant here"),
        ]
        df, post, dstats, tstats, cstats = self._tables(spark, rows)
        out = mlt.more_like_this(
            post, dstats, tstats, cstats,
            df.filter("doc_id = 0").select("doc_id"),
            min_term_freq=2, min_doc_freq=2, k=3,
        ).collect()
        # only apple survives the gates: banana-only/noise docs never
        # become candidates, and the source doc itself is excluded
        assert [r["doc_id"] for r in out] == [1, 2]
        assert [r["rank"] for r in out] == [1, 2]
        assert out[0]["score"] > out[1]["score"]
        assert all(r["src_id"] == 0 for r in out)

    def test_max_query_terms_cap(self, spark):
        from alix_spark.query import mlt

        # source has two qualifying terms; rarer 'cider' (df 2) beats
        # common 'apple' (df 4) on idf at equal stf, so with a cap of
        # one query term only cider-docs are retrieved
        rows = [
            (0, "apple apple cider cider"),
            (1, "cider press here"),
            (2, "apple apple sauce"),
            (3, "apple tart base"),
            (4, "apple apple apple jam"),
        ]
        df, post, dstats, tstats, cstats = self._tables(spark, rows)
        out = mlt.more_like_this(
            post, dstats, tstats, cstats,
            df.filter("doc_id = 0").select("doc_id"),
            min_term_freq=2, min_doc_freq=2, max_query_terms=1, k=5,
        ).collect()
        assert [r["doc_id"] for r in out] == [1]


def test_unordered_duplicate_term_needs_distinct_positions(spark, tmp_path):
    """'chat chat' unordered must need TWO occurrences — one position
    may not satisfy both slots (Lucene SpanNear non-overlap; review
    batch 29)."""
    docs = spark.createDataFrame(
        [
            (1, "chat solo filler words here"),       # one occurrence
            (2, "chat chat adjacent pair"),           # two, adjacent
            (3, "chat one two chat far apart pair"),  # two, distance 3
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "dupix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=2)
    blocks = wand._load_blocks(idx, ["chat"], positions=True)
    got = {
        d: tf
        for d, tf, _dl in wand.phrase_shard_matches(
            blocks, ["chat", "chat"], slop=0, ordered=False
        )
    }
    # width = 1: doc 1 (single) no match; doc 2 adjacent matches;
    # doc 3's occurrences are 3 apart > width -> no match
    assert got == {2: 1}
    wide = {
        d: tf
        for d, tf, _dl in wand.phrase_shard_matches(
            blocks, ["chat", "chat"], slop=2, ordered=False
        )
    }
    assert wide == {2: 1, 3: 1}


def test_wand_topk_nonpositive_k_returns_empty(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hash join"), (2, "hash")], "doc_id long, text string"
    )
    idx = str(tmp_path / "k0ix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=1)
    assert wand.query_local(idx, ["hash"], k=0) == []
    assert wand.query_local(idx, ["hash", "join"], k=0, mode="and") == []


def test_lone_wildcard_metachar_token_is_dropped():
    """'pourquoi ?' must not become a match-any-1-char MUST clause
    narrowing the whole query (review batch 29); real wildcards and
    the trailing-'?' pattern keep working."""
    cl = parser.parse("pourquoi ?")
    assert [type(c).__name__ for c in cl] == ["TermClause"]
    cl2 = parser.parse("livre?")
    assert [type(c).__name__ for c in cl2] == ["WildcardClause"]
    assert cl2[0].pattern == "livre?"
    assert parser.parse("* ?") == []


def test_oracle_term_lists_escape_quotes():
    from alix_spark.query import bm25, similarities

    sql = bm25.bm25_oracle_sql(["aujourd'hui"], k=5, mode="or")
    assert "'aujourd''hui'" in sql
    sql2 = similarities.alt_oracle_sql(["aujourd'hui"], sim="g", k=5)
    assert "'aujourd''hui'" in sql2
