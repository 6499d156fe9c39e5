"""CLI corpus-utility parity: Expressions / Keywords / SpellSugg
(reference cli/*.java — the dictionary-tuning workflows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from alix_spark.corpus.expressions import expressions
from alix_spark.lexicometry.keywords import MEASURES, doc_keywords
from alix_spark.lexicometry.suggest import suggest_spell


def _tok(spark, docs: list[str]):
    rows = [
        (d, p, w)
        for d, text in enumerate(docs)
        for p, w in enumerate(text.split())
    ]
    return spark.createDataFrame(rows, "doc_id long, pos int, term string")


def test_expressions_reset_and_nonoverlap(spark):
    """A skipped token RESETS the accumulator (Expressions.java:353);
    trigrams are counted non-overlapping from each run start; partial
    chunks never count."""
    tok = _tok(spark, [
        "alpha beta gamma delta epsilon zeta eta",  # 2 full chunks + leftover
        "alpha beta THE gamma delta epsilon",       # reset mid-run
        "alpha beta gamma",
    ])
    skip = F.col("term") == "THE"
    rows = {r["expression"]: r["freq"]
            for r in expressions(tok, skip, top=100).collect()}
    assert rows == {
        "alpha beta gamma": 2,           # docs 0 and 2
        "delta epsilon zeta": 1,         # doc 0 second chunk ('eta' leftover)
        "gamma delta epsilon": 1,        # doc 1 after the reset
    }


def test_expressions_digit_initial_resets(spark):
    tok = _tok(spark, ["alpha beta 9x gamma delta epsilon"])
    skip = F.col("term").rlike("^[0-9-]")
    rows = {r["expression"] for r in expressions(tok, skip).collect()}
    assert rows == {"gamma delta epsilon"}


def test_expressions_position_gap_resets(spark):
    """A HOLE in the position numbering resets the accumulator exactly
    like a physically-present skip token (review batch 31): the full
    analysis chain DROPS stop/punctuation tokens while consuming a
    position, so engine.expressions() over chain output must not chain
    content words across the dropped function word the reference
    resets at."""
    import pyspark.sql.functions as F2

    # positions 0,1,[2 dropped],3,4,5 — a trigram may not span the hole
    tok = spark.createDataFrame(
        [(0, 0, "alpha"), (0, 1, "beta"),
         (0, 3, "gamma"), (0, 4, "delta"), (0, 5, "epsilon")],
        "doc_id long, pos int, term string",
    )
    rows = {r["expression"]
            for r in expressions(tok, F2.lit(False)).collect()}
    assert rows == {"gamma delta epsilon"}


def test_doc_keywords_measures_and_ranks(spark):
    from alix_spark.index import simple

    docs = spark.createDataFrame(
        [(0, "cat cat cat dog"), (1, "dog dog fish fish fish cat")],
        "doc_id long, text string",
    )
    tok = simple.tokens(docs)
    post = simple.postings(tok)
    out = doc_keywords(
        post,
        simple.doc_stats(tok),
        simple.term_stats(tok),
        simple.corpus_stats(tok),
        top=2,
    ).collect()
    by = {(r["doc_id"], r["measure"], r["rank"]): r for r in out}
    # three measures per doc, ranks dense from 1
    assert {r["measure"] for r in out} == set(MEASURES)
    assert by[(0, "freq", 1)]["term"] == "cat"
    assert by[(1, "freq", 1)]["term"] == "fish"
    # G: overrepresented-in-doc term wins; its score is positive
    assert by[(0, "g", 1)]["term"] == "cat" and by[(0, "g", 1)]["score"] > 0
    # freq_idf prefers the rarer term at equal tf: every term here has
    # df=2 except none — just assert determinism/shape
    assert all(r["rank"] in (1, 2) for r in out)


def test_suggest_spell_ranks_by_distance_then_freq(spark):
    tstats = spark.createDataFrame(
        [("table", 10, 100), ("tables", 5, 50), ("cable", 3, 30),
         ("tab", 2, 20), ("zzzzzzzz", 1, 1)],
        "term string, df long, cf long",
    )
    rows = [(r["term"], r["dist"]) for r in
            suggest_spell(tstats, "Tabel", max_dist=2, top=10).collect()]
    # table: dist 2 (el -> le); tables: dist 3 OUT; cable: dist 3 OUT;
    # tab: dist 2; zzzzzzzz: length-pruned
    assert ("table", 2) in rows and ("tab", 2) in rows
    assert all(d <= 2 for _, d in rows)
    # distance asc, then cf desc
    assert rows[0] == ("table", 2)


def test_engine_cli_report_methods(spark, tmp_path):
    """The CLI workflows ride the engine facade: unknowns/expressions
    need the corpus (chain channels); keywords/spell serve from the
    frozen index."""
    import pytest as _pytest

    from alix_spark.corpus import webtext
    from alix_spark.engine import AlixEngine
    from alix_spark.index.registry import IndexRegistry

    corpus = webtext.webtext(spark, 15, seed=8, partitions=2)
    idx = str(tmp_path / "ix")
    eng = AlixEngine.build(spark, corpus, idx, n_shards=2)
    kw = eng.keywords(top=3).collect()
    assert kw and {r["measure"] for r in kw} == {"freq", "g", "freq_idf"}
    sp = eng.spell("vile", max_dist=2, top=5).collect()
    assert any(r["term"] == "ville" for r in sp)
    unk = eng.unknowns(top=20)
    assert "term" in unk.columns and "freq" in unk.columns
    ex = eng.expressions(top=20)
    assert "expression" in ex.columns
    # corpus-less (registry-opened) engines 404 the chain-bound ops
    reg_root = str(tmp_path / "reg")
    import shutil

    shutil.copytree(idx, reg_root + "/bare")
    reg = IndexRegistry(spark, reg_root)
    reg.poll()
    bare = reg.get("bare")
    for fn in (bare.unknowns, bare.expressions):
        with _pytest.raises(ValueError, match="corpus"):
            fn()
    # ...but the index-served ones still work corpus-less
    assert any(
        r["term"] == "ville" for r in bare.spell("vile", top=5).collect()
    )


def test_doc_keywords_repulsed_terms_sink(spark):
    """The 'g' panel's sign follows over/under-representation: a term
    UNDER-represented in a doc scores negative and sinks (review
    regression: a wrong flip floated repulsed terms to the top)."""
    from alix_spark.index import simple
    from alix_spark.lexicometry.keywords import doc_keywords

    docs = spark.createDataFrame(
        # 'rare' is heavily present in doc 1 but appears ONCE in doc 0
        # (under its corpus expectation there)
        [(0, "aa aa aa aa aa aa aa rare"), (1, "rare rare rare rare aa")],
        "doc_id long, text string",
    )
    tok = simple.tokens(docs)
    out = doc_keywords(
        simple.postings(tok), simple.doc_stats(tok),
        simple.term_stats(tok), simple.corpus_stats(tok), top=5,
    ).collect()
    g0 = {r["term"]: r["score"] for r in out
          if r["doc_id"] == 0 and r["measure"] == "g"}
    # doc 0: E(rare) = 5*8/13 ≈ 3.08, tf=1 → g = ln(1/3.08) < 0
    assert g0["rare"] < 0 < g0["aa"]
    ranked0 = [r["term"] for r in sorted(
        (r for r in out if r["doc_id"] == 0 and r["measure"] == "g"),
        key=lambda r: r["rank"])]
    assert ranked0 == ["aa", "rare"]


def test_embedding_dup_pairs_custom_id_col(spark):
    """id_col other than 'vec_id' must work (review regression:
    lsh_signatures hardcodes its output name)."""
    import numpy as np

    from alix_spark.textops.dedup import embedding_dup_pairs

    rng = np.random.default_rng(5)
    v = rng.normal(size=64)
    rows = [("a", [float(x) for x in v]), ("b", [float(x) for x in v])]
    emb = spark.createDataFrame(rows, "doc string, embedding array<double>")
    got = embedding_dup_pairs(emb, threshold=0.99, id_col="doc").collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [("a", "b")]
