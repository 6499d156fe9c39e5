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
    hits = engine.search("guerr*")
    assert hits == engine.search("guerre")


def test_search_or_group(engine):
    hits = engine.search("(guerre paix)")
    assert len(hits) > 0


def test_search_unknown(engine):
    assert engine.search("zzzzz") == []


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
