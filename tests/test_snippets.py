"""Snippet ranking + embedding export tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from alix_spark.index import simple
from alix_spark.lexicometry import svd, theme
from alix_spark.query import snippets

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def data(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = simple.tokens(docs).cache()
    tok.count()
    return docs, tok


def test_snippet_scores_are_distinct_term_weight_sums(spark, data):
    docs, tok = data
    w = theme.theme_weights(
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
        top=100000,
    )
    top = snippets.snippet_topk(tok, w, ["hash"], width=3, k=5).collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # verify one window by hand
    wmap = {r["term"]: r["score"] for r in w.collect()}
    r0 = top[0]
    window = (
        tok.filter(
            (F.col("doc_id") == r0["doc_id"])
            & (F.col("pos") >= r0["pos"] - 3)
            & (F.col("pos") <= r0["pos"] + 3)
        )
        .select("term").distinct().collect()
    )
    want = sum(wmap[x["term"]] for x in window if x["term"] in wmap)
    assert r0["score"] == pytest.approx(want, abs=2e-6)
    assert r0["n_terms"] == len([x for x in window if x["term"] in wmap])


def test_embedding_export_properties(spark, data):
    docs, tok = data
    parts = docs.select("doc_id", F.col("lang").alias("part"))
    pdf = svd.embedding_export(tok, parts, top_terms=20, dim=4)
    assert list(pdf.columns) == ["term", "v0", "v1", "v2", "v3"]
    vecs = pdf[["v0", "v1", "v2", "v3"]].to_numpy()
    norms = np.sqrt((vecs**2).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-4)
    # deterministic
    pdf2 = svd.embedding_export(tok, parts, top_terms=20, dim=4)
    assert (pdf.to_numpy() == pdf2.to_numpy()).all()


# ------------------------------------------------------------- hilite


def test_hilite_surface_and_lemma():
    from alix_spark.query.snippets import hilite

    src = "Le roi aime les villes anciennes."
    # query by lemma "ville" highlights surface "villes"
    out = hilite(src, ["ville", "roi"])
    assert "<mark>roi</mark>" in out
    assert "<mark>villes</mark>" in out
    assert "aime" in out and "<mark>aime" not in out


def test_hilite_preserves_text():
    from alix_spark.query.snippets import hilite

    src = "<p>La guerre et la paix.</p>"
    out = hilite(src, ["guerre"])
    assert out.replace("<mark>", "").replace("</mark>", "") == src
