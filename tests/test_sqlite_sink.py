"""SQLite token-sink export (reference sqlite/.../alix.sql + Insert):
schema parity, form dictionaries, offset fidelity."""

from __future__ import annotations

import sqlite3

from alix_spark.analysis.chain import analyzed_tokens_with_offsets
from alix_spark.corpus import webtext
from alix_spark.index.sqlite_sink import export_sqlite


def test_export_sqlite_roundtrip(spark, tmp_path):
    corpus = webtext.doc_ids(webtext.webtext(spark, 10, seed=13, partitions=2))
    tok = analyzed_tokens_with_offsets(corpus)
    path = str(tmp_path / "alix.sqlite")
    stats = export_sqlite(corpus.select("doc_id", "url", "html"), tok, path)
    assert stats["docs"] == 10 and stats["toks"] > 0
    assert stats["orth"] >= stats["lem"] > 0

    con = sqlite3.connect(path)
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert tables == {"doc", "tok", "orth", "lem"}

    # occurrence counts match the Spark token table
    assert con.execute("SELECT count(*) FROM tok").fetchone()[0] == tok.count()

    # (form, cat) unique in the dictionaries (reference orth_form index)
    dup = con.execute(
        "SELECT count(*) FROM (SELECT form, cat FROM orth GROUP BY form, cat"
        " HAVING count(*) > 1)").fetchone()[0]
    assert dup == 0

    # offset fidelity: token offsets slice the ORIGINAL html to the
    # surface form the analyzer consumed (lemma-projected terms carry
    # their source span) — check non-MWE, non-clitic-split rows where
    # no lemma projection rewrote the term
    rows = con.execute("""
        SELECT d.html, o.form, t.offset, t.length
        FROM tok t JOIN doc d ON d.id = t.doc
                   JOIN orth o ON o.id = t.orth
                   JOIN lem  l ON l.id = t.lem
        WHERE o.form = l.form LIMIT 200""").fetchall()
    assert rows
    checked = 0
    for html, form, off, length in rows:
        src = bytes(html).decode("utf-8")
        slice_ = src[off : off + length]
        if slice_.replace("’", "'") == form:
            checked += 1
    assert checked >= len(rows) * 0.6  # case-folds/normalizations aside

    # lemma dictionary lookup works end-to-end
    any_lem = con.execute(
        "SELECT l.form FROM tok t JOIN lem l ON l.id = t.lem LIMIT 1"
    ).fetchone()
    assert any_lem and any_lem[0]
    con.close()


def test_orth_keeps_surface_form(spark, tmp_path):
    """orth stores the SURFACE the analyzer consumed; a lemmatized
    token must show orth.form != lem.form (review regression — the
    projected term made orth a row-for-row copy of lem)."""
    corpus = webtext.doc_ids(webtext.webtext(spark, 20, seed=7, partitions=2))
    tok = analyzed_tokens_with_offsets(corpus)
    path = str(tmp_path / "alix_orth.sqlite")
    export_sqlite(
        corpus.select("doc_id", "url", "html", "warc_ts"), tok, path
    )
    con = sqlite3.connect(path)
    diff = con.execute(
        "SELECT count(*) FROM tok t JOIN orth o ON o.id = t.orth "
        "JOIN lem l ON l.id = t.lem WHERE o.form <> l.form"
    ).fetchone()[0]
    assert diff > 0, "no surface/lemma divergence — orth duplicates lem"
    # doc.date populated from warc_ts
    dated = con.execute(
        "SELECT count(*) FROM doc WHERE date IS NOT NULL"
    ).fetchone()[0]
    assert dated == 20
    con.close()


def test_export_sqlite_string_ids_named_error(spark, tmp_path):
    """Review batch 34: a url-keyed (string id) token table must fail
    with an error NAMING the url_ranks join, not a bare int()
    ValueError."""
    import pytest

    docs = spark.createDataFrame(
        [("https://a/1", "https://a/1")], "doc_id string, url string"
    )
    tok = spark.createDataFrame(
        [], "doc_id string, term string, pos_tag string, lemma string, "
            "start int, end int, orth string"
    )
    with pytest.raises(ValueError, match="url_ranks"):
        export_sqlite(docs, tok, str(tmp_path / "x.sqlite"))
