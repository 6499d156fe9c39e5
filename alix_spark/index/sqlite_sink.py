"""SQLite token sink — the reference's alternate lemmatized-text store.

Mirrors the reference's schema (sqlite/src/java/com/github/oeuvres/
alix/sqlite/alix.sql + Insert.java): a ``doc`` table, a ``tok``
occurrence table ``(doc, orth, cat, lem, offset, length)`` referencing
``orth``/``lem`` form dictionaries with ``(form, cat)`` uniqueness and
the same lookup indexes.

Like the reference's writer, this is a SINGLE-NODE export (SQLite is a
one-file store): the distributed analysis runs in Spark, and the
resulting token stream is drained to the file through
``toLocalIterator`` — one partition in memory at a time, never the
whole corpus. It is an export sink for interoperability, not the
engine's index (that is the sharded parquet/Iceberg layout in
:mod:`alix_spark.index.segments`).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame

SCHEMA = """
PRAGMA encoding = 'UTF-8';
CREATE TABLE doc (
    id     INTEGER PRIMARY KEY,
    code   TEXT UNIQUE NOT NULL,
    html   BLOB,
    date   INTEGER
);
CREATE TABLE tok (
    id     INTEGER PRIMARY KEY,
    doc    INTEGER NOT NULL,
    orth   INTEGER NOT NULL,
    cat    TEXT    NOT NULL,
    lem    INTEGER NOT NULL,
    offset INTEGER NOT NULL,
    length INTEGER NOT NULL
);
CREATE TABLE orth (
    id   INTEGER PRIMARY KEY,
    form TEXT NOT NULL,
    cat  TEXT,
    lem  INTEGER
);
CREATE TABLE lem (
    id   INTEGER PRIMARY KEY,
    form TEXT NOT NULL,
    cat  TEXT
);
"""

INDEXES = """
CREATE UNIQUE INDEX doc_code ON doc(code);
CREATE INDEX tok_orth ON tok(orth, doc);
CREATE INDEX tok_lem ON tok(lem, doc);
CREATE UNIQUE INDEX orth_form ON orth(form, cat);
CREATE UNIQUE INDEX lem_form ON lem(form, cat);
"""


def export_sqlite(docs: DataFrame, tok: DataFrame, path: str) -> dict:
    """Write the analyzed corpus to a SQLite file in the reference's
    table shape.

    docs: (doc_id, url[, html, warc_ts]) — doc.code = url; doc.date =
          the crawl timestamp (epoch seconds) when warc_ts is present.
    tok:  (doc_id, term, pos_tag, lemma, start, end, orth) analyzed
          tokens with source offsets
          (``analyzed_tokens_with_offsets`` output). ``orth`` rows are
          the SURFACE forms (the chain's pre-lemma-projection term —
          without this channel the orth dictionary would just duplicate
          lem, because the canonical ``term`` column is already
          lemma-projected); ``lem`` rows the lemma forms (falling back
          to the surface when no lemma applies, like the reference's
          sparse lemma channel).

    Returns {"docs": n, "toks": n, "orth": n, "lem": n}.

    ``doc_id`` must be integral (the reference schema's INTEGER key):
    a string-keyed token table (``id_type='string'``) must join
    ``url_ranks`` first — the error below names that, instead of a
    bare int() ValueError (review batch 34).
    """
    from datetime import timezone
    from zoneinfo import ZoneInfo

    def _doc_id(v):
        if isinstance(v, bool) or not isinstance(v, int):
            raise ValueError(
                "export_sqlite: doc_id must be an integer (got "
                f"{type(v).__name__}) — for url-keyed tokens join "
                "corpus.webtext.url_ranks first"
            )
        return v

    # Spark collects timestamps as tz-NAIVE datetimes rendered in the
    # SESSION timezone; naive .timestamp() would re-interpret them in
    # the driver OS zone, exporting different epochs on different
    # machines (review batch 34)
    sess_tz = ZoneInfo(
        docs.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )

    con = sqlite3.connect(path)
    try:
        con.executescript("DROP TABLE IF EXISTS doc; DROP TABLE IF EXISTS tok;"
                          "DROP TABLE IF EXISTS orth; DROP TABLE IF EXISTS lem;")
        con.executescript(SCHEMA)

        cols = {f.name for f in docs.schema.fields}
        n_docs = 0
        for row in docs.toLocalIterator():
            html = bytes(row["html"]) if "html" in cols and row["html"] is not None else None
            date = None
            if "warc_ts" in cols and row["warc_ts"] is not None:
                ts = row["warc_ts"]
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=sess_tz)
                date = int(ts.timestamp())
            con.execute(
                "INSERT INTO doc(id, code, html, date) VALUES (?, ?, ?, ?)",
                (_doc_id(row["doc_id"]), row["url"], html, date),
            )
            n_docs += 1

        orth_ids: dict[tuple[str, str], int] = {}
        lem_ids: dict[tuple[str, str], int] = {}
        n_toks = 0
        batch = []
        tok_cols = {f.name for f in tok.schema.fields}
        for row in tok.toLocalIterator():
            # orth = the true surface form; the canonical term column is
            # lemma-projected, so using it here would make orth a copy of
            # lem and lose the surface forever
            form = row["orth"] if "orth" in tok_cols else row["term"]
            cat = row["pos_tag"]
            lemma = row["lemma"] or form
            lk = (lemma, cat)
            if lk not in lem_ids:
                lem_ids[lk] = len(lem_ids) + 1
                con.execute(
                    "INSERT INTO lem(id, form, cat) VALUES (?, ?, ?)",
                    (lem_ids[lk], lemma, cat),
                )
            ok = (form, cat)
            if ok not in orth_ids:
                orth_ids[ok] = len(orth_ids) + 1
                con.execute(
                    "INSERT INTO orth(id, form, cat, lem) VALUES (?, ?, ?, ?)",
                    (orth_ids[ok], form, cat, lem_ids[lk]),
                )
            batch.append(
                (_doc_id(row["doc_id"]), orth_ids[ok], cat, lem_ids[lk],
                 int(row["start"]), int(row["end"]) - int(row["start"]))
            )
            n_toks += 1
            if len(batch) >= 10000:
                con.executemany(
                    "INSERT INTO tok(doc, orth, cat, lem, offset, length) "
                    "VALUES (?, ?, ?, ?, ?, ?)", batch)
                batch = []
        if batch:
            con.executemany(
                "INSERT INTO tok(doc, orth, cat, lem, offset, length) "
                "VALUES (?, ?, ?, ?, ?, ?)", batch)
        con.executescript(INDEXES)
        con.commit()
    finally:
        # close on EVERY exit: a mid-export IntegrityError must not
        # pin the half-written file's handle (review batch 34; the
        # partial file itself is the caller's to clean — the export
        # has no atomic-publish contract)
        con.close()
    return {"docs": n_docs, "toks": n_toks,
            "orth": len(orth_ids), "lem": len(lem_ids)}
