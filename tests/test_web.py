"""HTTP serving layer: servlet-parity routing, formats, and the 9 ops
end-to-end over a built index (AlixServlet.java:124-165, Op.java:
102-143)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from alix_spark.corpus import webtext
from alix_spark.engine import AlixEngine
from alix_spark.web.server import AlixHttpServer


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    corpus = webtext.webtext(spark, 60, seed=11, partitions=4).persist()
    corpus.count()
    idx = str(tmp_path_factory.mktemp("web") / "ix")
    engine = AlixEngine.build(spark, corpus, idx, n_shards=4)
    server = AlixHttpServer({"demo": engine}).start()
    yield server, engine
    server.stop()


def _get(server, path, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", headers=headers or {}
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, dict(resp.headers), resp.read()


def _json(server, path):
    status, headers, body = _get(server, path)
    assert status == 200
    assert headers["Content-Type"].startswith("application/json")
    return json.loads(body)


def test_list_indices(served):
    server, engine = served
    rows = _json(server, "/")["rows"]
    assert [r["name"] for r in rows] == ["demo"]
    assert rows[0]["docs"] == int(engine.meta["corpus_docs"])


def test_describe_index(served):
    server, engine = served
    rows = _json(server, "/demo")["rows"]
    assert rows[0]["corpus_docs"] == int(engine.meta["corpus_docs"])


def test_unknown_index_404(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/nope/terms.json")
    assert e.value.code == 404
    assert "error" in json.loads(e.value.read())


def test_unsupported_format_406(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/terms.docx")
    assert e.value.code == 406


def test_results_matches_engine_search(served):
    server, engine = served
    rows = _json(server, "/demo/results.json?q=ville&hits=5")["rows"]
    hits = engine.search("ville", k=5)
    assert [(r["doc_id"], round(r["score"], 6)) for r in rows] == [
        (d, round(s, 6)) for d, s in hits
    ]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_results_missing_q_400(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/results.json")
    assert e.value.code == 400


def test_freqlist_csv_and_json_agree(served):
    server, _ = served
    rows = _json(server, "/demo/freqlist.json?top=10")["rows"]
    assert len(rows) == 10
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    status, headers, body = _get(server, "/demo/freqlist.csv?top=10")
    assert headers["Content-Type"].startswith("text/csv")
    lines = body.decode().strip().splitlines()
    assert lines[0].strip() == "term,freq,docs"
    assert len(lines) == 11
    first = lines[1].split(",")
    assert first[0] == rows[0]["term"] and int(first[1]) == rows[0]["freq"]


def test_terms_and_suggest(served):
    server, engine = served
    rows = _json(server, "/demo/terms.json?top=5")["rows"]
    assert len(rows) == 5 and "score" in rows[0]
    want = [r.asDict() for r in engine.suggest("vi", top=5).collect()]
    got = _json(server, "/demo/suggest.json?q=vi&top=5")["rows"]
    assert [r["term"] for r in got] == [r["term"] for r in want]


def test_terms_unknown_tsort_400(served):
    """An unknown tsort raised KeyError deep in keyness and surfaced
    as a 500 (review batch 32); a client typo is a 400."""
    server, engine = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/terms.json?lang=fr&tsort=bogus")
    assert e.value.code == 400
    assert b"bogus" in e.value.read()


def test_results_capability_valueerror_maps_to_400(served):
    """A predictable, client-triggerable capability mismatch (e.g. a
    positional query against a positions-less index) raises ValueError
    engine-side and must answer 400, not 500 (review batch 32)."""
    server, engine = served
    orig = engine.search
    engine.search = lambda *a, **kw: (_ for _ in ()).throw(
        ValueError("positional query on an index built with "
                   "with_positions=False")
    )
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, "/demo/results.json?q=ville")
        assert e.value.code == 400
        assert b"with_positions" in e.value.read()
    finally:
        engine.search = orig


def test_terms_chrono_interval(served):
    """terms?start=&end= serves the chrono-partitioned branch; half an
    interval or a data-empty one answers 400, never 500."""
    server, engine = served
    rows = _json(server, "/demo/terms.json?start=100&end=220&top=5")["rows"]
    assert rows and set(rows[0]) == {"term", "score"}
    for path in (
        "/demo/terms.json?start=100",           # end missing
        "/demo/terms.json?start=9000&end=9999", # outside field range
        "/demo/terms.json?start=x&end=y",       # not integers
        "/demo/terms.json?start=100&end=220&lang=fr",    # conflicting
        "/demo/terms.json?start=100&end=220&tsort=chi2", # conflicting
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server, path)
        assert e.value.code == 400, path


def test_chrono_jsonl(served):
    server, engine = served
    status, headers, body = _get(server, "/demo/chrono.jsonl")
    assert headers["Content-Type"].startswith("application/x-ndjson")
    rows = [json.loads(line) for line in body.decode().splitlines()]
    assert sum(r["docs"] for r in rows) == int(engine.meta["corpus_docs"])


def test_cooc_profile_and_clades_and_snippets(served):
    server, _ = served
    prof = _json(server, "/demo/cooc-profile.json?q=ville&dist=3&top=5")["rows"]
    assert prof and {"term", "dist", "freq", "cum_freq"} <= set(prof[0])
    clades = _json(server, "/demo/clades.json?top=30")["rows"]
    assert clades
    snips = _json(server, "/demo/snippets.json?q=ville+roi&hits=5")["rows"]
    assert snips and {"doc_id", "pos", "score"} <= set(snips[0])
    scores = [r["score"] for r in snips]
    assert scores == sorted(scores, reverse=True)


def test_doc_by_id_and_slug(served):
    server, engine = served
    rows = _json(server, "/demo/doc.json?id=1")["rows"]
    assert rows[0]["doc_id"] == 1 and rows[0]["text"]
    # servlet offers an unmatched path segment to the doc op as a slug
    url = rows[0]["url"]
    from urllib.parse import quote

    slug_rows = _json(server, f"/demo/{quote(url, safe='')}.json")["rows"]
    assert slug_rows[0]["url"] == url
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/doc.json?id=99999")
    assert e.value.code == 404


def test_html_default_format(served):
    server, _ = served
    status, headers, body = _get(server, "/demo/freqlist?top=3")
    assert headers["Content-Type"].startswith("text/html")
    assert body.startswith(b"<table>")


def test_not_modified_304(served):
    server, _ = served
    _, headers, _ = _get(server, "/demo/freqlist.json?top=1")
    lm = headers["Last-Modified"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/freqlist.json?top=1", {"If-Modified-Since": lm})
    assert e.value.code == 304  # urllib surfaces 304 as an HTTPError


def test_registry_backed_server(spark, tmp_path):
    """Registry-mode: initial scan on start, hot poll loads a newly
    published index (the servlet's IndexRegistry model)."""
    from alix_spark.index.registry import IndexRegistry

    root = tmp_path / "root"
    root.mkdir()
    corpus = webtext.webtext(spark, 30, seed=3, partitions=2)
    AlixEngine.build(spark, corpus, str(root / "first"), n_shards=2)
    reg = IndexRegistry(spark, str(root))
    server = AlixHttpServer(reg, poll_interval_s=3600).start()
    try:
        rows = _json(server, "/")["rows"]
        assert [r["name"] for r in rows] == ["first"]
        # publish a second index; a poll makes it servable
        AlixEngine.build(spark, corpus, str(root / "second"), n_shards=2)
        reg.poll()
        rows = _json(server, "/")["rows"]
        assert [r["name"] for r in rows] == ["first", "second"]
        assert _json(server, "/second/freqlist.json?top=3")["rows"]
    finally:
        server.stop()


def test_serving_continuous_through_republish(spark, tmp_path):
    """Queries keep succeeding while a new version is built and
    published underneath the server: the versioned publish means a
    reader only ever sees a complete index, the registry poll swaps
    the engine handle, and no request errors during the swap (the
    reference's fileKey + unload-grace serving model)."""
    import threading

    from alix_spark.index import segments, simple
    from alix_spark.index.registry import IndexRegistry

    def build_version(root_ix, word):
        staging, token = segments.begin_publish(root_ix)
        docs = spark.createDataFrame(
            [(i, f"{word} commun " * (i + 1)) for i in range(6)],
            "doc_id long, text string",
        )
        segments.build_index(spark, simple.tokens(docs), staging, n_shards=2)
        return segments.commit_publish(root_ix, staging, token)

    root = tmp_path / "root"
    root.mkdir()
    root_ix = str(root / "live")
    build_version(root_ix, "alpha")
    reg = IndexRegistry(spark, str(root))
    server = AlixHttpServer(reg, poll_interval_s=3600).start()
    errors: list[Exception] = []
    seen: set[str] = set()
    stop = threading.Event()

    def hammer():
        while not stop.is_set():
            try:
                rows = _json(server, "/live/freqlist.json?top=5")["rows"]
                seen.update(r["term"] for r in rows)
            except Exception as e:  # noqa: BLE001 — any failure is the finding
                errors.append(e)
                return

    th = threading.Thread(target=hammer)
    th.start()
    try:
        build_version(root_ix, "gamma")  # concurrent with serving
        reg.poll()  # registry swap (the daemon poll, forced for the test)
        # serve until the new vocabulary is observed
        for _ in range(200):
            rows = _json(server, "/live/freqlist.json?top=5")["rows"]
            if any(r["term"] == "gamma" for r in rows):
                break
        assert any("gamma" in t for t in seen | {r["term"] for r in rows})
    finally:
        stop.set()
        th.join(timeout=30)
        server.stop()
    assert errors == []
    assert "alpha" in seen  # served v1 before the swap


def test_html_cells_escaped(served):
    """Crawled text is attacker-controlled: the HTML format must escape
    cell content (a doc containing <script> is served inert)."""
    from alix_spark.web.server import _rows_to_payload

    body, ctype = _rows_to_payload(
        [{"text": "<script>alert(1)</script>", "t&": 1}], "html"
    )
    assert b"<script>alert" not in body
    assert b"&lt;script&gt;" in body and b"t&amp;" in body


def test_doc_slug_without_extension(served):
    """A dotted url slug with NO format extension must route to the doc
    op with the html default, not 406 (URLs always contain dots)."""
    server, _ = served
    from urllib.parse import quote

    url = _json(server, "/demo/doc.json?id=1")["rows"][0]["url"]
    status, headers, body = _get(server, f"/demo/{quote(url, safe='')}")
    assert status == 200 and headers["Content-Type"].startswith("text/html")


def test_registry_engine_corpusless_ops_404_not_500(spark, tmp_path):
    """Registry-opened engines have no corpus table: chrono/clades/
    terms?lang= answer a clean 404 (like doc), never a 500."""
    from alix_spark.index import segments, simple
    from alix_spark.index.registry import IndexRegistry

    root = tmp_path / "root"
    root.mkdir()
    root_ix = str(root / "bare")
    staging, token = segments.begin_publish(root_ix)
    docs = spark.createDataFrame(
        [(i, "delta commun " * (i + 1)) for i in range(4)],
        "doc_id long, text string",
    )
    segments.build_index(spark, simple.tokens(docs), staging, n_shards=2)
    segments.commit_publish(root_ix, staging, token)
    reg = IndexRegistry(spark, str(root))
    server = AlixHttpServer(reg, poll_interval_s=3600).start()
    try:
        # index-only ops still serve
        assert _json(server, "/bare/freqlist.json?top=3")["rows"]
        assert _json(server, "/bare/results.json?q=delta")["rows"]
        for path in (
            "/bare/chrono.json",
            "/bare/clades.json",
            "/bare/terms.json?lang=fr",
            "/bare/doc.json?id=1",
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _get(server, path)
            assert e.value.code == 404, path
    finally:
        server.stop()


def test_snippets_expand_wildcards(served):
    """A wildcard query scores snippet windows over its expansions
    (results and snippets must agree on what matches)."""
    server, _ = served
    rows = _json(server, "/demo/snippets.json?q=vill*&hits=5")["rows"]
    assert rows, "wildcard snippets came back empty"


def test_conc_rows_and_docx_roundtrip(served):
    """The conc op serves KWIC rows; .docx renders a valid package
    (reference DocxResults.java): Heading2 per doc, bold pivots,
    one footnote per line, byte-deterministic."""
    import xml.etree.ElementTree as ET
    import zipfile
    from io import BytesIO

    server, engine = served
    rows = _json(server, "/demo/conc.json?q=ville&hits=8")["rows"]
    assert rows and all(r["pivot"] == "ville" for r in rows)
    assert {"doc_id", "pos", "left_ctx", "right_ctx"} <= set(rows[0])

    status, headers, body = _get(server, "/demo/conc.docx?q=ville&hits=8")
    assert status == 200
    assert headers["Content-Type"].startswith(
        "application/vnd.openxmlformats-officedocument.wordprocessingml"
    )
    z = zipfile.ZipFile(BytesIO(body))
    assert z.testzip() is None
    ns = {"w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main"}
    doc = ET.fromstring(z.read("word/document.xml"))
    notes = ET.fromstring(z.read("word/footnotes.xml"))
    # one bold pivot run with the term per concordance line
    pivots = [
        t.text
        for r in doc.iter(f"{{{ns['w']}}}r")
        if r.find("w:rPr/w:b", ns) is not None
        for t in r.findall("w:t", ns)
        if t.text == "ville"
    ]
    assert len(pivots) == len(rows)
    # every line's footnote reference resolves to a real footnote id
    ref_ids = {
        e.get(f"{{{ns['w']}}}id")
        for e in doc.iter(f"{{{ns['w']}}}footnoteReference")
    }
    note_ids = {
        e.get(f"{{{ns['w']}}}id")
        for e in notes.iter(f"{{{ns['w']}}}footnote")
    }
    assert len(ref_ids) == len(rows) and ref_ids <= note_ids
    # deterministic bytes (fixed zip timestamps)
    _s2, _h2, body2 = _get(server, "/demo/conc.docx?q=ville&hits=8")
    assert body2 == body


def test_docx_is_concordance_only(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/demo/results.docx?q=ville")
    assert e.value.code == 406
