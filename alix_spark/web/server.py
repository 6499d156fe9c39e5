"""HTTP serving layer: the reference's 9 operations over
``/{index}/{op}.{format}``.

Re-expresses AlixServlet's routing (web/.../AlixServlet.java:124-165):

1. empty path        → list all indices
2. ``/{index}``      → describe one index
3. ``/{index}/{op}[.{fmt}]`` → dispatch to an operation
4. unknown op        → offered to the document operation (doc slug)
5. otherwise         → JSON 404 error

and Op.dispatch's format fan-out (Op.java:102-143): json / jsonl /
csv / txt / html, 406 on an unsupported extension. The registered op
names are the reference's 9 (AlixServlet.registerOps, :542-553):
chrono, clades, cooc-profile, doc, freqlist, results, snippets,
suggest, terms. ``If-Modified-Since`` is honored against the live
publish's mtime rounded to the second, like the servlet's
``notModified`` (AlixServlet.java:201-230).

The layer is deliberately THIN: every operation delegates to the
:class:`alix_spark.engine.AlixEngine` facade (itself served from the
frozen index — postings/stats sidecars, never re-analyzing), and the
index inventory is the hot-reloading :class:`alix_spark.index.
registry.IndexRegistry`. Pure stdlib (``http.server``): at scale the
same handlers sit behind any WSGI front; the Spark session inside the
engine is shared across handler threads (job submission is
thread-safe).

Serving fast paths: ``results`` (BM25 top-k) runs entirely on the
pyarrow WAND path — no Spark job; ``freqlist`` and ``suggest`` read
the term_stats sidecar through pyarrow. The lexicometry ops (terms /
chrono / cooc-profile / clades / snippets) are Spark jobs over the
decoded index rail, collected top-k.
"""

from __future__ import annotations

import csv
import io
import json
import os
import threading
import time
from email.utils import formatdate, parsedate_to_datetime
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

FORMATS = ("json", "jsonl", "csv", "txt", "html")
OPS = (
    "chrono",
    "clades",
    "conc",
    "cooc-profile",
    "doc",
    "freqlist",
    "results",
    "snippets",
    "suggest",
    "terms",
)


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _split_op_format(segment: str) -> tuple[str, str | None]:
    """``terms.json`` → (``terms``, ``json``); no extension → default
    html (the reference's full-page default, Op.dispatch format==null).

    Doc-slug segments routinely contain dots (URLs): the suffix after
    the last dot is treated as a format ONLY when the base is a
    registered op (so ``terms.docx`` still 406s) or the suffix is a
    known format (slug + explicit ``.json``); otherwise the WHOLE
    segment is the op/slug. A slug whose url genuinely ends in a
    format-named suffix (``…page.html``) is ambiguous and resolves as
    format — inherent to the path grammar."""
    if "." in segment:
        op, fmt = segment.rsplit(".", 1)
        if op in OPS or fmt in FORMATS:
            return op, fmt
    return segment, None


def _rows_to_payload(rows: list[dict], fmt: str | None) -> tuple[bytes, str]:
    """Serialize result rows in the requested format (Op.java:102-143
    fan-out; csv uses the reference's quote-doubling escape,
    Op.csvEscape)."""
    if fmt is None or fmt == "html":
        from html import escape

        cols = list(rows[0].keys()) if rows else []
        buf = ["<table>"]
        buf.append(
            "<tr>" + "".join(f"<th>{escape(str(c))}</th>" for c in cols)
            + "</tr>"
        )
        # crawled text is attacker-controlled — every cell escapes
        for r in rows:
            buf.append(
                "<tr>"
                + "".join(f"<td>{escape(str(r[c]))}</td>" for c in cols)
                + "</tr>"
            )
        buf.append("</table>")
        return "\n".join(buf).encode(), "text/html; charset=UTF-8"
    if fmt == "json":
        return (
            json.dumps({"rows": rows}, ensure_ascii=False).encode(),
            "application/json; charset=UTF-8",
        )
    if fmt == "jsonl":
        body = "\n".join(json.dumps(r, ensure_ascii=False) for r in rows)
        return body.encode(), "application/x-ndjson; charset=UTF-8"
    if fmt == "csv":
        out = io.StringIO()
        w = csv.writer(out)
        if rows:
            w.writerow(rows[0].keys())
            for r in rows:
                w.writerow(r.values())
        return out.getvalue().encode(), "text/csv; charset=UTF-8"
    if fmt == "txt":
        body = "\n".join(
            "\t".join(str(v) for v in r.values()) for r in rows
        )
        return body.encode(), "text/plain; charset=UTF-8"
    raise HttpError(406, f"unsupported format: {fmt}")


def _df_rows(df, limit: int = 1000) -> list[dict]:
    """Collect a (small, already top-k'd) result frame — Spark or
    pandas (clades' CA map is driver-side pandas) — to row dicts; the
    hard ``limit`` guards the serving process against an op called
    without its own top-k."""
    if hasattr(df, "collect"):
        return [r.asDict(recursive=True) for r in df.limit(limit).collect()]
    return df.head(limit).to_dict("records")


class _Params:
    """Query parameters with the reference's defaulted/clamped reads
    (HttpPars.getInt(name, range, default) analogue)."""

    def __init__(self, query: str):
        self._q = parse_qs(query)

    def get(self, name: str, default: str | None = None) -> str | None:
        vals = self._q.get(name)
        return vals[0] if vals else default

    def get_int(self, name: str, default: int, lo: int, hi: int) -> int:
        raw = self.get(name)
        if raw is None:
            return default
        try:
            return max(lo, min(hi, int(raw)))
        except ValueError:
            return default


class AlixHttpServer:
    """The reference servlet, bound to a registry of engines.

    ``registry`` is an :class:`IndexRegistry` (polled every
    ``poll_interval_s`` on a daemon thread, like the servlet's
    10 s registry scan) OR a plain ``{name: AlixEngine}`` dict for
    embedding/tests. ``port=0`` binds an ephemeral port (read
    ``server.port`` after ``start()``)."""

    def __init__(
        self,
        registry,
        host: str = "127.0.0.1",
        port: int = 0,
        poll_interval_s: float = 10.0,
    ):
        self.registry = registry
        self.started_s = time.time()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            server_version = "alix_spark"

            def log_message(self, *a):  # quiet test output
                pass

            def do_GET(self):
                try:
                    outer._route(self)
                except HttpError as e:
                    outer._send_error(self, e.status, e.message)
                except BrokenPipeError:
                    pass
                except Exception as e:  # a failing op must not kill serving
                    outer._send_error(self, 500, f"{type(e).__name__}: {e}")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.port = self.httpd.server_address[1]
        self.host = host
        self._thread: threading.Thread | None = None
        self._poller: threading.Thread | None = None
        self._stop = threading.Event()
        self._poll_interval_s = poll_interval_s

    # --------------------------------------------------------- lifecycle

    def start(self) -> "AlixHttpServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        if hasattr(self.registry, "poll"):
            self.registry.poll()  # initial synchronous scan (servlet init)

            def _poll_loop():
                while not self._stop.wait(self._poll_interval_s):
                    try:
                        self.registry.poll()
                    except Exception:
                        pass  # a failed poll keeps last-good handles

            self._poller = threading.Thread(target=_poll_loop, daemon=True)
            self._poller.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()

    # ----------------------------------------------------------- engines

    def _names(self) -> list[str]:
        if hasattr(self.registry, "names"):
            return self.registry.names()
        return sorted(self.registry)

    def _engine(self, name: str):
        try:
            if hasattr(self.registry, "get") and hasattr(self.registry, "poll"):
                return self.registry.get(name)
            return self.registry[name]
        except KeyError:
            raise HttpError(404, f"Index not found: {name}") from None

    # ----------------------------------------------------------- routing

    def _route(self, h: BaseHTTPRequestHandler) -> None:
        url = urlparse(h.path)
        segments = [unquote(s) for s in url.path.split("/") if s]
        pars = _Params(url.query)

        if not segments:
            self._send_rows(h, None, self._list_indices(), "json")
            return

        name = segments[0]
        engine = self._engine(name)
        if self._not_modified(h, engine):
            return
        if len(segments) == 1:
            self._send_rows(h, engine, [dict(engine.meta)], "json")
            return

        op, fmt = _split_op_format(segments[1])
        # docx is a concordance-only export (reference DocxResults is a
        # ResultsRenderer over snippets; every other op still 406s)
        if fmt == "docx" and op != "conc":
            raise HttpError(406, "docx export is concordance-only")
        if fmt is not None and fmt != "docx" and fmt not in FORMATS:
            raise HttpError(406, f"unsupported format: {fmt}")
        if op in OPS:
            rows = self._dispatch(engine, op, pars)
        else:
            # unmatched segment offered to the document op as a slug
            # (AlixServlet.java:378-385 docIdByName)
            rows = self._op_doc_slug(engine, op)
        if fmt == "docx":
            from alix_spark.web.docx import concordance_docx

            self._send_bytes(
                h, engine, concordance_docx(rows),
                "application/vnd.openxmlformats-officedocument"
                ".wordprocessingml.document",
            )
            return
        self._send_rows(h, engine, rows, fmt)

    def _not_modified(self, h, engine) -> bool:
        """Second-precision Last-Modified gate (AlixServlet.java:
        201-230): timestamp = max(server start, live publish mtime)."""
        ims = h.headers.get("If-Modified-Since")
        if not ims:
            return False
        try:
            since = parsedate_to_datetime(ims).timestamp()
        except (TypeError, ValueError):
            return False
        if int(self._last_modified(engine)) <= int(since):
            h.send_response(304)
            h.end_headers()
            return True
        return False

    def _last_modified(self, engine) -> float:
        try:
            mtime = os.path.getmtime(
                os.path.join(engine.index_dir, "corpus.json")
            )
        except OSError:
            mtime = 0.0
        return max(self.started_s, mtime)

    def _send_rows(self, h, engine, rows, fmt) -> None:
        body, ctype = _rows_to_payload(rows, fmt)
        self._send_bytes(h, engine, body, ctype)

    def _send_bytes(self, h, engine, body: bytes, ctype: str) -> None:
        h.send_response(200)
        h.send_header("Content-Type", ctype)
        h.send_header("Access-Control-Allow-Origin", "*")
        h.send_header("Cache-Control", "no-cache")
        if engine is not None:
            h.send_header(
                "Last-Modified",
                formatdate(self._last_modified(engine), usegmt=True),
            )
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    def _send_error(self, h, status: int, message: str) -> None:
        body = json.dumps({"error": message}).encode()
        h.send_response(status)
        h.send_header("Content-Type", "application/json; charset=UTF-8")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    # -------------------------------------------------------- operations

    def _list_indices(self) -> list[dict]:
        out = []
        for name in self._names():
            try:
                eng = self._engine(name)
            except HttpError:
                continue  # unloaded by the poll thread mid-listing
            out.append(
                {
                    "name": name,
                    "docs": int(eng.meta.get("corpus_docs", 0)),
                    "terms": int(eng.meta.get("vocab_size", 0)),
                }
            )
        return out

    def _dispatch(self, engine, op: str, pars: _Params) -> list[dict]:
        return getattr(self, "_op_" + op.replace("-", "_"))(engine, pars)

    @staticmethod
    def _require_corpus(engine):
        """Registry-opened engines hold only the frozen index; ops
        that need the source table (chrono, clades, focus terms, doc)
        answer 404 there, not a 500 (the doc op's guard, generalized)."""
        if engine.corpus is None:
            raise HttpError(
                404, "operation needs the corpus table; index serves none"
            )

    def _op_results(self, engine, pars) -> list[dict]:
        """BM25 top-k over the parsed query — the pyarrow WAND serving
        path, no Spark job (OpResults.java ranked results)."""
        q = pars.get("q")
        if not q:
            raise HttpError(400, "missing parameter: q")
        k = pars.get_int("hits", 10, 1, 1000)
        try:
            hits = engine.search(q, k=k)
        except ValueError as exc:
            # predictable, client-triggerable capability mismatches —
            # e.g. a phrase/near query against an index built without
            # positions — are a 400, not a 500 (review batch 32)
            raise HttpError(400, str(exc))
        return [
            {"rank": i + 1, "doc_id": int(d), "score": float(s)}
            for i, (d, s) in enumerate(hits)
        ]

    def _op_freqlist(self, engine, pars) -> list[dict]:
        """Global frequency list straight off the term_stats sidecar
        (pyarrow scan, no Spark — OpFreqlist)."""
        from alix_spark.query import wand

        import numpy as np

        top = pars.get_int("top", 50, 1, 10000)
        dset = wand.term_stats_dataset(engine.index_dir)
        # O(n) top-k over the NUMERIC cf column only (argpartition) —
        # the term strings, which dominate driver memory at web-scale
        # vocabularies, are fetched ONLY for the tie pool and the k
        # winners via row-index take (review batch 32; the previous
        # full-table scan materialized every term string first,
        # contradicting this comment's own claim). Row indices are
        # stable between scans: pyarrow datasets scan fragments in
        # listing order and preserve in-fragment row order.
        cf = dset.to_table(columns=["cf"])["cf"].to_numpy(
            zero_copy_only=False
        )
        k = min(top, len(cf))
        if not k:
            return []
        kth = -np.partition(-cf, k - 1)[k - 1]
        # terms strictly above the cutoff all win; ties AT the cutoff
        # (with a Zipf tail this can be most of the vocabulary) are
        # settled term-asc via an O(t) string partition of just the
        # tie pool — never a full-vocabulary sort on the driver
        above = np.nonzero(cf > kth)[0]
        need = k - len(above)
        tie_idx = np.nonzero(cf == kth)[0]
        if need > 0 and len(tie_idx) > need:
            tie_terms = np.asarray(
                dset.take(tie_idx, columns=["term"])["term"].to_pylist(),
                dtype=object,
            )
            sel = np.argpartition(tie_terms, need - 1)[:need]
            tie_idx = tie_idx[sel]
        cand = np.concatenate([above, tie_idx[: max(need, 0)]]).astype(
            "int64"
        )
        winners = dset.take(cand, columns=["term", "df"])
        rows = sorted(
            zip(
                winners["term"].to_pylist(),
                cf[cand].tolist(),
                winners["df"].to_pylist(),
            ),
            key=lambda r: (-r[1], r[0]),
        )[:k]
        return [
            {"term": t, "freq": int(c), "docs": int(d)}
            for t, c, d in rows
        ]

    def _op_terms(self, engine, pars) -> list[dict]:
        """Theme-ranked terms, keyness focus-vs-rest when ``lang``
        partitions the corpus, or chrono-partitioned contrastive terms
        when ``start``/``end`` bound a day-of-year interval (the
        reference OpTerms year-query branch)."""
        from pyspark.sql import functions as F

        top = pars.get_int("top", 50, 1, 1000)
        lang = pars.get("lang")
        scorer = pars.get("tsort", "g2")
        start, end = pars.get("start"), pars.get("end")
        if start is not None or end is not None:
            if start is None or end is None:
                raise HttpError(400, "start and end must be given together")
            if lang or pars.get("tsort") is not None:
                # the chrono-contrast branch has a fixed scorer over the
                # whole corpus; silently dropping these returned
                # plausible-but-wrong rows
                raise HttpError(
                    400, "lang/tsort cannot be combined with start/end"
                )
            self._require_corpus(engine)
            try:
                s, e = int(start), int(end)
            except ValueError:
                raise HttpError(400, "start/end must be integers")
            try:
                return _df_rows(engine.terms(start=s, end=e, top=top))
            except ValueError as exc:  # empty focus / out-of-range interval
                raise HttpError(400, str(exc))
        if pars.get("tsort") is not None:
            from alix_spark.lexicometry.keyness import SCORERS

            if scorer not in SCORERS:
                # an unknown scorer raised KeyError deep in keyness and
                # surfaced as a 500 (review batch 32)
                raise HttpError(
                    400,
                    f"unknown tsort {scorer!r}; one of {sorted(SCORERS)}",
                )
        if lang:
            self._require_corpus(engine)  # focus filters the corpus
        focus = F.col("lang") == lang if lang else None
        return _df_rows(engine.terms(focus=focus, scorer=scorer, top=top))

    def _op_suggest(self, engine, pars) -> list[dict]:
        q = pars.get("q")
        if not q:
            raise HttpError(400, "missing parameter: q")
        top = pars.get_int("top", 20, 1, 200)
        # zero-Spark per-keystroke path: the shared fold+rank backend
        # directly (engine.suggest wraps the same rows in a Spark
        # DataFrame, which costs a createDataFrame+collect per request)
        from alix_spark.lexicometry.suggest import suggest_local

        return [
            {"term": t, "cf": c}
            for t, c in suggest_local(engine.index_dir, q, top=top)
        ]

    def _op_chrono(self, engine, pars) -> list[dict]:
        self._require_corpus(engine)
        return _df_rows(engine.chrono())

    def _op_cooc_profile(self, engine, pars) -> list[dict]:
        from alix_spark.lexicometry import cooc as cooc_mod

        q = pars.get("q")
        if not q:
            raise HttpError(400, "missing parameter: q")
        dist = pars.get_int("dist", 5, 1, 50)
        top = pars.get_int("top", 20, 1, 500)
        return _df_rows(
            cooc_mod.cooc_profile(
                engine.rail(), q, max_dist=dist, top=top
            )
        )

    def _op_clades(self, engine, pars) -> list[dict]:
        self._require_corpus(engine)  # parts come from the corpus lang
        top = pars.get_int("top", 100, 2, 2000)
        return _df_rows(engine.clades(top_terms=top))

    def _op_snippets(self, engine, pars) -> list[dict]:
        """Theme-scored snippet windows around query-term matches
        (OpSnippets → SnippetScorer.ThemeWords)."""
        from alix_spark.query import parser as parser_mod
        from alix_spark.query import snippets as snip_mod

        q = pars.get("q")
        if not q:
            raise HttpError(400, "missing parameter: q")
        width = pars.get_int("width", 5, 1, 50)
        k = pars.get_int("hits", 10, 1, 200)
        terms = [
            t
            for c in parser_mod.parse(q)
            for t in (
                [c.term]
                if isinstance(c, parser_mod.TermClause)
                else c.terms
                if isinstance(c, (parser_mod.OrClause, parser_mod.PhraseClause))
                else engine._expand(c.pattern)
                if isinstance(c, parser_mod.WildcardClause)
                else []
            )
        ]
        if not terms:
            return []
        weights = engine.theme_weights()  # cached per index version
        return _df_rows(
            snip_mod.snippet_topk(
                engine.rail(), weights, terms, width=width, k=k
            )
        )

    def _op_conc(self, engine, pars) -> list[dict]:
        """KWIC concordance lines over the index rail
        (engine.concordance); ``.docx`` renders them through
        web/docx.py (reference DocxResults.java:1-201), every other
        format through the standard fan-out."""
        q = pars.get("q")
        if not q:
            raise HttpError(400, "missing parameter: q")
        from alix_spark.query import parser as parser_mod

        terms = [
            c.term for c in parser_mod.parse(q)
            if isinstance(c, parser_mod.TermClause)
        ]
        if not terms:
            raise HttpError(400, "q must contain a plain pivot term")
        width = pars.get_int("width", 5, 1, 50)
        k = pars.get_int("hits", 50, 1, 1000)
        rows = _df_rows(engine.concordance(terms[0], width=width, limit=k))
        for r in rows:
            r["pivot"] = terms[0]
        return rows

    def _op_doc(self, engine, pars) -> list[dict]:
        raw = pars.get("id")
        if raw is None:
            raise HttpError(400, "missing parameter: id")
        return self._doc_rows(engine, raw)

    def _op_doc_slug(self, engine, slug: str) -> list[dict]:
        return self._doc_rows(engine, slug)

    def _doc_rows(self, engine, key: str) -> list[dict]:
        """One document by dense doc_id or by url slug (OpDoc; the
        slug path is the servlet's unmatched-segment fallback)."""
        from pyspark.sql import functions as F

        if engine.corpus is None:
            raise HttpError(404, "index serves no document store")
        # the handle's memoized (url, doc_id) map — url_ranks runs an
        # eager corpus-wide job at construction, so rebuilding it per
        # HTTP request re-paid that job on every doc/slug lookup
        # (review batch 32; engine._url_ids is the batch-31 cache)
        docs = engine.corpus.join(engine._url_ids(), "url")
        if key.isdigit():
            docs = docs.filter(F.col("doc_id") == int(key))
        else:
            docs = docs.filter(F.col("url") == key)
        rows = _df_rows(
            docs.select("doc_id", "url", "warc_ts", "lang", "text"), limit=2
        )
        if not rows:
            raise HttpError(404, f"document not found: {key}")
        for r in rows:
            r["warc_ts"] = str(r["warc_ts"])
        return rows
