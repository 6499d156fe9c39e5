"""Document analysis chain: HTML → extracted text + indexable tokens.

This is the engine's write-path per-document "dataflow operator"
(reference pipeline: FrenchAnalyzer.java:288-305 canonical chain, driven
from AlixLuceneConsumer.java:171-205). Everything runs batched inside
``mapInPandas`` — pure-function per document, no per-row Python UDFs
(the ``input_hint`` contract), trivially parallel over any number of
executors.

Two products per document:

- :func:`extract_text` — the detagged text, the north rule's
  **byte-identical extracted text per url** deliverable (asserted
  against committed goldens and against the corpus generator's
  round-trip inverse in tests).
- :func:`analyze` — final ``(term, position, pos_tag, lemma)`` tokens
  after the full filter chain, the input to the index build.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.analysis.filters import run_chain
from alix_spark.analysis.tokenizer import _ENT, _ENT_RE, _ZONE_RE, tokenize
from alix_spark.util import ensure_py_files

# the SAME excluded-zone definition the tokenizer uses (one source of
# truth — extraction and tokenization must agree on what is zone
# content), plus comments, which extraction also drops
_STRIP_ZONES_RE = re.compile(
    _ZONE_RE.pattern + r"|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_BLOCK_CLOSE_RE = re.compile(
    r"</\s*(?:p|h[1-6]|li|div|td|tr|blockquote|section|article|body|html)\s*>"
    r"|<\s*(?:br|hr)\s*/?\s*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")


def extract_text(html: str | bytes) -> str:
    """Deterministic text extraction from an HTML page.

    Spec (inverse of corpus.webtext.text_to_html):
    1. drop ``<script>``/``<style>``/``<head>`` elements and comments
    2. closing block tags and ``<br>``/``<hr>`` become newlines
    3. all remaining tags removed
    4. the 5 XML entities decoded (&amp; &lt; &gt; &quot; &apos;)
    5. lines stripped, empty lines dropped, joined with ``\\n``

    NULL source → empty text: a crawl table routinely carries rows
    with a failed fetch (html NULL); one such row must not kill the
    whole index build.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _STRIP_ZONES_RE.sub(" ", html)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENT_RE.sub(lambda m: _ENT[m.group(0)], s)
    lines = [ln.strip() for ln in s.split("\n")]
    # collapse intra-line whitespace runs introduced by tag removal
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln) for ln in lines]
    return "\n".join(ln for ln in lines if ln)


def analyze(
    src: str | bytes,
    tagger_path: str | None = None,
    with_offsets: bool = False,
) -> list[tuple]:
    """Full chain on one document: ``[(term, pos, pos_tag, lemma)]``
    (with ``with_offsets``: 7-tuples ``+ start, end, orth`` — source
    offsets and the true surface form).

    ``tagger_path``: optional OpenNLP POS model (.bin) — switches the
    POS stage to maxent inference (loaded once per process). A NULL
    source yields zero tokens (failed-fetch rows are normal in a
    crawl table)."""
    if src is None:
        return []
    if isinstance(src, (bytes, bytearray)):
        src = bytes(src).decode("utf-8", errors="replace")
    tagger = None
    if tagger_path:
        from alix_spark.analysis.maxent import load_tagger

        tagger = load_tagger(tagger_path)
    return run_chain(tokenize(src), tagger=tagger, with_offsets=with_offsets)


# ------------------------------------------------------- Spark operators

EXTRACT_SCHEMA = "url string, text string"


def analyzed_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "html",
    id_type: str = "long",
    light: bool = False,
    tagger_path: str | None = None,
) -> DataFrame:
    """Distributed analysis: ``(id, html) → (id, pos, term, pos_tag,
    lemma)`` exploded token table via mapInPandas (Arrow batches; the
    chain itself is per-document pure Python over C-level regex — the
    vectorized-UDF slow path is only the filter dict lookups).

    ``id_col`` may be the dense ``doc_id`` or the natural-key ``url``
    (``id_type='string'``): at scale, tokenize by url straight off the
    source scan and join the skinny token table to
    ``corpus.webtext.url_ranks`` afterwards — never shuffle the html
    payload.

    ``light=True`` (the index-build path) transfers PACKED per-doc
    arrays over Arrow — one id per document, terms and positions as
    array columns — and explodes JVM-side (``inline(arrays_zip(...))``),
    so the doc id is never duplicated per token row. On realistic page
    sizes this roughly halves the Python→JVM transfer."""
    ensure_py_files(docs.sparkSession)

    if light:
        packed = analyzed_packed(
            docs, id_col=id_col, src_col=src_col, id_type=id_type,
            tagger_path=tagger_path,
        )
        return packed.select(
            id_col, F.expr("inline(arrays_zip(poss, terms))")
        ).select(id_col, F.col("poss").alias("pos"), F.col("terms").alias("term"))

    cols = docs.select(F.col(id_col).alias("_id"), F.col(src_col).alias("src"))

    schema = (
        f"{id_col} {id_type}, pos int, term string, "
        "pos_tag string, lemma string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            poss: list = []
            terms: list = []
            tags: list = []
            lemmas: list = []
            for doc_id, src in zip(pdf["_id"], pdf["src"]):
                toks = analyze(src, tagger_path=tagger_path)
                ids.extend([doc_id] * len(toks))
                for term, pos, tag, lemma in toks:
                    poss.append(pos)
                    terms.append(term)
                    tags.append(tag)
                    lemmas.append(lemma)
            yield pd.DataFrame(
                {
                    id_col: ids, "pos": poss, "term": terms,
                    "pos_tag": tags, "lemma": lemmas,
                }
            )

    return cols.mapInPandas(run, schema=schema)


def analyzed_packed(
    docs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "html",
    id_type: str = "long",
    tagger_path: str | None = None,
) -> DataFrame:
    """Distributed analysis, PACKED: ``(id, html) → (id, terms
    array<string>, poss array<int>)`` — one row per document, the
    whole token stream as array columns.

    This is the index build's preferred input shape: the packed rows
    shuffle ~2 orders of magnitude fewer rows than the exploded
    ``(id, pos, term)`` table (no per-token row overhead, the doc id
    never duplicated per token), and
    :func:`alix_spark.index.segments.build_index_packed` consumes it
    without ever exploding to one-row-per-token on the JVM side."""
    ensure_py_files(docs.sparkSession)
    cols = docs.select(F.col(id_col).alias("_id"), F.col(src_col).alias("src"))
    packed_schema = f"{id_col} {id_type}, terms array<string>, poss array<int>"

    def run_packed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            terms: list = []
            poss: list = []
            for doc_id, src in zip(pdf["_id"], pdf["src"]):
                toks = analyze(src, tagger_path=tagger_path)
                ids.append(doc_id)
                terms.append([t[0] for t in toks])
                poss.append([t[1] for t in toks])
            yield pd.DataFrame({id_col: ids, "terms": terms, "poss": poss})

    return cols.mapInPandas(run_packed, schema=packed_schema)


def analyzed_tokens_with_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "html",
    id_type: str = "long",
    tagger_path: str | None = None,
) -> DataFrame:
    """analyzed_tokens + source offsets: ``(id, pos, term, pos_tag,
    lemma, start, end)`` — the OffsetAttribute channel consumers (the
    sqlite token sink, highlighters) need."""
    ensure_py_files(docs.sparkSession)
    cols = docs.select(F.col(id_col).alias("_id"), F.col(src_col).alias("src"))
    schema = (
        f"{id_col} {id_type}, pos int, term string, pos_tag string, "
        "lemma string, start int, end int, orth string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                id_col: [], "pos": [], "term": [], "pos_tag": [],
                "lemma": [], "start": [], "end": [], "orth": [],
            }
            for doc_id, src in zip(pdf["_id"], pdf["src"]):
                for term, pos, tag, lemma, start, end, orth in analyze(
                    src, tagger_path=tagger_path, with_offsets=True
                ):
                    rows[id_col].append(doc_id)
                    rows["pos"].append(pos)
                    rows["term"].append(term)
                    rows["pos_tag"].append(tag)
                    rows["lemma"].append(lemma)
                    rows["start"].append(start)
                    rows["end"].append(end)
                    rows["orth"].append(orth)
            yield pd.DataFrame(rows)

    return cols.mapInPandas(run, schema=schema)


def extracted_text(docs: DataFrame, src_col: str = "html") -> DataFrame:
    """Distributed extraction: ``(url, html) → (url, text)``."""
    ensure_py_files(docs.sparkSession)
    cols = docs.select("url", F.col(src_col).alias("src"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": [extract_text(s) for s in pdf["src"]],
                }
            )

    return cols.mapInPandas(run, schema=EXTRACT_SCHEMA)
