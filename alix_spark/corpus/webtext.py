"""Deterministic synthetic Common-Crawl-style webtext corpus.

Produces the exact ``input_hint`` schema from BASELINE.json::

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Properties engineered for the engine's correctness surface:

- **Deterministic per doc_id** regardless of partitioning or cluster
  size: every row is generated from ``seed + doc_id`` only (counter-based
  numpy Generator), so local[8] and local[32] produce byte-identical
  corpora — prerequisite for the rank-identity scaling runs.
- **Round-trip contract**: ``html`` is built from ``text`` by
  :func:`text_to_html`, and :func:`alix_spark.analysis.chain.extract_text`
  inverts it byte-identically (the north rule's "byte-identical extracted
  text per url" invariant is asserted in tests over this pair).
- **French-flavored content** exercising the analysis chain: elisions
  (``l'``, ``d'``, ``qu'``…), enclitics (``-il``, ``-vous``…),
  abbreviations with dots (``M.``, ``etc.``, ``U.S.A.``), the 5 XML
  entities, numbers with separators, all-caps words, curly apostrophes,
  and multi-word expressions — mirroring what the reference tokenizer
  handles (reference: analysis/.../MarkupTokenizer.java:94-957).
- **Zipfian vocabulary** for realistic term skew (the north rule's
  salted-repartition motivation).

Scale note: generation runs inside ``mapInPandas`` — 10^12 documents is
just ``spark.range(N)`` with more partitions; no driver-side data.
"""

from __future__ import annotations

import html as _html
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.util import ensure_py_files

# Core French vocabulary (function words are drawn often → Zipf head).
_FUNCTION = [
    "le", "la", "les", "un", "une", "des", "de", "du", "et", "ou", "mais",
    "donc", "car", "ne", "pas", "plus", "très", "bien", "tout", "tous",
    "pour", "dans", "sur", "avec", "sans", "sous", "par", "est", "sont",
    "était", "fut", "sera", "a", "ont", "avait", "cette", "ce", "ces",
    "son", "sa", "ses", "leur", "nous", "vous", "ils", "elles", "on",
]
_NOUNS = [
    "maison", "ville", "homme", "femme", "enfant", "livre", "histoire",
    "temps", "jour", "nuit", "monde", "pays", "guerre", "paix", "amour",
    "idée", "œuvre", "état", "église", "roi", "peuple", "siècle", "art",
    "science", "nature", "raison", "esprit", "cœur", "âme", "liberté",
    "travail", "société", "gouvernement", "révolution", "philosophie",
    "langue", "littérature", "théâtre", "poésie", "musique", "peinture",
]
_VERBS = [
    "parle", "voit", "fait", "dit", "pense", "croit", "donne", "prend",
    "vient", "va", "sait", "peut", "veut", "doit", "trouve", "cherche",
    "montre", "écrit", "lit", "aime", "regarde", "écoute", "comprend",
]
_ADJ = [
    "grand", "petit", "beau", "jeune", "vieux", "nouveau", "ancien",
    "premier", "dernier", "seul", "même", "autre", "vrai", "faux",
    "noir", "blanc", "rouge", "profond", "clair", "obscur", "fort",
]
_ELIDED = [
    "l'homme", "l'idée", "d'abord", "d'ailleurs", "qu'il", "qu'elle",
    "n'est", "c'est", "s'il", "j'ai", "m'a", "t'a", "jusqu'à",
    "lorsqu'on", "puisqu'il", "quoiqu'elle", "presqu'île",
]
_ENCLITIC = ["dit-il", "est-elle", "a-t-on", "allez-vous", "crois-tu", "va-t-en"]
_ABBREV = ["M.", "Mme", "etc.", "U.S.A.", "J.-J.", "cf.", "p.", "chap."]
_PROPN = [
    "Paris", "France", "Victor", "Hugo", "Rousseau", "Voltaire",
    "Napoléon", "Seine", "Lyon", "Molière", "Racine", "Balzac",
]
_CAPS = ["CNRS", "UNESCO", "SNCF", "TGV", "ONU"]
_MWE = ["chemin de fer", "pomme de terre", "coup d'œil", "tout à fait", "au fur et à mesure"]
_SPECIAL = ["Tom & Jerry", "x < y", "a > b", '"citation"', "45°", "3,14", "1.250", "-42"]

_LANGS = np.array(["fr", "fr", "fr", "fr", "fr", "fr", "en", "de", "es", "fr"])
_HOSTS = [
    "gallica.example.org", "persee.example.fr", "revues.example.com",
    "archives.example.net", "bibliotheque.example.fr", "journal.example.org",
]

# pools with draw weights (Zipf-ish mixture)
_POOLS: list[tuple[list[str], float]] = [
    (_FUNCTION, 0.42),
    (_NOUNS, 0.22),
    (_VERBS, 0.12),
    (_ADJ, 0.08),
    (_ELIDED, 0.05),
    (_PROPN, 0.04),
    (_ENCLITIC, 0.02),
    (_ABBREV, 0.02),
    (_MWE, 0.01),
    (_CAPS, 0.01),
    (_SPECIAL, 0.01),
]
_POOL_P = np.array([p for _, p in _POOLS])
_POOL_P = _POOL_P / _POOL_P.sum()


def _doc_text(rng: np.random.Generator, doc_scale: int = 1) -> str:
    """One document: ``doc_scale`` × (1-8) paragraphs of 1-6 sentences
    of 4-18 draws. ``doc_scale=1`` ≈ 100 tokens (unit-test size);
    real Common-Crawl pages average 10-50× that — pass a larger scale
    for representative benchmarks."""
    paragraphs = []
    for _ in range(int(rng.integers(1, 9)) * doc_scale):
        sentences = []
        for _ in range(int(rng.integers(1, 7))):
            n = int(rng.integers(4, 19))
            pool_ids = rng.choice(len(_POOLS), size=n, p=_POOL_P)
            words = []
            for pid in pool_ids:
                pool = _POOLS[pid][0]
                # Zipf rank-weighted draw inside the pool
                r = int(rng.zipf(1.6)) - 1
                words.append(pool[r % len(pool)])
            words[0] = words[0][0].upper() + words[0][1:]
            end = rng.choice([".", ".", ".", " ?", " !", "…"])
            sentences.append(" ".join(words) + end)
        paragraphs.append(" ".join(sentences))
    return "\n".join(paragraphs)


def text_to_html(text: str) -> str:
    """Wrap plain text in deterministic Common-Crawl-ish HTML.

    Inverse of :func:`alix_spark.analysis.chain.extract_text`: the first
    text line becomes the ``<h1>`` (and the ``<head>`` title, which
    extraction excludes); every following line becomes one ``<p>``
    (entity-escaped).
    """
    lines = text.split("\n")
    title = lines[0]
    paras = "".join(
        f"<p class=\"txt\">{_html.escape(line, quote=False)}</p>\n"
        for line in lines[1:]
    )
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><meta charset=\"utf-8\"/><title>{_html.escape(title, quote=False)}</title>"
        "<script>var x = 1 < 2;</script>"
        "<style>.txt { color: #222; }</style>"
        "</head>\n"
        f"<body>\n<h1>{_html.escape(title, quote=False)}</h1>\n"
        f"{paras}"
        "<!-- crawled by alix_spark synthetic generator -->\n"
        "</body></html>\n"
    )


def _gen_batch(doc_ids: np.ndarray, seed: int, doc_scale: int = 1) -> pd.DataFrame:
    rows = []
    for doc_id in doc_ids:
        rng = np.random.default_rng(seed + int(doc_id) * 2654435761 % (1 << 63))
        lang = str(_LANGS[int(rng.integers(0, len(_LANGS)))])
        host = _HOSTS[int(rng.integers(0, len(_HOSTS)))]
        url = f"https://{host}/doc/{int(doc_id):012d}"
        # warc_ts: deterministic second offset inside 2024
        ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(
            seconds=int(rng.integers(0, 365 * 24 * 3600))
        )
        title_words = [
            _NOUNS[int(rng.integers(0, len(_NOUNS)))],
            "de",
            _PROPN[int(rng.integers(0, len(_PROPN)))],
        ]
        title = " ".join(title_words)
        title = title[0].upper() + title[1:]
        text = title + "\n" + _doc_text(rng, doc_scale)
        html_s = text_to_html(text)
        rows.append(
            (url, ts.tz_localize(None), html_s.encode("utf-8"), text, lang)
        )
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def webtext(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    doc_scale: int = 1,
) -> DataFrame:
    """Generate the synthetic corpus as a distributed DataFrame."""
    ensure_py_files(spark)
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 1)
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), seed, doc_scale)

    return base.mapInPandas(gen, schema=SCHEMA)


def write_corpus(spark: SparkSession, n_docs: int, out: str, seed: int = 42) -> None:
    webtext(spark, n_docs, seed).write.mode("overwrite").parquet(out)


def url_ranks(corpus: DataFrame) -> DataFrame:
    """Deterministic dense docIDs ``(url, doc_id)``: rank of url in url
    byte order (SURVEY §7 hard part 6 — stable across cluster sizes).

    Scale note: a global ``row_number`` window would funnel the whole
    corpus through ONE task. Instead: range-partition the url column
    ONLY (parallel global sort over skinny rows — the wide html payload
    never enters the sort), then partition-local row_number offset by
    the preceding partitions' counts — every stage parallel, identical
    ids at any parallelism (asserted in tests). Shared implementation:
    util.dense_ranks (also used for the index term dictionary)."""
    from alix_spark.util import dense_ranks

    return dense_ranks(corpus, "url", "doc_id")


def doc_ids(corpus: DataFrame) -> DataFrame:
    """Corpus with dense docIDs attached (join on url).

    Prefer tokenizing by url first and joining ids to the *token* table
    (skinny rows) — joining here shuffles the html payload; kept for
    small-corpus convenience and tests."""
    return corpus.join(url_ranks(corpus), "url").select(
        "doc_id", "url", "warc_ts", "text", "lang", "html"
    )
