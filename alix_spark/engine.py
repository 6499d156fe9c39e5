"""User-facing engine facade: the reference's query operations, one
object.

The reference serves 9 operations over ``/{index}/{op}`` (AlixServlet +
Op.dispatch, web/.../AlixServlet.java:124-165): results (concordance /
BM25), terms (ranked/keyness), chrono (histogram), cooc, clades (CA
map), suggest, plus ingest tooling. This facade binds them to one
built corpus + index so a reference user can switch call-for-call:

    eng = AlixEngine.build(spark, corpus_df, "/data/alix_index")
    eng.search("l'homme \\"chemin de fer\\" vil*")   # parsed query → top-k
    eng.concordance("ville")                         # KWIC lines
    eng.terms()                                      # theme ranking
    eng.terms(focus=F.col("lang") == "fr")           # keyness vs rest
    eng.chrono()                                     # time histogram
    eng.cooc("ville")                                # windowed cooc
    eng.clades()                                     # CA factor map
    eng.suggest("vil")                               # completion

All heavy state lives in the index directory (frozen, republishable —
LuceneIndex.java:36-43 semantics); the facade itself is stateless
glue over :mod:`alix_spark.index`, :mod:`alix_spark.query` and
:mod:`alix_spark.lexicometry`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_tokens
from alix_spark.corpus.webtext import url_ranks
from alix_spark.index import segments
from alix_spark.lexicometry import cooc as cooc_mod
from alix_spark.lexicometry import keyness as keyness_mod
from alix_spark.lexicometry import suggest as suggest_mod
from alix_spark.lexicometry import svd as svd_mod
from alix_spark.lexicometry import theme as theme_mod
from alix_spark.query import kwic as kwic_mod
from alix_spark.query import parser, wand


class AlixEngine:
    """A frozen index + its source corpus, queryable."""

    def __init__(self, spark: SparkSession, index_dir: str, corpus: DataFrame | None = None):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = segments.read_meta(index_dir)
        self.corpus = corpus
        self._tok: DataFrame | None = None
        self._vocab: set[str] | None = None

    # ------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        index_dir: str,
        n_shards: int = 16,
        tagger_path: str | None = None,
        resume: bool = False,
    ) -> "AlixEngine":
        """Corpus table (input_hint schema) → analysis chain →
        compressed sharded index → engine handle."""
        tok_url = analyzed_tokens(
            corpus, id_col="url", id_type="string", light=True,
            tagger_path=tagger_path,
        )
        ids = url_ranks(corpus)
        tok = tok_url.join(ids, "url").select("doc_id", "pos", "term")
        segments.build_index(spark, tok, index_dir, n_shards=n_shards, resume=resume)
        return cls(spark, index_dir, corpus)

    # ---------------------------------------------------- token access

    def tokens(self) -> DataFrame:
        """Analyzed token table with dense docIDs (cached)."""
        if self._tok is None:
            if self.corpus is None:
                raise ValueError("engine opened without a corpus table")
            tok_url = analyzed_tokens(self.corpus, id_col="url", id_type="string")
            ids = url_ranks(self.corpus)
            self._tok = (
                tok_url.join(ids, "url")
                .select("doc_id", "pos", "term", "pos_tag", "lemma")
                .persist()
            )
        return self._tok

    def vocabulary(self) -> set[str]:
        if self._vocab is None:
            ts = self.spark.read.parquet(os.path.join(self.index_dir, "term_stats"))
            self._vocab = {r["term"] for r in ts.select("term").collect()}
        return self._vocab

    # ----------------------------------------------------------- search

    def search(self, q: str, k: int = 10) -> list[tuple[int, float]]:
        """Parsed query → BM25 top-k (serving path). Bare terms AND;
        wildcards expand; a quoted phrase routes to the positional
        matcher; OR groups use disjunctive WAND."""
        clauses = parser.resolve(parser.parse(q), self.vocabulary())
        if not clauses:
            return []
        phrase = [c for c in clauses if isinstance(c, parser.PhraseClause)]
        if phrase and len(clauses) == 1:
            rows = wand.phrase_topk(
                self.spark, self.index_dir, phrase[0].terms,
                slop=phrase[0].slop, ordered=phrase[0].ordered, k=k,
            ).collect()
            return [(r["doc_id"], r["score"]) for r in rows]
        terms: list[str] = []
        mode = "and"
        for c in clauses:
            if isinstance(c, parser.TermClause):
                terms.append(c.term)
            elif isinstance(c, parser.OrClause):
                terms.extend(c.terms)
                mode = "or" if len(clauses) == 1 else mode
            elif isinstance(c, parser.PhraseClause):
                terms.extend(c.terms)
        return wand.query_local(self.index_dir, terms, k=k, mode=mode)

    def concordance(self, term: str, width: int = 5, limit: int = 100) -> DataFrame:
        """KWIC lines (reference OpResults concordance view)."""
        return kwic_mod.kwic(self.tokens(), term, width=width, limit=limit)

    # ------------------------------------------------------ lexicometry

    def _bm25_inputs(self):
        from alix_spark.index import simple

        tok = self.tokens().select("doc_id", "pos", "term")
        return (
            simple.postings(tok),
            simple.doc_stats(tok).select("doc_id", "dl"),
            simple.term_stats(tok),
            simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
        )

    def terms(self, focus=None, scorer: str = "g2", top: int = 50) -> DataFrame:
        """Ranked terms: theme weights for the whole corpus, or keyness
        focus-vs-rest when a focus predicate over the corpus is given
        (reference OpTerms branches 1/2)."""
        if focus is None:
            return theme_mod.theme_weights(*self._bm25_inputs(), top=top)
        focus_docs = (
            self.corpus.filter(focus)
            .join(url_ranks(self.corpus), "url")
            .select("doc_id")
        )
        return keyness_mod.keyness(
            self.tokens().select("doc_id", "term"), focus_docs, scorer, top=top
        )

    def chrono(self) -> DataFrame:
        """Docs per month of crawl date (reference OpChrono)."""
        return (
            self.corpus.groupBy(
                F.year("warc_ts").alias("y"), F.month("warc_ts").alias("m")
            )
            .agg(F.count("*").alias("docs"))
            .orderBy("y", "m")
        )

    def cooc(self, pivot: str, left: int = 5, right: int = 5, top: int = 50) -> DataFrame:
        return cooc_mod.cooc_counts(
            self.tokens().select("doc_id", "pos", "term"), pivot,
            left=left, right=right, top=top,
        )

    def clades(self, top_terms: int = 100, axes: int = 2):
        """Correspondence-analysis factor map over lang parts
        (reference OpClades)."""
        parts = (
            self.corpus.select("url", F.col("lang").alias("part"))
            .join(url_ranks(self.corpus), "url")
            .select("doc_id", "part")
        )
        return svd_mod.ca_map(
            self.tokens().select("doc_id", "term"), parts,
            top_terms=top_terms, axes=axes,
        )

    def suggest(self, q: str, top: int = 20) -> DataFrame:
        ts = self.spark.read.parquet(os.path.join(self.index_dir, "term_stats"))
        return suggest_mod.suggest_folded(ts, q, top=top)
