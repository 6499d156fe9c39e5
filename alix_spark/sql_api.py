"""SQL surface: the query engine as Spark SQL table functions.

The reference exposes its 9 query operations over an HTTP servlet API
(web/.../AlixServlet.java:124-165, Op.dispatch). The Spark-native
equivalent of "an API any client can call" is SQL: these Python UDTFs
register the search paths as table functions, so any SQL client of the
session can run

    SELECT * FROM alix_bm25('<index_dir>', 'hash,join', 10, 'and');
    SELECT * FROM alix_phrase('<index_dir>', 'table,scan', 0, 10);

against a built :mod:`alix_spark.index.segments` index. Execution uses
the pyarrow serving path (block-pruned reads + block-max WAND on the
evaluating node — no nested Spark jobs inside the UDTF).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


def _csv_terms(terms: str | None) -> list[str]:
    """'a, b' → ['a', 'b'] — natural SQL input carries spaces, and an
    unstripped ' b' silently matches nothing in the dictionary."""
    return [t.strip() for t in (terms or "").split(",") if t.strip()]


@udtf(returnType="doc_id bigint, score double")
class Bm25Udtf:
    """alix_bm25(index_dir, csv_terms, k, mode) → (doc_id, score)."""

    def eval(self, index_dir: str, terms: str, k: int = 10, mode: str = "and"):
        from alix_spark.query.wand import query_local

        term_list = _csv_terms(terms)
        for doc_id, score in query_local(index_dir, term_list, k=int(k), mode=mode):
            yield int(doc_id), float(score)


@udtf(returnType="doc_id bigint, tf bigint")
class PhraseUdtf:
    """alix_phrase(index_dir, csv_terms, slop, k) → (doc_id, tf)."""

    def eval(self, index_dir: str, terms: str, slop: int = 0, k: int = 10):
        from alix_spark.query.wand import _load_blocks, phrase_shard_matches

        if int(k) <= 0:
            # hits[:negative] would DROP rows from the end instead of
            # yielding none (the wand k<=0 guard, review batch 29,
            # did not cover this UDTF's direct slice)
            return
        term_list = _csv_terms(terms)
        # cached, republish-invalidated dataset handle — no directory
        # re-listing per invocation (wand serving-path cache); the
        # shard loop is wand's shared one
        pdf = _load_blocks(index_dir, term_list, positions=True)
        hits = [
            (doc, n)
            for doc, n, _dl in phrase_shard_matches(
                pdf, term_list, int(slop), True
            )
        ]
        hits.sort(key=lambda t: (-t[1], t[0]))
        for doc, n in hits[: int(k)]:
            yield int(doc), int(n)


@udtf(returnType="term string, cf bigint")
class SuggestUdtf:
    """alix_suggest(index_dir, prefix, k) → (term, cf) by corpus freq.

    Diacritic-insensitive (reference TermSuggest semantics): prefix
    match under 3 folded chars, infix at 3+."""

    def eval(self, index_dir: str, q: str, k: int = 10):
        # the SHARED fold+rank serving helper (publish-token-keyed,
        # LRU-bounded cache; same backend as engine.suggest and the
        # HTTP layer — one place owns the <3-prefix/≥3-infix rule and
        # the cf-desc/term-asc ranking); k<=0 yields no rows
        from alix_spark.lexicometry.suggest import suggest_local

        for term, cf in suggest_local(index_dir, q, top=int(k)):
            yield term, int(cf)


@udtf(returnType="term string, dist bigint, cf bigint")
class SpellUdtf:
    """alix_spell(index_dir, word, max_dist, k) → (term, dist, cf):
    spelling corrections against the index dictionary (reference
    cli/SpellSugg.java workflow; dist asc, cf desc, term asc)."""

    def eval(self, index_dir: str, q: str, max_dist: int = 2, k: int = 10):
        from alix_spark.lexicometry.suggest import suggest_spell_local

        for term, dist, cf in suggest_spell_local(
            index_dir, q, max_dist=int(max_dist), top=int(k)
        ):
            yield term, int(dist), int(cf)


def register(spark: SparkSession) -> None:
    """Register all table functions on the session."""
    from alix_spark.util import ensure_py_files

    # UDTF eval bodies import alix_spark inside executor Python
    # workers — ship the package, or the functions only work when the
    # driver's cwd IS the repo (CLAUDE.md contract rule)
    ensure_py_files(spark)
    spark.udtf.register("alix_bm25", Bm25Udtf)
    spark.udtf.register("alix_phrase", PhraseUdtf)
    spark.udtf.register("alix_suggest", SuggestUdtf)
    spark.udtf.register("alix_spell", SpellUdtf)
