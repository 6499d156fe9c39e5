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


@udtf(returnType="doc_id bigint, score double")
class Bm25Udtf:
    """alix_bm25(index_dir, csv_terms, k, mode) → (doc_id, score)."""

    def eval(self, index_dir: str, terms: str, k: int = 10, mode: str = "and"):
        from alix_spark.query.wand import query_local

        term_list = [t for t in (terms or "").split(",") if t]
        for doc_id, score in query_local(index_dir, term_list, k=int(k), mode=mode):
            yield int(doc_id), float(score)


@udtf(returnType="doc_id bigint, tf bigint")
class PhraseUdtf:
    """alix_phrase(index_dir, csv_terms, slop, k) → (doc_id, tf)."""

    def eval(self, index_dir: str, terms: str, slop: int = 0, k: int = 10):
        from alix_spark.query.wand import _load_blocks, _phrase_match_docs

        term_list = [t for t in (terms or "").split(",") if t]
        # cached, republish-invalidated dataset handle — no directory
        # re-listing per invocation (wand serving-path cache)
        pdf = _load_blocks(index_dir, term_list, positions=True)
        hits: list[tuple[int, int]] = []
        for _shard, g in pdf.groupby("shard", sort=False):
            tb = {t: tg for t, tg in g.groupby("term", sort=False)}
            if len(tb) < len(set(term_list)):
                continue
            for doc, n, _dl in _phrase_match_docs(
                tb, term_list, int(slop), True
            ):
                hits.append((doc, n))
        hits.sort(key=lambda t: (-t[1], t[0]))
        for doc, n in hits[: int(k)]:
            yield int(doc), int(n)


@udtf(returnType="term string, cf bigint")
class SuggestUdtf:
    """alix_suggest(index_dir, prefix, k) → (term, cf) by corpus freq.

    Diacritic-insensitive (reference TermSuggest semantics): prefix
    match under 3 folded chars, infix at 3+."""

    def eval(self, index_dir: str, q: str, k: int = 10):
        from alix_spark.lexicometry.suggest import fold_query
        from alix_spark.query.wand import term_stats_dataset

        qf = fold_query(q or "")
        # cached handle; the folded scan itself stays full-vocabulary —
        # the reference's TermSuggest is likewise a whole-dictionary
        # folded string scan (TermSuggest.java:1-28)
        tbl = term_stats_dataset(index_dir).to_table(columns=["term", "cf"])
        rows = []
        for term, cf in zip(tbl["term"].to_pylist(), tbl["cf"].to_pylist()):
            folded = fold_query(term)
            ok = folded.startswith(qf) if len(qf) < 3 else qf in folded
            if ok:
                rows.append((term, cf))
        rows.sort(key=lambda t: (-t[1], t[0]))
        for term, cf in rows[: int(k)]:
            yield term, int(cf)


def register(spark: SparkSession) -> None:
    """Register all table functions on the session."""
    spark.udtf.register("alix_bm25", Bm25Udtf)
    spark.udtf.register("alix_phrase", PhraseUdtf)
    spark.udtf.register("alix_suggest", SuggestUdtf)
