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
        from alix_spark.lexicometry.suggest import fold_query

        qf = fold_query(q or "")
        # the folded vocabulary is computed ONCE per publish (cached
        # against the dataset handle's identity, which _datasets swaps
        # on republish) — per-call work is one scan over it, not a
        # re-fold of every term (lateral use is O(rows·V) either way,
        # but without the O(V) string-translate per row)
        for term, folded, cf in _folded_vocab(index_dir):
            ok = folded.startswith(qf) if len(qf) < 3 else qf in folded
            if ok:
                yield term, int(cf)
                k -= 1
                if k <= 0:
                    return


_FOLDED_VOCAB: dict[str, tuple[object, list[tuple[str, str, int]]]] = {}


def _folded_vocab(index_dir: str) -> list[tuple[str, str, int]]:
    """(term, folded_term, cf) for the whole dictionary, pre-sorted by
    (cf desc, term asc) so a scan in order IS the ranking; invalidated
    when the serving cache swaps its dataset handle (republish)."""
    from alix_spark.lexicometry.suggest import fold_query
    from alix_spark.query.wand import term_stats_dataset

    dset = term_stats_dataset(index_dir)
    hit = _FOLDED_VOCAB.get(index_dir)
    if hit is not None and hit[0] is dset:
        return hit[1]
    tbl = dset.to_table(columns=["term", "cf"])
    rows = sorted(
        (
            (term, fold_query(term), int(cf))
            for term, cf in zip(
                tbl["term"].to_pylist(), tbl["cf"].to_pylist()
            )
        ),
        key=lambda t: (-t[2], t[0]),
    )
    _FOLDED_VOCAB[index_dir] = (dset, rows)
    return rows


def register(spark: SparkSession) -> None:
    """Register all table functions on the session."""
    spark.udtf.register("alix_bm25", Bm25Udtf)
    spark.udtf.register("alix_phrase", PhraseUdtf)
    spark.udtf.register("alix_suggest", SuggestUdtf)
