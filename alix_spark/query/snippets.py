"""Snippet extraction and ranking around query matches.

Reference: span matches are merged into snippet windows
(DocSnippets.java:47-80), each window is scored by the sum of
corpus-level theme weights of the DISTINCT terms it contains
(SnippetScorer.ThemeWords — common/.../snippets/SnippetScorer.java:1-60,
weights = TermStats.termWeights with the BM25 idf-exponent scorer,
OpResults.java:98-101), and the best windows across all docs are kept
by a global top-K (TopSnippetCollector.java:28).

Spark shape: match positions broadcast into a positional band join of
the token table (the rail window, TermRail.java:34-97); the per-window
score is one groupBy over distinct (window, term) with a broadcast
weights join; the global top-K is orderBy().limit() with the
(score desc, doc asc, pos asc) tie-break."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import round6


def snippet_topk(
    tok: DataFrame,
    weights: DataFrame,
    query_terms: list[str],
    width: int = 5,
    k: int = 10,
) -> DataFrame:
    """Top-k snippet windows for the query terms.

    tok:     (doc_id, pos, term) token table
    weights: (term, score) corpus theme weights
             (lexicometry.theme.theme_weights output)
    Returns (doc_id, pos, n_terms, score): window center (the match
    position), distinct scored terms in the ±width window, and the
    theme-weight sum; ordered score desc, doc_id asc, pos asc."""
    from alix_spark.util import maybe_broadcast

    # both counted sides lazily pinned: maybe_broadcast's guard count
    # materializes each ONCE instead of re-running the token scan and
    # the full theme-weights aggregation as extra jobs (review batch
    # 34; the band join below needs the guard — see kwic.py)
    hits = (
        tok.filter(F.col("term").isin(sorted(set(query_terms))))
        .select(F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos"))
        .localCheckpoint(eager=False)
    )
    window_terms = (
        tok.alias("t")
        .join(
            maybe_broadcast(hits),  # guarded: common query terms
            (F.col("t.doc_id") == F.col("h_doc"))
            & (F.col("t.pos") >= F.col("h_pos") - width)
            & (F.col("t.pos") <= F.col("h_pos") + width),
        )
        .select(
            F.col("h_doc").alias("doc_id"),
            F.col("h_pos").alias("pos"),
            F.col("t.term").alias("term"),
        )
        .distinct()  # each distinct term counts once per window (ThemeWords)
    )
    scored = (
        window_terms.join(
            maybe_broadcast(
                weights.select("term", "score").localCheckpoint(eager=False)
            ),
            "term",
        )  # guarded: a web-scale vocabulary's weights are not driver-size
        .groupBy("doc_id", "pos")
        .agg(
            F.count("*").alias("n_terms"),
            round6(F.sum("score")).alias("score"),
        )
    )
    return scored.orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("pos")
    ).limit(k)


def hilite(src: str, query_terms: list[str], open_tag: str = "<mark>",
           close_tag: str = "</mark>", tagger=None) -> str:
    """Full-document highlight by match offsets (reference
    HiliteSnippets.java:60-131: string splice at the match offsets).

    The source runs through the SAME chain as the index
    (``run_chain(with_offsets=True)`` — not a hand-copied stage list
    that could drift), so query terms hit the document exactly where
    the index would match them: the matched term is the final
    INDEXED form (lemma-projected), and the highlight splices its
    source span; ``tagger`` selects the maxent path like the build.
    Only indexable tokens can highlight — stopwords and cleanup-dropped
    tokens don't match, mirroring what the index can actually find.
    Matching is CASE-SENSITIVE like every index-side lookup (WAND,
    kwic, member): a lowercased comparison here would highlight
    'Paris' for a query the search layer reported as matching
    nothing."""
    from alix_spark.analysis.filters import run_chain
    from alix_spark.analysis.tokenizer import tokenize

    want = set(query_terms)
    spans = []
    for term, _pos, _tag, _lemma, start, end, _orth in run_chain(
        tokenize(src), tagger=tagger, with_offsets=True
    ):
        if term in want:
            spans.append((start, end))
    # splice right-to-left so earlier offsets stay valid
    out = src
    for start, end in sorted(spans, reverse=True):
        out = out[:start] + open_tag + out[start:end] + close_tag + out[end:]
    return out
