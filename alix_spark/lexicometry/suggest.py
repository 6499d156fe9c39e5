"""Term completion: prefix for short inputs, infix otherwise, ranked by
corpus frequency.

Reference: TermSuggest.java:1-28,141 — ASCII-folded dictionary scan,
prefix match for <3 chars, infix for >=3; ranked by population freq.
Spark shape: the vocabulary is small relative to the corpus, so this is
a filter + top-k over term_stats (broadcast-scale at query time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest(tstats: DataFrame, q: str, top: int = 20) -> DataFrame:
    """(term, cf) completions for q over a (term, df, cf) stats table."""
    q = q.lower()
    if len(q) < 3:
        pred = F.col("term").startswith(q)
    else:
        pred = F.col("term").contains(q)
    return (
        tstats.filter(pred)
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )


def suggest_population(
    tok: DataFrame, pop_docs: DataFrame, q: str, top: int = 20
) -> DataFrame:
    """Population-scoped completion (reference TermSuggest.java:141:
    completions are ranked by the term's frequency inside the CURRENT
    doc population — a filtered sub-corpus — not the global corpus).

    ``tok``: (doc_id, term) token table; ``pop_docs``: (doc_id) of the
    population. The population is a filter result (usually ≪ corpus),
    broadcast onto the token scan; ranking freq is computed on the
    surviving tokens only. Matching is diacritic/case-folded exactly
    like :func:`suggest_folded` — the reference folds the suggest
    dictionary once, so the population-scoped path must not silently
    lose accented or capitalized terms the global path returns."""
    qf = fold_query(q)
    folded = _fold_expr(F.col("term"))
    if len(qf) < 3:
        pred = folded.startswith(qf)
    else:
        pred = folded.contains(qf)
    return (
        tok.join(F.broadcast(pop_docs.select("doc_id")), "doc_id")
        .filter(pred)
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )


# explicit diacritic fold map — identical char-for-char `translate` on
# Spark and DuckDB (the reference ASCII-folds with Lucene's
# ASCIIFoldingFilter; this 1:1 table covers the French repertoire, with
# the ligatures œ/æ folded to their first letter on both sides)
FOLD_SRC = "àâäáãéèêëíìîïñóòôöõúùûüçýÿœæÀÂÄÁÃÉÈÊËÍÌÎÏÑÓÒÔÖÕÚÙÛÜÇÝŸŒÆ"
FOLD_DST = "aaaaaeeeeiiiinooooouuuucyyoaAAAAAEEEEIIIINOOOOOUUUUCYYOA"
# the uppercase table must cover every lowercase entry's uppercase (Ÿ
# included): only then do translate∘lower (the DuckDB oracle's order)
# and lower∘translate (the Spark column order) agree on every input
assert len(FOLD_SRC) == len(FOLD_DST)
_FOLD_MAP = {ord(s): d for s, d in zip(FOLD_SRC, FOLD_DST)}


def _fold_expr(col):
    return F.lower(F.translate(col, FOLD_SRC, FOLD_DST))


def fold_query(q: str) -> str:
    return q.translate(_FOLD_MAP).lower()


def suggest_folded(tstats: DataFrame, q: str, top: int = 20) -> DataFrame:
    """Diacritic-insensitive completion (reference TermSuggest.java:1-28:
    terms ASCII-folded at index time; query folded; prefix match for <3
    folded chars, infix for ≥3; ranked by corpus freq)."""
    qf = fold_query(q)
    folded = tstats.withColumn("folded", _fold_expr(F.col("term")))
    if len(qf) < 3:
        pred = F.col("folded").startswith(qf)
    else:
        pred = F.col("folded").contains(qf)
    return (
        folded.filter(pred)
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )
