"""Windowed co-occurrence around a pivot term.

Reference: TopCoocSnippets.java:58-360 — collect term counts in a
±left/right token window around every span-match position, rank the
resulting population (pivot occurrences excluded,
TopTerms.populationExclude).

Spark shape: self-join of the token table on doc_id with a positional
band predicate. The pivot side is tiny (only matching positions) so it
broadcasts; the band predicate keeps the join selective. At 100 TB the
token table join is pruned by doc_id partition + the pivot semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooc_counts(
    tok: DataFrame,
    pivot: str,
    left: int = 5,
    right: int = 5,
    top: int = 50,
) -> DataFrame:
    """(term, freq, docs) of terms co-occurring within [pos-left,
    pos+right] of any occurrence of `pivot`, pivot itself excluded.
    Overlapping windows count a neighbour once per (doc, position)
    pair — i.e. plain band-join multiplicity, then dedup on
    (doc_id, pos) of the neighbour so each token occurrence counts at
    most once (merged-snippet semantics, TopCoocSnippets.java:58-80).
    """
    hits = tok.filter(F.col("term") == pivot).select(
        F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos")
    )
    neigh = (
        tok.alias("t")
        .join(
            F.broadcast(hits),
            (F.col("t.doc_id") == F.col("h_doc"))
            & (F.col("t.pos") >= F.col("h_pos") - left)
            & (F.col("t.pos") <= F.col("h_pos") + right)
            & (F.col("t.pos") != F.col("h_pos")),
        )
        .select("t.doc_id", "t.pos", "t.term")
        .distinct()
    )
    return (
        neigh.filter(F.col("term") != pivot)
        .groupBy("term")
        .agg(F.count("*").alias("freq"), F.countDistinct("doc_id").alias("docs"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top)
    )
