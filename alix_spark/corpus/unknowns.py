"""Ranked unknown-token report — the dictionary-tuning workflow.

Reference: cli/src/java/com/github/oeuvres/alix/cli/Unknowns.java:44-134
(the exact workflow behind /root/reference/piaget-errors.txt): analyze a
corpus, keep word tokens the dictionaries cannot account for, rank by
frequency. Lexicometry users run this routinely to find OCR damage and
missing lexicon entries.

Spark shape: surface-shape filters are column expressions on the token
table, the dictionary test is ONE anti-join (broadcast while the
dictionary is genuinely small, shuffle otherwise), and the report is a
single partial-aggregated groupBy — no Python in the hot path, no
driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import maybe_broadcast


def _wordish(col: F.Column) -> F.Column:
    """The reference's surface-shape gate (Unknowns.java:120-127):
    length >= 3, last char neither a digit nor an apostrophe (elision
    artifacts)."""
    return (
        # ONE character class (review batch 35): two separate rlike
        # evaluations per token doubled the regex work on the hot
        # corpus-scale filter; the oracle collapses identically
        (F.length(col) >= 3)
        & ~col.rlike("[0-9'’]$")
    )


def unknown_tokens(
    tok: DataFrame,
    known: DataFrame,
    term_col: str = "term",
    top: int = 2000,
) -> DataFrame:
    """(term, freq, docs) report of tokens absent from ``known``.

    ``tok``: token table with (doc_id, ``term_col``); ``known``: a
    one-column dictionary relation (``term``) — lexicon forms, lemmas,
    or any corpus-derived vocabulary. ``top`` mirrors the reference's
    Top<Chain>(2000) (Unknowns.java:81). Ties rank term asc for a
    deterministic report."""
    t = tok.select("doc_id", F.col(term_col).alias("term")).filter(
        _wordish(F.col("term"))
    )
    dic = maybe_broadcast(known.select("term").distinct())
    return (
        t.join(dic, "term", "left_anti")
        .groupBy("term")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top)
    )


def unknowns_from_chain(tok: DataFrame, top: int = 2000) -> DataFrame:
    """The report over analysis-chain output (``analyzed_tokens``
    non-light: doc_id, pos, term, pos_tag, lemma).

    Mirrors the reference's stream test (Unknowns.java:118-128): skip
    tokens the dictionaries DID account for (non-empty lemma channel —
    FilterLemmatize hit), skip names (the NAME tag group → PROPN here);
    stopwords and non-word types are already dropped by the chain
    itself. What remains is exactly the piaget-errors.txt population:
    word-shaped tokens no dictionary explains."""
    unk = tok.filter(
        (F.coalesce(F.col("lemma"), F.lit("")) == "")
        & (F.col("pos_tag") != "PROPN")
        & _wordish(F.col("term"))
    )
    return (
        unk.groupBy("term")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(top)
    )
