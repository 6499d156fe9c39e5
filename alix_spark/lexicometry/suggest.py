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
