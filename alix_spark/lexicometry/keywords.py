"""Per-document keyword panels.

Reference: cli/src/java/com/github/oeuvres/alix/cli/Keywords.java
(:70-101): for every document, the top-10 terms under several
FormEnum scorings — raw frequency (Distrib.OCCS/FREQ), a doc-vs-corpus
G test (Distrib.G), and frequency·IDF (Distrib.FREQ_IDF) — the report
librarians use to caption documents.

Spark shape: one join tree over (post ⋈ dstats ⋈ broadcast tstats ⋈
broadcast 1-row cstats), all three measures computed as column
expressions in the SAME pass, then one window rank per measure — the
token table is never rescanned per measure. The rank window partitions
by doc_id: partition-local at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alix_spark.util import maybe_broadcast, round6

MEASURES = ("freq", "g", "freq_idf")


def doc_keywords(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    top: int = 10,
) -> DataFrame:
    """(doc_id, measure, rank, term, score) — ``top`` terms per doc per
    measure, ties broken term asc (TopArray contract).

    Measures (the reference's Distrib scorings named in Keywords.java;
    the Doc.formEnum class itself is absent from the snapshot, so the
    formulas are pinned here):
      freq      tf
      g         one-cell G vs the corpus expectation E = cf·dl/T:
                tf·ln(tf/E) — naturally positive for over-represented
                terms and negative for repulsed ones, so repulsed
                terms SINK in the descending panel (deliberately NOT
                SimilarityGsimple's always-positive flip, which would
                float repulsed terms to the top of a keyword list)
      freq_idf  tf · ln(1 + (N − df + 0.5)/(df + 0.5))
    """
    t = F.col("corpus_tokens").cast("double")
    n = F.col("corpus_docs").cast("double")
    tf = F.col("tf").cast("double")
    e = F.col("cf").cast("double") * F.col("dl").cast("double") / t
    g = tf * F.log(tf / e)
    idf = F.log(
        F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        post.join(dstats.select("doc_id", "dl"), "doc_id")
        # count-guarded: a web-scale vocabulary must not broadcast
        .join(maybe_broadcast(tstats.select("term", "df", "cf")), "term")
        .crossJoin(
            F.broadcast(cstats.select("corpus_docs", "corpus_tokens"))
        )
        .select(
            "doc_id",
            "term",
            tf.alias("freq"),
            g.alias("g"),
            (tf * idf).alias("freq_idf"),
        )
    )
    panels = []
    for m in MEASURES:
        w = Window.partitionBy("doc_id").orderBy(
            F.desc(m), F.asc("term")
        )
        panels.append(
            scored.select(
                "doc_id",
                F.lit(m).alias("measure"),
                # long: row_number is INT here, BIGINT in DuckDB
                F.row_number().over(w).cast("long").alias("rank"),
                "term",
                round6(F.col(m).cast("double")).alias("score"),
            ).filter(F.col("rank") <= top)
        )
    out = panels[0]
    for p in panels[1:]:
        out = out.unionByName(p)
    return out.orderBy("doc_id", "measure", "rank")
