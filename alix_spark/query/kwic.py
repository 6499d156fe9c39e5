"""KWIC concordance: keyword-in-context lines around term matches.

Reference: the concordance path of ``OpResults`` — span matches merged
into snippets (DocSnippets.java:47-80) and rendered as KWIC with left
and right context (ResultsSnippets.java:63, SnippetHit.java). Positions
are the token channel: stop words leave gaps, so context windows are
position-based like the reference's rail windows (TermRail.java:34-97).

Spark shape: the match side is a tiny filter (pivot occurrences), so it
broadcasts into a positional band self-join of the token table; context
assembly is sort_array(collect_list(struct(pos, term))) — deterministic
ordering, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kwic(
    tok: DataFrame,
    term: str,
    width: int = 5,
    limit: int = 100,
) -> DataFrame:
    """(doc_id, pos, left_ctx, right_ctx) for each occurrence of
    ``term``; contexts are space-joined terms in position order within
    ±width. Ordered (doc_id, pos) with a deterministic limit."""
    from alix_spark.util import maybe_broadcast

    # lazily pinned: maybe_broadcast's count below materializes the
    # hits ONCE and the band join reuses the pinned partitions —
    # without the pin the count re-ran the full upstream rail decode
    # as an extra job per concordance call (review batch 34). The
    # count-guard itself must STAY: this is a BAND join (range
    # predicate), where an oversized broadcast side degrades to a
    # nested-loop plan, not an AQE shuffle join.
    hits = (
        tok.filter(F.col("term") == term)
        .select(F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos"))
        .localCheckpoint(eager=False)
    )
    # the hit's own row stays IN the band: it falls into neither the
    # left nor the right when() bucket, so it contributes nothing to
    # the contexts — but it guarantees every occurrence a group row,
    # which previously cost a second full band join + aggregation via
    # an anti-join/union for context-less hits
    band = (
        tok.alias("t")
        .join(
            maybe_broadcast(hits),  # stop-word-grade terms must not broadcast
            (F.col("t.doc_id") == F.col("h_doc"))
            & (F.col("t.pos") >= F.col("h_pos") - width)
            & (F.col("t.pos") <= F.col("h_pos") + width),
        )
        .select(
            F.col("h_doc").alias("doc_id"),
            F.col("h_pos").alias("pos"),
            F.col("t.pos").alias("c_pos"),
            F.col("t.term").alias("c_term"),
        )
    )
    sides = band.groupBy("doc_id", "pos").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("c_pos") < F.col("pos"),
                            F.struct(F.col("c_pos").alias("p"), F.col("c_term").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
        ).alias("left_ctx"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("c_pos") > F.col("pos"),
                            F.struct(F.col("c_pos").alias("p"), F.col("c_term").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
        ).alias("right_ctx"),
    )
    return sides.orderBy("doc_id", "pos").limit(limit)
