"""Partitioned keyness: focus part vs every other part, pairwise.

Exact port of the reference's ``PartScorer.LogLikelihood`` (strict
dominance: min of pairwise signed G², PartScorer.java:542-592) and
``PartScorer.LogLikelihoodTail`` (mean of the worst ``ceil(0.2·n)``
pairwise scores, :706-779 — the default scorer for date-partitioned
keyness, web/.../OpTerms.java:130-134), including:

- signed pairwise 2×2 G² with zero-cells contributing 0 and the sign
  from rate comparison (:1286-1335)
- parts with fewer than ``min_part_tokens`` tokens excluded (:487-489)
- terms with ``focus_term_docs < min_focus_term_docs`` dropped (NaN,
  :419-421)
- final score multiplied by focus-coverage dispersion
  ``(focusTermDocs/focusDocs)^dispersion`` (:447, :1370-1380)

Spark shape: one groupBy to (term, part) counts, one to part totals,
a broadcast join, then a per-term window to aggregate pairwise scores
— no driver-side loops, SQL-expressible end-to-end (oracle-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alix_spark.util import round6

DISPERSION = 0.3        # reference :545
MIN_FOCUS_TERM_DOCS = 3  # reference :548
TAIL_FRACTION = 0.2      # reference :717
MAX_PARTS = 128          # reference Partition.java byte map bound


def parts_from_numeric(
    df: DataFrame,
    col: str,
    bounds: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, part) from a numeric column and range boundaries —
    the reference's ``Partition.build`` (common/.../terms/
    Partition.java:60-330: docId→part byte map from numeric field
    ranges, ≤128 parts). ``bounds = [b1, b2, …]`` yields parts
    ``"<b1"``, ``"[b1,b2)"``, …, ``">=bn"``.

    Docs with a NULL value are EXCLUDED, like the reference's byte map
    rejecting unassigned docs (``NO_PART = -1``) — not silently routed
    into the top range part (ADVICE r1). NaN is excluded the same way:
    in Spark SQL NaN compares greater than every double, so it would
    otherwise fall through every range ``when()`` straight into the
    ``>=bn`` part."""
    if not bounds:
        raise ValueError("bounds must name at least one boundary")
    if list(bounds) != sorted(bounds):
        raise ValueError(f"bounds must be ascending: {bounds}")
    if len(bounds) + 1 > MAX_PARTS:
        raise ValueError(f"at most {MAX_PARTS} parts (reference byte map)")
    expr = F.when(F.col(col) < bounds[0], F.lit(f"<{bounds[0]}"))
    for lo, hi in zip(bounds, bounds[1:]):
        expr = expr.when(
            (F.col(col) >= lo) & (F.col(col) < hi), F.lit(f"[{lo},{hi})")
        )
    expr = expr.otherwise(F.lit(f">={bounds[-1]}"))
    keep = F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    return df.filter(keep).select(
        F.col(id_col).alias("doc_id"), expr.alias("part")
    )


def _signed_g2():
    """Column expr over a (focus term freq), fa (focus tokens),
    b (part term freq), fb (part tokens) — PartScorer.signedG2."""
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    fa = F.col("fa").cast("double")
    fb = F.col("fb").cast("double")
    na, nb = fa - a, fb - b
    n = fa + fb
    t, nt = a + b, na + nb

    def cell(o, e):
        return F.when((o > 0) & (e > 0), 2.0 * o * F.log(o / e)).otherwise(0.0)

    g2 = (
        cell(a, t * fa / n)
        + cell(b, t * fb / n)
        + cell(na, nt * fa / n)
        + cell(nb, nt * fb / n)
    )
    g2 = F.when((t <= 0) | (nt <= 0), F.lit(0.0)).otherwise(g2)
    return F.when(a / fa >= b / fb, g2).otherwise(-g2)


def partition_keyness(
    tok: DataFrame,
    doc_parts: DataFrame,
    focus_part: str,
    scorer: str = "tail",
    min_part_tokens: int = 0,
    min_focus_term_docs: int = MIN_FOCUS_TERM_DOCS,
    dispersion: float = DISPERSION,
    tail_fraction: float = TAIL_FRACTION,
    top: int = 50,
) -> DataFrame:
    """tok: (doc_id, term) token table; doc_parts: (doc_id, part).

    Returns (term, score) top-k, score desc then term asc.
    scorer: 'min' (LogLikelihood strict dominance) or 'tail'
    (LogLikelihoodTail, mean of worst 20%)."""
    from alix_spark.util import maybe_broadcast

    # ONE token-level aggregate feeds every downstream table: the
    # (doc, term) roll-up shuffles once and its exchange is reused by
    # the part/term/doc-count branches (the previous shape re-scanned —
    # and at web scale re-ANALYZED — the token table once per table).
    # Values are integer-exact identical: freq = Σ tf, ftd = rows per
    # (focus, term) since (doc, term) is unique after the roll-up.
    post = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # select THEN distinct: a duplicated (doc_id, part) label row (a
    # raw filter-query output, possibly carrying extra columns like a
    # score) must not double-count freq/ftd — the same discipline as
    # theme_weights_focus/keyness; the projection also keeps stray
    # columns from colliding with post's after the join
    doc_parts = doc_parts.select("doc_id", "part").distinct()
    tp = post.join(maybe_broadcast(doc_parts), "doc_id")  # per-doc labels grow with the corpus

    term_part = tp.groupBy("term", "part").agg(F.sum("tf").alias("freq"))
    part_tokens = term_part.groupBy("part").agg(F.sum("freq").alias("part_toks"))

    focus_tokens = part_tokens.filter(F.col("part") == focus_part).select(
        F.col("part_toks").alias("fa")
    )
    focus_counts = (
        term_part.filter(F.col("part") == focus_part)
        .select("term", F.col("freq").alias("a"))
    )
    focus_term_docs = (
        tp.filter(F.col("part") == focus_part)
        .groupBy("term")
        .agg(F.count("*").alias("ftd"))
    )
    focus_docs_n = doc_parts.filter(F.col("part") == focus_part).count()

    # every (term, non-focus part) cell, including zero cells for parts
    # where the term is absent (cross of focus terms × valid parts)
    valid_parts = part_tokens.filter(
        (F.col("part") != focus_part) & (F.col("part_toks") >= min_part_tokens)
    )
    cells = (
        focus_counts.crossJoin(F.broadcast(valid_parts))
        .join(
            term_part.withColumnRenamed("freq", "b"),
            ["term", "part"],
            "left",
        )
        .withColumn("b", F.coalesce(F.col("b"), F.lit(0)))
        .withColumnRenamed("part_toks", "fb")
        .crossJoin(F.broadcast(focus_tokens))
        .withColumn("g2", _signed_g2())
    )

    w = Window.partitionBy("term").orderBy(F.asc("g2"))
    ranked = cells.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("term"))
    )
    if scorer == "min":
        agg = (
            ranked.filter(F.col("rk") == 1)
            .select("term", F.col("g2").alias("raw"))
        )
    elif scorer == "tail":
        tail_n = F.greatest(
            F.lit(1), F.ceil(F.col("cnt") * F.lit(tail_fraction))
        )
        agg = (
            ranked.filter(F.col("rk") <= tail_n)
            .groupBy("term")
            .agg(F.avg("g2").alias("raw"))
        )
    else:
        raise KeyError(scorer)

    coverage = F.pow(
        F.col("ftd").cast("double") / F.lit(float(focus_docs_n)),
        F.lit(dispersion),
    )
    return (
        agg.join(focus_term_docs, "term")
        .filter(F.col("ftd") >= min_focus_term_docs)
        .select("term", round6(F.col("raw") * coverage).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top)
    )
