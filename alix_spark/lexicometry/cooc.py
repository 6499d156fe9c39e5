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

def _hits_side(tok: DataFrame, pivot: str):
    """Pivot occurrences, broadcast only while genuinely small — a
    stop-word-grade pivot falls back to the shuffle band-join. ONE
    count-guard policy repo-wide (util.maybe_broadcast), not a local
    copy that could drift from it (review batch 27)."""
    from alix_spark.util import maybe_broadcast

    hits = tok.filter(F.col("term") == pivot).select(
        F.col("doc_id").alias("h_doc"), F.col("pos").alias("h_pos")
    )
    return maybe_broadcast(hits)


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
    hits = _hits_side(tok, pivot)
    neigh = (
        tok.alias("t")
        .join(
            hits,
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


def cooc_profile(
    tok: DataFrame,
    pivot: str,
    max_dist: int = 5,
    top: int = 20,
) -> DataFrame:
    """Term × distance-tick co-occurrence profile with cumulative
    counts (reference CoocProfile.java:1-40 + CoocProfileSnippets:
    per-tick cumulative counts around the pivot; ticks = |Δpos|).

    Returns (term, dist, freq, cum_freq) for the overall-top terms,
    ordered (term, dist). A neighbour occurrence counts at its MINIMUM
    distance to any pivot hit (merged-window semantics)."""
    hits = _hits_side(tok, pivot)
    neigh = (
        tok.alias("t")
        .join(
            hits,
            (F.col("t.doc_id") == F.col("h_doc"))
            & (F.abs(F.col("t.pos") - F.col("h_pos")) <= max_dist)
            & (F.col("t.pos") != F.col("h_pos")),
        )
        .select(
            "t.doc_id", "t.pos", "t.term",
            F.abs(F.col("t.pos") - F.col("h_pos")).alias("d"),
        )
        .groupBy("doc_id", "pos", "term")
        .agg(F.min("d").alias("dist"))
        .filter(F.col("term") != pivot)
    )
    per_tick = neigh.groupBy("term", "dist").agg(F.count("*").alias("freq"))
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("term").orderBy("dist")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_tick.withColumn("cum_freq", F.sum("freq").over(wcum))
    topterms = (
        neigh.groupBy("term").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term")).limit(top).select("term")
    )
    return (
        ranked.join(F.broadcast(topterms), "term")
        .select("term", F.col("dist").cast("long").alias("dist"), "freq", "cum_freq")
        .orderBy("term", "dist")
    )


def cooc_profile_scored(
    tok: DataFrame,
    pivot: str,
    ticks: tuple = (1, 2, 5, 10),
    top_k: int = 10,
) -> DataFrame:
    """Keyness-scored distance profile — the reference's full
    ``CoocProfile.select`` / ``score`` semantics (CoocProfile.java:
    select :284-356, applyScore :436-444, topCandidates :558-601;
    band accumulation CoocProfileSnippets.java:133-196):

    - each token position is credited to its NEAREST band around any
      pivot occurrence (the shell = mask[i] − mask[i−1] ring walk);
      the pivot's own positions land in band 0 and feed the focus
      token DENOMINATORS (they are excluded from candidate rows only,
      like ``pivotBits``)
    - per tick, cumulative focus counts are scored with signed G²
      against the whole field (``refCount = fieldFreq − focusCount``,
      ``refTotal = fieldTokens − focusTokens``)
    - selection = the UNION of each tick's top-K (score desc, term asc
      — the reference breaks ties on dense term id; term asc is this
      engine's deterministic equivalent); ``top_k`` is a floor on the
      row count, not a cap on the union
    - each selected term records the first tick where it entered a
      per-tick top-K (``entry_radius``) and its rank there
      (``entry_rank``); rows are ordered by score at the widest tick

    Returns the full curve: (term, radius, freq, score, entry_radius,
    entry_rank) — one row per selected term × tick, zero-count early
    ticks included (the reference keeps whole rows after narrowing).

    Spark shape: ONE band self-join (pivot side broadcast while small)
    + small per-tick aggregates; the per-tick grid is a broadcast
    literal; ranking is a per-tick window. No Python stages.
    """
    from pyspark.sql import Window

    from alix_spark.lexicometry.keyness import g2_expr
    from alix_spark.util import round6

    ticks = [int(t) for t in ticks]
    if not ticks or any(t < 1 for t in ticks) or ticks != sorted(set(ticks)):
        raise ValueError(f"ticks must be strictly ascending and >= 1: {ticks}")
    max_r = ticks[-1]
    spark = tok.sparkSession

    hits = _hits_side(tok, pivot)
    # min distance per position; d = 0 keeps the pivot occurrence
    # itself (denominator parity with the reference's mask)
    near = (
        tok.alias("t")
        .join(
            hits,
            (F.col("t.doc_id") == F.col("h_doc"))
            & (F.abs(F.col("t.pos") - F.col("h_pos")) <= max_r),
        )
        .groupBy("t.doc_id", "t.pos", "t.term")
        .agg(F.min(F.abs(F.col("t.pos") - F.col("h_pos"))).alias("d"))
    )
    band = F.when(F.col("d") <= ticks[0], F.lit(0))
    for i, r in enumerate(ticks[1:], start=1):
        band = band.when(F.col("d") <= r, F.lit(i))
    near = near.select("term", band.alias("band"))

    tick_grid = F.broadcast(
        spark.createDataFrame(
            [(i, r) for i, r in enumerate(ticks)], "tick int, radius int"
        )
    )
    # ONE (term, band) aggregate feeds both the per-term curves and the
    # per-tick token denominators (its exchange is shared downstream —
    # the band self-join never runs twice); the per-tick grid join is a
    # broadcast literal
    tb = near.groupBy("term", "band").agg(F.count("*").alias("f"))
    cum = (
        tb.join(tick_grid, F.col("band") <= F.col("tick"))
        .groupBy("term", "tick", "radius")
        .agg(F.sum("f").alias("a"))
    )
    toks_cum = F.broadcast(
        tb.join(tick_grid, F.col("band") <= F.col("tick"))
        .groupBy("tick")
        .agg(F.sum("f").alias("fa"))
    )
    # field stats: the 1-row total derives from the per-term aggregate
    # so both share one tokenize + (term) shuffle subtree
    field_term = tok.groupBy("term").agg(F.count("*").alias("field_freq"))
    field_tot = F.broadcast(
        field_term.agg(F.sum("field_freq").alias("field_tokens"))
    )

    scored = (
        cum.join(field_term, "term")
        .join(toks_cum, "tick")
        .crossJoin(field_tot)
        .select(
            "term",
            "tick",
            "radius",
            F.col("a"),
            F.col("fa"),
            (F.col("field_freq") - F.col("a")).alias("b"),
            (F.col("field_tokens") - F.col("fa")).alias("fb"),
        )
        .withColumn("score", g2_expr())
    )
    cand = scored.filter(F.col("term") != pivot)
    w = Window.partitionBy("tick").orderBy(F.desc("score"), F.asc("term"))
    winners = cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )
    entry = winners.groupBy("term").agg(
        F.min(F.struct("tick", "rk", "radius")).alias("e")
    ).select(
        "term",
        F.col("e.radius").alias("entry_radius"),
        F.col("e.rk").alias("entry_rank"),
    )
    final_score = (
        cand.filter(F.col("tick") == len(ticks) - 1)
        .select("term", F.col("score").alias("fscore"))
    )
    # full curve grid for selected terms; early zero-count ticks kept,
    # their score recomputed with a = 0 exactly as score(row, tick)
    grid = entry.crossJoin(tick_grid)
    curve = (
        grid.join(
            scored.select("term", "tick", "a", "score"), ["term", "tick"], "left"
        )
        .join(toks_cum, "tick")
        .join(field_term, "term")
        .crossJoin(field_tot)
        .withColumn("a", F.coalesce(F.col("a"), F.lit(0)))
        .withColumn("b", F.col("field_freq") - F.col("a"))
        .withColumn("fb", F.col("field_tokens") - F.col("fa"))
        .withColumn("score", F.coalesce(F.col("score"), g2_expr()))
        .join(final_score, "term")
    )
    return (
        curve.select(
            "term",
            F.col("radius").cast("long").alias("radius"),
            F.col("a").cast("long").alias("freq"),
            round6(F.col("score")).alias("score"),
            F.col("entry_radius").cast("long").alias("entry_radius"),
            F.col("entry_rank").cast("long").alias("entry_rank"),
        )
        # fscore is not in the projection: the analyzer re-adds it for
        # the Sort and strips it again itself (no .drop needed)
        .orderBy(F.desc("fscore"), F.asc("term"), F.asc("radius"))
    )


def cooc_matrix(
    tok: DataFrame,
    terms: list[str],
    window: int = 5,
) -> DataFrame:
    """Node×node co-occurrence matrix with association measures
    (reference CoocMatSnippets.java + util/.../AssociationMeasure.java:
    mutual-information family over cell count, marginals, and N).

    Pairs (a < b) of the given node terms co-occurring within ±window
    in the same doc. Pair counting is by occurrence MULTIPLICITY, like
    the reference (CoocMatSnippets.java:50-52: a term occurring r times
    and another c times in one window contribute r·c to the cell) —
    which is why dice here is the reference's unbounded-under-
    multiplicity form (AssociationMeasure.LogDice's core), not a
    set-Jaccard family: a set-style jaccard over these counts can
    exceed its bounds or divide by zero, so the third measure is the
    reference's NPMI (AssociationMeasure.Npmi: pmi/−log p(a,b), −1 at
    never-co-occur, 1 at always) instead.
    Measures: pmi = ln(n_ab·N/(n_a·n_b)), dice = 2·n_ab/(n_a+n_b),
    npmi = ln(n_ab·N/(n_a·n_b)) / ln(N/n_ab), clamped to 1 when the
    multiplicity count reaches N (the reference's pCooc ≥ 1 branch —
    under r·c counting n_ab may exceed N, where the probability form
    is undefined)."""
    sel = tok.filter(F.col("term").isin(terms)).select("doc_id", "pos", "term")
    # N via a broadcast 1-row agg INSIDE the plan — an eager tok.count()
    # here would run a full scan at DataFrame-construction time and
    # scan the token table twice
    ntot = tok.agg(F.count("*").cast("double").alias("n_corpus"))
    marg = sel.groupBy("term").agg(F.count("*").alias("n_t"))
    pairs = (
        sel.alias("x")
        .join(
            sel.alias("y"),
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.term") < F.col("y.term"))
            & (F.abs(F.col("x.pos") - F.col("y.pos")) <= window),
        )
        .groupBy(
            F.col("x.term").alias("a"), F.col("y.term").alias("b")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    from alix_spark.util import round6

    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nab = F.col("n_ab").cast("double")
    n = F.col("n_corpus")
    return (
        pairs.join(F.broadcast(marg.withColumnRenamed("term", "a").withColumnRenamed("n_t", "n_a")), "a")
        .join(F.broadcast(marg.withColumnRenamed("term", "b").withColumnRenamed("n_t", "n_b")), "b")
        .crossJoin(F.broadcast(ntot))
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            round6(F.log(nab * n / (na * nb))).alias("pmi"),
            round6(2.0 * nab / (na + nb)).alias("dice"),
            round6(
                F.when(nab >= n, F.lit(1.0)).otherwise(
                    F.log(nab * n / (na * nb)) / F.log(n / nab)
                )
            ).alias("npmi"),
        )
        .orderBy("a", "b")
    )
