"""Keyness scorers: focus-subcorpus vs rest term ranking.

Exact ports of the reference formulas (common/.../terms/KeynessScorer.java):
  - G2        (:165-211)  signed Dunning log-likelihood over the 2x2 table
  - Chi2      (:77-121)   signed Pearson X², cell=0 when expected<=0
  - LogRatio  (:212-231)  Hardie log2 rate ratio × ln(focus count)
  - LogDice   (:145-158)  Rychlý 14 + log2(dice)
  - SimpleMaths (:233-262) Kilgarriff smoothed ppm ratio, k=1
  - Count     (:124-134)  raw focus count

Each scorer is a pure column expression over per-term counts
(a = focus term count, b = other term count) and scalar marginals
(fa = focus tokens, fb = other tokens) — all inputs come from two
groupBy aggregations, so the whole ranking is one shuffle + a top-k.

The matching DuckDB oracle SQL snippets live in
alix_spark.entry_queries; both sides use ln()/same operation order so
scores are float-identical before the defensive 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from alix_spark.util import round6

LN2 = "ln(2)"  # computed as ln(2) on both engines for bit-parity


def _cols():
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    fa = F.col("fa").cast("double")
    fb = F.col("fb").cast("double")
    return a, b, fa, fb


def g2_expr() -> Column:
    """Signed G² (KeynessScorer.java:165-211)."""
    a, b, fa, fb = _cols()
    na, nb = fa - a, fb - b
    n = fa + fb
    t, nt = a + b, na + nb
    ea, eb = fa * t / n, fb * t / n
    ena, enb = fa * nt / n, fb * nt / n
    g2 = (
        F.when(a > 0, 2.0 * a * F.log(a / ea)).otherwise(0.0)
        + F.when(b > 0, 2.0 * b * F.log(b / eb)).otherwise(0.0)
        + F.when(na > 0, 2.0 * na * F.log(na / ena)).otherwise(0.0)
        + F.when(nb > 0, 2.0 * nb * F.log(nb / enb)).otherwise(0.0)
    )
    # fb == 0 (empty rest) makes b/fb NULL in Spark, which would fall
    # into the NEGATED branch — an all-corpus focus must score positive
    return F.when((fb <= 0) | (a / fa >= b / fb), g2).otherwise(-g2)


def chi2_expr() -> Column:
    """Signed Pearson X² (KeynessScorer.java:77-121)."""
    a, b, fa, fb = _cols()
    na, nb = fa - a, fb - b
    n = fa + fb
    t, nt = a + b, na + nb
    ea, eb = fa * t / n, fb * t / n
    ena, enb = fa * nt / n, fb * nt / n

    def cell(o: Column, e: Column) -> Column:
        return F.when(e > 0, (o - e) * (o - e) / e).otherwise(0.0)

    x2 = cell(a, ea) + cell(b, eb) + cell(na, ena) + cell(nb, enb)
    return F.when((fb <= 0) | (a / fa >= b / fb), x2).otherwise(-x2)


def logratio_expr() -> Column:
    """Hardie log ratio × ln(focus count) (KeynessScorer.java:212-231);
    0 when either count is 0."""
    a, b, fa, fb = _cols()
    return F.when(
        (a > 0) & (b > 0),
        F.log((a / fa) / (b / fb)) / F.log(F.lit(2.0)) * F.log(a),
    ).otherwise(0.0)


def logdice_expr() -> Column:
    """14 + log2(dice) (KeynessScorer.java:145-158); only defined for
    a > 0 (callers filter)."""
    a, b, fa, _ = _cols()
    dice = 2.0 * a / (fa + (a + b))
    return F.lit(14.0) + F.log(dice) / F.log(F.lit(2.0))


def simplemaths_expr(k: float = 1.0) -> Column:
    """Kilgarriff smoothed ppm ratio (KeynessScorer.java:233-262).
    fb == 0 (all-corpus focus) means b is necessarily 0: the rest-side
    ppm is 0, not NULL — the same empty-rest convention g2/chi2
    special-case."""
    a, b, fa, fb = _cols()
    b_ppm = F.when(fb > 0, b * 1_000_000.0 / fb).otherwise(0.0)
    return (a * 1_000_000.0 / fa + k) / (b_ppm + k)


def count_expr() -> Column:
    """Raw focus count (KeynessScorer.java:124-134 Count — the
    reference's 'count'/'raw' tsort)."""
    a, _b, _fa, _fb = _cols()
    return a


SCORERS = {
    "g2": g2_expr,
    "chi2": chi2_expr,
    "logratio": logratio_expr,
    "logdice": logdice_expr,
    "simplemaths": simplemaths_expr,
    "count": count_expr,
    "raw": count_expr,
}


def keyness(
    tok: DataFrame,
    focus_docs: DataFrame,
    scorer: str,
    top: int = 50,
) -> DataFrame:
    """Rank terms of the focus subcorpus vs the rest.

    tok:        (doc_id, pos, term) token table
    focus_docs: (doc_id) — the focus document subset (reference: doc
                bitset from a filter query, TopTerms.select + rank,
                TopTerms.java:401-539 / :653-704)

    Returns (term, a, b, score) top-`top` by score desc, term asc.
    Focus counts come from a semi-join-limited agg; marginals are two
    scalar counts; the scorer is a pure column expression — one shuffle.
    """
    tagged = tok.join(
        # focus is an arbitrary corpus-filter result (unbounded): no
        # unconditional broadcast hint — AQE decides from runtime size
        # (review batch 27)
        focus_docs.select("doc_id").distinct().withColumn("is_focus", F.lit(1)),
        "doc_id",
        "left",
    ).withColumn("is_focus", F.coalesce("is_focus", F.lit(0)))
    counts = tagged.groupBy("term").agg(
        F.sum("is_focus").alias("a"),
        F.sum(1 - F.col("is_focus")).alias("b"),
    )
    # marginals derive from the (vocab-sized) per-term counts — every
    # token has a term, so Σa/Σb ARE the token marginals; a second
    # aggregation over the full token table would scan it twice
    marg = counts.agg(F.sum("a").alias("fa"), F.sum("b").alias("fb"))
    scored = counts.crossJoin(F.broadcast(marg))
    if scorer == "logdice":
        scored = scored.filter(F.col("a") > 0)
    expr = SCORERS[scorer]()
    return (
        scored.select(
            "term",
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            round6(expr).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top)
    )
