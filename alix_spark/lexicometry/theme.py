"""Theme term weighting: corpus- and focus-level BM25 term scores.

Exact port of the reference's ``IdfTermScorer.BM25``
(common/.../terms/IdfTermScorer.java:208-358):

    idf    = ln(1 + (N − df + 0.5)/(df + 0.5)) ^ idfExp     (:243-254)
    local  = tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))           (:256-272)
    no focus:  score = idf · Σ_docs local                   (:311-313)
    IRDF:      score = irdf · Σ_{focus docs} local, with
               irdf = ln(1 + (restDocs−restDf+0.5)/(restDf+0.5))^idfExp  (:337-342)
    MINUS:     score = idf · (focusAcc − restAcc)           (:352-353)

Default idfExp = 0.9 (:227). This is the scorer behind the reference's
"theme terms of the whole corpus" ranking (web/.../OpTerms.java:101-112)
and the per-doc variant (TermDocScorer.BM25, TermDocScorer.java:87-202)
used for doc-vector exports (Lucene2vec).

Everything is two groupBy aggregations + column math — one shuffle,
top-k; SQL-expressible, so every operator here is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.query.bm25 import B, K1
from alix_spark.util import round6

IDF_EXP = 0.9  # reference IdfTermScorer.java:227


def _local_expr(k1: float = K1, b: float = B) -> "F.Column":
    tf = F.col("tf").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    return (tf * F.lit(k1 + 1.0)) / (tf + norm)


def theme_weights(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    idf_exp: float = IDF_EXP,
    top: int | None = 50,
) -> DataFrame:
    """Corpus theme ranking: score = idf^exp · Σ_docs local.

    post (term, doc_id, tf) · dstats (doc_id, dl) · tstats (term, df)
    · cstats (corpus_docs, avgdl). Returns (term, df, score) top-k by
    (score desc, term asc); ``top=None`` = the full unbounded weight
    vector (TermStats.termWeights covers the whole vocabulary)."""
    acc = (
        post.join(dstats.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(cstats.select("corpus_docs", "avgdl")))
        .groupBy("term")
        .agg(F.sum(_local_expr()).alias("acc"), F.first("corpus_docs").alias("n"))
    )
    idf = F.pow(
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        F.lit(idf_exp),
    )
    # tstats is the VOCABULARY — unbounded at web scale, so no
    # unconditional broadcast hint (OOM class named in
    # util.maybe_broadcast), and no eager count-guard either (tstats
    # usually shares the un-pinned postings aggregate, so a count
    # would re-run it as a separate job): AQE picks broadcast-vs-
    # shuffle from the aggregated runtime size (review batch 27)
    ranked = (
        acc.join(tstats.select("term", "df"), "term")
        .select("term", "df", round6(idf * F.col("acc")).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
    )
    return ranked if top is None else ranked.limit(top)


def theme_weights_focus(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    focus_docs: DataFrame,
    idf_exp: float = IDF_EXP,
    mode: str = "irdf",
    top: int = 50,
) -> DataFrame:
    """Focus-vs-rest theme ranking (OpTerms branch 2 analogue).

    All five reference contrast modes (IdfTermScorer.java:308-358):
    'irdf' (default — rarity measured outside the focus), 'minus'
    (idf·(focusAcc − restAcc)), 'rsj' (signed Robertson–Sparck-Jones
    weight on the 2×2 doc table, |w|^idfExp sign-preserved, × acc),
    'factor' (idf·acc·ln(relFocus/relCorpus)·ln(focusTf) — BM25 × log-
    dampened over-representation), 'weighted' (idf·(1·acc − 2·restAcc),
    the reference's shipped wFocus/wRest pair).
    focus_docs: (doc_id) subset — deduplicated here (a raw filter-query
    output with a repeated id would otherwise double-count acc/focus_df
    and drive rest_df negative, like keyness.py's .distinct()
    discipline), and restricted to ids the corpus actually contains so
    n_focus_docs matches the marginals."""
    # fail at entry with the actual requirement, not deep in Spark
    # analysis with an unresolved-column error (review batch 27): the
    # factor contrast is the only mode reading cf / corpus_tokens,
    # which the other stats frames may legitimately omit
    if mode == "factor":
        if "cf" not in tstats.columns:
            raise ValueError(
                "theme_weights_focus(mode='factor') requires a 'cf' "
                "column in tstats (corpus term frequency)"
            )
        if "corpus_tokens" not in cstats.columns:
            raise ValueError(
                "theme_weights_focus(mode='factor') requires a "
                "'corpus_tokens' column in cstats"
            )
    focus = focus_docs.select("doc_id").distinct().join(
        dstats.select("doc_id"), "doc_id", "left_semi"
    )
    c_cols = ["corpus_docs", "avgdl"] + (
        ["corpus_tokens"] if "corpus_tokens" in cstats.columns else []
    )
    marked = (
        post.join(dstats.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(cstats.select(*c_cols)))
        .join(
            # focus is an arbitrary filter result (unbounded): no
            # unconditional hint — AQE decides from runtime size
            focus.withColumn("isf", F.lit(1)),
            "doc_id",
            "left",
        )
        .withColumn("isf", F.coalesce(F.col("isf"), F.lit(0)))
    )
    # in-plan 1-row agg, not an eager focus.count(): constructing the
    # (lazy) result must not run a Spark job, and the focus subplan
    # should evaluate once
    nfd = focus.join(dstats.select("doc_id", "dl"), "doc_id").agg(
        F.count("*").cast("double").alias("n_focus_docs"),
        F.sum("dl").cast("double").alias("focus_tokens"),
    )
    aggs = [
        F.sum(F.when(F.col("isf") == 1, _local_expr()).otherwise(0.0)).alias("acc"),
        F.sum(F.when(F.col("isf") == 0, _local_expr()).otherwise(0.0)).alias("other_acc"),
        F.sum(F.when(F.col("isf") == 1, F.col("tf")).otherwise(F.lit(0))).alias("focus_tf"),
        F.sum(F.col("isf")).alias("focus_df"),
        F.first("corpus_docs").alias("n"),
    ]
    if "corpus_tokens" in c_cols:
        aggs.append(F.first("corpus_tokens").alias("corpus_tokens"))
    per_term = marked.groupBy("term").agg(*aggs)
    t_cols = ["term", "df"] + (["cf"] if "cf" in tstats.columns else [])
    # vocabulary side: AQE-decided, same rationale as theme_weights
    joined = per_term.join(
        tstats.select(*t_cols), "term"
    ).crossJoin(F.broadcast(nfd))
    if mode == "irdf":
        rest_docs = F.col("n") - F.col("n_focus_docs")
        rest_df = F.col("df") - F.col("focus_df")
        irdf = F.pow(
            F.log(
                F.lit(1.0)
                + (rest_docs - rest_df + F.lit(0.5)) / (rest_df + F.lit(0.5))
            ),
            F.lit(idf_exp),
        )
        score = irdf * F.col("acc")
    elif mode in ("minus", "weighted", "factor"):
        idf = F.pow(
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
            F.lit(idf_exp),
        )
        if mode == "minus":
            score = idf * (F.col("acc") - F.col("other_acc"))
        elif mode == "weighted":
            # reference's shipped wFocus=1, wRest=-2 (:344-347)
            score = idf * (F.col("acc") - F.lit(2.0) * F.col("other_acc"))
        else:  # factor (:332-338)
            rel_focus = F.col("focus_tf").cast("double") / F.col("focus_tokens")
            rel_corpus = (
                F.col("cf").cast("double") / F.col("corpus_tokens").cast("double")
            )
            score = F.when(
                (F.col("focus_tf") > 0) & (F.col("focus_tokens") > 0)
                & (rel_corpus > 0),
                idf * F.col("acc") * F.log(rel_focus / rel_corpus)
                * F.log(F.col("focus_tf").cast("double")),
            ).otherwise(F.lit(0.0))
    elif mode == "rsj":
        # signed Robertson–Sparck-Jones on the 2×2 doc table (:317-330)
        r = F.col("focus_df").cast("double")
        big_r = F.col("n_focus_docs")
        n_t = F.col("df").cast("double")
        big_n = F.col("n").cast("double")
        rsj = F.log(
            ((r + F.lit(0.5)) * (big_n - big_r - n_t + r + F.lit(0.5)))
            / ((n_t - r + F.lit(0.5)) * (big_r - r + F.lit(0.5)))
        )
        guard = (
            (big_n - big_r >= 0) & (n_t - r >= 0) & (big_r - r >= 0)
            & (big_n - big_r - (n_t - r) >= 0)
        )
        score = F.when(
            guard,
            F.signum(rsj) * F.pow(F.abs(rsj), F.lit(idf_exp)) * F.col("acc"),
        ).otherwise(F.lit(0.0))
    else:
        raise KeyError(mode)
    return (
        joined.filter(F.col("focus_df") > 0)
        .select("term", round6(score).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top)
    )


def doc_term_weights(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    idf_exp: float = 1.0,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Per-(term, doc) BM25 weight table — the reference's doc-vector
    export path (TermDocScorer.BM25 → Lucene2vec,
    common/.../cli/Lucene2vec.java:1-30)."""
    idf = F.pow(
        F.log(
            F.lit(1.0)
            + (F.col("corpus_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ),
        F.lit(idf_exp),
    )
    return (
        post.join(dstats.select("doc_id", "dl"), "doc_id")
        .join(tstats.select("term", "df"), "term")  # vocabulary: AQE-decided
        .crossJoin(F.broadcast(cstats.select("corpus_docs", "avgdl")))
        .select(
            "term", "doc_id", "tf",
            round6(idf * _local_expr(k1, b)).alias("weight"),
        )
    )
