"""Dense time-binned histogram channels.

Reference: HistoNum.java:44-246 + OpChrono.java:27-70 — per-year bins
carrying (docs, tokens, hits) channels. Spark shape: one groupBy on the
bin key; at scale the bin column is a partition column so the agg is
partition-local before the final tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = "value",
    bin_: str = "month",
) -> DataFrame:
    """(bin, docs, total) histogram over a timestamp column.

    The value channel sums over DECIMAL(18,2) and casts back to
    double: exact, so bit-identical across engines AND accumulation
    orders — a double sum is order-sensitive and would diverge from
    any fixed-order oracle (this is the form the driver contract
    checks; ``round6`` would only absorb, not remove, the order
    dependence)."""
    key = F.date_trunc(bin_, F.col(ts_col)).alias("bin")
    aggs = [F.count("*").alias("docs")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total")
        )
    return df.groupBy(key).agg(*aggs).orderBy("bin")


def chrono_channels(
    tok: DataFrame,
    doc_bins: DataFrame,
    term: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One op, four channels per bin — the reference's HistoNum fill
    (HistoNum.java:44-246 + OpChrono.java:27-70): every doc of the
    population lands in its bin, and the query's hits and their BM25
    scores are distributed into the same bins.

    ``tok``: (doc_id, pos, term); ``doc_bins``: (doc_id, bin).
    Returns (bin, docs, tokens, hits, score):
      docs   — documents in the bin
      tokens — Σ doc length
      hits   — Σ tf of the query term over the bin's docs
      score  — Σ per-doc BM25 contribution of the term, accumulated
               as integer micro-units (per-doc floor-round to 6 dp,
               exact long sum): order-insensitive and bit-identical
               across engines — a raw double sum is accumulation-order
               dependent and a post-sum round only narrows, never
               closes, the half-case window (r03 driver red row)

    Scale shape: two partial-aggregated groupBys on doc_id (map-side
    combine), one broadcast of the 1-row corpus stats, one tiny final
    groupBy on the bin key — no token-granularity shuffle survives to
    the bin agg.
    """
    dstats = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    cstats = dstats.agg(
        F.count("*").alias("n"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    post = (
        tok.filter(F.col("term") == term)
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    dfc = post.agg(F.count("*").alias("df"))
    base = (
        # LEFT join: a zero-token doc (empty page, all-stopword
        # boilerplate) has no dstats row but still counts in its bin's
        # docs channel — the reference fills EVERY population doc
        doc_bins.join(dstats, "doc_id", "left")
        .join(post, "doc_id", "left")
        .crossJoin(F.broadcast(cstats))
        .crossJoin(F.broadcast(dfc))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    w = F.when(
        F.col("tf").isNotNull(),
        idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm),
    ).otherwise(F.lit(0.0))
    w_micro = F.floor(w * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        base.select(
            "bin",
            F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"),
            F.coalesce(F.col("tf"), F.lit(0)).cast("long").alias("tf"),
            w_micro.alias("w_micro"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("docs"),
            F.sum("dl").alias("tokens"),
            F.sum("tf").alias("hits"),
            (F.sum("w_micro") / F.lit(1000000.0)).alias("score"),
        )
        .orderBy("bin")
    )


def facet_counts(df: DataFrame, facet_col: str) -> DataFrame:
    """Label → doc count (reference FlucCategory/FlucFacet counts,
    fluc/FlucFacet.java:1-30). For array-typed facets explode first."""
    return (
        df.groupBy(F.col(facet_col).alias("label"))
        .agg(F.count("*").alias("docs"))
        .orderBy(F.desc("docs"), F.asc("label"))
    )
