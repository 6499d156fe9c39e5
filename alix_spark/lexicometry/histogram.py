"""Dense time-binned histogram channels.

Reference: HistoNum.java:44-246 + OpChrono.java:27-70 — per-year bins
carrying (docs, tokens, hits) channels. Spark shape: one groupBy on the
bin key; at scale the bin column is a partition column so the agg is
partition-local before the final tiny shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import round6


def time_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = "value",
    bin_: str = "month",
) -> DataFrame:
    """(bin, docs, total) histogram over a timestamp column."""
    key = F.date_trunc(bin_, F.col(ts_col)).alias("bin")
    aggs = [F.count("*").alias("docs")]
    if value_col:
        # floor-based round6, never native round() — Spark HALF_UP vs
        # DuckDB half-even diverge on exact .5 (repo-wide convention)
        aggs.append(round6(F.sum(value_col)).alias("total"))
    return df.groupBy(key).agg(*aggs).orderBy("bin")


def facet_counts(df: DataFrame, facet_col: str) -> DataFrame:
    """Label → doc count (reference FlucCategory/FlucFacet counts,
    fluc/FlucFacet.java:1-30). For array-typed facets explode first."""
    return (
        df.groupBy(F.col(facet_col).alias("label"))
        .agg(F.count("*").alias("docs"))
        .orderBy(F.desc("docs"), F.asc("label"))
    )
