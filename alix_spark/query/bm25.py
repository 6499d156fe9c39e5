"""BM25 top-k document ranking as declarative DataFrame ops.

Golden formula (reference common/.../terms/TermDocScorer.java:98-101,
174-189 — Lucene-default BM25):

    idf   = ln(1 + (N - n + 0.5) / (n + 0.5))          N = corpus docs, n = doc freq
    norm  = k1 * (1 - b + b * dl / avgdl)              dl = doc token count
    score = idf * tf * (k1 + 1) / (tf + norm)
    k1 = 1.2, b = 0.75

Doc length is ``docTokens`` (Σtf of emitted tokens), not ``docWidths``
(reference TermStats.java:37-49). Top-k tie-break: score desc then lower
doc_id first (reference util/.../TopArray.java:1-30).

Scale notes: query terms are a tiny `isin` filter — Catalyst pushes it
into the parquet/Iceberg scan of the postings table, so only the query
terms' posting lists are read; per-term stats join is a broadcast; the
per-doc score sum is one shuffle on doc_id over candidate docs only.
The block-max WAND executor (alix_spark.query.wand) replaces the full
candidate scoring with skip-based early termination at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import round6, sql_round6

K1 = 1.2
B = 0.75


def score_expr(k1: float = K1, b: float = B) -> "F.Column":
    """Per-(term, doc) BM25 weight; expects columns tf, dl, df and
    scalar columns corpus_docs, avgdl present on the row."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("corpus_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    return idf * (F.col("tf") * F.lit(k1 + 1.0)) / (F.col("tf") + norm)


def bm25_topk(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Brute-force (oracle-exact) BM25 top-k.

    post:   (term, doc_id, tf)    dstats: (doc_id, dl)
    tstats: (term, df, cf)        cstats: (corpus_docs, corpus_tokens, avgdl)
    mode:   'and' = all terms must match (posting intersection,
            reference SpanNear semantics collapsed to bag-of-words),
            'or'  = union (reference SpanOrQuery).

    Returns (doc_id, score) with score rounded to 6 dp for stable
    cross-engine comparison; ordered score desc, doc_id asc, limit k.
    """
    if mode not in ("and", "or"):
        # anything else silently fell through to OR semantics; the
        # sibling sim parameter raises on typos (review batch 35)
        raise ValueError(f"bm25_topk: mode must be 'and' or 'or', got {mode!r}")
    terms = sorted(set(terms))
    cand = (
        post.filter(F.col("term").isin(terms))
        .join(F.broadcast(tstats.filter(F.col("term").isin(terms))), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
    )
    scored = cand.select(
        "doc_id", "term", score_expr(k1, b).alias("w")
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("w").alias("raw"), F.countDistinct("term").alias("nt")
    )
    if mode == "and":
        agg = agg.filter(F.col("nt") == F.lit(len(terms)))
    return (
        agg.select("doc_id", round6(F.col("raw")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB SQL computing the identical BM25 top-k (same float ops,
    same rounding, same tie-break) — the rank-identity oracle."""
    terms = sorted(set(terms))
    if not terms:
        # `term IN ()` is a DuckDB syntax error while the engine side
        # returns an empty frame — render a valid empty result
        # instead of a crashed contract leg (review batch 35)
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1 = 0"
    # escape quotes: an apostrophe-bearing term (aujourd'hui) must
    # render as valid SQL, not a syntax error (review batch 29)
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM {table}
),
dstats AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
cstats AS (SELECT count(DISTINCT doc_id) AS n, count(*) * 1.0 / count(DISTINCT doc_id) AS avgdl FROM toks),
tstats AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
           WHERE term IN ({term_list}) GROUP BY term),
post AS (SELECT term, doc_id, count(*) AS tf FROM toks
         WHERE term IN ({term_list}) GROUP BY term, doc_id),
scored AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (c.n - t.df + 0.5) / (t.df + 0.5))
           * (p.tf * {k1 + 1.0}) / (p.tf + {k1} * ({1.0 - b} + {b} * d.dl / c.avgdl)) AS w
  FROM post p JOIN tstats t USING (term) JOIN dstats d USING (doc_id), cstats c
)
SELECT doc_id, {sql_round6("sum(w)")} AS score
FROM scored
GROUP BY doc_id
{having}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
