"""Alternate document-scoring similarities (reference §2.6).

The reference ships experimental Lucene similarities next to its
default BM25 — Chi2 and G-test scorers with NEGATIVE scores for
repulsed docs, and a raw-frequency scorer for testing
(common/.../search/similarities/SimilarityChi2.java:54-71,
SimilarityG.java:55-74, SimilarityFreq.java:51-56). They are not wired
into OpResults (BM25 stays the ranking default), but a reference user
can select them; here they are first-class scorers with the same
declarative shape as :mod:`alix_spark.query.bm25` and exact DuckDB
oracles.

Per-(term, doc) scores, summed over query terms (T = corpus tokens,
cf = collection term frequency, dl = doc length):

    chi2:    E = cf·dl/T;  m = (tf−E)²/E
             w = 0 if m = 0 else ±log₂(m)  (negative when tf < E)
    chi2inv: w = 0 if tf > E else (tf−E)²/E
             (SimilarityChi2inv.java:55-68 — scores only REPULSED docs)
    g:       E = cf·dl/T
             w = ±(tf·ln(tf/E) + (T−tf)·ln((T−tf)/(T−E)))  (negative when tf < E)
    gsimple: m = tf·ln(tf/E);  w = −m if tf < E else m
             (SimilarityGsimple.java:55-74 — one-cell G, always ≥ 0)
    freq:    w = tf
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import round6, sql_round6

SIMS = ("chi2", "chi2inv", "g", "gsimple", "freq")


def _weight_expr(sim: str) -> "F.Column":
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    cf = F.col("cf").cast("double")
    t = F.col("corpus_tokens").cast("double")
    e = cf * dl / t
    if sim == "chi2":
        m = (tf - e) * (tf - e) / e
        mag = F.log2(m)
        return F.when(m == 0.0, F.lit(0.0)).otherwise(
            F.when(tf < e, -mag).otherwise(mag)
        )
    if sim == "chi2inv":
        m = (tf - e) * (tf - e) / e
        return F.when(tf > e, F.lit(0.0)).otherwise(m)
    if sim == "g":
        s = tf * F.log(tf / e) + (t - tf) * F.log((t - tf) / (t - e))
        return F.when(tf < e, -s).otherwise(s)
    if sim == "gsimple":
        m = tf * F.log(tf / e)
        return F.when(tf < e, -m).otherwise(m)
    if sim == "freq":
        return tf
    raise KeyError(sim)


def alt_topk(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    terms: list[str],
    sim: str = "chi2",
    k: int = 10,
    mode: str = "and",
) -> DataFrame:
    """Top-k docs under an alternate similarity — same join shape,
    rounding, and (score desc, doc_id asc) tie-break as bm25_topk."""
    if mode not in ("and", "or"):
        raise ValueError(f"alt_topk: mode must be 'and' or 'or', got {mode!r}")
    terms = sorted(set(terms))
    cand = (
        post.filter(F.col("term").isin(terms))
        .join(F.broadcast(tstats.filter(F.col("term").isin(terms))), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats.select("corpus_tokens")))
    )
    scored = cand.select("doc_id", "term", _weight_expr(sim).alias("w"))
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


def _sql_weight(sim: str) -> str:
    e = "(CAST(t.cf AS DOUBLE) * d.dl / c.T)"
    if sim == "chi2":
        m = f"((p.tf - {e}) * (p.tf - {e}) / {e})"
        return (
            f"CASE WHEN {m} = 0.0 THEN 0.0 "
            f"WHEN p.tf < {e} THEN -log2({m}) ELSE log2({m}) END"
        )
    if sim == "chi2inv":
        m = f"((p.tf - {e}) * (p.tf - {e}) / {e})"
        return f"CASE WHEN p.tf > {e} THEN 0.0 ELSE {m} END"
    if sim == "g":
        s = (
            f"(p.tf * ln(p.tf / {e}) "
            f"+ (c.T - p.tf) * ln((c.T - p.tf) / (c.T - {e})))"
        )
        return f"CASE WHEN p.tf < {e} THEN -{s} ELSE {s} END"
    if sim == "gsimple":
        s = f"(p.tf * ln(p.tf / {e}))"
        return f"CASE WHEN p.tf < {e} THEN -{s} ELSE {s} END"
    if sim == "freq":
        return "CAST(p.tf AS DOUBLE)"
    raise KeyError(sim)


def alt_oracle_sql(
    terms: list[str], sim: str, k: int = 10, mode: str = "and"
) -> str:
    """DuckDB SQL computing the identical alternate-similarity top-k."""
    terms = sorted(set(terms))
    if not terms:
        # the bm25_oracle_sql empty-terms guard (review batch 35)
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE 1 = 0"
    # escape quotes: an apostrophe-bearing term (aujourd'hui) must
    # render as valid SQL, not a syntax error (review batch 29)
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    having = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
),
dstats AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
cstats AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM toks),
tstats AS (SELECT term, count(*) AS cf FROM toks
           WHERE term IN ({term_list}) GROUP BY term),
post AS (SELECT term, doc_id, count(*) AS tf FROM toks
         WHERE term IN ({term_list}) GROUP BY term, doc_id),
scored AS (
  SELECT p.doc_id, p.term, {_sql_weight(sim)} AS w
  FROM post p JOIN tstats t USING (term) JOIN dstats d USING (doc_id), cstats c
)
SELECT doc_id, {sql_round6("sum(w)")} AS score
FROM scored
GROUP BY doc_id
{having}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
