"""More-like-this related-document search (Lucene MoreLikeThis parity).

The reference engine is Lucene-based; MoreLikeThis is Lucene's
standard related-document operator (lucene/queries/.../mlt/
MoreLikeThis.java, public API): extract the source document's most
"interesting" terms, then run them as a plain OR query under the
searcher's similarity. Re-expressed Spark-first over the same
(post, dstats, tstats, cstats) tables the brute BM25 path uses:

1. term selection — per source doc, terms with tf >= min_term_freq
   and df >= min_doc_freq, ranked by ``tf * (ln((N+1)/(df+1)) + 1)``
   (tf-idf with the ClassicSimilarity idf — MLT's interestingness
   score), top ``max_query_terms``, ties broken term asc. The rank
   key is one product of an integer tf and a log of an integer-ratio
   double, so both engines rank identical doubles (the token_entropy
   ln-on-integers discipline);
2. retrieval — OR-mode BM25 (k1 = 1.2, b = 0.75, the reference's
   similarity) of the selected terms, source doc excluded, top-k per
   source by 6-dp-rounded score desc then doc_id asc (TopArray
   tie-break).

Scale shape: the per-source selected-term set is tiny (<= 25 terms x
|sources|) and joins the postings table via a count-guarded broadcast
— Catalyst pushes the term filter into the postings scan, so only the
query terms' posting lists are read; the per-(source, candidate)
score sum is one shuffle; both rank windows partition by src_id
(bounded fan-out per source), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alix_spark.query.bm25 import B, K1, score_expr
from alix_spark.util import maybe_broadcast, round6, sql_round6


def more_like_this(
    post: DataFrame,
    dstats: DataFrame,
    tstats: DataFrame,
    cstats: DataFrame,
    sources: DataFrame,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(src_id, rank, doc_id, score): top-k related docs per source.

    post:    (term, doc_id, tf)   dstats: (doc_id, dl)
    tstats:  (term, df, ...)      cstats: (corpus_docs, ..., avgdl)
    sources: one column ``doc_id`` naming the query documents.

    Defaults are Lucene MoreLikeThis's (maxQueryTerms 25, minTermFreq
    2, minDocFreq 5). A source whose terms all fail the frequency
    gates yields no rows (MLT of an empty query), and a source absent
    from the corpus yields none either.
    """
    src = sources.select(F.col("doc_id").alias("src_id")).distinct()
    src_terms = (
        post.join(
            maybe_broadcast(src), post["doc_id"] == src["src_id"]
        )
        .filter(F.col("tf") >= min_term_freq)
        .select("src_id", "term", F.col("tf").alias("stf"))
    )
    # df lookup: the small side is the source-term set, not the vocab
    cand_terms = (
        tstats.select("term", "df")
        .join(maybe_broadcast(src_terms), "term")
        .filter(F.col("df") >= min_doc_freq)
        .crossJoin(F.broadcast(cstats.select("corpus_docs")))
        .withColumn(
            # round6 BEFORE the ranking window: the selection of the
            # top max_query_terms terms is a cross-engine comparison,
            # and JVM vs libm ln can differ in the last ulp — an
            # unrounded key could flip the term-set boundary and
            # diverge the whole retrieval (review batch 29; the
            # zipf/sampling_weights precedent)
            "interest",
            round6(
                F.col("stf")
                * (
                    F.log(
                        (F.col("corpus_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ),
        )
    )
    wsel = Window.partitionBy("src_id").orderBy(
        F.desc("interest"), F.asc("term")
    )
    sel = (
        cand_terms.withColumn("rk", F.row_number().over(wsel))
        .filter(F.col("rk") <= max_query_terms)
        .select("src_id", "term", "df")
    )
    scored = (
        post.join(maybe_broadcast(sel), "term")
        .filter(F.col("doc_id") != F.col("src_id"))
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
        .select("src_id", "doc_id", score_expr(k1, b).alias("w"))
    )
    agg = scored.groupBy("src_id", "doc_id").agg(
        round6(F.sum("w")).alias("score")
    )
    wtop = Window.partitionBy("src_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rank") <= k)
        .select("src_id", "rank", "doc_id", "score")
        .orderBy("src_id", "rank")
    )


def mlt_oracle_sql(
    src_pred: str,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL computing the identical MLT top-k (same float ops,
    same rounding, same tie-breaks). ``src_pred`` is a SQL predicate
    over ``table`` selecting the source docs (e.g. 'doc_id % 100 = 0').
    dl/df/avgdl are derived from the postings aggregate exactly as
    Spark's _bm25_inputs does (integer-identical values)."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM {table}
),
post AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dstats AS (SELECT doc_id, sum(tf) AS dl FROM post GROUP BY doc_id),
tstats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
cstats AS (SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dstats),
srcs AS (SELECT DISTINCT {id_col} AS src_id FROM {table} WHERE {src_pred}),
st AS (
  SELECT s.src_id, p.term, p.tf AS stf, t.df
  FROM post p JOIN srcs s ON p.doc_id = s.src_id
              JOIN tstats t USING (term)
  WHERE p.tf >= {min_term_freq} AND t.df >= {min_doc_freq}
),
ranked AS (
  SELECT src_id, term, df,
         row_number() OVER (
           PARTITION BY src_id
           ORDER BY {sql_round6("stf * (ln((c.n + 1.0) / (df + 1.0)) + 1.0)")} DESC,
                    term ASC) AS rk
  FROM st, cstats c
),
sel AS (SELECT src_id, term, df FROM ranked WHERE rk <= {max_query_terms}),
scored AS (
  SELECT sel.src_id, p.doc_id,
         ln(1.0 + (c.n - sel.df + 0.5) / (sel.df + 0.5))
           * (p.tf * {k1 + 1.0})
           / (p.tf + {k1} * ({1.0 - b} + {b} * d.dl / c.avgdl)) AS w
  FROM sel JOIN post p USING (term)
           JOIN dstats d ON d.doc_id = p.doc_id, cstats c
  WHERE p.doc_id <> sel.src_id
),
agg AS (
  SELECT src_id, doc_id, {sql_round6("sum(w)")} AS score
  FROM scored GROUP BY 1, 2
),
topk AS (
  SELECT src_id, doc_id, score,
         row_number() OVER (
           PARTITION BY src_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM agg
)
SELECT src_id, CAST(rank AS BIGINT) AS rank, doc_id, score
FROM topk WHERE rank <= {k}
ORDER BY src_id, rank
"""
