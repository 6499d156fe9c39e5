"""SQL-parity index layer: tokens → postings → stats → dictionary.

These builders implement the reference's columnar sidecar structures
(reference: common/.../terms/TermStats.java:30-112 per-doc/per-term
aggregates; TermLexicon.java:36-65 dense termIds in byte order) as plain
DataFrame jobs over a ``(doc_id, text)`` table, using a *simple
deterministic tokenizer* (lowercase, split on non-alphanumeric runs)
that is expressible identically in ANSI SQL — this is the oracle-checked
spine of the engine. The full Alix analysis chain (alix_spark.analysis)
plugs into the same downstream builders by swapping the tokens source.

Scale notes (100 TB target):
- Tokenization is `split`/`filter`/`posexplode` — whole-stage codegen,
  no Python in the hot path; the parquet scan prunes to (doc_id, text).
- Postings/stats are single-shuffle groupBy aggs with map-side partial
  aggregation; Zipf skew on hot terms is absorbed by the partial agg
  (per-partition combine) and AQE skew handling.
- term_dict uses a global sort (range partition) — only over the
  *distinct* vocabulary, which is ~1e7 rows even at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tokenizer contract shared with the DuckDB oracle (see entry_queries):
#   terms = filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_array(df: DataFrame, text_col: str = "text") -> "F.Column":
    """Array<string> of simple tokens for one text column (JVM-side).

    NOTE: the returned Column is UNBOUND — it references ``text_col``
    by name and binds to whatever DataFrame it is used in; ``df`` is
    accepted only for call-site symmetry and is not consulted."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def gram_multiplicities(
    base: DataFrame,
    orders,
    out_col: str,
    out_type: str = "string",
    key_fn=None,
    toks_col: str = "toks",
) -> DataFrame:
    """(carried..., out_col, m): ONE Arrow pass emitting one row per
    distinct word n-gram per input row with its within-row
    multiplicity ``m`` — the shared emitter behind top_ngrams (raw
    grams), onion_ratio (md5 keys) and dsir_weights (hashed buckets),
    extracted in review batch 24 so the tokenize/Counter/column-
    accumulate loop is maintained once.

    ``orders`` is the n-gram orders to pool into one Counter (e.g.
    ``(3,)`` or DSIR's ``(1, 2)`` — orders never collide because a
    token cannot contain the joining space); ``key_fn`` maps each gram
    string to the emitted ``out_col`` value (None = the raw gram).
    Carried columns are every column of ``base`` except ``toks_col``,
    copied verbatim onto each emitted row — output types derive from
    the input schema, so string ids survive. NULL token arrays carry
    no grams (rows vanish; callers re-join a doc spine when
    zero-evidence rows must survive the op).

    mapInPandas may split a logical group across Arrow batches, which
    is safe here because the Counter is strictly per input ROW (the
    per-group-aggregation hazard never arises)."""
    carried = [f for f in base.schema.fields if f.name != toks_col]
    names = [f.name for f in carried]
    if out_col in names or "m" in names or out_col == "m":
        # a carried column named 'm' (or out_col) would collide in the
        # emitted dict and be SILENTLY overwritten by the multiplicity
        # (review batch 35) — make the contract explicit
        raise ValueError(
            f"gram_multiplicities: carried columns {names} collide "
            f"with output columns ({out_col!r}, 'm') — rename before "
            "calling"
        )
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in carried]
        + [f"{out_col} {out_type}", "m long"]
    )
    orders = tuple(int(n) for n in orders)

    def gen(it):
        from collections import Counter

        import pandas as pd

        for pdf in it:
            acc: dict = {c: [] for c in names}
            vals, ms = [], []
            for row in zip(pdf[toks_col], *(pdf[c] for c in names)):
                tl = list(row[0]) if row[0] is not None else []
                cnt: Counter = Counter()
                for n in orders:
                    if n == 1:
                        cnt.update(tl)
                    else:
                        cnt.update(
                            " ".join(tl[i : i + n])
                            for i in range(len(tl) - n + 1)
                        )
                for gram, m in cnt.items():
                    for c, kv in zip(names, row[1:]):
                        acc[c].append(kv)
                    vals.append(gram if key_fn is None else key_fn(gram))
                    ms.append(m)
            if vals:
                yield pd.DataFrame({**acc, out_col: vals, "m": ms})

    return base.mapInPandas(gen, schema)


def tokens(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exploded token table ``(doc_id, pos, term)``; pos is the 0-based
    index in the filtered token sequence (the reference's token position
    channel, gaps excluded — simple mode has no stopword gaps)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_array(df, text_col)).alias("pos", "term"),
    )


def doc_stats(tok: DataFrame) -> DataFrame:
    """Per-doc stats (reference TermStats.docTokens/docWidths,
    TermStats.java:37-49). In simple mode tokens == widths."""
    return tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        (F.max("pos") + F.lit(1)).cast("long").alias("width"),
    )


def term_stats(tok: DataFrame) -> DataFrame:
    """Per-term stats: df = doc freq, cf = corpus freq
    (reference TermStats.termDocs/termFreq, TermStats.java:95-105)."""
    return tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("cf"),
    )


def term_dict(tok: DataFrame) -> DataFrame:
    """Dense term ids in lexicographic byte order of the term
    (reference TermLexicon.java:46-53; id 1-based, 0 = absent-term
    sentinel). Simple-mode terms are ASCII so string order == byte
    order; the full chain sorts on encode(term,'utf-8').

    Ranked with util.dense_ranks — a bare Window.orderBy would funnel
    the whole vocabulary through ONE task (the same hazard fixed in
    segments.build_index's term_id assignment)."""
    from alix_spark.util import dense_ranks

    return dense_ranks(tok.select("term").distinct(), "term", "term_id")


def postings(tok: DataFrame, with_positions: bool = False) -> DataFrame:
    """Posting lists ``(term, doc_id, tf[, positions])`` — the core
    inverted-index table (reference: Lucene postings with positions,
    AlixLuceneConsumer.java:66-74). One shuffle on (term, doc_id) with
    map-side combine; positions kept sorted ascending."""
    aggs = [F.count("*").alias("tf")]
    if with_positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return tok.groupBy("term", "doc_id").agg(*aggs)


def corpus_stats(tok: DataFrame) -> DataFrame:
    """Corpus scalars (reference TermStats.fieldDocs/fieldTokens +
    avgdl, TermStats.java:148-156): one row
    (corpus_docs, corpus_tokens, avgdl)."""
    return tok.agg(
        F.countDistinct("doc_id").alias("corpus_docs"),
        F.count("*").alias("corpus_tokens"),
    ).select(
        "corpus_docs",
        "corpus_tokens",
        (F.col("corpus_tokens") / F.col("corpus_docs")).alias("avgdl"),
    )
