"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All four are pure column expressions (JVM-side, codegen'd) so they cost
one scan at 100 TB; each has an exact DuckDB oracle in entry_queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.index.simple import tokens_array
from alix_spark.util import round6


def _member(words: list[str]):
    # single-arg lambda (a two-arg lambda would receive the element
    # index as the second argument from F.filter)
    return lambda x: x.isin(words)

# Tiny marker-word profiles (deterministic heuristic language-ID — the
# reference's analysis chain is French-only; this generalizes the idea
# of lexicon membership scoring to a lang-ID decision).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "fr": ["le", "la", "les", "de", "et", "un", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "es": ["el", "la", "los", "de", "y", "es", "un"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def lang_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, en, fr, de, es): marker-hit counts per
    language + argmax (ties broken by language name asc). A doc with
    ZERO marker hits in every language gets lang_pred NULL — a bare
    argmax over all-zero scores would confidently label every
    out-of-profile document with the alphabetically first language."""
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_array(df, text_col).alias("toks"))
    out = toks.select(
        "doc_id",
        *[
            F.size(F.filter(F.col("toks"), _member(words))).cast("long").alias(lang)
            for lang, words in sorted(LANG_MARKERS.items())
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pred = F.when(
        best > 0,
        F.coalesce(
            *[F.when(F.col(lang) == best, F.lit(lang)) for lang in langs]
        ),
    )
    return out.withColumn("lang_pred", pred)


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_types, ttr, stop_ratio, mean_tok_len,
    quality): heuristic quality channels + a composite score.

    quality = 0.4·min(n_tokens/100,1) + 0.3·ttr + 0.3·stop_ratio-closeness
    (all deterministic closed forms, rounded to 6 dp)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        tokens_array(df, text_col).alias("toks"),
    )
    base = toks.select(
        "doc_id",
        "n_chars",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_types"),
        F.size(F.filter(F.col("toks"), _member(STOPWORDS))).cast("long").alias("n_stop"),
        F.aggregate(
            F.transform(F.col("toks"), lambda x: F.length(x).cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        ).alias("tok_chars"),
    )
    nt = F.col("n_tokens").cast("double")
    ttr = F.col("n_types") / nt
    stop_ratio = F.col("n_stop") / nt
    mean_len = F.col("tok_chars") / nt
    quality = (
        F.lit(0.4) * F.least(nt / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * ttr
        + F.lit(0.3) * (F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)))
    )
    return base.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_types",
        round6(ttr).alias("ttr"),
        round6(stop_ratio).alias("stop_ratio"),
        round6(mean_len).alias("mean_tok_len"),
        round6(quality).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace token count and a
    BPE-ish piece count (alnum runs + individual non-alnum non-space
    chars — an upper bound proxy for subword token count)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit("")))
        .cast("long")
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\\\s]', 0)"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, fp_full, fp_min): md5 of the normalized token stream
    (exact-dup key) and the minimum md5 over word n-gram shingles (a
    winnowing-style rolling fingerprint stable under local edits)."""
    toks = df.select(F.col(id_col).alias("doc_id"), tokens_array(df, text_col).alias("__toks"))
    parts = ", ".join(f"__toks[i + {j}]" for j in range(n))
    sh = toks.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.col("__toks"))).alias("fp_full"),
        F.expr(
            f"IF(size(__toks) >= {n}, "
            f"transform(sequence(0, size(__toks) - {n}), "
            f"i -> md5(concat_ws(' ', {parts}))), "
            f"CAST(array() AS ARRAY<STRING>))"
        ).alias("sh_hashes"),
    )
    return sh.select(
        "doc_id", "fp_full", F.array_min("sh_hashes").alias("fp_min")
    )
