"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

lang-ID/quality/token counts are pure column expressions (JVM-side,
codegen'd) so they cost one scan at 100 TB; fingerprinting hashes its
shingles in an Arrow-batched python pass (Spark's transform/sequence
array lambdas are interpreted, measured ~6x slower for this shape —
same trade as dedup.doc_shingles). Each op has an exact DuckDB oracle
in entry_queries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.index.simple import gram_multiplicities, tokens_array
from alix_spark.util import (
    NONSPACE_RE,
    WS_CLASS,
    ensure_py_files,
    maybe_broadcast,
    round6,
)


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


def quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: tuple[str, ...] = (),
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_types, ttr, stop_ratio, mean_tok_len,
    quality): heuristic quality channels + a composite score.

    quality = 0.4·min(n_tokens/100,1) + 0.3·ttr + 0.3·stop_ratio-closeness
    (all deterministic closed forms, rounded to 6 dp).

    ``carry`` names extra input columns passed through unchanged, so a
    downstream roll-up (webpipe.domain_stats) stays a single scan
    instead of self-joining the source on doc_id. ``toks_col`` names a
    pre-tokenized array<string> column to reuse instead of
    re-tokenizing (webpipe.training_shard's one-tokenize hook);
    char counts still come from ``text_col``."""
    carry = tuple(carry)
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        tok_expr.alias("toks"),
        *carry,
    )
    base = toks.select(
        "doc_id",
        "n_chars",
        *carry,
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
        *carry,
        "n_tokens",
        "n_types",
        round6(ttr).alias("ttr"),
        round6(stop_ratio).alias("stop_ratio"),
        round6(mean_len).alias("mean_tok_len"),
        round6(quality).alias("quality"),
    )


def ws_tokens_expr(text_col: str) -> F.Column:
    """Whitespace-word count Column — THE one definition of a
    whitespace token, shared by :func:`token_counts` (per doc) and
    :func:`tokenizer_fertility` (per-language census) so the two can
    never drift."""
    return F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != F.lit(""))
    ).cast("long")


def bpe_pieces_expr(text_col: str) -> F.Column:
    """BPE-ish piece count Column (alnum runs + lone non-alnum
    non-space chars — the subword upper-bound proxy) — the one
    definition shared by :func:`token_counts` and
    :func:`tokenizer_fertility`."""
    return F.size(
        F.expr(
            f"regexp_extract_all(lower(`{text_col}`), "
            "'[a-z0-9]+|[^a-z0-9\\\\s]', 0)"
        )
    ).cast("long")


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace token count and a
    BPE-ish piece count (alnum runs + individual non-alnum non-space
    chars — an upper bound proxy for subword token count)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens_expr(text_col).alias("ws_tokens"),
        bpe_pieces_expr(text_col).alias("bpe_ish_tokens"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, fp_full, fp_min): md5 of the normalized token stream
    (exact-dup key) and the minimum md5 over word n-gram shingles (a
    winnowing-style rolling fingerprint stable under local edits).

    Shingle hashing runs in mapInPandas (hashlib md5 — bit-identical
    hex to Spark/DuckDB ``md5()``): the transform/sequence lambda
    alternative is interpreted, not codegen'd, and measured ~6x slower
    for exactly this shape. NULL text fingerprints as an empty token
    stream (fp_min NULL), matching the SQL oracle's semantics."""
    ensure_py_files(df.sparkSession)
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_array(df, text_col).alias("toks")
    )
    id_type = toks.schema["doc_id"].dataType.simpleString()

    def gen(it):
        import hashlib

        md5 = lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
        for pdf in it:
            ids, fulls, mins = [], [], []
            for doc_id, tl in zip(pdf["doc_id"], pdf["toks"]):
                tl = list(tl) if tl is not None else []
                fulls.append(md5(" ".join(tl)))
                hs = [
                    md5(" ".join(tl[i : i + n]))
                    for i in range(len(tl) - n + 1)
                ]
                mins.append(min(hs) if hs else None)
                ids.append(doc_id)
            if ids:  # empty batch: fresh empty frames default to
                yield pd.DataFrame(  # float64 columns, breaking Arrow
                    {"doc_id": ids, "fp_full": fulls, "fp_min": mins}
                )

    return toks.mapInPandas(
        gen, f"doc_id {id_type}, fp_full string, fp_min string"
    )


def lm_scores(
    docs: DataFrame,
    train_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll): per-doc mean negative
    log-likelihood under an add-α-smoothed bigram language model —
    the model-based quality gate (the CCNet/KenLM filtering pattern):
    boilerplate and in-domain prose score low, lexical noise and
    out-of-domain garble score high.

    Model, estimated on ``train_docs`` (default: the scored corpus
    itself): P(w₂|w₁) = (c(w₁w₂) + α) / (c(w₁·) + α·V) with c(w₁·) the
    bigram-head count and V the training vocabulary size; a doc's
    avg_nll is the mean −ln P over its bigrams (multiplicity kept).
    Docs with fewer than 2 tokens have no bigram and are excluded.
    α = 0.5 is exact in binary floating point, so the smoothing
    constant can never split the engines.

    Scale shape: the tokenized corpus is materialized ONCE (lazy
    localCheckpoint — ContextCleaner reclaims the blocks, same trade
    as dedup.minhash_lsh_pairs) and feeds every consumer; bigram
    stats are ONE map-side-combined groupBy over the exploded training
    bigrams (output bounded by distinct bigrams, far below corpus
    size), and the head counts c(w₁·) roll up from that
    already-aggregated result — never a second corpus-wide explode.
    Scoring joins the exploded doc bigrams against the stats on the
    bigram key — a standard shuffle equi-join whose skewed keys
    (frequent bigrams) AQE splits — then one doc_id-keyed aggregation.
    V and the α literals ride in a broadcast 1-row crossJoin. No
    Python stage anywhere: bigram construction is arrays_zip over a
    sliced token array (a single projection), so the whole plan is
    JVM-side."""
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(docs, text_col)
    )
    doc_toks = docs.select(
        F.col(id_col).alias("doc_id"), tok_expr.alias("toks")
    ).localCheckpoint(eager=False)

    def bigrams(frame):
        # (doc_id, w1, w2) with multiplicity: zip toks[0:n-1] with
        # toks[1:n] — pure column expressions, no interpreted lambda
        z = F.arrays_zip(
            F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
            F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
        )
        return (
            frame.filter(F.size("toks") >= 2)
            .select("doc_id", F.explode(z).alias("bg"))
            .select("doc_id", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
        )

    if train_docs is None:
        train_toks = doc_toks
    else:
        train_toks = train_docs.select(
            F.col(id_col).alias("doc_id"),
            tokens_array(train_docs, text_col).alias("toks"),
        ).localCheckpoint(eager=False)
    tb = bigrams(train_toks)
    c12 = tb.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("c12"))
    # head counts from the aggregated bigram table, not a second
    # corpus-wide explode: Σ_w2 c(w1,w2) ≡ c(w1·), exact (integer-
    # valued doubles, far below 2^53)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    # V counts ALL distinct tokens (a 1-token doc contributes to the
    # vocabulary but to no bigram), so it reads the checkpointed
    # token table, not the bigram stats
    vocab = train_toks.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").cast("double").alias("v")
    )

    a = F.lit(float(alpha))
    scored = (
        bigrams(doc_toks)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0.0)) + a)
                    / (F.coalesce(F.col("c1"), F.lit(0.0)) + a * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            round6(F.avg("nll")).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars_raw, n_chars_norm, changed, norm_md5): Unicode
    normalization gate — the first step of any web-crawl text pipeline
    (C4/CCNet both normalize before dedup so that byte-different,
    render-identical pages hash together).

    Chain (order is part of the contract):
    1. zero-width / joiner / BOM / soft-hyphen removal
       (U+200B..U+200D, U+2060, U+FEFF, U+00AD) — BEFORE composition,
       because NFC cannot compose across an interposed format char
       ('e' U+200C U+0301 must still end up as precomposed 'é', or
       render-identical pages hash apart);
    2. NFC composition (``unicodedata.normalize`` — same tables as
       DuckDB's ``nfc_normalize``, verified identical incl. the
       combining-mark reorder cases);
    3. CRLF and lone CR → LF;
    4. remaining C0/C1 controls (except TAB and LF) → space;
    5. runs of spaces/tabs → one space; leading/trailing whitespace
       stripped.

    ``norm_md5`` (md5 of the UTF-8 of the normal form) is the join key
    a downstream exact-dedup stage uses; ``changed`` flags docs whose
    normal form differs (the crawl-health metric). NULL text yields
    NULL channels. Runs in ONE Arrow-batched pass over the input
    partitions — no shuffle at any scale; Python is unavoidable here
    (Spark has no NFC builtin) but ``unicodedata.normalize`` and
    ``re`` are C-speed and the pass is per-partition."""
    ensure_py_files(df.sparkSession)
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
    id_type = src.schema["doc_id"].dataType.simpleString()

    def gen(it):
        import hashlib
        import re
        import unicodedata

        zw = re.compile("[​‌‍⁠﻿­]")
        ctl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
        runs = re.compile("[ \t]+")
        lead = re.compile("^[ \t\n\r]+")
        trail = re.compile("[ \t\n\r]+$")
        for pdf in it:
            ids, raws, norms, chs, md5s = [], [], [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
                ids.append(doc_id)
                if t is None:
                    raws.append(None)
                    norms.append(None)
                    chs.append(None)
                    md5s.append(None)
                    continue
                s = unicodedata.normalize("NFC", zw.sub("", t))
                s = s.replace("\r\n", "\n").replace("\r", "\n")
                s = ctl.sub(" ", s)
                s = runs.sub(" ", s)
                s = trail.sub("", lead.sub("", s))
                raws.append(len(t))
                norms.append(len(s))
                chs.append(s != t)
                md5s.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "n_chars_raw": pd.array(raws, dtype="Int64"),
                        "n_chars_norm": pd.array(norms, dtype="Int64"),
                        "changed": pd.array(chs, dtype="boolean"),
                        "norm_md5": md5s,
                    }
                )

    return src.mapInPandas(
        gen,
        f"doc_id {id_type}, n_chars_raw long, n_chars_norm long, "
        "changed boolean, norm_md5 string",
    )


def classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, w_sum, clf_score, keep): fastText-style
    hashed-bigram linear classifier gate — the quality-classifier
    pattern (CCNet's fastText filter, GPT-3's LR filter) with a
    deterministic hash-derived weight table so both engines and every
    run agree bit-for-bit.

    Each word bigram hashes into a signed weight on a 1/1000 grid:
    ``w = (hexval(md5(w1||' '||w2)[:4]) mod 2001 − 1000)`` (an integer
    in [−1000, 1000], i.e. a weight in [−1, 1] in milli-units). A real
    deployment swaps the md5-derived table for trained weights via an
    identical hash→weight lookup; everything else — the plan shape,
    the hashing, the aggregation — is the production path.

    ``w_sum`` accumulates in INTEGER milli-units, so the per-doc sum is
    exact under any aggregation order; ``clf_score`` = w_sum/(1000·n)
    rounded to 6 dp, and ``keep`` compares the integer sum (never a
    float boundary). Docs with <2 tokens have no bigram and are
    excluded. Fully JVM-side: bigrams are a slice+arrays_zip
    projection, the hash is Spark's ``md5``/``conv``, and the per-doc
    aggregation is one map-side-combined groupBy — at 100 TB the
    shuffle carries (doc_id, partial sums) only."""
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    toks = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    z = F.arrays_zip(
        F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
        F.expr("slice(toks, 2, greatest(size(toks) - 1, 0))"),
    )
    grams = (
        toks.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(z).alias("bg"))
        .select(
            "doc_id",
            F.concat(F.col("bg.0"), F.lit(" "), F.col("bg.1")).alias("g"),
        )
    )
    hv = F.conv(F.substring(F.md5(F.col("g")), 1, 4), 16, 10).cast("long")
    w = (hv % F.lit(2001) - F.lit(1000)).alias("w")
    return (
        grams.select("doc_id", w)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("w").cast("long").alias("w_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "w_sum",
            round6(
                F.col("w_sum") / (F.lit(1000.0) * F.col("n_bigrams"))
            ).alias("clf_score"),
            (F.col("w_sum") > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


def zipf_profile(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 500,
) -> DataFrame:
    """(source, n_terms, top_freq, slope, r2): per-source Zipf's-law
    fit — OLS of ln(freq) on ln(rank) over the source's ``top_n`` most
    frequent terms (rank ties broken term-asc). Natural text sits near
    slope −1 with high r²; machine-generated spam, navigation
    boilerplate, and keyword-stuffed pages bend the curve — a cheap
    source-level signal for the domain keep/drop decision that
    complements :func:`webpipe.domain_stats`.

    Scale shape: ONE corpus-wide explode→groupBy (map-side combined,
    output bounded by distinct (source, term) — far below corpus
    size); the rank window and the regression then run on that
    aggregated table, partitioned BY SOURCE (never a global sort).
    ``regr_slope``/``regr_r2`` are float sums whose addend order Spark
    does not fix; the 6-dp floor rounding absorbs the last-ulp noise
    (same contract as every float oracle in this repo)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col).alias("source"),
        tokens_array(docs, text_col).alias("toks"),
    )
    freqs = (
        toks.select("source", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    rk = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("w").asc()
    )
    ranked = freqs.select(
        "source", "freq", F.row_number().over(rk).alias("rank")
    ).filter(F.col("rank") <= top_n)
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.max(F.when(F.col("rank") == 1, F.col("freq"))).alias("top_freq"),
            round6(F.expr("regr_slope(ln(cast(freq as double)), ln(cast(rank as double)))")).alias("slope"),
            round6(F.expr("regr_r2(ln(cast(freq as double)), ln(cast(rank as double)))")).alias("r2"),
        )
        .orderBy("source")
    )


# Unicode script ranges (BMP core blocks — the triage signal, not a
# full UCD Script= property): name -> Java/RE2-shared character class.
# Sorted names double as output column order.
SCRIPT_RANGES: dict[str, str] = {
    "arabic": "\u0600-\u06FF",
    "cjk": "\u4E00-\u9FFF\u3040-\u30FF\uAC00-\uD7AF",
    "cyrillic": "\u0400-\u04FF",
    "greek": "\u0370-\u03FF",
    # U+00D7 (\u00D7) and U+00F7 (\u00F7) are math symbols inside Latin-1
    # Supplement \u2014 excluded so symbol-only docs keep the
    # zero-evidence NULL contract
    "latin": "A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u024F",
}


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, arabic, cjk, cyrillic, greek, latin, n_letters,
    script_pred): per-document Unicode-script histogram + dominant
    script — the triage step a multilingual crawl runs before any
    language-specific stage (the marker-word lang-ID in
    :func:`lang_scores` only works INSIDE a script; this routes docs
    to the right per-script pipeline first).

    Counts are code points inside each script's core BMP blocks
    (Latin incl. supplements/Extended-A/B, Cyrillic, Greek, Arabic,
    CJK = Han + kana + Hangul syllables). ``script_pred`` is the
    argmax (ties broken script-name asc), NULL when no letter of any
    profiled script occurs — same zero-evidence contract as
    ``lang_scores``. Pure column expressions (``regexp_count`` is
    JVM-side and codegen'd): one scan, zero shuffles at any scale."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(f"[{cls}]"))
        .cast("long")
        .alias(name)
        for name, cls in sorted(SCRIPT_RANGES.items())
    ]
    out = df.select(F.col(id_col).alias("doc_id"), *counts)
    names = sorted(SCRIPT_RANGES)
    best = F.greatest(*[F.col(n) for n in names])
    pred = F.when(
        best > 0,
        F.coalesce(*[F.when(F.col(n) == best, F.lit(n)) for n in names]),
    )
    total = None
    for n in names:
        total = F.col(n) if total is None else total + F.col(n)
    return out.select(
        "doc_id",
        *names,
        total.cast("long").alias("n_letters"),
        pred.alias("script_pred"),
    )


def repetition_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, top2_frac, top3_frac, dup5_frac): Gopher-style
    within-document repetition signals for training-data filtering:

    - ``top2_frac`` / ``top3_frac``: occurrences of the single most
      frequent word {2,3}-gram over the total {2,3}-gram count — high
      values flag boilerplate loops ("click here click here …");
    - ``dup5_frac``: fraction of 5-gram slots holding a 5-gram that
      occurs more than once in the doc (1 − distinct/total) — long
      verbatim self-repetition.

    Docs with fewer than 5 tokens are excluded so every channel is
    defined. Counting runs per document in ONE Arrow stage over the
    input partitions — no shuffle at any scale (the explode→groupBy
    alternative shuffles every n-gram; the transform/sequence lambda
    alternative is interpreted) — and the fractions round via the
    shared floor-based round6 so the DuckDB oracle matches bit-exactly.
    ``toks_col`` reuses a pre-tokenized array<string> column
    (webpipe.training_shard's one-tokenize hook)."""
    ensure_py_files(df.sparkSession)
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    toks = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    id_type = toks.schema["doc_id"].dataType.simpleString()

    def gen(it):
        from collections import Counter

        for pdf in it:
            ids, ns, t2, t3, d5 = [], [], [], [], []
            for doc_id, tl in zip(pdf["doc_id"], pdf["toks"]):
                tl = list(tl) if tl is not None else []
                n = len(tl)
                if n < 5:
                    continue
                c2 = Counter(zip(tl, tl[1:]))
                c3 = Counter(zip(tl, tl[1:], tl[2:]))
                g5 = set(zip(tl, tl[1:], tl[2:], tl[3:], tl[4:]))
                ids.append(doc_id)
                ns.append(n)
                t2.append(max(c2.values()) / (n - 1))
                t3.append(max(c3.values()) / (n - 2))
                d5.append(1.0 - len(g5) / (n - 4))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": ids,
                        "n_tokens": ns,
                        "top2_frac": t2,
                        "top3_frac": t3,
                        "dup5_frac": d5,
                    }
                )

    out = toks.mapInPandas(
        gen,
        f"doc_id {id_type}, n_tokens long, top2_frac double, "
        "top3_frac double, dup5_frac double",
    )
    return out.select(
        "doc_id",
        "n_tokens",
        round6(F.col("top2_frac")).alias("top2_frac"),
        round6(F.col("top3_frac")).alias("top3_frac"),
        round6(F.col("dup5_frac")).alias("dup5_frac"),
    )


def _entropy_agg(counts: DataFrame, group_cols: list[str]) -> DataFrame:
    """Entropy sufficient statistics per group over a term-count table
    carrying a ``c`` column: ``n_i`` (total tokens), ``k_i`` (distinct
    types) and ``clnc = Σ c·ln c`` — the ln-on-integer-counts
    decomposition ``H = ln n − Σ c·ln c / n`` shared by
    :func:`token_entropy` (group = doc) and :func:`source_divergence`
    (group = source). ``ln`` runs on integer counts only, so both
    engines compute bit-identical logs on the same inputs; the final
    round6 of the assembled entropy absorbs sum-order noise (the
    repo-wide float contract)."""
    return counts.groupBy(*group_cols).agg(
        F.sum("c").cast("long").alias("n_i"),
        F.count("*").cast("long").alias("k_i"),
        F.sum(
            F.col("c").cast("double") * F.log(F.col("c").cast("double"))
        ).alias("clnc"),
    )


def _entropy_expr() -> F.Column:
    """The entropy Column over :func:`_entropy_agg` output columns.
    ``k_i == 1`` is pinned to exactly 0.0 on both engines: the math is
    exactly zero there but the float expression lands within ±1 ulp of
    the 1e-6 floor boundary — the one systematic round6 half-case."""
    return F.when(F.col("k_i") == 1, F.lit(0.0)).otherwise(
        F.log(F.col("n_i").cast("double")) - F.col("clnc") / F.col("n_i")
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, n_types, entropy): per-doc unigram Shannon
    entropy in nats — the classic lexical-diversity quality gate
    (CCNet-family pipelines drop both tails: near-zero entropy is
    keyword stuffing / repeated boilerplate, implausibly high entropy
    at length is random-character noise). Complements
    :func:`repetition_scores` (n-gram repetition) with a distributional
    signal the n-gram channels miss (e.g. shuffled boilerplate).

    ``entropy = ln(n) - Σ c·ln(c) / n`` over the doc's term counts
    ``c`` (algebraically identical to ``-Σ p·ln p``, but the Σ has one
    addend per TYPE, and ln runs on integers — both engines compute
    bit-identical ln's on the same integer inputs, so the shared
    floor-round6 contract holds). ``n_types == 1`` is pinned to exactly
    0.0 on both sides: the math is exactly zero there but the float
    expression lands within ±1 ulp of the 1e-6 floor boundary, the one
    systematic half-case. Zero evidence (no tokens) → NULL entropy,
    same contract as lang-ID.

    Scale shape: explode → two map-side-combined hash aggregations
    (the (doc_id, term) roll-up then the per-doc roll-up — partial
    aggregation makes shuffle volume ~types-per-doc, not tokens) and a
    left join back to the id spine for the zero-evidence rows; all
    JVM-side column expressions, no Python stage, no window."""
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    base = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    counts = (
        base.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    agg = _entropy_agg(counts, ["doc_id"])
    ent = _entropy_expr()
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_i", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("k_i", F.lit(0)).cast("long").alias("n_types"),
            round6(ent).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def doc_freq_spectrum(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(df, n_terms, n_tokens): the document-frequency SPECTRUM — for
    each df value, how many distinct terms appear in exactly that many
    documents, and their total corpus occurrences. The WIMBD-style
    corpus census that sizes every downstream decision: the df=1 mass
    is the hapax/noise pool (OCR junk, ids, typos), the high-df tail
    is the stopword/boilerplate band a line-dedup or df-cap must
    handle, and the curve's shape calibrates dedup thresholds
    (jaccard_pairs' max_shingle_df, url_filter's broadcast guards).

    All-integer outputs — exact under any aggregation order, no float
    contract at all.

    Scale shape: explode → (term, doc) roll-up → per-term roll-up →
    spectrum roll-up, ALL map-side-combined hash aggregations (shuffle
    volume falls at each stage: tokens → term×doc → terms → distinct
    df values); no window, no Python stage."""
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    base = df.select(F.col(id_col).alias("doc_id"), tok_expr.alias("toks"))
    per_doc = (
        base.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    per_term = per_doc.groupBy("w").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("tf"),
    )
    return (
        per_term.groupBy("df")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
        .orderBy("df")
    )


def source_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    toks_col: str | None = None,
    max_groups: int = 64,
) -> DataFrame:
    """(source_a, source_b, n_terms, entropy_a, entropy_b, entropy_mix,
    jsd): pairwise Jensen–Shannon divergence (nats, ∈ [0, ln 2])
    between the unigram term distributions of every source pair — the
    domain-distance map behind training-mixture design (which corpora
    are redundant, which add coverage; the DSIR/DoReMi-family
    diagnostics compare domains exactly this way).

    Float contract: every ``ln`` runs on an INTEGER input, so both
    engines log the same values bit-identically. With per-term counts
    ``a, b`` and totals ``A, B``, the equal-weight mixture probability
    is ``m_t = (a·B + b·A) / (2·A·B)`` — integer numerator ``n_t`` over
    the constant integer denominator ``D`` — so
    ``H(m) = ln D − (Σ n_t·ln n_t)/D`` and likewise
    ``H(p) = ln A − (Σ a·ln a)/A``: the only cross-engine float
    divergence left is Σ-order noise, absorbed by the final round6
    (the zipf/token_entropy precedent). JSD = H(m) − (H(p)+H(q))/2.
    The cross products ``a·B`` and ``2·A·B`` are computed in DOUBLE on
    both engines (identical IEEE ops on identical inputs): below 2^53
    they are exact — bit-identical to integer math — and at
    pretraining scale (1e10+-token sources, where int64 products would
    overflow and ANSI mode would kill the job) they degrade to ~1-ulp
    rounding instead of crashing (review batch 26).

    Scale shape: the per-(source, term) count table is built once with
    map-side combine and lazily pinned (three consumers); the pair
    fan-out is two BROADCAST equi-joins against the tiny (sa, sb) pair
    skeleton (never an OR-condition join, which would plan as a
    nested-loop) followed by ONE map-side-combined groupBy — the corpus
    is never joined to itself. Cost is O(k²·V) rows for k sources over
    vocabulary V, which is why ``max_groups`` guards k (raises above
    it, like source_overlap's cap): this is a domain diagnostic over
    tens of corpora, not a per-doc operator. NULL-``group_col`` docs
    belong to no distribution and are excluded on both sides;
    token-less sources carry no distribution and emit no pairs."""
    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(df, text_col)
    )
    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("src"), tok_expr.alias("toks")
    )
    counts = (
        base.select("src", F.explode("toks").alias("w"))
        .groupBy("src", "w")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    stats = _entropy_agg(counts, ["src"])
    srows = stats.select("src").limit(max_groups + 1).collect()
    if len(srows) > max_groups:
        raise ValueError(
            f"source_divergence: more than {max_groups} distinct "
            f"'{group_col}' values — the pairwise fan-out is quadratic "
            "in the group count; pre-aggregate or raise max_groups "
            "deliberately"
        )
    srcs = sorted(r.src for r in srows)
    spark = df.sparkSession
    # pair-skeleton schema derived from the actual group column type —
    # a hardcoded string schema would crash on int labels (batch 26)
    from pyspark.sql.types import StructField, StructType

    gtype = df.schema[group_col].dataType
    pairs = spark.createDataFrame(
        [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1 :]],
        schema=StructType(
            [StructField("sa", gtype), StructField("sb", gtype)]
        ),
    )
    a_side = counts.join(F.broadcast(pairs), counts["src"] == pairs["sa"]).select(
        "sa", "sb", "w", F.col("c").alias("ca"), F.lit(0).cast("long").alias("cb")
    )
    b_side = counts.join(F.broadcast(pairs), counts["src"] == pairs["sb"]).select(
        "sa", "sb", "w", F.lit(0).cast("long").alias("ca"), F.col("c").alias("cb")
    )
    union_counts = (
        a_side.unionAll(b_side)
        .groupBy("sa", "sb", "w")
        .agg(F.sum("ca").cast("long").alias("ca"), F.sum("cb").cast("long").alias("cb"))
    )
    h = stats.select(
        "src", "n_i", _entropy_expr().alias("hh")
    )
    ha = h.select(
        F.col("src").alias("sa"), F.col("n_i").alias("ta"), F.col("hh").alias("h_a")
    )
    hb = h.select(
        F.col("src").alias("sb"), F.col("n_i").alias("tb"), F.col("hh").alias("h_b")
    )
    # cross products in DOUBLE (exact below 2^53, overflow-proof at
    # 1e10+-token sources where int64 products would ANSI-crash)
    n_t = (
        F.col("ca").cast("double") * F.col("tb").cast("double")
        + F.col("cb").cast("double") * F.col("ta").cast("double")
    )
    per_pair = (
        union_counts.join(F.broadcast(ha), "sa")
        .join(F.broadcast(hb), "sb")
        .groupBy("sa", "sb", "ta", "tb", "h_a", "h_b")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum(n_t * F.log(n_t)).alias("xs"),
        )
    )
    d = F.lit(2.0) * F.col("ta").cast("double") * F.col("tb").cast("double")
    h_mix = F.log(d) - F.col("xs") / d
    return per_pair.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_terms",
        round6(F.col("h_a")).alias("entropy_a"),
        round6(F.col("h_b")).alias("entropy_b"),
        round6(h_mix).alias("entropy_mix"),
        round6(h_mix - (F.col("h_a") + F.col("h_b")) / F.lit(2.0)).alias("jsd"),
    ).orderBy("source_a", "source_b")


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(lang, n_docs, n_words, n_pieces, n_chars, vocab, fertility,
    chars_per_piece): per-language tokenizer-fertility census — the
    BLOOM/XGLM-style diagnostic for how expensively a tokenizer
    represents each language. ``n_words`` counts whitespace words
    (token_counts' ws definition), ``n_pieces`` the BPE-ish subword
    proxy (alnum runs + lone non-alnum non-space chars), ``vocab`` the
    distinct lowercase alnum types; fertility = pieces per word. A
    fertility far above the corpus norm flags a language the tokenizer
    fragments (→ more compute per byte of signal); chars_per_piece is
    the compression view of the same fact.

    Float contract: all sums are integers (exact under any aggregation
    order); the two ratios divide identical integers on both engines
    and round6 — no half-case. NULL-``lang_col`` docs belong to no
    census row and are excluded on both sides; ratios are NULL when
    their denominator is 0 rather than a division error.

    Scale shape: one scan computing per-doc integer counters →
    map-side-combined groupBy(lang) (output rows = languages); the
    vocab channel is a second map-side-combined (lang, term) roll-up
    whose shuffle volume is per-language vocabulary, not tokens. All
    JVM column expressions, no Python stage, no window."""
    base = df.filter(F.col(lang_col).isNotNull()).select(
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("text"),
        tokens_array(df, text_col).alias("toks"),
    )
    per_doc = base.select(
        "lang",
        ws_tokens_expr("text").alias("ws"),
        bpe_pieces_expr("text").alias("pieces"),
        F.length("text").cast("long").alias("chars"),
    )
    sums = per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("n_words"),
        F.sum("pieces").cast("long").alias("n_pieces"),
        F.sum("chars").cast("long").alias("n_chars"),
    )
    vocab = (
        base.select("lang", F.explode("toks").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("_c"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("vocab"))
    )
    out = sums.join(vocab, "lang", "left")
    return out.select(
        "lang",
        "n_docs",
        "n_words",
        "n_pieces",
        "n_chars",
        F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        F.when(
            F.col("n_words") > 0,
            round6(F.col("n_pieces") / F.col("n_words").cast("double")),
        ).alias("fertility"),
        F.when(
            F.col("n_pieces") > 0,
            round6(F.col("n_chars") / F.col("n_pieces").cast("double")),
        ).alias("chars_per_piece"),
    ).orderBy("lang")


def heaps_profile(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    toks_col: str | None = None,
    num_parts: int | None = None,
) -> DataFrame:
    """(source, n_points, total_tokens, vocab, beta, r2): per-source
    Heaps'-law fit — OLS of ln(cumulative vocabulary) on ln(cumulative
    tokens) over the source's docs in doc_id order. Natural language
    grows vocabulary as V(n) ≈ K·n^β with β ≈ 0.4-0.6 and high r²;
    template/boilerplate sources saturate early (β → 0) and
    random-noise sources grow too fast (β → 1) — a source-level
    health signal that complements :func:`zipf_profile` (the static
    frequency curve) with the growth view, and tells a crawl-mix
    curator when more data from a domain has stopped adding new
    vocabulary.

    The curve needs two running sums per doc (tokens so far, new terms
    so far). A per-source window (``sum() over (partition by source
    order by doc_id)``) funnels each source — possibly most of a crawl
    — through ONE task, so both running totals go through the shared
    ``util.grouped_prefix_sums`` engine (the same machinery as
    webpipe.pack_shards; see its docstring for the pin-the-split
    protocol). "New terms per doc" is first-occurrence attribution:
    min(doc_id) per (source, term), then counts per introducing doc —
    explode → map-side-combined min, the same shuffle class as the
    postings build. The regression then runs on the per-doc point
    table (one row per doc, no window).

    Preconditions: ``id_col`` is the corpus primary key (duplicate ids
    make the cumulative curve ill-defined), and docs with a NULL group
    key are EXCLUDED — a record without a source attribution has no
    curve to belong to (the oracle filters identically). The token
    arrays are computed ONCE and pinned (lazy localCheckpoint) so the
    size branch and the first-occurrence branch don't re-tokenize;
    ``toks_col`` reuses a pre-tokenized array<string> column
    instead."""
    from alix_spark.util import grouped_prefix_sums

    tok_expr = (
        F.col(toks_col) if toks_col is not None else tokens_array(docs, text_col)
    )
    base = (
        docs.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            tok_expr.alias("toks"),
        )
        .localCheckpoint(eager=False)
    )
    sized = base.select(
        "source",
        "doc_id",
        F.coalesce(F.size("toks"), F.lit(0)).cast("long").alias("n_tok"),
    )
    firsts = (
        base.select("source", "doc_id", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("source", "doc_id")
        .agg(F.count("*").cast("long").alias("new_terms"))
    )
    per = sized.join(firsts, ["source", "doc_id"], "left").select(
        "source",
        "doc_id",
        "n_tok",
        F.coalesce("new_terms", F.lit(0)).cast("long").alias("new_terms"),
    )
    pre = grouped_prefix_sums(
        per,
        ["doc_id"],
        ["n_tok", "new_terms"],
        group_cols=["source"],
        num_parts=num_parts,
    )
    points = pre.select(
        "source",
        (F.col("before_n_tok") + F.col("n_tok")).alias("cum_toks"),
        (F.col("before_new_terms") + F.col("new_terms")).alias("cum_vocab"),
    )
    return (
        points.filter((F.col("cum_toks") > 0) & (F.col("cum_vocab") > 0))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.max("cum_toks").cast("long").alias("total_tokens"),
            F.max("cum_vocab").cast("long").alias("vocab"),
            round6(
                F.expr(
                    "regr_slope(ln(cast(cum_vocab as double)),"
                    " ln(cast(cum_toks as double)))"
                )
            ).alias("beta"),
            round6(
                F.expr(
                    "regr_r2(ln(cast(cum_vocab as double)),"
                    " ln(cast(cum_toks as double)))"
                )
            ).alias("r2"),
        )
        .orderBy("source")
    )


# The eight indicator words of the Gopher "stop word" rule (Rae et
# al. 2021, "Scaling Language Models: ... Gopher", appendix A1.1 —
# public rule set; a doc must contain at least 2 of them). ASCII-only
# so the \b word boundary behaves identically in Java (Spark) and RE2
# (DuckDB) regex engines.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_metrics(text: F.Column) -> dict[str, F.Column]:
    """The Gopher gate's named count Columns over one text Column —
    shared by the batch gate (:func:`gopher_rules`) and the streaming
    keep-rate monitor (streaming.monitor.quality_rate), so both paths
    gate with IDENTICAL semantics. Line terminators are normalized
    first (CRLF, lone CR, NEL, LS, PS -> \\n); whitespace is the
    explicit cross-engine class (util.WS_CLASS). Select these with
    their dict keys as aliases, then apply :func:`gopher_keep`."""
    t = F.regexp_replace(
        F.coalesce(text, F.lit("")),
        "\r\n|[\r\u0085\u2028\u2029]",
        "\n",
    )

    def rc(pat: str) -> F.Column:
        return F.regexp_count(t, F.lit(pat)).cast("long")

    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = F.when(t.rlike(rf"(?i)\b{w}\b"), F.lit(1)).otherwise(F.lit(0))
        stop_hits = hit if stop_hits is None else stop_hits + hit
    return {
        "n_words": rc(NONSPACE_RE),
        "word_chars": F.length(
            F.regexp_replace(t, f"[{WS_CLASS}]", "")
        ).cast("long"),
        "alpha_words": rc(f"[^{WS_CLASS}]*[A-Za-z][^{WS_CLASS}]*"),
        "hashes": rc("#"),
        "ellipses": rc("\\.\\.\\.|\u2026"),
        "n_lines": rc("\n") + F.lit(1),
        "bullet_lines": rc("(?m)^[ \t]*[-*\u2022]"),
        "ellipsis_lines": rc("(?m)(\\.\\.\\.|\u2026)[ \t]*$"),
        "n_stop_kinds": stop_hits.cast("long"),
    }


def gopher_keep() -> F.Column:
    """The Gopher A1.1 keep verdict over :func:`gopher_metrics`
    columns (by name) — every gate in integer cross-multiplied form,
    so the verdict has no float half-case on any engine."""
    w = F.col("n_words")
    return (
        (w >= 50)
        & (w <= 100000)
        & (F.lit(3) * w <= F.col("word_chars"))
        & (F.col("word_chars") <= F.lit(10) * w)
        & (F.lit(10) * F.col("hashes") <= w)
        & (F.lit(10) * F.col("ellipses") <= w)
        & (F.lit(10) * F.col("bullet_lines") <= F.lit(9) * F.col("n_lines"))
        & (F.lit(10) * F.col("ellipsis_lines") <= F.lit(3) * F.col("n_lines"))
        & (F.lit(5) * F.col("alpha_words") >= F.lit(4) * w)
        & (F.col("n_stop_kinds") >= 2)
    )


def gopher_rules(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_words, n_lines, mean_word_len, hash_ratio,
    ellipsis_ratio, bullet_line_ratio, ellipsis_line_ratio,
    alpha_ratio, n_stop_kinds, keep): the Gopher repetition-free
    quality rule set (Rae et al. 2021, appendix A1.1 — the most
    widely reused public web-filtering recipe, e.g.
    RefinedWeb/FineWeb re-implementations):

    - 50 <= word count <= 100,000 (whitespace words)
    - 3 <= mean word length <= 10
    - symbol-to-word ratio <= 0.1 for EACH of '#' and ellipsis
      (the paper gates the two symbols separately, not their sum)
    - <= 90% of lines start with a bullet (-, *, \\u2022)
    - <= 30% of lines end with an ellipsis
    - >= 80% of words contain at least one alphabetic character
    - at least 2 distinct words from the 8-word stop list

    ``keep`` is the conjunction. Every gate compares in INTEGER
    cross-multiplied form (e.g. ``10*hashes <= n_words`` instead of
    ``hashes/n_words <= 0.1``) so the verdict is bit-exact across
    engines and aggregation orders — the ratio columns are 6-dp
    display channels only, never the gate inputs. NULL text is
    treated as empty (keep=false via the word-count gate; per-row
    verdict semantics — every input doc gets a row). Ratio channels
    with a zero denominator are NULL.

    Scale shape: pure column expressions over one scan (regexp_count
    is JVM-side and codegen'd) — zero shuffles at any corpus size.
    Reference has no counterpart (its chain is curated-TEI French);
    this is the crawl-side admission gate in front of it. Line
    terminators are normalized first (CRLF, lone CR, NEL, LS, PS ->
    \\n) so Java's terminator-tolerant (?m) anchors and the oracle's
    RE2 anchors see identical lines; whitespace is the explicit
    cross-engine class (util.WS_CLASS — Java \\s includes \\x0B,
    RE2's does not)."""
    m = df.select(
        F.col(id_col).alias("doc_id"),
        *(c.alias(k) for k, c in gopher_metrics(F.col(text_col)).items()),
    )
    keep = gopher_keep()
    w = F.col("n_words")

    def ratio(num: F.Column, den: F.Column) -> F.Column:
        return F.when(den > 0, round6(num.cast("double") / den.cast("double")))

    return m.select(
        "doc_id",
        "n_words",
        "n_lines",
        ratio(F.col("word_chars"), w).alias("mean_word_len"),
        ratio(F.col("hashes"), w).alias("hash_ratio"),
        ratio(F.col("ellipses"), w).alias("ellipsis_ratio"),
        ratio(F.col("bullet_lines"), F.col("n_lines")).alias("bullet_line_ratio"),
        ratio(F.col("ellipsis_lines"), F.col("n_lines")).alias("ellipsis_line_ratio"),
        ratio(F.col("alpha_words"), w).alias("alpha_ratio"),
        "n_stop_kinds",
        keep.alias("keep"),
    ).orderBy("doc_id")


def winnowing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    w: int = 4,
) -> DataFrame:
    """(doc_id, pos, fp): winnowing fingerprint selection (Schleimer,
    Wilkerson & Aiken 2003 — the MOSS local-similarity sketch). Over
    the word ``n``-gram md5 stream, every window of ``w`` consecutive
    hashes selects its minimum, RIGHTMOST position on ties — the
    paper's STANDARD winnowing rule (its "robust winnowing" variant
    additionally prefers re-selecting the previous window's pick on
    ties to thin fingerprints in low-entropy runs; not implemented —
    selection here is stateless per window, which is what the oracle
    replicates); the distinct selected (position, hash) pairs are the
    document's fingerprint set.

    Guarantee (paper §2): any token run of length >= w + n - 1 shared
    by two documents yields at least one shared fingerprint, at an
    expected density of 2/(w+1) fingerprints per shingle — the sketch
    that makes partial-overlap detection (quotes, mirrored passages)
    affordable where :func:`fingerprints`' single fp_min can only see
    whole-document similarity.

    Scale shape: one Arrow-batched pass with full text locality —
    selection is per-document, so there is NO shuffle at any corpus
    size (downstream overlap joins group by fp). Hashing is hashlib
    md5 (bit-identical hex to Spark/DuckDB ``md5()``, the oracle
    contract); window minima compare per-doc lexicographic RANKS of
    the hex digests (np.unique codes), vectorized sliding windows —
    no per-window Python loop. Docs with fewer than ``w`` shingles
    use one window over all of them; docs with no shingle (NULL/short
    text) emit no rows.

    Precondition: ``id_col`` values are unique (one row per document
    — the documents-table contract, same precondition as
    heaps_profile). Duplicate ids would be processed independently
    per row here but pooled into one phantom-windowed stream by the
    SQL oracle's per-doc shingle count."""
    if n < 1 or w < 1:
        raise ValueError("winnowing: n and w must be >= 1")
    ensure_py_files(df.sparkSession)
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_array(df, text_col).alias("toks")
    )
    id_type = toks.schema["doc_id"].dataType.simpleString()

    def gen(it):
        import hashlib

        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        md5 = lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
        for pdf in it:
            ids, poss, fps = [], [], []
            for doc_id, tl in zip(pdf["doc_id"], pdf["toks"]):
                tl = list(tl) if tl is not None else []
                hs = [
                    md5(" ".join(tl[i : i + n]))
                    for i in range(len(tl) - n + 1)
                ]
                m = len(hs)
                if m == 0:
                    continue
                we = min(w, m)
                # per-doc lexicographic ranks stand in for the digests
                # (numpy cannot reduce over flexible string dtypes);
                # reversed-window argmin = rightmost minimum
                ranks = np.unique(np.array(hs), return_inverse=True)[1]
                rev = sliding_window_view(ranks, we)[:, ::-1]
                sel = np.arange(rev.shape[0]) + (we - 1) - np.argmin(rev, axis=1)
                for p in np.unique(sel):
                    ids.append(doc_id)
                    poss.append(int(p))
                    fps.append(hs[p])
            if ids:  # empty frames default to float64, breaking Arrow
                yield pd.DataFrame({"doc_id": ids, "pos": poss, "fp": fps})

    return toks.mapInPandas(
        gen, f"doc_id {id_type}, pos long, fp string"
    ).orderBy("doc_id", "pos")


def top_ngrams(
    docs: DataFrame,
    n: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    toks_col: str | None = None,
) -> DataFrame:
    """(source, rank, gram, n_occ, n_docs): per-source top-k word
    n-grams by occurrence count — the WIMBD-style corpus heavy-hitter
    report (Elazar et al. 2024, "What's In My Big Data?"): the most
    duplicated n-grams per source surface boilerplate, templates and
    memorization risk before training.

    Rank is wholly integer-keyed (n_occ desc, n_docs desc, gram asc),
    so selection is deterministic and engine-independent — no float
    ever enters the ordering. NULL-``group_col`` docs have no stratum
    and are excluded; NULL text carries no grams.

    Scale shape: one Arrow pass emits (source, gram, multiplicity) —
    one row per distinct gram per doc, so n_docs is a plain count and
    n_occ a sum on the aggregated table; the rank window partitions by
    source over the AGGREGATED (source, gram) counts, never the raw
    corpus. At web scale the gram vocabulary is linear in corpus
    tokens — the one shuffle this op cannot avoid — and the window
    sorts each source's slice of the aggregate, not the corpus.
    """
    from pyspark.sql import Window

    ensure_py_files(docs.sparkSession)
    tok_expr = (
        F.col(toks_col)
        if toks_col is not None
        else tokens_array(docs, text_col)
    )
    base = docs.filter(F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("source"), tok_expr.alias("toks")
    )
    ex = gram_multiplicities(base, (n,), "gram", "string")
    agg = ex.groupBy("source", "gram").agg(
        F.sum("m").cast("long").alias("n_occ"),
        F.count("*").cast("long").alias("n_docs"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("n_occ"), F.desc("n_docs"), F.asc("gram")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "gram", "n_occ", "n_docs")
        .orderBy("source", "rank")
    )


# Shared Java/RE2 BMP classes (the script_profile discipline: both
# engines compile the same pattern text). MOJI matches the two classic
# UTF-8-read-as-Latin-1/cp1252 signatures: a Latin-1 lead letter
# (Â/Ã/â) followed by a raw continuation char, and the cp1252-decoded
# general-punctuation prefix "â€" (â€). CTRL is every
# C0/C1 control except tab/LF/CR. The classes overlap on purpose
# (Ã + C1 continuation counts in both) — they are independent
# evidence channels, not a partition.
MOJI_RE = (
    "[\\x{00C2}\\x{00C3}\\x{00E2}][\\x{0080}-\\x{00BF}]"
    "|\\x{00E2}\\x{20AC}"
)
REPL_RE = "\\x{FFFD}"
CTRL_RE = (
    "[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}"
    "\\x{007F}-\\x{009F}]"
)


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    top: int = 100,
    text_col: str = "text",
    toks_col: str | None = None,
) -> DataFrame:
    """(w1, w2, c12, c1, c2, score): corpus-wide adjacent-bigram
    collocations ranked by signed log-likelihood ratio (Dunning 1993,
    "Accurate Methods for the Statistics of Surprise and Coincidence"
    — the classic collocation finder; the corpus-wide adjacent analog
    of the pivot-windowed cooc family in lexicometry/cooc.py).

    The contingency is over adjacent-pair EVENTS: c12 = count of the
    pair (w1, w2), c1 = pairs with w1 on the left, c2 = pairs with w2
    on the right, n = all pairs — margins and total come from the
    aggregated bigram table itself, so no unigram pass is needed and
    the 2x2 is exactly consistent. Score is G2 with the keyness-family
    sign convention (negative when the pair occurs LESS than expected:
    observed/left-margin rate under the right-margin rate, compared as
    identical doubles on both engines); cells guard k > 0 like
    keyness.g2_expr, all count inputs cast to double first, and the
    displayed score is floor-round6'd so the DuckDB oracle matches
    bit-for-bit. Ordering is (score desc, w1 asc, w2 asc) — total and
    deterministic. ``min_count`` prunes the candidate pairs BEFORE the
    margin joins; margins/total still use the full counts.

    Scale shape: one Arrow pass emits (bigram, multiplicity) — one row
    per distinct bigram per doc, no positional explode; ONE map-side-
    combined groupBy builds the corpus bigram table, pinned (lazy
    localCheckpoint) because it feeds both margins, the total and the
    probe; margins join back count-guarded (maybe_broadcast — at web
    scale the vocabulary-sized margin tables fall back to shuffle
    equi-joins); the final top-k is TakeOrderedAndProject, never a
    full sort. NULL text carries no pairs."""
    ensure_py_files(docs.sparkSession)
    tok_expr = (
        F.col(toks_col)
        if toks_col is not None
        else tokens_array(docs, text_col)
    )
    base = docs.select(tok_expr.alias("toks"))
    ex = gram_multiplicities(base, (2,), "gram")
    bi = (
        ex.groupBy("gram")
        .agg(F.sum("m").cast("long").alias("c12"))
        .select(F.split("gram", " ").alias("_a"), "c12")
        .select(
            F.col("_a")[0].alias("w1"), F.col("_a")[1].alias("w2"), "c12"
        )
        .localCheckpoint(eager=False)
    )
    m1 = bi.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    m2 = bi.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = bi.agg(F.sum("c12").cast("long").alias("n"))
    j = (
        bi.filter(F.col("c12") >= F.lit(int(min_count)))
        .join(maybe_broadcast(m1), "w1")
        .join(maybe_broadcast(m2), "w2")
        .crossJoin(F.broadcast(tot))
    )
    k11 = F.col("c12").cast("double")
    r1 = F.col("c1").cast("double")
    r2 = F.col("c2").cast("double")
    nn = F.col("n").cast("double")
    k12 = r1 - k11
    k21 = r2 - k11
    k22 = nn - r1 - r2 + k11

    def cell(k, e):
        return F.when(k > 0, 2.0 * k * F.log(k / e)).otherwise(0.0)

    g2 = (
        cell(k11, r1 * r2 / nn)
        + cell(k12, r1 * (nn - r2) / nn)
        + cell(k21, (nn - r1) * r2 / nn)
        + cell(k22, (nn - r1) * (nn - r2) / nn)
    )
    signed = F.when(k11 / r1 >= r2 / nn, g2).otherwise(-g2)
    return (
        j.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            round6(signed).alias("score"),
        )
        .orderBy(F.col("score").desc(), "w1", "w2")
        .limit(int(top))
    )


def encoding_anomalies(
    docs: DataFrame,
    max_bad_per_200: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chars, n_repl, n_moji, n_ctrl, keep): ftfy-style
    encoding-health gate — the hygiene pass every web pipeline runs
    before quality scoring, because mojibake ("Ã©", "â€™"), U+FFFD
    replacement chars (a decoder already gave up) and stray C0/C1
    controls poison tokenizers and n-gram stats downstream.

    keep is false iff any replacement char is present, or the
    mojibake+control density exceeds ``max_bad_per_200`` per 200
    chars — the comparison is the integer cross-multiplied form
    ``200 * (n_moji + n_ctrl) > max_bad_per_200 * n_chars`` (the
    gopher_rules discipline: no float ratio ever enters a verdict).
    NULL text carries no evidence: all counts 0, keep=true.

    Scale shape: four regexp_count column expressions over one scan —
    zero shuffles, whole-stage codegen, the cheapest possible gate at
    100 TB."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("long")
    n_repl = F.regexp_count(t, F.lit(REPL_RE)).cast("long")
    n_moji = F.regexp_count(t, F.lit(MOJI_RE)).cast("long")
    n_ctrl = F.regexp_count(t, F.lit(CTRL_RE)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_repl.alias("n_repl"),
        n_moji.alias("n_moji"),
        n_ctrl.alias("n_ctrl"),
    ).select(
        "doc_id",
        "n_chars",
        "n_repl",
        "n_moji",
        "n_ctrl",
        (
            (F.col("n_repl") == 0)
            & (
                F.lit(200) * (F.col("n_moji") + F.col("n_ctrl"))
                <= F.lit(int(max_bad_per_200)) * F.col("n_chars")
            )
        ).alias("keep"),
    ).orderBy("doc_id")


def readability(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_chars, n_words, n_sents, chars_per_word,
    words_per_sent, ari): Automated Readability Index profile — the
    classic integer-census readability score (Senter & Smith 1967),
    used as a cheap fluency/complexity signal in corpus audits (very
    low ARI flags word salad and boilerplate, very high flags OCR
    noise and run-ons).

        ari = 4.71 * (chars/words) + 0.5 * (words/sents) - 21.43

    Census rules (deterministic, engine-independent): ``n_chars``
    counts [a-z0-9] after lowercasing (letters+digits, the ARI
    convention — punctuation and spaces excluded), ``n_words`` the
    whitespace/punctuation-delimited tokens, ``n_sents`` the RUNS of
    terminal punctuation [.!?]+ (an unterminated trailing fragment
    ends no sentence). Zero words or zero sentences → NULL metrics
    (no evidence, never a division blow-up). All three counts are
    integers; the ratios divide the SAME integers in both engines and
    round6 absorbs the last-ulp of the float combine.

    Scale shape: regexp_count column expressions over one scan — zero
    shuffles, codegen'd end to end."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.regexp_count(F.lower(t), F.lit("[a-z0-9]")).cast("long")
    n_words = F.coalesce(F.size(tokens_array(docs, text_col)), F.lit(0)).cast(
        "long"
    )
    n_sents = F.regexp_count(t, F.lit("[.!?]+")).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
    )
    cw = F.col("n_chars") / F.col("n_words")
    ws = F.col("n_words") / F.col("n_sents")
    return base.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_sents",
        F.when(F.col("n_words") > 0, round6(cw)).alias("chars_per_word"),
        F.when(F.col("n_sents") > 0, round6(ws)).alias("words_per_sent"),
        F.when(
            (F.col("n_words") > 0) & (F.col("n_sents") > 0),
            round6(
                F.lit(4.71) * cw + F.lit(0.5) * ws - F.lit(21.43)
            ),
        ).alias("ari"),
    ).orderBy("doc_id")
