"""Partitioned keyness: focus part vs every other part, or vs corpus.

Exact port of the reference's six ``PartScorer`` variants
(common/.../terms/PartScorer.java):

Pairwise family (``LogLikelihoodBase``, :353-524):
- ``min``: ``LogLikelihood`` strict dominance — min of pairwise signed
  2×2 G² vs every other part (:542-592)
- ``tail``: ``LogLikelihoodTail`` — mean of the worst ``ceil(0.2·n)``
  pairwise scores (:706-779 — the default scorer for date-partitioned
  keyness, web/.../OpTerms.java:130-134)
with zero-cells contributing 0 and the sign from rate comparison
(:1286-1335), parts under ``min_part_tokens`` excluded (:487-489),
terms with ``focus_term_docs < min_focus_term_docs`` dropped (:419),
and the final score multiplied by focus-coverage dispersion
``(focusTermDocs/focusDocs)^dispersion`` (:447, :1370-1380).

Corpus family (``CorpusScorer``, :72-226 — focus vs the WHOLE
partition under a proportional null, floor ``a >= min_focus_term_freq``
:324, corpus totals over positive-token parts :190-225):
- ``residual``: ``LogLikelihoodResidual`` — signed sqrt of the focus
  row's G² deviance (:622-682)
- ``pearson``: ``Pearson`` — focus-cell adjusted Pearson residual
  ``(O-E)/sqrt(E(1-partProp)(1-termProp))`` (:791-849)
- ``specificity``: ``Specificity`` — signed hypergeometric tail
  ``±log10 P[X≷k]`` via Lanczos logΓ + recurrence summation
  (:966-1223); per-term scalar kernel in an Arrow-batched pandas UDF
  (work is vocabulary-bounded, not corpus-bounded, and embarrassingly
  parallel across vocab partitions)

Focus family (``FocusScorer``, :237-337):
- ``rateratio``: ``RateRatio`` — smoothed log2 rate ratio vs the
  strongest valid non-focus part (:861-945)

Spark shape: one groupBy to (term, part) counts, one to part totals,
a broadcast join, then either a per-term window (pairwise) or 1-row
corpus-stat broadcasts (corpus family) — no driver-side loops,
SQL-expressible end-to-end (oracle-checked).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from alix_spark.util import round6

DISPERSION = 0.3        # reference :545
MIN_FOCUS_TERM_DOCS = 3  # reference :548
TAIL_FRACTION = 0.2      # reference :717
MAX_PARTS = 128          # reference Partition.java byte map bound
MIN_FOCUS_TERM_FREQ = 5  # reference :37 DEFAULT_MIN_FOCUS_TERM_FREQ
MIN_PART_TOKENS = 1000   # reference :40 DEFAULT_MIN_PART_TOKENS
RATE_ALPHA = 0.3         # reference :874 RateRatio() default alpha

# Partition.build repair floors (Partition.java)
TARGET_NON_FOCUS = 12        # :73 DEFAULT_TARGET_NON_FOCUS_PARTS
MIN_EXTREMITY_TOKENS = 25_000  # :88
MIN_INTERNAL_DOCS = 10       # :102
MIN_INTERNAL_TOKENS = 1_000  # :116
MAX_DENSE_RANGE = 1_000_000  # denseRange practicality guard (the
# reference allocates int[range]; chronological axes are inherently
# small — this catches a caller passing e.g. epoch seconds)


def parts_from_numeric(
    df: DataFrame,
    col: str,
    bounds: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, part) from a numeric column and range boundaries —
    the reference's ``Partition.build`` (common/.../terms/
    Partition.java:60-330: docId→part byte map from numeric field
    ranges, ≤128 parts). ``bounds = [b1, b2, …]`` yields parts
    ``"<b1"``, ``"[b1,b2)"``, …, ``">=bn"``.

    Docs with a NULL value are EXCLUDED, like the reference's byte map
    rejecting unassigned docs (``NO_PART = -1``) — not silently routed
    into the top range part (ADVICE r1). NaN is excluded the same way:
    in Spark SQL NaN compares greater than every double, so it would
    otherwise fall through every range ``when()`` straight into the
    ``>=bn`` part."""
    if not bounds:
        raise ValueError("bounds must name at least one boundary")
    if list(bounds) != sorted(bounds):
        raise ValueError(f"bounds must be ascending: {bounds}")
    if len(bounds) + 1 > MAX_PARTS:
        raise ValueError(f"at most {MAX_PARTS} parts (reference byte map)")
    expr = F.when(F.col(col) < bounds[0], F.lit(f"<{bounds[0]}"))
    for lo, hi in zip(bounds, bounds[1:]):
        expr = expr.when(
            (F.col(col) >= lo) & (F.col(col) < hi), F.lit(f"[{lo},{hi})")
        )
    expr = expr.otherwise(F.lit(f">={bounds[-1]}"))
    keep = F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    return df.filter(keep).select(
        F.col(id_col).alias("doc_id"), expr.alias("part")
    )


def _signed_g2():
    """Column expr over a (focus term freq), fa (focus tokens),
    b (part term freq), fb (part tokens) — PartScorer.signedG2."""
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    fa = F.col("fa").cast("double")
    fb = F.col("fb").cast("double")
    na, nb = fa - a, fb - b
    n = fa + fb
    t, nt = a + b, na + nb

    def cell(o, e):
        return F.when((o > 0) & (e > 0), 2.0 * o * F.log(o / e)).otherwise(0.0)

    g2 = (
        cell(a, t * fa / n)
        + cell(b, t * fb / n)
        + cell(na, nt * fa / n)
        + cell(nb, nt * fb / n)
    )
    g2 = F.when((t <= 0) | (nt <= 0), F.lit(0.0)).otherwise(g2)
    return F.when(a / fa >= b / fb, g2).otherwise(-g2)


# --------------------------------------- chronological Partition.build


def _cut_and_repair(hist, int_min, int_max, start, end, target_non_focus):
    """Exact port of Partition.build phases 2-4 (Partition.java:214-366,
    helpers :560-998): the focus interval [start, end] stays one
    indivisible part; non-focus values are cut into periods of width
    ``max(1, ceil(nonFocusOffsets / target))``; each side is repaired
    independently (extremity expansion until full width + >=10 docs +
    >=25k tokens, then Huffman-style merge of internal periods under
    10 docs / 1k tokens into their smaller-token neighbor).

    ``hist``: {value_offset: (docs, tokens)} over dense offsets.
    Returns (periods, focus_part) with periods = [(first, last, docs,
    tokens)] in chronological order, offsets dense from ``int_min``.
    """
    rng = int_max - int_min + 1
    focus_first = max(start, int_min) - int_min
    focus_last = min(end, int_max) - int_min

    def period(first, last):
        d = sum(hist.get(o, (0, 0))[0] for o in range(first, last + 1))
        t = sum(hist.get(o, (0, 0))[1] for o in range(first, last + 1))
        return [first, last, d, t]

    focus = period(focus_first, focus_last)
    if focus[2] <= 0 or focus[3] <= 0:
        raise ValueError(
            f"focus interval [{start},{end}] has no accepted text tokens"
        )

    non_focus_offsets = focus_first + (rng - focus_last - 1)
    base_width = (
        1 if non_focus_offsets <= 0
        else max(1, math.ceil(non_focus_offsets / target_non_focus))
    )

    left = []
    last = focus_first - 1
    while last >= 0:
        first = max(0, last - base_width + 1)
        left.append(period(first, last))
        last = first - 1
    left.reverse()
    right = []
    first = focus_last + 1
    while first < rng:
        last = min(rng - 1, first + base_width - 1)
        right.append(period(first, last))
        first = last + 1

    def merge_adjacent(ps, i):
        a, b = ps[i], ps[i + 1]
        ps[i] = [min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2], a[3] + b[3]]
        del ps[i + 1]

    def weak_extremity(p):
        return (
            (p[1] - p[0] + 1) < base_width
            or p[2] < MIN_INTERNAL_DOCS
            or p[3] < MIN_EXTREMITY_TOKENS
        )

    def weak_internal(p):
        return p[2] < MIN_INTERNAL_DOCS or p[3] < MIN_INTERNAL_TOKENS

    def repair(raw):
        ps = [p for p in raw if p[2] > 0 and p[3] > 0]
        while len(ps) > 1 and weak_extremity(ps[0]):
            merge_adjacent(ps, 0)
        while len(ps) > 1 and weak_extremity(ps[-1]):
            merge_adjacent(ps, len(ps) - 2)
        i = 1
        while i < len(ps) - 1:
            if not weak_internal(ps[i]):
                i += 1
                continue
            if ps[i - 1][3] <= ps[i + 1][3]:
                merge_adjacent(ps, i - 1)
                i = max(1, i - 1)
            else:
                merge_adjacent(ps, i)
        return ps

    left, right = repair(left), repair(right)
    if not left and not right:
        raise ValueError(
            f"no non-focus accepted text tokens outside [{start},{end}]"
        )
    periods = left + [focus] + right
    if len(periods) > MAX_PARTS:
        raise ValueError(f"too many parts: {len(periods)}")
    return periods, len(left)


def build_chrono_parts(
    doc_values: DataFrame,
    doc_tokens: DataFrame,
    start: int,
    end: int,
    target_non_focus: int = TARGET_NON_FOCUS,
):
    """The reference's default date partition for contrastive
    chronological scoring (Partition.build, Partition.java:214-366).

    ``doc_values``: (doc_id, value) with an integral value column;
    ``doc_tokens``: (doc_id, dl) indexed-token counts. A document is
    accepted when its value is present and ``dl > 0`` (tallyValues
    :922-941 — document counts and token denominators stay aligned).
    The field min/max come from every document WITH a value, like
    ``FlucNum.min()/max()``.

    Returns ``(doc_parts, focus_part, periods)``: a (doc_id, part int)
    frame (docs outside every repaired period are excluded = NO_PART),
    the focus part id, and the period table [(first_value, last_value,
    docs, tokens)].

    Scale shape: ONE small aggregate per value (the histogram is
    value-bounded — years, days — never corpus-bounded) collected to
    the driver for the sequential repair walk, then a <=128-arm CASE
    maps documents to parts; no shuffle beyond the histogram groupBy.
    """
    if start > end:
        raise ValueError(f"invalid focus interval: [{start},{end}]")
    if not (1 <= target_non_focus <= MAX_PARTS - 1):
        raise ValueError(f"target_non_focus out of range: {target_non_focus}")

    vals = doc_values.select("doc_id", F.col("value").cast("long").alias("value"))
    bounds = vals.filter(F.col("value").isNotNull()).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        raise ValueError("no document carries a value")
    int_min, int_max = int(bounds["lo"]), int(bounds["hi"])
    if end < int_min or start > int_max:
        raise ValueError(
            f"focus [{start},{end}] outside field range [{int_min},{int_max}]"
        )
    if int_max - int_min + 1 > MAX_DENSE_RANGE:
        raise ValueError(
            f"dense range {int_max - int_min + 1} too large; bin the axis first"
        )

    # one join over the per-doc frame: dl rides along for the histogram
    # aggregate and is simply projected away for the doc_parts output
    # (a second doc_tokens join to recover dl re-shuffled the frame)
    accepted = (
        vals.filter(F.col("value").isNotNull())
        .join(doc_tokens.filter(F.col("dl") > 0).select("doc_id", "dl"), "doc_id")
    )
    hist_rows = (
        accepted.groupBy("value")
        .agg(F.count("*").alias("docs"), F.sum("dl").alias("tokens"))
        .collect()
    )
    hist = {
        int(r["value"]) - int_min: (int(r["docs"]), int(r["tokens"]))
        for r in hist_rows
    }
    periods, focus_part = _cut_and_repair(
        hist, int_min, int_max, start, end, target_non_focus
    )

    expr = None
    for part, (first, last, _d, _t) in enumerate(periods):
        cond = F.col("value").between(int_min + first, int_min + last)
        expr = F.when(cond, F.lit(part)) if expr is None else expr.when(
            cond, F.lit(part)
        )
    doc_parts = accepted.select(
        "doc_id", expr.alias("part")
    ).filter(F.col("part").isNotNull())
    return doc_parts, focus_part, [
        (int_min + f, int_min + l, d, t) for f, l, d, t in periods
    ]


# ------------------------------------------------ Specificity kernel
# Exact scalar port of PartScorer.Specificity (reference :966-1223):
# the same Lanczos logΓ coefficients, the same left-to-right double
# operation order, the same 1e-14 tail cutoff — so the DuckDB oracle
# (which inlines the identical arithmetic) matches bit-for-bit
# (math.log ≡ DuckDB ln on glibc, verified 0/20004 diffs).

_LANCZOS = (
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
)
_TAIL_EPS = 1e-14  # reference :972
_LOG10 = math.log(10.0)  # reference :969


def _log_gamma(x: float) -> float:
    """Lanczos log Γ(x) for x >= 0.5 (reference :1079-1111; the
    reflection branch is unreachable here — every call site passes
    count + 1 >= 1)."""
    y = x - 1.0
    a = 0.99999999999980993
    for i, c in enumerate(_LANCZOS):
        a += c / (y + i + 1.0)
    t = y + len(_LANCZOS) - 0.5
    return 0.5 * math.log(2.0 * math.pi) + (y + 0.5) * math.log(t) - t + math.log(a)


def _log_choose(n: int, k: int) -> float:
    """log C(n,k) (reference :1056-1071)."""
    if k < 0 or k > n:
        return math.nan
    kk = min(k, n - k)
    if kk == 0:
        return 0.0
    return (
        _log_gamma(float(n) + 1.0)
        - _log_gamma(float(kk) + 1.0)
        - _log_gamma(float(n - kk) + 1.0)
    )


def _log_hyper(N: int, K: int, n: int, k: int) -> float:
    return _log_choose(K, k) + _log_choose(N - K, n - k) - _log_choose(N, n)


def _log_upper_tail(N: int, K: int, n: int, k: int, hi: int) -> float:
    """log P[X >= k] by recurrence from k upward (reference :1189-1223)."""
    logp = _log_hyper(N, K, n, k)
    if math.isnan(logp):
        return math.nan
    s = 1.0
    t = 1.0
    for x in range(k, hi):
        r = (float(K - x) / float(x + 1)) * (
            float(n - x) / float(N - K - n + x + 1)
        )
        if r <= 0.0:
            break
        t *= r
        s += t
        if t <= s * _TAIL_EPS:
            break
    return logp + math.log(s)


def _log_lower_tail(N: int, K: int, n: int, k: int, lo: int) -> float:
    """log P[X <= k] by recurrence from k downward (reference :1143-1177)."""
    logp = _log_hyper(N, K, n, k)
    if math.isnan(logp):
        return math.nan
    s = 1.0
    t = 1.0
    for x in range(k, lo, -1):
        r = (float(x) / float(K - x + 1)) * (
            float(N - K - n + x) / float(n - x + 1)
        )
        if r <= 0.0:
            break
        t *= r
        s += t
        if t <= s * _TAIL_EPS:
            break
    return logp + math.log(s)


def specificity_score(k: int, n: int, K: int, N: int):
    """Signed hypergeometric specificity for one term
    (reference Specificity.score :1004-1047). Returns None for NaN."""
    if K > N or n > N:
        return None
    lo = max(0, n - (N - K))
    hi = min(n, K)
    if k < lo or k > hi:
        return None
    expected = float(n) * float(K) / float(N)
    if float(k) >= expected:
        log_tail = _log_upper_tail(N, K, n, k, hi)
        sgn = 1.0
    else:
        log_tail = _log_lower_tail(N, K, n, k, lo)
        sgn = -1.0
    if math.isnan(log_tail):
        return None
    return sgn * (-log_tail / _LOG10)


def partition_keyness(
    tok: DataFrame,
    doc_parts: DataFrame,
    focus_part: str,
    scorer: str = "tail",
    min_part_tokens: int = 0,
    min_focus_term_docs: int = MIN_FOCUS_TERM_DOCS,
    dispersion: float = DISPERSION,
    tail_fraction: float = TAIL_FRACTION,
    min_focus_term_freq: int = MIN_FOCUS_TERM_FREQ,
    alpha: float = RATE_ALPHA,
    top: int = 50,
) -> DataFrame:
    """tok: (doc_id, term) token table; doc_parts: (doc_id, part).

    Returns (term, score) top-k, score desc then term asc.
    scorer: 'min' (LogLikelihood strict dominance), 'tail'
    (LogLikelihoodTail, mean of worst 20%), 'residual'
    (LogLikelihoodResidual), 'pearson' (adjusted Pearson residual),
    'rateratio' (smoothed log2 rate ratio vs strongest other part),
    or 'specificity' (signed hypergeometric tail).

    The pairwise scorers ('min'/'tail') use the ``min_focus_term_docs``
    floor + coverage dispersion; the corpus/focus scorers use the
    ``min_focus_term_freq`` occurrence floor and no dispersion, exactly
    as the reference's class hierarchy splits them."""
    from alix_spark.util import maybe_broadcast

    # ONE token-level aggregate feeds every downstream table: the
    # (doc, term) roll-up shuffles once and its exchange is reused by
    # the part/term/doc-count branches (the previous shape re-scanned —
    # and at web scale re-ANALYZED — the token table once per table).
    # Values are integer-exact identical: freq = Σ tf, ftd = rows per
    # (focus, term) since (doc, term) is unique after the roll-up.
    post = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # select THEN distinct: a duplicated (doc_id, part) label row (a
    # raw filter-query output, possibly carrying extra columns like a
    # score) must not double-count freq/ftd — the same discipline as
    # theme_weights_focus/keyness; the projection also keeps stray
    # columns from colliding with post's after the join
    doc_parts = doc_parts.select("doc_id", "part").distinct()
    tp = post.join(maybe_broadcast(doc_parts), "doc_id")  # per-doc labels grow with the corpus

    term_part = tp.groupBy("term", "part").agg(F.sum("tf").alias("freq"))
    part_tokens = term_part.groupBy("part").agg(F.sum("freq").alias("part_toks"))

    focus_tokens = part_tokens.filter(F.col("part") == focus_part).select(
        F.col("part_toks").alias("fa")
    )
    focus_counts = (
        term_part.filter(F.col("part") == focus_part)
        .select("term", F.col("freq").alias("a"))
    )
    if scorer in ("residual", "pearson", "specificity", "rateratio"):
        return _score_corpus_family(
            scorer, focus_part, term_part, part_tokens, focus_tokens,
            focus_counts, min_focus_term_freq, min_part_tokens, alpha, top,
            tok.sparkSession,
        )
    if scorer not in ("min", "tail"):
        raise KeyError(scorer)

    focus_term_docs = (
        tp.filter(F.col("part") == focus_part)
        .groupBy("term")
        .agg(F.count("*").alias("ftd"))
    )
    # the coverage denominator as a LAZY in-plan 1-row aggregate +
    # broadcast crossJoin — an eager .count() here would run a Spark
    # job at construction time and then re-execute the same subplan
    # inside the main plan (the corpus-family/theme nfd discipline;
    # review batch 27)
    focus_docs_nd = (
        doc_parts.filter(F.col("part") == focus_part)
        .agg(F.count("*").cast("double").alias("focus_docs_n"))
    )

    # every (term, non-focus part) cell, including zero cells for parts
    # where the term is absent (cross of focus terms × valid parts)
    valid_parts = part_tokens.filter(
        (F.col("part") != focus_part) & (F.col("part_toks") >= min_part_tokens)
    )
    cells = (
        focus_counts.crossJoin(F.broadcast(valid_parts))
        .join(
            term_part.withColumnRenamed("freq", "b"),
            ["term", "part"],
            "left",
        )
        .withColumn("b", F.coalesce(F.col("b"), F.lit(0)))
        .withColumnRenamed("part_toks", "fb")
        .crossJoin(F.broadcast(focus_tokens))
        .withColumn("g2", _signed_g2())
    )

    w = Window.partitionBy("term").orderBy(F.asc("g2"))
    ranked = cells.withColumn("rk", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("term"))
    )
    if scorer == "min":
        agg = (
            ranked.filter(F.col("rk") == 1)
            .select("term", F.col("g2").alias("raw"))
        )
    elif scorer == "tail":
        tail_n = F.greatest(
            F.lit(1), F.ceil(F.col("cnt") * F.lit(tail_fraction))
        )
        agg = (
            ranked.filter(F.col("rk") <= tail_n)
            .groupBy("term")
            .agg(F.avg("g2").alias("raw"))
        )
    else:
        raise KeyError(scorer)

    coverage = F.pow(
        F.col("ftd").cast("double") / F.col("focus_docs_n"),
        F.lit(dispersion),
    )
    return (
        agg.join(focus_term_docs, "term")
        .filter(F.col("ftd") >= min_focus_term_docs)
        .crossJoin(F.broadcast(focus_docs_nd))
        .select("term", round6(F.col("raw") * coverage).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top)
    )


def _score_corpus_family(
    scorer, focus_part, term_part, part_tokens, focus_tokens, focus_counts,
    min_focus_term_freq, min_part_tokens, alpha, top, spark,
):
    """Residual / Pearson / Specificity (CorpusScorer) and RateRatio
    (FocusScorer) branches: occurrence floor ``a >= min_focus_term_freq``
    (reference :324), corpus totals over every positive-token part with
    the focus included (:190-225), no coverage dispersion. NaN rows are
    dropped; degenerate-variance / zero-deviance rows keep score 0,
    exactly as the reference distinguishes them."""
    base = focus_counts.filter(F.col("a") >= min_focus_term_freq)
    a = F.col("a").cast("double")
    fa = F.col("fa").cast("double")

    if scorer == "rateratio":
        # RateRatio (:861-945): smoothed rate vs the strongest other
        # part; a term absent from a valid part still contributes
        # (0+α)/(fb+α) to the max, hence the left join + coalesce
        valid_parts = part_tokens.filter(
            (F.col("part") != focus_part)
            & (F.col("part_toks") >= min_part_tokens)
        )
        other_rate = (
            F.coalesce(F.col("b"), F.lit(0)).cast("double") + F.lit(alpha)
        ) / (F.col("part_toks").cast("double") + F.lit(alpha))
        per_part = base.crossJoin(F.broadcast(valid_parts)).join(
            term_part.withColumnRenamed("freq", "b"), ["term", "part"], "left"
        )
        mo = per_part.groupBy("term", "a").agg(
            F.max(other_rate).alias("max_other_rate")
        )
        focus_rate = (a + F.lit(alpha)) / (fa + F.lit(alpha))
        raw = F.log(focus_rate / F.col("max_other_rate")) / F.lit(math.log(2.0))
        scored = mo.crossJoin(F.broadcast(focus_tokens)).select(
            "term", raw.alias("raw")
        )
    else:
        # CorpusScorer.corpusStats (:190-225) needs at least one other
        # positive-token part. Expressed as a lazy broadcast scalar +
        # filter (not an eager count) so the guard shares ONE physical
        # plan with the scored frame — an eager action here ran the
        # whole token-aggregation pipeline a second time at corpus
        # scale (shuffle exchanges are only reused within one plan).
        other_parts = part_tokens.filter(F.col("part") != focus_part).agg(
            F.count("*").alias("other_parts")
        )
        totals = part_tokens.agg(F.sum("part_toks").alias("nn"))
        term_totals = term_part.groupBy("term").agg(F.sum("freq").alias("kk"))
        st = (
            base.join(term_totals, "term")
            .crossJoin(F.broadcast(focus_tokens))
            .crossJoin(F.broadcast(totals))
            .crossJoin(F.broadcast(other_parts))
            .filter(F.col("other_parts") > 0)
        )
        kk = F.col("kk").cast("double")
        nn = F.col("nn").cast("double")
        expected = fa * kk / nn

        if scorer == "pearson":
            # Pearson (:824-848): (O-E)/sqrt(E(1-partProp)(1-termProp))
            variance = expected * (1.0 - fa / nn) * (1.0 - kk / nn)
            raw = F.when(variance <= 0, F.lit(0.0)).otherwise(
                (a - expected) / F.sqrt(variance)
            )
            scored = st.filter(expected > 0).select("term", raw.alias("raw"))
        elif scorer == "residual":
            # LogLikelihoodResidual (:655-681): signed sqrt of the
            # focus row's deviance, devianceCell (:1349-1360)
            def dev(o, e):
                return F.when(o <= 0, 2.0 * e).otherwise(
                    2.0 * (o * F.log(o / e) - o + e)
                )

            g2 = dev(a, expected) + dev(fa - a, fa - expected)
            raw = F.when(g2 <= 0, F.lit(0.0)).otherwise(
                F.when(a - expected >= 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                * F.sqrt(g2)
            )
            scored = st.filter((expected > 0) & (expected < fa)).select(
                "term", raw.alias("raw")
            )
        else:  # specificity
            from alix_spark.util import ensure_py_files

            ensure_py_files(spark)

            def _spec_batches(batches):
                # one Arrow stage; NaN (out-of-support) rows dropped
                # in-function so no downstream filter re-evaluates the
                # kernel (a pandas_udf + isnan filter duplicated the
                # Python stage in the physical plan)
                import pandas as pd

                for pdf in batches:
                    raw = [
                        specificity_score(int(k), int(n), int(K), int(N))
                        for k, n, K, N in zip(
                            pdf["k"], pdf["n"], pdf["kk"], pdf["nn"]
                        )
                    ]
                    out = pd.DataFrame(
                        {
                            "term": pdf["term"].to_numpy(),
                            "raw": pd.array(raw, dtype="float64"),
                        }
                    )
                    yield out[out["raw"].notna()]

            scored = st.select(
                "term",
                F.col("a").cast("long").alias("k"),
                F.col("fa").cast("long").alias("n"),
                F.col("kk").cast("long").alias("kk"),
                F.col("nn").cast("long").alias("nn"),
            ).mapInPandas(_spec_batches, "term string, raw double")

    return (
        scored.select("term", round6(F.col("raw")).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top)
    )
