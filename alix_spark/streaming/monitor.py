"""Streaming crawl monitoring + stateful dedup operators.

The reference is a frozen batch index (SURVEY §2.7: no streaming ops);
these operators are the briefing's Structured-Streaming additions for
a continuously-crawling training-data pipeline:

- :func:`crawl_rate` — event-time windowed page counts with a
  WATERMARK: late pages (beyond the allowed delay) are dropped and
  windows finalize exactly once (append mode), so a downstream
  dashboard sink never sees a finalized window twice.
- :func:`first_seen` — CUSTOM stateful streaming dedup via
  ``applyInPandasWithState``: the first page per content hash passes,
  every later recrawl/mirror is suppressed across micro-batches. This
  is the streaming twin of the batch exact-dedup tier
  (textops.dedup.exact_dup_groups) for pipelines that must emit
  training shards continuously instead of recompacting.

Scale notes: the window agg is a standard watermarked hash aggregation
(partial per executor, state store per window); first_seen's state is
one marker row per DISTINCT content hash, hash-partitioned across
executors by the groupBy key — state size is bounded by distinct
content, not stream length.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

# lang_drift interpolates baseline keys into derived column names
_LANG_KEY_RE = re.compile(r"[A-Za-z0-9_-]+")

FIRST_SEEN_SCHEMA = (
    "url string, warc_ts timestamp, lang string, content_md5 string"
)


def crawl_rate(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(window_start, window_end, lang, pages) finalized crawl-rate
    histogram over a STREAMING pages frame.

    ``withWatermark``: a page arriving more than ``watermark`` behind
    the max event time seen so far is dropped (late data); a window
    emits (append mode) only once the watermark passes its end, so the
    result stream is insert-only and safe for an idempotent sink."""
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "lang")
        .agg(F.count("*").alias("pages"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "pages",
        )
    )


def _first_seen_fn(key, pdf_iter, state):
    """Emit the first row for an unseen content hash; suppress the key
    forever after (state = one marker per distinct hash)."""
    import pandas as pd

    if state.exists:
        for _ in pdf_iter:  # drain (recrawls of an already-seen page)
            pass
        return iter(())
    best = None
    for pdf in pdf_iter:
        cand = pdf.sort_values(["warc_ts", "url"]).head(1)
        if best is None or (
            (cand["warc_ts"].iloc[0], cand["url"].iloc[0])
            < (best["warc_ts"].iloc[0], best["url"].iloc[0])
        ):
            best = cand
    state.update((1,))
    if best is None:
        return iter(())
    return iter(
        (best[["url", "warc_ts", "lang", "content_md5"]],)
    )


def first_seen(pages: DataFrame) -> DataFrame:
    """Streaming first-occurrence filter keyed by content hash.

    Input: a streaming frame with (url, warc_ts, html, lang). Output:
    one row per DISTINCT html payload — the earliest (warc_ts, url)
    occurrence within its first micro-batch; later batches never
    re-emit (the reference batch pipeline dedups at compaction;
    this is the continuous-emission variant)."""
    from alix_spark.util import ensure_py_files

    # _first_seen_fn pickles by reference to this module: executors
    # must be able to import alix_spark from any driver cwd
    ensure_py_files(pages.sparkSession)
    keyed = pages.select(
        "url", "warc_ts", "lang", F.md5(F.col("html")).alias("content_md5")
    )
    deduped = (
        keyed.filter(F.col("content_md5").isNotNull())
        .groupBy("content_md5")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # NULL-payload pages carry no content to compare and PASS THROUGH
    # un-deduped (the recent_dedup/batch-tier convention, review batch
    # 32): md5(NULL) is NULL, and a NULL group key would collapse
    # EVERY payload-less page into one state group — the first would
    # emit and all later ones would be suppressed forever.
    return deduped.unionByName(keyed.filter(F.col("content_md5").isNull()))


def quality_rate(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(window_start, window_end, lang, pages, kept, keep_rate):
    watermarked windowed QUALITY keep-rate per language — the crawl-
    health dashboard behind admission gating: a window whose keep_rate
    collapses flags a bad crawl seed/domain batch the moment its
    window finalizes, instead of after the next batch recompaction.

    The verdict is the EXACT batch Gopher gate (textstats
    gopher_metrics + gopher_keep — one shared expression set, so the
    monitor can never drift from the offline gate); pages gate on
    their decoded payload (production pipelines would run the webtext
    extraction first — the gate is text-level either way). Same
    watermark/append-mode semantics as :func:`crawl_rate`: late pages
    drop, windows finalize exactly once, the sink stays insert-only.

    Scale: metrics are JVM column expressions per row; the agg is a
    standard watermarked hash aggregation (partial per executor) —
    state is one row per (window, lang), never per page."""
    from alix_spark.textops.textstats import gopher_keep, gopher_metrics
    from alix_spark.util import round6

    m = pages.select(
        ts_col,
        "lang",
        *(
            c.alias(k)
            for k, c in gopher_metrics(
                F.decode(F.col("html"), "UTF-8")
            ).items()
        ),
    )
    kept = F.when(gopher_keep(), F.lit(1)).otherwise(F.lit(0))
    return (
        m.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "lang")
        .agg(
            F.count("*").cast("long").alias("pages"),
            F.sum(kept).cast("long").alias("kept"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang",
            "pages",
            "kept",
            round6(
                F.col("kept").cast("double") / F.col("pages").cast("double")
            ).alias("keep_rate"),
        )
    )


def host_sessions(
    pages: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """(host, session_start, session_end, pages): per-host crawl
    SESSIONIZATION via ``session_window`` — consecutive fetches from
    one host merge while their gaps stay under ``gap``; a longer pause
    closes the session. The politeness/health view a crawl operator
    watches: a session with thousands of pages and no pause is a
    crawler hammering one host; many one-page sessions on one host is
    a seed list thrashing.

    Same watermark/append semantics as :func:`crawl_rate`: a session
    emits exactly once, after the watermark passes its close (sessions
    have data-driven ends — MERGING stays possible until then), so the
    sink stays insert-only. Hosts parse JVM-side (``parse_url``);
    NULL/unparseable urls group under host NULL rather than vanishing.

    Scale: session state is per (host, open session) — bounded by
    active hosts within the watermark horizon, not stream length; the
    merge is the state store's sorted-interval union, never a shuffle
    of history."""
    host = F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host")
    return (
        pages.select(F.col(ts_col), host)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), "host")
        .agg(F.count("*").cast("long").alias("pages"))
        .select(
            "host",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "pages",
        )
    )


def lang_drift(
    pages: DataFrame,
    baseline: dict[str, float],
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    threshold: float = 0.2,
) -> DataFrame:
    """(window_start, window_end, pages, <lang> counts…, tvd, drifted):
    windowed language-MIX drift monitor — total-variation distance
    between each finalized window's language shares and the corpus
    ``baseline`` (the shares the training mixture was designed
    around). A drifting crawl (a seed-list change flooding one
    language, a lang-ID regression) shows up the moment its window
    finalizes, not after the next mixture rebalance; ``threshold`` is
    the alert line (TVD ∈ [0, 1], 0.2 ≈ a fifth of the mass moved).

    ``baseline`` maps lang → expected share (shares ≥ 0, Σ ≤ 1; the
    remainder is the expected OTHER mass). Because the baseline langs
    are known up front, per-lang counts are conditional sums inside
    ONE watermarked aggregation — no second stateful stage, no pivot,
    state one row per window; the same append-mode/insert-only
    finalization contract as :func:`crawl_rate`. NULL lang counts as
    OTHER (it is observed mass, just not a baseline language).

    Scale: per-row work is a handful of CASE columns; the agg is a
    standard watermarked hash aggregation. TVD is computed per
    finalized window row — a few dozen column ops on a tiny result."""
    from alix_spark.util import round6

    if not baseline:
        raise ValueError("lang_drift: baseline must name at least one lang")
    for lang in baseline:
        # the lang is interpolated into derived column names (n_<lang>)
        # that are later re-selected by string: a dot would parse as a
        # struct-field access and a backtick would break quoting, both
        # surfacing as a confusing unresolved-column analysis error —
        # reject at entry like the other guards (ADVICE r04)
        if not isinstance(lang, str) or not _LANG_KEY_RE.fullmatch(lang):
            raise ValueError(
                f"lang_drift: baseline key {lang!r} must match "
                "[A-Za-z0-9_-]+ (it names a derived column)"
            )
    if any(v < 0 for v in baseline.values()):
        raise ValueError("lang_drift: baseline shares must be >= 0")
    total_share = sum(baseline.values())
    if total_share > 1.0 + 1e-9:
        raise ValueError("lang_drift: baseline shares must sum to <= 1")
    langs = sorted(baseline)
    other_share = max(0.0, 1.0 - total_share)
    agg = (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count("*").cast("long").alias("pages"),
            *(
                F.sum(
                    F.when(F.col("lang") == lang, F.lit(1)).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(f"n_{lang}")
                for lang in langs
            ),
        )
    )
    total = F.col("pages").cast("double")
    dev = None
    for lang in langs:
        term = F.abs(
            F.col(f"n_{lang}").cast("double") / total - F.lit(baseline[lang])
        )
        dev = term if dev is None else dev + term
    n_other = F.col("pages") - sum(F.col(f"n_{lang}") for lang in langs)
    dev = dev + F.abs(n_other.cast("double") / total - F.lit(other_share))
    tvd = round6(dev / F.lit(2.0))
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "pages",
        *(f"n_{lang}" for lang in langs),
        tvd.alias("tvd"),
        (tvd >= F.lit(threshold)).alias("drifted"),
    )


def recent_dedup(pages: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Streaming content dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` on the content hash — a recrawl
    of the same payload within the watermark horizon is suppressed;
    state for a hash is evicted once the watermark passes it, so a
    re-fetch far later CAN re-emit.

    The production-scale twin of :func:`first_seen`: first_seen
    guarantees global first-occurrence but its state grows with
    DISTINCT content forever (10^12 markers at crawl scale);
    recent_dedup bounds state to the watermark horizon — the standard
    state-TTL trade (dedup exactness within the horizon, periodic
    batch compaction — textops.dedup — owns cross-horizon exactness).
    Output rows are the surviving pages (url, warc_ts, lang,
    content_md5), insert-only. NULL-payload pages carry no content to
    compare and PASS THROUGH un-deduped (the batch tiers' NULL-text
    convention; review batch 25 — a NULL dedup key would collapse
    every payload-less page within the horizon into one emission)."""
    keyed = pages.select(
        "url", "warc_ts", "lang", F.md5(F.col("html")).alias("content_md5")
    )
    deduped = (
        keyed.filter(F.col("content_md5").isNotNull())
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )
    return deduped.unionByName(keyed.filter(F.col("content_md5").isNull()))
