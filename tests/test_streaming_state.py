"""Watermarked windowed aggregation + custom stateful streaming dedup
(streaming/monitor.py — the briefing's Structured-Streaming operators;
the reference itself is a frozen batch index)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from alix_spark.streaming import monitor

SCHEMA = "url string, warc_ts timestamp, html binary, lang string"


def _write_drop(spark, rows, path):
    raw = "url string, warc_ts string, html binary, lang string"
    spark.createDataFrame(rows, raw).withColumn(
        "warc_ts", F.col("warc_ts").cast("timestamp")
    ).select("url", "warc_ts", "html", "lang").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _run_stream(spark, source_glob, build, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")  # one micro-batch per drop
        .parquet(source_glob)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_crawl_rate_drops_late_rows_and_finalizes_windows(spark, tmp_path):
    """A row arriving beyond the watermark is DROPPED; a window emits
    once its end passes the watermark (append mode) — insert-only."""
    src = str(tmp_path / "src")
    # drop 1: two pages in the 10:00 window
    _write_drop(spark, [
        ("https://a/1", "2024-01-01 10:10:00", b"<p>x</p>", "fr"),
        ("https://a/2", "2024-01-01 10:40:00", b"<p>y</p>", "fr"),
    ], os.path.join(src, "drop1"))
    # drops 2+3: advance event time to 14:06 → watermark 12:06 passes
    # 11:00, so the 10:00 window finalizes (evicts) during drop 3's
    # batch. (Spark drops a late row only once its window's state is
    # evicted — a late row in the SAME batch as the eviction still
    # merges; the keep-alive drop pins the eviction a batch early.)
    _write_drop(spark, [
        ("https://a/3", "2024-01-01 14:05:00", b"<p>z</p>", "fr"),
    ], os.path.join(src, "drop2"))
    _write_drop(spark, [
        ("https://a/5", "2024-01-01 14:06:00", b"<p>w</p>", "fr"),
    ], os.path.join(src, "drop3"))
    # drop 4: a LATE page for the already-finalized 10:00 window —
    # dropped by the watermark, never re-emitted (insert-only contract)
    _write_drop(spark, [
        ("https://a/4", "2024-01-01 10:20:00", b"<p>late</p>", "fr"),
    ], os.path.join(src, "drop4"))

    out = _run_stream(
        spark, src + "/*",
        lambda s: monitor.crawl_rate(s, window="1 hour", watermark="2 hours"),
        "crawl_rate_sink",
    ).collect()
    by_start = {str(r["window_start"]): r["pages"] for r in out}
    assert by_start.get("2024-01-01 10:00:00") == 2  # late row excluded
    # exactly one emission per finalized window (insert-only)
    assert len(out) == len(by_start)
    # the 14:00 window never finalized (watermark never passed 15:00)
    assert "2024-01-01 14:00:00" not in by_start


def test_first_seen_suppresses_recrawls_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: the first occurrence of a content
    hash passes; identical payloads in the SAME batch and in LATER
    batches are suppressed; distinct payloads all pass."""
    src = str(tmp_path / "src")
    _write_drop(spark, [
        ("https://b/1", "2024-01-01 10:00:00", b"<p>same</p>", "fr"),
        ("https://b/2", "2024-01-01 10:01:00", b"<p>same</p>", "fr"),
        ("https://b/3", "2024-01-01 10:02:00", b"<p>other</p>", "fr"),
    ], os.path.join(src, "drop1"))
    _write_drop(spark, [
        ("https://b/4", "2024-01-01 11:00:00", b"<p>same</p>", "fr"),
        ("https://b/5", "2024-01-01 11:01:00", b"<p>third</p>", "en"),
    ], os.path.join(src, "drop2"))

    # NULL payloads carry no content to compare: each must PASS
    # THROUGH (review batch 32 — md5(NULL) is NULL, and a NULL group
    # key would emit the first payload-less page and suppress every
    # later one forever)
    _write_drop(spark, [
        ("https://b/6", "2024-01-01 11:02:00", None, "fr"),
        ("https://b/7", "2024-01-01 11:03:00", None, "de"),
    ], os.path.join(src, "drop3"))

    out = _run_stream(
        spark, src + "/*", monitor.first_seen, "first_seen_sink"
    ).collect()
    urls = sorted(r["url"] for r in out)
    # earliest (warc_ts, url) per distinct payload, recrawls
    # suppressed; BOTH payload-less pages pass
    assert urls == [
        "https://b/1", "https://b/3", "https://b/5",
        "https://b/6", "https://b/7",
    ]
    assert len({r["content_md5"] for r in out if r["content_md5"]}) == 3


def test_quality_rate_gates_with_the_batch_gopher_verdict(spark, tmp_path):
    """The windowed keep-rate applies the EXACT batch Gopher gate to
    the decoded payload; windows finalize insert-only under the same
    watermark semantics as crawl_rate."""
    src = str(tmp_path / "src")
    good = ("the cats and dogs run " * 20).encode()  # passes every gate
    bad = b"<p>too short to pass anything</p>"
    _write_drop(spark, [
        ("https://q/1", "2024-01-01 10:10:00", good, "en"),
        ("https://q/2", "2024-01-01 10:20:00", good, "en"),
        ("https://q/3", "2024-01-01 10:40:00", bad, "en"),
    ], os.path.join(src, "drop1"))
    # advance event time so the 10:00 window finalizes (eviction is
    # pinned a batch early by the keep-alive drop, see crawl_rate test)
    _write_drop(spark, [
        ("https://q/4", "2024-01-01 14:05:00", bad, "en"),
    ], os.path.join(src, "drop2"))
    _write_drop(spark, [
        ("https://q/5", "2024-01-01 14:06:00", bad, "en"),
    ], os.path.join(src, "drop3"))

    out = _run_stream(
        spark, src + "/*",
        lambda s: monitor.quality_rate(s, window="1 hour", watermark="2 hours"),
        "quality_rate_sink",
    ).collect()
    by_start = {str(r["window_start"]): r for r in out}
    r = by_start["2024-01-01 10:00:00"]
    assert (r["pages"], r["kept"]) == (3, 2)
    assert r["keep_rate"] == 0.666667
    # batch-gate identity: the same payloads through gopher_rules
    from alix_spark.textops import textstats

    batch = textstats.gopher_rules(
        spark.createDataFrame(
            [(1, good.decode()), (2, bad.decode())], "doc_id long, text string"
        )
    ).collect()
    verdicts = {r_["doc_id"]: r_["keep"] for r_ in batch}
    assert verdicts == {1: True, 2: False}


def test_host_sessions_merge_and_split(spark, tmp_path):
    """Pages within the gap merge into one session per host; a pause
    longer than the gap opens a new session; sessions finalize
    (append) once the watermark passes their close."""
    src = str(tmp_path / "src")
    _write_drop(spark, [
        ("https://a.example/1", "2024-01-01 10:00:00", b"x", "fr"),
        ("https://a.example/2", "2024-01-01 10:10:00", b"y", "fr"),
        ("https://b.example/1", "2024-01-01 10:05:00", b"z", "fr"),
    ], os.path.join(src, "drop1"))
    # a.example returns after a 50-minute pause -> NEW session
    _write_drop(spark, [
        ("https://a.example/3", "2024-01-01 11:00:00", b"w", "fr"),
    ], os.path.join(src, "drop2"))
    # advance watermark far past every session close (+ keep-alive)
    _write_drop(spark, [
        ("https://c.example/1", "2024-01-01 20:00:00", b"k", "fr"),
    ], os.path.join(src, "drop3"))
    _write_drop(spark, [
        ("https://c.example/2", "2024-01-01 20:01:00", b"k2", "fr"),
    ], os.path.join(src, "drop4"))

    out = _run_stream(
        spark, src + "/*",
        lambda s: monitor.host_sessions(s, gap="30 minutes", watermark="1 hour"),
        "host_sessions_sink",
    ).collect()
    sess = {(r.host, str(r.session_start)): r.pages for r in out}
    # one merged 2-page session for a.example at 10:00 (10:00+10:10
    # within the 30-min gap), a separate 1-page session at 11:00
    assert sess[("a.example", "2024-01-01 10:00:00")] == 2
    assert sess[("a.example", "2024-01-01 11:00:00")] == 1
    assert sess[("b.example", "2024-01-01 10:05:00")] == 1
    # the 20:00 sessions never finalized (watermark stops at 19:01)
    assert not any(h == "c.example" for h, _ in sess)
    # insert-only: one row per finalized session
    assert len(out) == len(sess) == 3


def test_recent_dedup_bounds_state_to_watermark(spark, tmp_path):
    """A recrawl of the same payload within the watermark horizon is
    suppressed; once the watermark passes the first sighting's
    eviction point, the same payload re-emits (bounded state — the
    trade vs first_seen's forever markers)."""
    src = str(tmp_path / "src")
    _write_drop(spark, [
        ("https://a/1", "2024-01-01 10:00:00", b"<p>same</p>", "fr"),
        ("https://a/2", "2024-01-01 10:30:00", b"<p>other</p>", "fr"),
        ("https://n/1", "2024-01-01 10:31:00", None, "fr"),
        ("https://n/2", "2024-01-01 10:32:00", None, "fr"),
    ], os.path.join(src, "drop1"))
    # same payload 1h later: within the 2h horizon -> suppressed
    _write_drop(spark, [
        ("https://b/1", "2024-01-01 11:00:00", b"<p>same</p>", "fr"),
    ], os.path.join(src, "drop2"))
    # advance event time far beyond the horizon; eviction runs at the
    # END of the batch that advances the watermark, so a second
    # keep-alive pins it one batch BEFORE the re-fetch (the same
    # gotcha the crawl_rate test documents)
    _write_drop(spark, [
        ("https://k/1", "2024-01-02 09:00:00", b"<p>keepalive</p>", "fr"),
    ], os.path.join(src, "drop3"))
    _write_drop(spark, [
        ("https://k/2", "2024-01-02 09:01:00", b"<p>keepalive2</p>", "fr"),
    ], os.path.join(src, "drop4"))
    # same payload again, a day later: state evicted -> re-emits
    _write_drop(spark, [
        ("https://c/1", "2024-01-02 10:00:00", b"<p>same</p>", "fr"),
    ], os.path.join(src, "drop5"))

    out = _run_stream(
        spark, src + "/*",
        lambda s: monitor.recent_dedup(s, watermark="2 hours"),
        "recent_dedup_sink",
    ).collect()
    urls = sorted(r.url for r in out)
    assert "https://b/1" not in urls          # within-horizon dup dropped
    assert "https://a/1" in urls and "https://c/1" in urls  # re-emit after eviction
    # NULL-payload pages carry no content: BOTH pass through un-deduped
    assert "https://n/1" in urls and "https://n/2" in urls
    assert len(urls) == 7


def test_lang_drift_flags_a_mix_shift(spark, tmp_path):
    """TVD between a finalized window's language shares and the design
    baseline; a window matching the baseline stays quiet, a flooded
    window trips the threshold. NULL lang counts as OTHER mass."""
    src = str(tmp_path / "src")
    # window 1 (10:00): 2 fr + 2 en — exactly the 50/50 baseline
    _write_drop(spark, [
        ("https://d/1", "2024-01-01 10:10:00", b"x", "fr"),
        ("https://d/2", "2024-01-01 10:20:00", b"x", "en"),
        ("https://d/3", "2024-01-01 10:30:00", b"x", "fr"),
        ("https://d/4", "2024-01-01 10:40:00", b"x", "en"),
    ], os.path.join(src, "drop1"))
    # window 2 (11:00): all-fr flood + one NULL lang (OTHER mass)
    _write_drop(spark, [
        ("https://d/5", "2024-01-01 11:10:00", b"x", "fr"),
        ("https://d/6", "2024-01-01 11:20:00", b"x", "fr"),
        ("https://d/7", "2024-01-01 11:30:00", b"x", "fr"),
        ("https://d/8", "2024-01-01 11:40:00", b"x", None),
    ], os.path.join(src, "drop2"))
    # advance the watermark so both windows finalize (keep-alive pin)
    _write_drop(spark, [
        ("https://d/9", "2024-01-01 15:05:00", b"x", "fr"),
    ], os.path.join(src, "drop3"))
    _write_drop(spark, [
        ("https://d/10", "2024-01-01 15:06:00", b"x", "fr"),
    ], os.path.join(src, "drop4"))

    out = _run_stream(
        spark, src + "/*",
        lambda s: monitor.lang_drift(
            s, {"fr": 0.5, "en": 0.5}, window="1 hour", watermark="2 hours"
        ),
        "lang_drift_sink",
    ).collect()
    by_start = {str(r["window_start"]): r for r in out}
    calm = by_start["2024-01-01 10:00:00"]
    assert (calm["pages"], calm["n_fr"], calm["n_en"]) == (4, 2, 2)
    assert calm["tvd"] == 0.0 and calm["drifted"] is False
    hot = by_start["2024-01-01 11:00:00"]
    # shares (0.75, 0, 0.25-other) vs (0.5, 0.5, 0): TVD = 0.5
    assert (hot["n_fr"], hot["n_en"]) == (3, 0)
    assert hot["tvd"] == 0.5 and hot["drifted"] is True


def test_lang_drift_validates_baseline(spark):
    import pytest

    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        monitor.lang_drift(df, {})
    with pytest.raises(ValueError):
        monitor.lang_drift(df, {"fr": -0.1})
    with pytest.raises(ValueError):
        monitor.lang_drift(df, {"fr": 0.7, "en": 0.6})
    # keys become derived column names: a dot would parse as a
    # struct-field access downstream — rejected at entry, not as a
    # confusing unresolved-column analysis error (ADVICE r04)
    with pytest.raises(ValueError, match="baseline key"):
        monitor.lang_drift(df, {"pt.BR": 0.5})
    with pytest.raises(ValueError, match="baseline key"):
        monitor.lang_drift(df, {"f`r": 0.5})
