"""Structured-Streaming ingest tests: micro-batched analysis + delta
staging + compaction equals the cold batch build bit-for-bit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_tokens
from alix_spark.corpus import webtext
from alix_spark.index import segments
from alix_spark.query import wand
from alix_spark.streaming import ingest


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "source": str(base / "source"),
        "staging": str(base / "staging"),
        "ckpt": str(base / "ckpt"),
        "idx_stream": str(base / "idx_stream"),
        "idx_batch": str(base / "idx_batch"),
    }


def test_streaming_ingest_equals_batch_build(spark, dirs):
    # two "crawl drops" land as separate files → separate micro-batches
    corpus = webtext.webtext(spark, 60, seed=21, partitions=2)
    corpus.filter(F.col("url") < "https://m").write.mode("overwrite").parquet(
        os.path.join(dirs["source"], "drop1")
    )
    corpus.filter(F.col("url") >= "https://m").write.mode("overwrite").parquet(
        os.path.join(dirs["source"], "drop2")
    )
    # stream over both drops (availableNow drains then stops)
    q = ingest.start_ingest(
        spark,
        dirs["source"] + "/*",
        dirs["staging"],
        dirs["ckpt"],
        trigger_available_now=True,
    )
    q.awaitTermination(300)

    meta_s = ingest.compact(spark, dirs["staging"], dirs["idx_stream"], n_shards=4)

    # cold batch build over the same pages
    docs = webtext.doc_ids(corpus)
    tok = analyzed_tokens(docs, light=True).select("doc_id", "pos", "term")
    meta_b = segments.build_index(spark, tok, dirs["idx_batch"], n_shards=4)

    assert meta_s["corpus_docs"] == meta_b["corpus_docs"] == 60
    assert meta_s["corpus_tokens"] == meta_b["corpus_tokens"]

    for terms, mode in [(["ville", "roi"], "and"), (["guerre", "paix"], "or")]:
        a = wand.query_local(dirs["idx_stream"], terms, k=10, mode=mode)
        b = wand.query_local(dirs["idx_batch"], terms, k=10, mode=mode)
        assert a == b and len(a) > 0


def test_compaction_dedups_recrawled_urls(spark, dirs, tmp_path):
    """A url recrawled in a later batch keeps only its latest tokens."""
    src = str(tmp_path / "src")
    stg = str(tmp_path / "stg")
    ck = str(tmp_path / "ck")
    idx = str(tmp_path / "idx")

    v1 = spark.createDataFrame(
        [("https://a/1", "2024-01-01 00:00:00", b"<p>ancienne ville</p>", "x", "fr")],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    v2 = spark.createDataFrame(
        [("https://a/1", "2024-02-01 00:00:00", b"<p>nouvelle guerre</p>", "x", "fr")],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    v1.write.parquet(os.path.join(src, "d1"))
    v2.write.parquet(os.path.join(src, "d2"))

    q = ingest.start_ingest(spark, src + "/*", stg, ck, trigger_available_now=True)
    q.awaitTermination(300)
    ingest.compact(spark, stg, idx, n_shards=2)

    # only the recrawl's tokens survive
    assert wand.query_local(idx, ["guerre"], k=10, mode="and")
    assert not wand.query_local(idx, ["ville"], k=10, mode="and")


def test_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (failure between write and checkpoint
    commit) must not duplicate staged token rows: each batch overwrites
    its own batch_id partition."""
    from alix_spark.corpus import webtext
    from alix_spark.streaming.ingest import _write_batch

    staging = str(tmp_path / "staging")
    batch = webtext.webtext(spark, 8, seed=3, partitions=2)
    _write_batch(batch, 0, staging)
    tok1 = spark.read.parquet(f"{staging}/tokens")
    n1 = tok1.count()
    # replay the SAME batch (same batch_id)
    _write_batch(batch, 0, staging)
    tok2 = spark.read.parquet(f"{staging}/tokens")
    assert tok2.count() == n1
    # a NEW batch appends its own partition without touching batch 0
    _write_batch(webtext.webtext(spark, 4, seed=9, partitions=2), 1, staging)
    tok3 = spark.read.parquet(f"{staging}/tokens")
    assert tok3.filter("batch_id = 0").count() == n1
    assert tok3.filter("batch_id = 1").count() > 0


def test_compaction_winner_is_batching_invariant(spark, tmp_path):
    """Same url, same warc_ts, DIFFERENT content landing in different
    micro-batches: the winner must be decided by content hash (the same
    tiebreak _write_batch uses within a batch), not by which batch the
    file listing happened to assign (review regression)."""
    from alix_spark.streaming.ingest import _write_batch

    rows = [
        ("https://a/1", "2024-01-01 00:00:00", b"<p>premier choix</p>", "x", "fr"),
        ("https://a/1", "2024-01-01 00:00:00", b"<p>second choix</p>", "x", "fr"),
    ]
    schema = "url string, warc_ts string, html binary, text string, lang string"

    def stage(order, stg):
        for bid, row in enumerate(order):
            df = spark.createDataFrame([row], schema).withColumn(
                "warc_ts", F.col("warc_ts").cast("timestamp")
            )
            _write_batch(df, bid, stg)

    idx_a = str(tmp_path / "ix_a")
    idx_b = str(tmp_path / "ix_b")
    stage(rows, str(tmp_path / "stg_a"))
    stage(rows[::-1], str(tmp_path / "stg_b"))
    ingest.compact(spark, str(tmp_path / "stg_a"), idx_a, n_shards=2)
    ingest.compact(spark, str(tmp_path / "stg_b"), idx_b, n_shards=2)

    import hashlib

    md5 = lambda b: hashlib.md5(b).hexdigest()
    want = "premier" if md5(rows[0][2]) > md5(rows[1][2]) else "second"
    for idx in (idx_a, idx_b):
        assert wand.query_local(idx, [want], k=5, mode="and"), want
        other = "second" if want == "premier" else "premier"
        assert not wand.query_local(idx, [other], k=5, mode="and")


def test_compaction_tolerates_legacy_staging_without_md5(spark, tmp_path):
    """A staging dir written by the pre-content_md5 _write_batch must
    still compact — falling back to the historical (warc_ts, batch_id)
    tiebreak — instead of failing mid-compaction on an unresolved
    column (ADVICE r3)."""
    import shutil

    from alix_spark.corpus import webtext
    from alix_spark.streaming.ingest import _write_batch

    stg = str(tmp_path / "stg")
    _write_batch(webtext.webtext(spark, 6, seed=5, partitions=2), 0, stg)
    legacy = spark.read.parquet(f"{stg}/pages").drop("content_md5")
    tmp_pages = str(tmp_path / "pages_legacy")
    legacy.write.parquet(tmp_pages)
    shutil.rmtree(f"{stg}/pages")
    spark.read.parquet(tmp_pages).write.parquet(f"{stg}/pages")
    meta = ingest.compact(spark, stg, str(tmp_path / "ix"), n_shards=2)
    assert meta["corpus_docs"] == 6
