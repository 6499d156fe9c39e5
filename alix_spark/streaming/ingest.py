"""Incremental index ingest via Structured Streaming.

The reference is strictly batch: indexes are built frozen and published
by atomic directory rename, with a polling registry picking up new
versions (LuceneIndex.java:36-43, TeiIngester.java:37-40,
web/.../IndexRegistry.java — SURVEY §1.5). This module is the Spark-
native *extension* of that model for continuous crawls: micro-batches
of new pages are analyzed and appended as **delta segments**, and a
compaction pass folds deltas into the base index — the Lucene
segment-merge lifecycle re-expressed as table operations.

Design:
- ``readStream`` over a parquet/file source with the input_hint schema
  (url, warc_ts, html, text, lang)
- ``foreachBatch``: run the SAME batch analysis chain (no separate
  streaming code path — semantics identical to the batch build by
  construction), then append ``(url, pos, term)`` token rows to a
  staging table partitioned by batch
- docIDs are NOT assigned in-stream (dense ranks would reshuffle per
  batch); the natural key ``url`` is carried until :func:`compact`
  republishes the full index with stable ids — matching the
  reference's rebuild-then-swap publishing, with Spark doing the
  rebuild incrementally from staged tokens instead of re-analyzing
  the corpus
- late/duplicate urls: last ``warc_ts`` wins at compaction
  (watermark-free dedup — exact, because compaction sees the staging
  table, not an unbounded stream state)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_tokens
from alix_spark.corpus.webtext import SCHEMA as WEBTEXT_SCHEMA
from alix_spark.corpus.webtext import url_ranks
from alix_spark.index import segments


def _write_batch(batch_df: DataFrame, batch_id: int, staging_dir: str) -> None:
    """One micro-batch: analyze and stage — IDEMPOTENT under replay.

    Each batch owns its ``batch_id=`` partition and a re-run OVERWRITES
    it (dynamic partition overwrite): a batch that failed between the
    tokens write and the checkpoint commit re-executes without
    duplicating token rows (asserted in tests)."""
    if batch_df.isEmpty():
        return
    # within-batch recrawl dedup: latest warc_ts per url wins (the
    # cross-batch case is resolved at compaction by batch_id)
    from pyspark.sql import Window

    # content-hash tiebreak: two fetches of a url in the SAME second
    # (mirrors, duplicate WARC records) must pick a deterministic
    # winner — a bare warc_ts order would leave it to shuffle order,
    # breaking replay/cross-parallelism bit-identity
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.md5(F.col("html")))
    )
    batch_df = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .persist()
    )
    try:
        tok = analyzed_tokens(
            batch_df, id_col="url", id_type="string", light=True
        ).withColumn("batch_id", F.lit(batch_id))
        tok.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(os.path.join(staging_dir, "tokens"))
        # content_md5 rides to staging so compaction can use the SAME
        # content-first tiebreak across batches (batch boundaries are an
        # accident of file listing, not an ordering signal)
        batch_df.select(
            "url", "warc_ts", "lang", F.md5(F.col("html")).alias("content_md5")
        ).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("batch_id").parquet(os.path.join(staging_dir, "pages"))
    finally:
        # a failed micro-batch write must not leak the persisted batch:
        # foreachBatch retries would stack a new cached lineage per
        # attempt in the long-lived streaming session (the segments.py
        # try/finally standard, review batch 32)
        batch_df.unpersist()


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start the incremental ingest stream; returns the StreamingQuery.

    Each micro-batch: html → analysis chain → token rows written to
    ``staging_dir/tokens`` plus the page row (url, warc_ts, lang) to
    ``staging_dir/pages``, each under its ``batch_id=`` partition.
    Exactly-once per batch: the streaming checkpoint dedups inputs and
    a replayed batch OVERWRITES its own partition (dynamic partition
    overwrite), so a failure between the write and the checkpoint
    commit cannot duplicate token rows.
    """
    stream = (
        spark.readStream.schema(WEBTEXT_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(batch_df, batch_id, staging_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(
    spark: SparkSession,
    staging_dir: str,
    index_dir: str,
    n_shards: int = 8,
) -> dict:
    """Fold staged tokens into a freshly published full index.

    Duplicate urls keep the latest (warc_ts, content_md5) crawl — the
    same content-first tiebreak _write_batch applies within a batch, so
    the winner does not depend on how files happened to split into
    micro-batches; batch_id breaks only the identical-content tie
    (either batch's token rows are identical then). Dense docIDs are
    (re)assigned over the surviving url set, so the published index is
    byte-identical to a cold batch build over the same page set —
    asserted in tests."""
    pages = spark.read.parquet(os.path.join(staging_dir, "pages"))
    # staging dirs written by the pre-content_md5 _write_batch lack the
    # md5 column: fall back to the old (warc_ts, batch_id) tiebreak
    # instead of failing mid-compaction (ADVICE r3) — the md5 leg of
    # the struct only breaks warc_ts ties, so the fallback is the exact
    # historical behavior for historical data
    tie = (
        F.struct("warc_ts", "content_md5", "batch_id")
        if "content_md5" in pages.columns
        else F.struct("warc_ts", "batch_id")
    )
    latest = pages.groupBy("url").agg(F.max(tie).alias("w")).select(
        "url", F.col("w.batch_id").alias("batch_id")
    )

    tok = spark.read.parquet(os.path.join(staging_dir, "tokens"))
    # plain shuffle join: `latest` holds EVERY distinct url of the
    # crawl history — months of micro-batches make it far too large to
    # broadcast (the repo rule: never driver-size a url dictionary);
    # AQE still broadcasts it while it is genuinely small
    live = tok.join(latest, ["url", "batch_id"])

    ids = url_ranks(pages.select("url").distinct())
    tok_ids = live.join(ids, "url").select("doc_id", "pos", "term")
    return segments.build_index(spark, tok_ids, index_dir, n_shards=n_shards)
