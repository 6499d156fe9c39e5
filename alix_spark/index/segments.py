"""Sharded, compressed inverted-index segments.

The north rule's physical index (BASELINE.json): per-partition inverted
segments as sorted ``(term, doc-delta, tf, positions)`` posting lists,
delta-gap + varint encoded in fixed-size blocks with per-block skip data
(max doc, max tf, BM25 upper bound — the block-max WAND metadata), merged
into a sharded global index, with per-shard manifests (lineage + counts)
for resumable restarts.

Layout under ``<index_dir>/`` (parquet; on a cluster this is an Iceberg
table with ``shard`` as partition column — atomic publish = snapshot
commit, the analogue of the reference's atomic directory rename,
TeiIngester.java:37-40):

    postings/shard=K/   (term, block_id, n, max_doc, max_tf, block_ub,
                         doc_bytes, tf_bytes, dl_bytes)
    doc_stats/          (doc_id, dl, width, shard)
    term_stats/         (term, df, cf, term_id)   — term_id dense in
                        UTF-8 byte order (the TermLexicon dictionary
                        and the stats sidecar as one table)
    corpus.json         (corpus_docs, corpus_tokens, avgdl)
    manifest/shard_K.json  (lineage + per-shard metrics)

Sharding is **by document** (``doc_id % n_shards``): every query fans
out to all shards, each runs WAND over its local doc subset, results
merge by top-k — the standard distributed-search layout (one Lucene
segment per shard in the reference's world). Build-side Zipfian term
skew is defused *before* the encode groupBy by the (shard, term)
composite key: a hot term splits across all doc-shards, bounding any
single group at ~1/n_shards of the term's postings; residual skew is
handled by AQE skew-join/partition splitting.

Blocks are self-contained: each carries varint doc-deltas, tfs, and doc
lengths (``dl``, the Lucene-norms analogue) so scoring needs no side
join at query time.
"""

from __future__ import annotations

import json
import os
from typing import Iterator
from zlib import crc32

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.query.bm25 import B, K1
from alix_spark.util import dense_ranks, ensure_py_files

BLOCK = 128
SALT_BUCKETS = 16
# manifest metrics ride on the write job via df.observe() up to this
# many rebuilt shards (3 conditional-sum aggregates per shard); wider
# builds fall back to a distinct-free postings re-read
_OBSERVE_SHARD_CAP = 128
FORMAT_VERSION = "delta-varint-v3"  # v3: direct-from-encode postings file layout (no write repartition); v2: positions channel, merged term_stats+dict


# ------------------------------------------------------------- varint

def varint_encode(a: np.ndarray) -> bytes:
    """Vectorized LEB128 varint encode of a non-negative int array."""
    a = a.astype(np.uint64, copy=True)
    if a.size == 0:
        return b""
    cols = []  # byte columns, little-endian 7-bit groups
    while True:
        b7 = (a & np.uint64(0x7F)).astype(np.uint8)
        a >>= np.uint64(7)
        more = a > 0
        b7 |= (more.astype(np.uint8) << 7)
        cols.append((b7, more))
        if not more.any():
            break
    n = cols[0][0].size
    depth = len(cols)
    mat = np.zeros((n, depth), dtype=np.uint8)
    mask = np.zeros((n, depth), dtype=bool)
    alive = np.ones(n, dtype=bool)
    for j, (b7, more) in enumerate(cols):
        mat[alive, j] = b7[alive]
        mask[alive, j] = True
        alive = alive & more
    return mat[mask].tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Vectorized varint decode of ``count`` values."""
    if count == 0:
        return np.zeros(0, dtype=np.int64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    ends = (raw & 0x80) == 0
    val_idx = np.zeros(raw.size, dtype=np.int64)
    val_idx[1:] = np.cumsum(ends)[:-1]
    starts = np.concatenate(([0], np.flatnonzero(ends)[:-1] + 1))
    pos_in_val = np.arange(raw.size) - starts[val_idx]
    vals = np.zeros(count, dtype=np.uint64)
    np.add.at(
        vals,
        val_idx,
        (raw & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos_in_val.astype(np.uint64)),
    )
    return vals.astype(np.int64)


# ------------------------------------------------------------- encoding

ENC_SCHEMA = (
    "shard int, term string, block_id int, n int, max_doc long, max_tf int, "
    "block_ub double, doc_bytes binary, tf_bytes binary, dl_bytes binary, "
    "pos_bytes binary"
)


def _encode_term_group(
    shard: int, term: str, docs: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
    avgdl: float, k1: float = K1, b: float = B,
    positions: np.ndarray | None = None,
) -> list[tuple]:
    """One (shard, term) posting list → delta+varint blocks with skip
    data. ``block_ub`` is the idf-free BM25 bound
    max(tf·(k1+1)/(tf+norm)) — query side multiplies the term's idf.

    ``positions``: optional flat array of within-doc token positions,
    grouped by doc in ``docs`` order (tf values give the per-doc
    counts), position-sorted within each doc. Encoded as within-doc
    delta + varint (the reference's Lucene positions channel,
    AlixLuceneConsumer.java:66-74), enabling index-side phrase/near.
    """
    order = np.argsort(docs, kind="stable")
    if positions is not None:
        # regroup the flat positions to the sorted doc order
        bounds = np.concatenate(([0], np.cumsum(tfs)))
        pos_chunks = [positions[bounds[i] : bounds[i + 1]] for i in order]
    docs, tfs, dls = docs[order], tfs[order], dls[order]
    rows = []
    for blk_id, off in enumerate(range(0, docs.size, BLOCK)):
        d = docs[off : off + BLOCK]
        t = tfs[off : off + BLOCK]
        dl = dls[off : off + BLOCK]
        deltas = np.diff(d, prepend=d[0:1])
        deltas[0] = d[0]  # first value absolute: blocks self-contained
        norm = k1 * (1.0 - b + b * dl / avgdl)
        ub = float(np.max(t * (k1 + 1.0) / (t + norm)))
        pos_b = b""
        if positions is not None:
            chunk = pos_chunks[off : off + BLOCK]
            flat = np.concatenate(chunk) if chunk else np.zeros(0, np.int64)
            if flat.size:
                # within-doc deltas: reset at each doc boundary
                dp = np.diff(flat, prepend=flat[0:1])
                starts = np.concatenate(([0], np.cumsum(t)))[:-1]
                dp[starts] = flat[starts]
                pos_b = varint_encode(dp)
        rows.append(
            (
                shard, term, blk_id, int(d.size), int(d[-1]), int(t.max()),
                ub, varint_encode(deltas), varint_encode(t), varint_encode(dl),
                pos_b,
            )
        )
    return rows


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(docs, tfs, dls) from one encoded block row (pandas Series/dict)."""
    n = int(row["n"])
    deltas = varint_decode(row["doc_bytes"], n)
    docs = np.cumsum(deltas)
    tfs = varint_decode(row["tf_bytes"], n)
    dls = varint_decode(row["dl_bytes"], n)
    return docs, tfs, dls


def seg_cumsum(deltas: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Segmented cumsum: within-doc position deltas → absolute
    positions, vectorized (each segment's first delta is absolute).
    THE decoder for the pos_bytes layout — every reader of the
    positions channel (decoded_rail, the phrase kernel's flat decode,
    decode_block_positions) goes through this one transform, so a
    future codec change (FORMAT_VERSION bump) has a single home."""
    c = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(seg_lens)))[:-1]
    # value to subtract for each segment = cumsum just before its start
    base = np.zeros(seg_lens.size, dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, seg_lens)


def decode_block_positions(row, tfs: np.ndarray) -> list[np.ndarray]:
    """Per-doc position arrays for one block (requires pos_bytes)."""
    total = int(tfs.sum())
    if total == 0 or not row["pos_bytes"]:
        return [np.zeros(0, np.int64) for _ in tfs]
    dp = varint_decode(row["pos_bytes"], total)
    flat = seg_cumsum(dp, tfs)
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    return [flat[bounds[i] : bounds[i + 1]] for i in range(tfs.size)]


# ------------------------------------------------------------ build job


def _stats(tok: DataFrame) -> tuple[DataFrame, DataFrame]:
    dstats = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        (F.max("pos") + F.lit(1)).cast("long").alias("width"),
    )
    tstats = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"), F.count("*").alias("cf")
    )
    return dstats, tstats


def build_index(
    spark: SparkSession,
    tok: DataFrame,
    index_dir: str,
    n_shards: int = 16,
    resume: bool = False,
    with_positions: bool = True,
    dl_broadcast_max: int = 2_000_000,
) -> dict:
    """Build (or resume) the sharded compressed index from a token table
    ``(doc_id, pos, term)``.

    Resume semantics (north rule): shards whose manifest file already
    exists are skipped entirely — the token scan is re-filtered to the
    missing shards only, so a restart redoes only lost work. Stats
    tables are (re)written once all shards exist.
    """
    ensure_py_files(spark)
    if not resume and os.path.isdir(index_dir):
        # the empty-input guard must run BEFORE the old index is
        # destroyed, or a rebuild fed an accidentally-empty corpus
        # deletes the live index and then raises (one early-terminating
        # job; only paid on in-place rebuilds)
        if tok.isEmpty():
            raise ValueError(
                "refusing to build an index from an empty token table "
                "(build into a staging dir via begin_publish so an "
                "empty input can never clobber a live index)"
            )
        import shutil

        shutil.rmtree(index_dir)
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)

    done = set()
    if resume:
        for s in range(n_shards):
            if os.path.exists(_manifest_path(index_dir, s)):
                if _check_resume_manifest(index_dir, s, n_shards):
                    done.add(s)
    todo = [s for s in range(n_shards) if s not in done]

    # pmod, not %: Spark's % takes the dividend's sign, so a negative
    # (e.g. hash-derived) doc_id would land in a negative shard that
    # the isin(todo) filter silently DROPS — while the packed path's
    # numpy % is nonnegative and indexes it (review batch 28; the term
    # hash below already uses pmod for the same reason)
    tok = tok.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    )
    # the token table feeds 4 downstream jobs (doc/term stats, corpus
    # scalars, postings encode) — persist it or the whole upstream
    # analysis chain re-runs per job (at 100 TB: materialize to a
    # staging Iceberg table instead of executor memory)
    from pyspark.storagelevel import StorageLevel

    tok = tok.persist(StorageLevel.MEMORY_AND_DISK)
    dstats = tstats = dl_bc = None
    try:

        dstats, tstats = _stats(tok)
        # the small per-doc / per-term aggregates each feed several
        # downstream jobs (corpus scalars, dl channel, sidecar writes,
        # term_id ranks) — persist them so the 10^9-row token table is
        # scanned once per aggregate, not once per consumer
        dstats = dstats.persist(StorageLevel.MEMORY_AND_DISK)
        tstats = tstats.persist(StorageLevel.MEMORY_AND_DISK)
        # corpus scalars via a 1-row agg — never collect the full dl column
        # to the driver (at 10^12 docs that is a driver OOM)
        crow = dstats.agg(
            F.count("*").alias("docs"), F.sum("dl").alias("tokens")
        ).collect()[0]
        if not crow["docs"]:
            raise ValueError(
                "refusing to build an index from an empty token table "
                "(build into a staging dir via begin_publish so an empty "
                "input can never clobber a live index)"
            )
        corpus = {
            "corpus_docs": int(crow["docs"]),
            "corpus_tokens": int(crow["tokens"]),
        }
        avgdl = corpus["corpus_tokens"] / corpus["corpus_docs"]

        if todo:
            # Salted encode grouping: (shard, term-hash bucket) bounds every
            # group at ~corpus/(n_shards·SALT_BUCKETS) postings even for the
            # hottest Zipf-head term, and keeps the applyInPandas group count
            # fixed instead of one-group-per-term (north rule: salted
            # repartitioning on term-hash).
            #
            # Single-shuffle encode: RAW tokens shuffle once on the salted
            # key; the (term, doc) roll-up happens inside the bucket with a
            # C-level pandas groupby. Doc lengths reach the encoder by one
            # of two paths, switched on corpus size:
            #   · ≤ dl_broadcast_max docs — a broadcast python dict (no
            #     extra shuffle, the fast path for every sandbox corpus);
            #   · above it — a shuffle join of the skinny (doc_id, dl) table
            #     onto the token stream before the encode groupBy, so the
            #     driver never materializes the dl map (10^12-doc path).
            # Both paths produce bit-identical blocks (asserted in tests).
            dl_join = corpus["corpus_docs"] > dl_broadcast_max
            dl_bc = None
            if not dl_join:
                dl_bc = spark.sparkContext.broadcast(
                    {r["doc_id"]: r["dl"]
                     for r in dstats.select("doc_id", "dl").collect()}
                )

            salted = tok.filter(F.col("shard").isin(todo)).withColumn(
                "tbucket", F.pmod(F.xxhash64("term"), F.lit(SALT_BUCKETS)).cast("int")
            )
            if dl_join:
                salted = salted.join(dstats.select("doc_id", "dl"), "doc_id")

            def encode(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                rows: list[tuple] = []
                dl = dl_bc.value if dl_bc is not None else None
                pdf = pdf.sort_values("pos", kind="stable")
                for (shard, term), g in pdf.groupby(["shard", "term"], sort=False):
                    docs_u, first_idx, inv, tfs = np.unique(
                        g["doc_id"].to_numpy(np.int64),
                        return_index=True, return_inverse=True,
                        return_counts=True,
                    )
                    pos_flat = None
                    if with_positions:
                        # positions grouped by doc (stable doc order), each
                        # doc's positions already ascending from the sort
                        order = np.argsort(inv, kind="stable")
                        pos_flat = g["pos"].to_numpy(np.int64)[order]
                    if dl is not None:
                        dls = np.array([dl[d] for d in docs_u], dtype=np.int64)
                    else:
                        dls = g["dl"].to_numpy(np.int64)[first_idx]
                    rows.extend(
                        _encode_term_group(
                            int(shard), term,
                            docs_u,
                            tfs.astype(np.int64),
                            dls,
                            avgdl,
                            positions=pos_flat,
                        )
                    )
                return pd.DataFrame(
                    rows,
                    columns=[
                        "shard", "term", "block_id", "n", "max_doc",
                        "max_tf", "block_ub", "doc_bytes", "tf_bytes",
                        "dl_bytes", "pos_bytes",
                    ],
                )

        side_t, side_err = _start_sidecar_thread(
            spark, index_dir, dstats, tstats, corpus, n_shards
        )
        try:
            if todo:
                encoded = salted.groupBy("shard", "tbucket").applyInPandas(
                    encode, schema=ENC_SCHEMA
                )
                _write_postings_and_manifests(
                    spark, encoded, index_dir, todo, n_shards
                )
        finally:
            # join even on a failed postings write: an orphaned writer
            # thread would race a caller's cleanup/retry inside index_dir
            side_t.join()
        if side_err:
            raise side_err[0]
        meta = {
            "corpus_docs": int(corpus["corpus_docs"]),
            "corpus_tokens": int(corpus["corpus_tokens"]),
            "avgdl": avgdl,
            "n_shards": n_shards,
            "built_shards": len(done) + len(todo),
            "resumed_from": sorted(done),
            "publish_token": _publish_token(),
        }
        with open(os.path.join(index_dir, "corpus.json"), "w") as f:
            json.dump(meta, f)
        return meta
    finally:
        # release caches on EVERY exit — a failed build in a
        # long-lived session must not pin the token table, and
        # the dl broadcast must be freed too (review batch 28)
        for _h in (tok, dstats, tstats):
            if _h is not None:
                try:
                    _h.unpersist()
                except Exception:
                    pass
        if dl_bc is not None:
            try:
                dl_bc.destroy()
            except Exception:
                pass


def _write_postings_and_manifests(
    spark: SparkSession,
    encoded: DataFrame,
    index_dir: str,
    todo: list[int],
    n_shards: int,
) -> None:
    """Dynamic-partition overwrite the postings table and write
    per-shard manifests.

    The encoded blocks are written STRAIGHT from the encode tasks: the
    encode groupBy already partitions on (shard, tbucket), so each
    shard's blocks live in ≤ SALT_BUCKETS tasks and query-side parquet
    listing stays O(shards · SALT_BUCKETS). An explicit repartition
    here (the r03 shape) re-shuffled every encoded byte — the full
    compressed index — a second time purely for file-count control;
    at 100 TB that second pass IS the write bottleneck, and it was
    ~40% of the non-chain tail in the 8→32 scaling probe."""
    import time as _time
    # Resume: dynamic partition overwrite replaces exactly the shards
    # being rebuilt — a half-written shard from a crashed run is
    # cleanly rewritten, completed shards are untouched (the Iceberg
    # `overwritePartitions` analogue of the reference's atomic
    # directory-rename publish, TeiIngester.java:37-40). A fresh build
    # (all shards) skips the dynamic-commit bookkeeping.
    _tw = _time.perf_counter()
    # Per-shard manifest metrics ride on the WRITE job itself via
    # df.observe() — the r04 probe showed the old re-read-the-postings
    # stats job costing ~1 s of pure job constants per build and
    # anti-scaling with cores (manifest_s 0.94→1.32 s at 8→32); at
    # 100 TB it re-scanned index metadata columns for numbers the
    # write already streamed past. Every metric is a plain conditional
    # sum, observable without a distinct: each (shard, term) is
    # encoded by exactly ONE (shard, tbucket) task (tbucket is a
    # term-hash, not a random salt), so it emits exactly one
    # block_id=0 row — n_terms = Σ[block_id=0]. Capped at
    # _OBSERVE_SHARD_CAP shards (3 aggregates per shard); a wider
    # build falls back to the re-read, itself now distinct-free.
    obs = None
    if 0 < len(todo) <= _OBSERVE_SHARD_CAP:
        from pyspark.sql import Observation

        aggs = []
        for s in todo:
            c = F.col("shard") == F.lit(s)
            aggs += [
                F.sum(
                    F.when(c & (F.col("block_id") == 0), 1).otherwise(0)
                ).alias(f"t_{s}"),
                F.sum(F.when(c, F.col("n")).otherwise(0)).alias(f"p_{s}"),
                F.sum(F.when(c, 1).otherwise(0)).alias(f"b_{s}"),
            ]
        obs = Observation()
        encoded = encoded.observe(obs, *aggs)
    w = encoded.write.mode("overwrite")
    if len(todo) < n_shards:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy("shard").parquet(os.path.join(index_dir, "postings"))
    _tm = _time.perf_counter()

    # per-shard manifests: lineage + metrics (resumable restarts)
    if obs is not None:
        vals = obs.get
        stats_by_shard = {
            s: {
                "n_terms": int(vals[f"t_{s}"] or 0),
                "n_postings": int(vals[f"p_{s}"] or 0),
                "n_blocks": int(vals[f"b_{s}"] or 0),
            }
            for s in todo
            if vals[f"b_{s}"]
        }
    else:
        seg_stats = (
            spark.read.parquet(os.path.join(index_dir, "postings"))
            .filter(F.col("shard").isin(todo))
            .groupBy("shard")
            .agg(
                # one block_id=0 row per (shard, term) — see above
                F.sum(
                    F.when(F.col("block_id") == 0, 1).otherwise(0)
                ).alias("n_terms"),
                F.sum("n").alias("n_postings"),
                F.count("*").alias("n_blocks"),
            )
            .collect()
        )
        stats_by_shard = {r["shard"]: r for r in seg_stats}
    # EVERY todo shard gets a manifest — a shard that happened to get
    # no postings (tiny corpus, doc_id gaps) is still DONE; without
    # its (zero-row) manifest, resume=True would treat it as lost
    # work forever and re-run the full encode scan on every restart
    for s in todo:
        r = stats_by_shard.get(s)
        with open(_manifest_path(index_dir, s), "w") as f:
            json.dump(
                {
                    "shard": s,
                    "n_terms": r["n_terms"] if r else 0,
                    "n_postings": int(r["n_postings"]) if r else 0,
                    "n_blocks": r["n_blocks"] if r else 0,
                    "n_shards": n_shards,
                    "block_size": BLOCK,
                    "format": FORMAT_VERSION,
                },
                f,
            )
    _LAST_WRITE_TIMINGS["encode_write_s"] = round(_tm - _tw, 3)
    _LAST_WRITE_TIMINGS["manifest_s"] = round(_time.perf_counter() - _tm, 3)


# sub-stage timers of the last _write_postings_and_manifests call
# (diagnostic only — read by the build's stage_timings plumbing)
_LAST_WRITE_TIMINGS: dict = {}


def _start_sidecar_thread(spark, index_dir, dstats, tstats, corpus, n_shards):
    """Submit the stats-sidecar writes from a driver thread: they
    depend only on the persisted dstats/tstats, so their small
    fixed-cost jobs fill scheduler gaps WHILE the encode+postings
    write runs (concurrent independent jobs — the standard way to keep
    a cluster busy through a small-job tail). Returns (thread, errors);
    join the thread and re-raise before publishing corpus.json."""
    import threading

    err: list[BaseException] = []

    def run() -> None:
        try:
            _write_stats_sidecars(
                spark, index_dir, dstats, tstats, corpus, n_shards
            )
        except BaseException as e:  # re-raised by the caller on join
            err.append(e)

    t = threading.Thread(target=run, name="sidecar-writes")
    t.start()
    return t, err


def _write_stats_sidecars(
    spark: SparkSession,
    index_dir: str,
    dstats: DataFrame,
    tstats: DataFrame,
    corpus: dict,
    n_shards: int,
) -> None:
    """Stats sidecars (reference TermStats sidecar <field>.stats).

    ``term_stats`` carries the dense term_id (UTF-8 byte order,
    reference TermLexicon.java:46-53) so the dictionary and stats are
    ONE table and one write. Sidecar writes are sized to their data,
    not to the core count: these tables are thousands-to-millions of
    skinny rows — 32 write tasks of 400 rows each is pure fixed cost
    (task scheduling anti-scales with parallelism on small jobs)."""
    def _size_parts(n_rows: int, per_part: int = 2_000_000) -> int:
        return max(1, min(
            spark.sparkContext.defaultParallelism, n_rows // per_part + 1
        ))

    d_parts = _size_parts(corpus["corpus_docs"])
    dstats.withColumn(
        # pmod: must agree with the build's shard assignment for
        # negative doc_ids (review batch 28)
        "shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int")
    ).repartition(d_parts).write.mode("overwrite").parquet(
        os.path.join(index_dir, "doc_stats")
    )
    # dense term_id in UTF-8 byte order WITHOUT a global single-partition
    # window (the whole vocabulary through one task): range-partitioned
    # parallel rank, identical ids at any parallelism (util.dense_ranks)
    n_terms = tstats.count()
    t_parts = _size_parts(n_terms, per_part=500_000)
    tids = dense_ranks(
        tstats, "term", "term_id",
        order_expr=F.encode(F.col("term"), "utf-8"), parts=t_parts,
    )
    tstats.join(tids, "term").repartition(t_parts).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, "term_stats"))


# --------------------------------------------------- packed build path
#
# The exploded build above shuffles ONE ROW PER TOKEN into the encode
# groupBy — at 10^12 documents × ~10^3 tokens/doc that is the single
# biggest shuffle in the system, and on the sandbox's 8→32 scaling
# probe it (plus the cache materialization of the exploded table) is
# what eats the parallelism the analysis chain delivers. The packed
# path keeps the chain's per-document arrays packed end-to-end:
#
#   chain (packed arrays) → bucketize (mapInPandas, NO shuffle: per-doc
#   (term, tf, positions) roll-up split into SALT_BUCKETS term-hash
#   buckets) → ONE shuffle of ~n_docs × SALT_BUCKETS array rows →
#   encode (numpy segmented gather, same _encode_term_group)
#
# Shuffle rows drop by ~avg_doc_len/SALT_BUCKETS (≈15× at doc_scale 10,
# ≈2 orders of magnitude at real web-page sizes with larger buckets);
# per-row overhead (doc_id duplication, Spark row headers) disappears
# into Arrow-packed arrays. Doc lengths ride on the bucket rows, so the
# packed path needs NO dl broadcast and NO dl join at any corpus size.
# Output blocks are bit-identical to the exploded path (asserted in
# tests/test_packed_build.py).

BUCKETIZED_SCHEMA = (
    "doc_id long, shard int, tbucket int, dl long, width long, "
    "terms array<string>, tfs array<int>, poss array<int>"
)


def bucketized_tokens(
    packed: DataFrame,
    n_shards: int,
    n_buckets: int = SALT_BUCKETS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Packed per-doc token arrays → per-(doc, term-hash-bucket) rows.

    Input: ``(doc_id, terms array<string>, poss array<int>)`` (the
    :func:`alix_spark.analysis.chain.analyzed_packed` shape). Output:
    one row per (doc, bucket) with the doc's per-term roll-up for that
    bucket — unique ``terms``, their ``tfs``, and the flat ``poss``
    grouped by term (ascending within each term). ``dl``/``width``
    (whole-doc token count / max position + 1) ride on every row so
    the encoder needs no side channel for doc lengths.

    Pure narrow mapInPandas (no shuffle); the bucket hash is crc32 —
    any deterministic term→bucket map yields identical final postings
    because each (shard, term) group is complete within one bucket."""
    ensure_py_files(packed.sparkSession)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = _bucketize_arrays(
                pdf["doc_id"].to_numpy(np.int64), pdf["terms"].tolist(),
                pdf["poss"].tolist(), n_shards, n_buckets,
            )
            if out is not None:
                yield out

    return packed.select(
        F.col(id_col).alias("doc_id"), "terms", "poss"
    ).mapInPandas(split, schema=BUCKETIZED_SCHEMA)


def _bucketize_arrays(
    ids: np.ndarray,
    terms_lists: list,
    poss_lists: list,
    n_shards: int,
    n_buckets: int,
) -> pd.DataFrame | None:
    """One batch of packed per-doc arrays → bucketized rows (the
    :func:`bucketized_tokens` kernel, shared with the fused
    analyze+bucketize operator so both paths are bit-identical)."""
    # NULL arrays (an outer join / foreign writer) normalize to empty:
    # the exploded build path simply has no rows for such a doc, and
    # this path must agree instead of TypeError-ing the whole batch
    # (review batch 28)
    terms_lists = [t if t is not None else [] for t in terms_lists]
    poss_lists = [p if p is not None else [] for p in poss_lists]
    lens = np.fromiter(
        (len(t) for t in terms_lists), np.int64, count=len(terms_lists)
    )
    total = int(lens.sum())
    if total == 0:
        return None
    widths = np.fromiter(
        (int(np.max(np.asarray(p, np.int64))) + 1 if len(p) else 0
         for p in poss_lists),
        np.int64, count=len(poss_lists),
    )
    doc_rep = np.repeat(np.arange(ids.size), lens)
    terms_flat = np.concatenate(
        [np.asarray(t, object) for t in terms_lists if len(t)]
    )
    poss_flat = np.concatenate(
        [np.asarray(p, np.int64) for p in poss_lists if len(p)]
    )
    # bucket per token via the per-unique-term crc32 (C-level;
    # factorize makes the python hash loop O(vocab), not O(tokens))
    codes, uniq = pd.factorize(terms_flat)
    uniq = np.asarray(uniq, object)
    ub = np.fromiter(
        (crc32(t.encode("utf-8")) % n_buckets for t in uniq),
        np.int64, count=len(uniq),
    )
    buck = ub[codes]
    # group tokens by (doc, bucket, term), positions ascending
    o = np.lexsort((poss_flat, codes, buck, doc_rep))
    d_s, b_s, c_s, p_s = doc_rep[o], buck[o], codes[o], poss_flat[o]
    new_entry = np.empty(o.size, bool)
    new_entry[0] = True
    new_entry[1:] = (
        (d_s[1:] != d_s[:-1]) | (b_s[1:] != b_s[:-1])
        | (c_s[1:] != c_s[:-1])
    )
    entry_starts = np.flatnonzero(new_entry)  # token space
    tf = np.diff(np.append(entry_starts, o.size))
    e_doc = d_s[entry_starts]
    e_buck = b_s[entry_starts]
    e_code = c_s[entry_starts]
    new_row = np.empty(entry_starts.size, bool)
    new_row[0] = True
    new_row[1:] = (e_doc[1:] != e_doc[:-1]) | (e_buck[1:] != e_buck[:-1])
    row_starts = np.flatnonzero(new_row)      # entry space
    row_tok_starts = entry_starts[row_starts]  # token space
    r_doc = e_doc[row_starts]
    r_buck = e_buck[row_starts]
    out_ids = ids[r_doc]
    return pd.DataFrame(
        {
            "doc_id": out_ids,
            "shard": (out_ids % n_shards).astype(np.int32),
            "tbucket": r_buck.astype(np.int32),
            "dl": lens[r_doc],
            "width": widths[r_doc],
            "terms": np.split(uniq[e_code], row_starts[1:]),
            "tfs": np.split(tf.astype(np.int32), row_starts[1:]),
            "poss": np.split(p_s.astype(np.int32), row_tok_starts[1:]),
        }
    )


def analyzed_bucketized(
    docs: DataFrame,
    n_shards: int,
    n_buckets: int = SALT_BUCKETS,
    id_col: str = "doc_id",
    src_col: str = "html",
    tagger_path: str | None = None,
) -> DataFrame:
    """FUSED analysis chain + bucketize: ``(doc_id, html) →``
    bucketized rows in ONE Python pass.

    Functionally ``bucketized_tokens(analyzed_packed(docs))`` (same
    kernels, bit-identical output — asserted in
    tests/test_packed_build.py) but without shipping the packed token
    arrays across an extra Arrow JVM↔Python round-trip: the token
    payload crosses the boundary once, already rolled up into bucket
    rows. This is the index build's hot path — on the 8→32 scaling
    probe the second Python crossing was pure overhead that diluted
    the chain's parallelism."""
    ensure_py_files(docs.sparkSession)
    cols = docs.select(F.col(id_col).alias("_id"), F.col(src_col).alias("src"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from alix_spark.analysis.chain import analyze

        for pdf in batches:
            if not len(pdf):
                continue
            terms_lists: list = []
            poss_lists: list = []
            for src in pdf["src"]:
                toks = analyze(src, tagger_path=tagger_path)
                terms_lists.append([t[0] for t in toks])
                poss_lists.append([t[1] for t in toks])
            out = _bucketize_arrays(
                pdf["_id"].to_numpy(np.int64), terms_lists, poss_lists,
                n_shards, n_buckets,
            )
            if out is not None:
                yield out

    return cols.mapInPandas(run, schema=BUCKETIZED_SCHEMA)


def _encode_packed_group(
    pdf: pd.DataFrame, avgdl: float, with_positions: bool
) -> pd.DataFrame:
    """Encode one (shard, tbucket) group of bucketized rows.

    Flattens the array columns with numpy segmented gathers — per-term
    posting lists assemble without any per-token Python — then reuses
    :func:`_encode_term_group` per term, so blocks are bit-identical
    to the exploded path's."""
    cols = [
        "shard", "term", "block_id", "n", "max_doc", "max_tf",
        "block_ub", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes",
    ]
    if not len(pdf):
        return pd.DataFrame(columns=cols)
    shard = int(pdf["shard"].iloc[0])
    terms_lists = pdf["terms"].tolist()
    tlens = np.fromiter(
        (len(t) for t in terms_lists), np.int64, count=len(terms_lists)
    )
    doc_per = np.repeat(pdf["doc_id"].to_numpy(np.int64), tlens)
    dl_per = np.repeat(pdf["dl"].to_numpy(np.int64), tlens)
    terms_flat = np.concatenate(
        [np.asarray(t, object) for t in terms_lists if len(t)]
    )
    tfs_flat = np.concatenate(
        [np.asarray(t, np.int64) for t in pdf["tfs"] if len(t)]
    )
    entry_starts = np.cumsum(tfs_flat) - tfs_flat  # into the flat pos stream
    codes, uniq = pd.factorize(terms_flat)
    uniq = np.asarray(uniq, object)
    order = np.lexsort((doc_per, codes))
    c_s = codes[order]
    d_s = doc_per[order]
    dl_s = dl_per[order]
    tf_s = tfs_flat[order]
    term_bounds = np.concatenate(
        ([0], np.flatnonzero(c_s[1:] != c_s[:-1]) + 1, [c_s.size])
    )
    pos_gathered = None
    pos_bounds = None
    if with_positions:
        pos_concat = np.concatenate(
            [np.asarray(p, np.int64) for p in pdf["poss"] if len(p)]
        )
        st = entry_starts[order]
        seg_off = np.cumsum(tf_s) - tf_s
        idx = np.repeat(st - seg_off, tf_s) + np.arange(int(tf_s.sum()))
        pos_gathered = pos_concat[idx]
        pos_bounds = np.concatenate(([0], np.cumsum(tf_s)))
    rows: list[tuple] = []
    for i in range(term_bounds.size - 1):
        a, b = int(term_bounds[i]), int(term_bounds[i + 1])
        pos_flat = None
        if with_positions:
            pos_flat = pos_gathered[pos_bounds[a] : pos_bounds[b]]
        rows.extend(
            _encode_term_group(
                shard, uniq[c_s[a]], d_s[a:b], tf_s[a:b], dl_s[a:b],
                avgdl, positions=pos_flat,
            )
        )
    return pd.DataFrame(rows, columns=cols)


def build_index_packed(
    spark: SparkSession,
    packed: DataFrame,
    index_dir: str,
    n_shards: int = 16,
    resume: bool = False,
    with_positions: bool = True,
    id_col: str = "doc_id",
    stage_timings: dict | None = None,
    bucketized: bool = False,
) -> dict:
    """Build (or resume) the sharded compressed index from PACKED
    per-doc token arrays ``(doc_id, terms array<string>, poss
    array<int>)`` — the scale path.

    Identical output to :func:`build_index` on the exploded table
    (asserted bit-identical in tests), but the token stream never
    explodes to one-row-per-token on the JVM side: the per-doc
    (term, tf, positions) roll-up happens map-side in the bucketize
    pass, and the one shuffle moves ~n_docs × SALT_BUCKETS packed
    array rows instead of one row per token.

    ``bucketized=True``: ``packed`` is already in the bucketize shape
    (BUCKETIZED_SCHEMA with the SAME ``n_shards``/SALT_BUCKETS, e.g.
    from the fused :func:`analyzed_bucketized`) — skip the bucketize
    pass."""
    ensure_py_files(spark)
    if not resume and os.path.isdir(index_dir):
        # empty-input guard BEFORE destroying the old index (see
        # build_index; same rationale)
        if packed.isEmpty():
            raise ValueError(
                "refusing to build an index from an empty token table "
                "(build into a staging dir via begin_publish so an "
                "empty input can never clobber a live index)"
            )
        import shutil

        shutil.rmtree(index_dir)
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)

    done = set()
    if resume:
        for s in range(n_shards):
            if os.path.exists(_manifest_path(index_dir, s)):
                if _check_resume_manifest(index_dir, s, n_shards):
                    done.add(s)
    todo = [s for s in range(n_shards) if s not in done]
    # stale-timing guard: a fully-resumed build (todo empty) must not
    # report the PREVIOUS build's write timings (review batch 28)
    _LAST_WRITE_TIMINGS.clear()

    import time as _time

    from pyspark.storagelevel import StorageLevel

    _t = _time.perf_counter
    t0 = _t()
    # one chain run feeds stats + encode: persist the BUCKETIZED table
    # (array rows — far cheaper to materialize than the exploded one;
    # at 100 TB: a staging Iceberg table instead of executor memory)
    buck = dstats = tstats = None
    try:
        buck = (
            packed if bucketized
            else bucketized_tokens(packed, n_shards, id_col=id_col)
        ).persist(StorageLevel.MEMORY_AND_DISK)

        # doc stats: dl/width ride on every bucket row — first()/max() with
        # map-side partial agg, ~SALT_BUCKETS rows per doc in, 1 out
        dstats = buck.groupBy("doc_id").agg(
            F.first("dl").alias("dl"), F.max("width").alias("width")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        crow = dstats.agg(
            F.count("*").alias("docs"), F.sum("dl").alias("tokens")
        ).collect()[0]
        if not crow["docs"]:
            raise ValueError(
                "refusing to build an index from an empty token table "
                "(build into a staging dir via begin_publish so an empty "
                "input can never clobber a live index)"
            )
        corpus = {
            "corpus_docs": int(crow["docs"]),
            "corpus_tokens": int(crow["tokens"]),
        }
        avgdl = corpus["corpus_tokens"] / corpus["corpus_docs"]
        t1 = _t()

        # term stats: each (doc, term) appears exactly once across bucket
        # rows, so df = count and cf = sum(tf) — no countDistinct expand
        tstats = (
            buck.select(F.expr("inline(arrays_zip(terms, tfs))"))
            .groupBy(F.col("terms").alias("term"))
            .agg(F.count("*").alias("df"), F.sum("tfs").cast("long").alias("cf"))
        ).persist(StorageLevel.MEMORY_AND_DISK)

        t2 = _t()
        # measured: sidecars were ~2.5 s of the ~10 s non-chain tail at 32
        # cores when run sequentially after the encode
        side_t, _sidecar_err = _start_sidecar_thread(
            spark, index_dir, dstats, tstats, corpus, n_shards
        )
        try:
            if todo:
                def encode(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
                    return _encode_packed_group(pdf, avgdl, with_positions)

                encoded = (
                    buck.filter(F.col("shard").isin(todo))
                    .groupBy("shard", "tbucket")
                    .applyInPandas(encode, schema=ENC_SCHEMA)
                )
                _write_postings_and_manifests(
                    spark, encoded, index_dir, todo, n_shards
                )
            t3 = _t()
        finally:
            # join even on a failed postings write: an orphaned writer
            # thread would race a caller's cleanup/retry inside index_dir
            side_t.join()

        if _sidecar_err:
            raise _sidecar_err[0]
        t4 = _t()
        if stage_timings is not None:
            stage_timings.update(
                chain_bucketize_dstats_s=round(t1 - t0, 3),
                encode_write_manifest_s=round(t3 - t2, 3),
                # sidecars run CONCURRENTLY with the encode stage; this is
                # only their overhang past the postings write
                sidecar_overhang_s=round(t4 - t3, 3),
                **_LAST_WRITE_TIMINGS,
            )
        meta = {
            "corpus_docs": int(corpus["corpus_docs"]),
            "corpus_tokens": int(corpus["corpus_tokens"]),
            "avgdl": avgdl,
            "n_shards": n_shards,
            "built_shards": len(done) + len(todo),
            "resumed_from": sorted(done),
            "publish_token": _publish_token(),
        }
        with open(os.path.join(index_dir, "corpus.json"), "w") as f:
            json.dump(meta, f)
        return meta
    finally:
        # release caches on EVERY exit — a failed build must not
        # pin the bucketized table (review batch 28)
        for _h in (buck, dstats, tstats):
            if _h is not None:
                try:
                    _h.unpersist()
                except Exception:
                    pass


# ------------------------------------------------- serving-side decode
#
# The reference serves lexicometry (terms/cooc/concordance/chrono) from
# the index sidecars (TermStats, the positions "rail"), NEVER by
# re-analyzing the corpus — the analysis chain is the most expensive
# stage in the whole system. These decoders give the Spark side the
# same property: the postings parquet decodes (distributed, one task
# per parquet split, numpy varint decode per block) back to the exact
# token shapes the lexicometry operators consume.


def decoded_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    """``(term, doc_id, tf, dl)`` decoded from the compressed blocks.

    Distributed mapInPandas over the postings parquet — a narrow scan +
    decode, no shuffle; downstream aggregations shuffle the decoded
    skinny rows exactly as they would a raw token table."""
    ensure_py_files(spark)
    post = spark.read.parquet(os.path.join(index_dir, "postings")).select(
        "term", "n", "doc_bytes", "tf_bytes", "dl_bytes"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            terms: list = []
            docs_l: list = []
            tfs_l: list = []
            dls_l: list = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                docs = np.cumsum(varint_decode(row.doc_bytes, n))
                terms.append(np.full(n, row.term, object))
                docs_l.append(docs)
                tfs_l.append(varint_decode(row.tf_bytes, n))
                dls_l.append(varint_decode(row.dl_bytes, n))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs_l).astype(np.int64),
                    "tf": np.concatenate(tfs_l).astype(np.int64),
                    "dl": np.concatenate(dls_l).astype(np.int64),
                }
            )

    return post.mapInPandas(
        run, schema="term string, doc_id long, tf long, dl long"
    )


def decoded_rail(spark: SparkSession, index_dir: str) -> DataFrame:
    """``(doc_id, pos, term)`` token rail decoded from the positions
    channel — row-for-row identical to the token table the index was
    built from (positions preserve stop-gaps). Requires an index built
    ``with_positions=True`` (pos_bytes present)."""
    ensure_py_files(spark)
    post = spark.read.parquet(os.path.join(index_dir, "postings")).select(
        "term", "n", "doc_bytes", "tf_bytes", "pos_bytes"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            terms: list = []
            docs_l: list = []
            poss_l: list = []
            for row in pdf.itertuples(index=False):
                n = int(row.n)
                docs = np.cumsum(varint_decode(row.doc_bytes, n))
                tfs = varint_decode(row.tf_bytes, n)
                total = int(tfs.sum())
                if total == 0 or not row.pos_bytes:
                    continue
                # within-doc delta decode: segmented cumsum via the
                # "subtract previous segment's carry" trick
                dp = varint_decode(row.pos_bytes, total).astype(np.int64)
                pos = seg_cumsum(dp, tfs)
                terms.append(np.full(total, row.term, object))
                docs_l.append(np.repeat(docs, tfs))
                poss_l.append(pos)
            if not terms:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(docs_l).astype(np.int64),
                    "pos": np.concatenate(poss_l).astype(np.int32),
                    "term": np.concatenate(terms),
                }
            )

    return post.mapInPandas(run, schema="doc_id long, pos int, term string")


def _manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "manifest", f"shard_{shard}.json")


def _check_resume_manifest(index_dir: str, shard: int, n_shards: int) -> bool:
    """A resumable manifest must come from a build with the SAME
    sharding and codec: resuming a 16-shard tree with n_shards=8 would
    mark every shard done and silently publish HALF the corpus, and a
    prior-format tree would mix codec layouts under one meta (review
    batch 28 — the manifests record n_shards/format for exactly this
    check).

    Returns True iff the shard counts as done. A truncated/unreadable
    manifest — the half-written file of exactly the crashed run resume
    exists for — returns False (shard is rebuilt) instead of aborting
    the whole resume with a raw JSONDecodeError; the hard ValueError
    is reserved for READABLE manifests from an incompatible build
    (ADVICE r04)."""
    try:
        with open(_manifest_path(index_dir, shard)) as f:
            m = json.load(f)
    except (ValueError, OSError):
        # ValueError covers JSONDecodeError AND UnicodeDecodeError
        # (torn writes can leave non-UTF-8 bytes, not just truncated
        # JSON)
        return False
    if not isinstance(m, dict):
        # parses but is a bare scalar/list — still a torn write
        return False
    if m.get("n_shards") != n_shards or m.get("format") != FORMAT_VERSION:
        raise ValueError(
            f"resume: shard {shard} manifest is from an incompatible "
            f"build (n_shards={m.get('n_shards')}, "
            f"format={m.get('format')!r}; this build: {n_shards}, "
            f"{FORMAT_VERSION!r}) — rebuild with resume=False"
        )
    return True


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "corpus.json")) as f:
        return json.load(f)


# ----------------------------------------------------- atomic publish
#
# The reference publishes a rebuilt index by atomic directory rename
# (TeiIngester.java:37-40: build into <name>_tmp, rename over <name>)
# so a serving process only ever sees a COMPLETE index. POSIX rename
# cannot replace a non-empty directory, so the equivalent here is
# version subdirectories plus an atomically-replaced pointer file:
#
#     <index_dir>/CURRENT            → token of the live version
#     <index_dir>/versions/<token>/  → one complete index tree each
#
# Writers build into versions/.tmp-<token>, rename to versions/<token>
# (atomic, target does not exist), then flip CURRENT via write-tmp +
# os.replace (atomic on POSIX). Readers resolve CURRENT once at open;
# a reader holding version A keeps reading A's files unchanged while B
# is built and published — nothing is ever overwritten in place. Old
# versions are garbage-collected only after a grace window (the
# reference's unload grace), so in-flight queries drain safely.
# (On a cluster the same role is played by an Iceberg snapshot commit;
# this is the filesystem analogue for the serving nodes.)

def _publish_token() -> str:
    """Monotonic-unique publish token: ns wall clock (ordering) + a
    random suffix (uniqueness even within one clock quantum — the
    mtime-granularity race ADVICE r2 flagged cannot recur)."""
    import time
    import uuid

    return f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}"


def resolve_current(index_dir: str) -> str:
    """The directory actually holding the live index: the CURRENT
    version under a versioned publish root, or ``index_dir`` itself for
    a plain (unversioned) index tree."""
    cur = os.path.join(index_dir, "CURRENT")
    if os.path.exists(cur):
        with open(cur) as f:
            token = f.read().strip()
        return os.path.join(index_dir, "versions", token)
    return index_dir


def begin_publish(index_dir: str) -> tuple[str, str]:
    """Start a versioned publish: returns ``(staging_dir, token)``.
    Build a complete index into ``staging_dir`` (e.g. via
    :func:`build_index_packed`), then :func:`commit_publish`."""
    token = _publish_token()
    staging = os.path.join(index_dir, "versions", f".tmp-{token}")
    os.makedirs(staging, exist_ok=True)
    return staging, token


def commit_publish(index_dir: str, staging_dir: str, token: str) -> str:
    """Atomically make the staged version live. Returns its final path.

    Two renames, both atomic: staging → versions/<token> (fresh name,
    never clobbers), then CURRENT flipped via ``os.replace`` of a
    freshly-written temp pointer. A crash between the two leaves the
    old version live and the new one complete-but-unreferenced (next
    gc sweeps it)."""
    import time as _time_mod

    prev_live = None
    if os.path.exists(os.path.join(index_dir, "CURRENT")):
        prev_live = resolve_current(index_dir)
    final = os.path.join(index_dir, "versions", token)
    os.rename(staging_dir, final)
    tmp_ptr = os.path.join(index_dir, f".CURRENT.tmp-{token}")
    with open(tmp_ptr, "w") as f:
        f.write(token)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_ptr, os.path.join(index_dir, "CURRENT"))
    # stamp the version we just superseded: gc's grace window counts
    # from WHEN it stopped being live (a version that served for hours
    # still gets its full drain window), not from its build mtime
    if prev_live and os.path.isdir(prev_live):
        try:
            with open(os.path.join(prev_live, ".superseded_at"), "w") as f:
                f.write(repr(_time_mod.time()))
        except OSError:
            pass  # gc stamps it lazily instead
    return final


def gc_versions(
    index_dir: str, grace_s: float = 60.0,
    stale_staging_s: float = 86400.0,
) -> list[str]:
    """Remove non-live versions (and abandoned staging dirs) older than
    ``grace_s`` — the unload grace window that lets in-flight readers
    of a superseded version drain, measured from when the version was
    SUPERSEDED (the ``.superseded_at`` stamp commit_publish writes),
    never from its build mtime — a version that served for hours gets
    its full drain window. A version with no stamp (crashed publish,
    pre-stamp tree) is stamped now and collected on a later pass.
    In-flight ``.tmp-*`` staging builds are only removed after
    ``stale_staging_s`` (default 24 h) so gc can never kill a long
    encode mid-publish. Returns the tokens removed."""
    import shutil
    import time

    vdir = os.path.join(index_dir, "versions")
    if not os.path.isdir(vdir):
        return []
    live = os.path.basename(resolve_current(index_dir))
    removed = []
    now = time.time()
    for name in os.listdir(vdir):
        if name == live:
            continue
        full = os.path.join(vdir, name)
        if name.startswith(".tmp-"):
            try:
                mtime = os.path.getmtime(full)
            except OSError:
                # commit_publish renamed the staging dir between the
                # listdir and this stat (review batch 28): it is a
                # live version now, not an abandoned build — skip
                continue
            if now - mtime >= stale_staging_s:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(name)
            continue
        stamp = os.path.join(full, ".superseded_at")
        try:
            with open(stamp) as f:
                since = float(f.read())
        except (OSError, ValueError):
            try:  # stamp lazily; collect on a later pass
                with open(stamp, "w") as f:
                    f.write(repr(now))
            except OSError:
                pass
            continue
        if now - since >= grace_s:
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
    return removed


def publish_marker(index_dir: str) -> str | None:
    """The live version's publish token (corpus.json ``publish_token``,
    mtime fallback for pre-token indexes), or None when no complete
    index is present — the registry's change-detection key."""
    live = resolve_current(index_dir)
    marker = os.path.join(live, "corpus.json")
    if not os.path.exists(marker):
        return None
    try:
        tok = read_meta(live).get("publish_token")
        # the mtime fallback must sit INSIDE the guard: an in-place
        # rebuild can rmtree corpus.json between the exists() probe
        # and this stat, and serving-path callers (suggest vocab,
        # wand cache keys) treat None as a cache miss, not a 500
        # (review batch 28)
        return tok if tok else f"mtime:{os.path.getmtime(marker)!r}"
    except (OSError, json.JSONDecodeError):
        return None
