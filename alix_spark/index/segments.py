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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.query.bm25 import B, K1
from alix_spark.util import dense_ranks, ensure_py_files

BLOCK = 128
SALT_BUCKETS = 64
FORMAT_VERSION = "delta-varint-v2"  # v2: positions channel, merged term_stats+dict


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


def decode_block_positions(row, tfs: np.ndarray) -> list[np.ndarray]:
    """Per-doc position arrays for one block (requires pos_bytes)."""
    total = int(tfs.sum())
    if total == 0 or not row["pos_bytes"]:
        return [np.zeros(0, np.int64) for _ in tfs]
    dp = varint_decode(row["pos_bytes"], total)
    bounds = np.concatenate(([0], np.cumsum(tfs)))
    out = []
    for i in range(tfs.size):
        out.append(np.cumsum(dp[bounds[i] : bounds[i + 1]]))
    return out


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
        import shutil

        shutil.rmtree(index_dir)
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)

    done = set()
    if resume:
        for s in range(n_shards):
            if os.path.exists(_manifest_path(index_dir, s)):
                done.add(s)
    todo = [s for s in range(n_shards) if s not in done]

    tok = tok.withColumn(
        "shard", (F.col("doc_id") % F.lit(n_shards)).cast("int")
    )
    # the token table feeds 4 downstream jobs (doc/term stats, corpus
    # scalars, postings encode) — persist it or the whole upstream
    # analysis chain re-runs per job (at 100 TB: materialize to a
    # staging Iceberg table instead of executor memory)
    from pyspark.storagelevel import StorageLevel

    tok = tok.persist(StorageLevel.MEMORY_AND_DISK)

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

        def encode(_key, pdf: pd.DataFrame) -> pd.DataFrame:
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

        # write tasks: at least one per shard, scaled up to the
        # cluster's parallelism via an explicit per-shard sub-bucket —
        # a 16-shard layout must not cap a 32-core (or 1000-executor)
        # write at 16 tasks, but hashing on the raw term would spread
        # every shard over ALL write tasks (≈n_write files per shard
        # directory). (shard, term-hash % width) keeps files per shard
        # ≤ width = n_write/shards, so query-side parquet listing stays
        # O(shards · width), not O(shards · cores).
        n_write = max(len(todo), spark.sparkContext.defaultParallelism)
        width = max(1, n_write // max(len(todo), 1))
        encoded = salted.groupBy("shard", "tbucket").applyInPandas(
            encode, schema=ENC_SCHEMA
        ).repartition(
            n_write, "shard",
            F.pmod(F.xxhash64("term"), F.lit(width)),
        )
        # dynamic partition overwrite: replaces exactly the shards being
        # (re)built — a half-written shard from a crashed run is cleanly
        # rewritten, completed shards are untouched (the Iceberg
        # `overwritePartitions` analogue of the reference's atomic
        # directory-rename publish, TeiIngester.java:37-40)
        encoded.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("shard").parquet(os.path.join(index_dir, "postings"))

        # per-shard manifests: lineage + metrics (resumable restarts)
        seg_stats = (
            spark.read.parquet(os.path.join(index_dir, "postings"))
            .filter(F.col("shard").isin(todo))
            .groupBy("shard")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.sum("n").alias("n_postings"),
                F.count("*").alias("n_blocks"),
            )
            .collect()
        )
        for r in seg_stats:
            with open(_manifest_path(index_dir, r["shard"]), "w") as f:
                json.dump(
                    {
                        "shard": r["shard"],
                        "n_terms": r["n_terms"],
                        "n_postings": r["n_postings"],
                        "n_blocks": r["n_blocks"],
                        "n_shards": n_shards,
                        "block_size": BLOCK,
                        "format": FORMAT_VERSION,
                    },
                    f,
                )

    # stats sidecars (reference TermStats sidecar <field>.stats).
    # term_stats carries the dense term_id (UTF-8 byte order, reference
    # TermLexicon.java:46-53) so the dictionary and stats are ONE table
    # and one write.
    # sidecar writes sized to their data, not to the core count: these
    # tables are thousands-to-millions of skinny rows — 32 write tasks
    # of 400 rows each is pure fixed cost (task scheduling anti-scales
    # with parallelism on small jobs)
    def _size_parts(n_rows: int, per_part: int = 2_000_000) -> int:
        return max(1, min(
            spark.sparkContext.defaultParallelism, n_rows // per_part + 1
        ))

    d_parts = _size_parts(corpus["corpus_docs"])
    dstats.withColumn(
        "shard", (F.col("doc_id") % F.lit(n_shards)).cast("int")
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
    meta = {
        "corpus_docs": int(corpus["corpus_docs"]),
        "corpus_tokens": int(corpus["corpus_tokens"]),
        "avgdl": avgdl,
        "n_shards": n_shards,
        "built_shards": len(done) + len(todo),
        "resumed_from": sorted(done),
    }
    with open(os.path.join(index_dir, "corpus.json"), "w") as f:
        json.dump(meta, f)
    tok.unpersist()
    dstats.unpersist()
    tstats.unpersist()
    return meta


def _manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "manifest", f"shard_{shard}.json")


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "corpus.json")) as f:
        return json.load(f)
