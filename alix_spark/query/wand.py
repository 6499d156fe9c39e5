"""Block-max WAND top-k over the compressed sharded index.

The north rule's query engine: BM25 top-k (k1=1.2, b=0.75 — reference
TermDocScorer.java:98-101) with posting-list cursors, per-block max-score
skip data, and WAND pivot pruning (the reference delegates this to
Lucene's impacts/BMW implementation, OpResults.java:257; here it is
first-class).

Execution model: the driver resolves query terms against term_stats
(idf), then one Spark job fans out over the index's ``shard`` partitions
— parquet reads are pruned to ``term IN (query terms)`` by predicate
pushdown, so each task touches only the query terms' blocks of its
shard. Each shard task runs WAND over its local doc subset and emits its
top-k; the global answer is the k best of the ≤ n_shards·k candidates
(``orderBy().limit(k)`` — tie-break score desc then doc_id asc,
reference TopArray.java:12-15).

Skipped blocks are never varint-decoded: the cursor holds encoded block
rows and decodes lazily on first entry — the I/O+decode saving that
makes WAND matter at 10^12 docs.
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.index.segments import read_meta, varint_decode
from alix_spark.query.bm25 import B, K1
from alix_spark.util import ensure_py_files, round6

_SENTINEL = 1 << 62


class _Cursor:
    """Posting-list cursor over encoded blocks with block-max skipping."""

    __slots__ = ("idf", "blocks", "bi", "docs", "tfs", "dls", "pos", "ub")

    def __init__(self, idf: float, blocks: pd.DataFrame):
        # blocks: rows sorted by block_id with columns n, max_doc,
        # block_ub, doc_bytes, tf_bytes, dl_bytes
        self.idf = idf
        self.blocks = blocks.reset_index(drop=True)
        self.ub = float(idf * self.blocks["block_ub"].max())  # global UB
        self.bi = -1
        self.docs = self.tfs = self.dls = None
        self.pos = 0
        self._next_block()

    def _next_block(self) -> None:
        self.bi += 1
        if self.bi >= len(self.blocks):
            self.docs = np.array([_SENTINEL], dtype=np.int64)
            self.tfs = np.array([0], dtype=np.int64)
            self.dls = np.array([1], dtype=np.int64)
            self.pos = 0
            return
        row = self.blocks.iloc[self.bi]
        n = int(row["n"])
        deltas = varint_decode(row["doc_bytes"], n)
        self.docs = np.cumsum(deltas)
        self.tfs = varint_decode(row["tf_bytes"], n)
        self.dls = varint_decode(row["dl_bytes"], n)
        self.pos = 0

    def doc(self) -> int:
        return int(self.docs[self.pos])

    def block_ub(self) -> float:
        if self.bi >= len(self.blocks):
            return 0.0
        return self.idf * float(self.blocks.iloc[self.bi]["block_ub"])

    def score(self, avgdl: float, k1: float = K1, b: float = B) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        norm = k1 * (1.0 - b + b * dl / avgdl)
        return self.idf * (tf * (k1 + 1.0)) / (tf + norm)

    def advance(self) -> None:
        self.pos += 1
        if self.pos >= self.docs.size:
            self._next_block()

    def advance_to(self, target: int) -> None:
        """Skip whole blocks via max_doc metadata, then binary-search
        inside the landing block — skipped blocks stay encoded."""
        while self.bi < len(self.blocks) and int(
            self.blocks.iloc[self.bi]["max_doc"]
        ) < target:
            self.bi += 1
            self.docs = None
        if self.bi >= len(self.blocks):
            self.docs = np.array([_SENTINEL], dtype=np.int64)
            self.tfs = np.array([0], dtype=np.int64)
            self.dls = np.array([1], dtype=np.int64)
            self.pos = 0
            return
        if self.docs is None:
            self.bi -= 1
            self._next_block()
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= self.docs.size:
            self._next_block()
            self.advance_to(target)

    def exhausted(self) -> bool:
        return self.doc() >= _SENTINEL


def wand_shard_topk(
    cursors: list[_Cursor], k: int, avgdl: float, mode: str = "or"
) -> list[tuple[int, float]]:
    """Block-max WAND over one shard's cursors → [(doc_id, score)].

    mode 'or': classic WAND threshold pruning.
    mode 'and': conjunction — pivot is always the max cursor doc.
    Returns k best by (score desc, doc_id asc).
    """
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of kept
    n_terms = len(cursors)

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -math.inf

    while True:
        live = [c for c in cursors if not c.exhausted()]
        if mode == "and" and len(live) < n_terms:
            break
        if not live:
            break
        live.sort(key=lambda c: c.doc())
        if mode == "and":
            target = live[-1].doc()
            aligned = all(c.doc() == target for c in live)
            if not aligned:
                for c in live:
                    if c.doc() < target:
                        c.advance_to(target)
                continue
            pivot_doc = target
            sel = live
        else:
            # find pivot: smallest prefix whose Σ upper bounds ≥ θ
            acc = 0.0
            pivot = -1
            for i, c in enumerate(live):
                acc += c.ub
                if acc > threshold():
                    pivot = i
                    break
            if pivot < 0:
                break  # no doc can beat θ
            pivot_doc = live[pivot].doc()
            # block-max refinement: Σ current-block UBs of cursors at/before pivot
            bm = 0.0
            for c in live[: pivot + 1]:
                if c.doc() <= pivot_doc:
                    c_ub = c.block_ub() if c.doc() >= 0 else c.ub
                    bm += c_ub
            if bm <= threshold():
                # current blocks can't beat θ: advance the leading cursor
                live[0].advance_to(pivot_doc if live[0].doc() < pivot_doc else pivot_doc + 1)
                continue
            if live[0].doc() != pivot_doc:
                # align leaders to the pivot doc
                for c in live[:pivot]:
                    if c.doc() < pivot_doc:
                        c.advance_to(pivot_doc)
                continue
            sel = [c for c in live if c.doc() == pivot_doc]

        score = 0.0
        for c in sel:
            score += c.score(avgdl)
        item = (score, -pivot_doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
        for c in sel:
            c.advance()

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-d, s) for s, d in out]


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
) -> DataFrame:
    """Distributed block-max WAND query → (doc_id, score) DataFrame,
    rank-identical to the brute-force bm25.bm25_topk oracle."""
    ensure_py_files(spark)
    terms = sorted(set(terms))
    meta = read_meta(index_dir)
    avgdl = float(meta["avgdl"])
    n_docs = int(meta["corpus_docs"])

    tstats = (
        spark.read.parquet(os.path.join(index_dir, "term_stats"))
        .filter(F.col("term").isin(terms))
        .collect()
    )
    idf = {
        r["term"]: math.log(1.0 + (n_docs - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in tstats
    }
    if mode == "and" and len(idf) < len(terms):
        return spark.createDataFrame([], "doc_id long, score double")
    if not idf:
        return spark.createDataFrame([], "doc_id long, score double")

    post = spark.read.parquet(os.path.join(index_dir, "postings")).filter(
        F.col("term").isin(list(idf))
    )
    n_terms_req = len(idf)
    idf_b = dict(idf)

    def run_shard(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        cursors = []
        for term, g in pdf.groupby("term", sort=True):
            cursors.append(
                _Cursor(idf_b[term], g.sort_values("block_id"))
            )
        if mode == "and" and len(cursors) < n_terms_req:
            return pd.DataFrame({"doc_id": [], "score": []})
        hits = wand_shard_topk(cursors, k, avgdl, mode=mode)
        return pd.DataFrame(
            {"doc_id": [h[0] for h in hits], "score": [h[1] for h in hits]}
        )

    local = post.groupBy("shard").applyInPandas(
        run_shard, schema="doc_id long, score double"
    )
    return (
        local.select("doc_id", round6(F.col("score")).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# ----------------------------------------------------- phrase / near


def _phrase_match_docs(
    term_blocks: dict[str, pd.DataFrame], terms: list[str], slop: int,
    ordered: bool,
) -> list[tuple[int, int, int]]:
    """Positional phrase/near matching over decoded postings of one
    shard → [(doc_id, n_matches, dl)].

    ordered slop=0 → exact phrase (reference SpanNear in-order,
    SpanQueryParser.java:302-318); ordered slop>0 → gaps allowed;
    unordered → any order within the slop window.
    """
    from alix_spark.index.segments import decode_block, decode_block_positions

    per_term: list[dict[int, np.ndarray]] = []
    dls: dict[int, int] = {}
    for t in terms:
        blocks = term_blocks.get(t)
        docmap: dict[int, np.ndarray] = {}
        if blocks is not None:
            for _, row in blocks.sort_values("block_id").iterrows():
                docs, tfs, dl = decode_block(row)
                poss = decode_block_positions(row, tfs)
                for i in range(docs.size):
                    docmap[int(docs[i])] = poss[i]
                    dls[int(docs[i])] = int(dl[i])
        per_term.append(docmap)

    common = set(per_term[0])
    for dm in per_term[1:]:
        common &= set(dm)

    out = []
    for doc in sorted(common):
        plists = [dm[doc] for dm in per_term]
        if ordered:
            # starts = positions of term0 that can be extended through
            # all terms with gaps ≤ slop between consecutive members
            cur = plists[0]
            for nxt in plists[1:]:
                if cur.size == 0:
                    break
                keep = []
                for p in cur:
                    cand = nxt[(nxt > p) & (nxt <= p + 1 + slop)]
                    if cand.size:
                        keep.append(int(cand.min()))
                cur = np.unique(np.array(keep, dtype=np.int64)) if keep else np.zeros(0, np.int64)
            n = int(cur.size)
        else:
            # unordered near: count windows where max-min span ≤
            # (len(terms)-1) + slop, greedy over sorted merged positions
            n = 0
            idxs = [0] * len(plists)
            width = len(terms) - 1 + slop
            while all(i < p.size for i, p in zip(idxs, plists)):
                vals = [int(p[i]) for i, p in zip(idxs, plists)]
                if max(vals) - min(vals) <= width:
                    n += 1
                    idxs = [i + 1 for i in idxs]
                else:
                    j = vals.index(min(vals))
                    idxs[j] += 1
        if n > 0:
            out.append((doc, n, dls[doc]))
    return out


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    slop: int = 0,
    ordered: bool = True,
    k: int = 10,
) -> DataFrame:
    """Distributed phrase/near query with BM25-style scoring: the
    phrase is treated as one synthetic term — tf = match count per doc,
    df = number of matching docs (computed exactly in the same job),
    idf and length norm per the golden BM25 formula."""
    ensure_py_files(spark)
    meta = read_meta(index_dir)
    avgdl = float(meta["avgdl"])
    n_docs = int(meta["corpus_docs"])

    post = spark.read.parquet(os.path.join(index_dir, "postings")).filter(
        F.col("term").isin(terms)
    )

    def run_shard(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        tb = {t: g for t, g in pdf.groupby("term", sort=False)}
        if len(tb) < len(set(terms)):
            return pd.DataFrame({"doc_id": [], "tf": [], "dl": []})
        hits = _phrase_match_docs(tb, terms, slop, ordered)
        return pd.DataFrame(
            {"doc_id": [h[0] for h in hits], "tf": [h[1] for h in hits],
             "dl": [h[2] for h in hits]}
        )

    matches = post.groupBy("shard").applyInPandas(
        run_shard, schema="doc_id long, tf long, dl long"
    )
    # exact phrase df via a global count window over the (tiny) match
    # set — one pass, no recompute of the matching job
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    withdf = matches.withColumn("df", F.count("*").over(w))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl))
    scored = withdf.select(
        "doc_id",
        round6(idf * (F.col("tf") * F.lit(K1 + 1.0)) / (F.col("tf") + norm)).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ------------------------------------------------- driver fast path


_LOCAL_CACHE: dict[str, tuple] = {}


def query_local(
    index_dir: str, terms: list[str], k: int = 10, mode: str = "and"
) -> list[tuple[int, float]]:
    """Low-latency serving path: read the query terms' blocks straight
    from the sharded parquet via pyarrow (predicate pushdown on term),
    run block-max WAND per shard on the serving node, merge top-k.
    No Spark job — this is the reference's query-node model (a single
    process over the frozen index, LuceneIndex.java:36-43); the Spark
    executor path (wand_topk) covers cluster-wide fan-out."""
    import pyarrow.dataset as ds

    terms = sorted(set(terms))
    meta = read_meta(index_dir)
    avgdl = float(meta["avgdl"])
    n_docs = int(meta["corpus_docs"])

    key = index_dir
    if key not in _LOCAL_CACHE:
        tstats = ds.dataset(os.path.join(index_dir, "term_stats")).to_table(
            columns=["term", "df"]
        )
        dfmap = dict(zip(tstats["term"].to_pylist(), tstats["df"].to_pylist()))
        dset = ds.dataset(
            os.path.join(index_dir, "postings"), partitioning="hive"
        )
        _LOCAL_CACHE[key] = (dfmap, dset)
    dfmap, dset = _LOCAL_CACHE[key]

    idf = {
        t: math.log(1.0 + (n_docs - dfmap[t] + 0.5) / (dfmap[t] + 0.5))
        for t in terms if t in dfmap
    }
    if not idf or (mode == "and" and len(idf) < len(terms)):
        return []

    tbl = dset.to_table(filter=ds.field("term").isin(list(idf)))
    pdf = tbl.to_pandas()
    results: list[tuple[int, float]] = []
    for _shard, g in pdf.groupby("shard", sort=False):
        cursors = [
            _Cursor(idf[t], tg.sort_values("block_id"))
            for t, tg in g.groupby("term", sort=True)
        ]
        if mode == "and" and len(cursors) < len(idf):
            continue
        results.extend(wand_shard_topk(cursors, k, avgdl, mode=mode))
    results = [(d, math.floor(s * 1e6 + 0.5) / 1e6) for d, s in results]
    results.sort(key=lambda t: (-t[1], t[0]))
    return results[:k]
