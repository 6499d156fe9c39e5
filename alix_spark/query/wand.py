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
