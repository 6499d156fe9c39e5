#!/usr/bin/env python
"""Headline benchmark for the alix_spark engine.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra fields (informational, keyed to BASELINE.json's metric):
- ``index_docs_per_sec``   index-build throughput (postings+stats over documents)
- ``bm25_p50_ms``          median latency of the BM25 top-10 queries
- ``cpus``                 parallelism used (for the N vs 4N scaling runs,
                           see BENCH/BASELINE.md: run with SPARK_GRAFT_CPUS=8
                           and =32 on the same input)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from alix_spark import entry_queries  # noqa: E402
from alix_spark.session import get_spark  # noqa: E402

# Headline set: index build (postings = the core shuffle), BM25 ranking,
# one keyness agg, positional cooc, dedup, ANN, and a text-stats scan.
HEADLINE = [
    "postings",
    "term_stats",
    "bm25_and",
    "bm25_single",
    "bm25_or",
    "phrase_match",
    "keyness_g2",
    "cooc_window",
    "dedup_minhash",
    "ann_cosine",
    "token_counts",
]

BM25_QUERIES = {"bm25_and", "bm25_single", "bm25_or"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = get_spark(app="alix_spark_bench", master=f"local[{cpus}]")
    qmap = entry_queries.queries()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # warm the JVM + parquet footer caches once (excluded from timings)
    qmap["doc_stats"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.collect() if name in BM25_QUERIES else df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    index_build_s = timings["postings"] + timings["term_stats"]
    bm25_lat = [timings[q] for q in sorted(BM25_QUERIES)]
    out = {
        "metric": "alix_spark headline: index build + BM25 topk + lexicometry + dedup/ANN",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "index_docs_per_sec": round(n_docs / index_build_s, 2) if index_build_s else None,
        "bm25_p50_ms": round(statistics.median(bm25_lat) * 1000.0, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
