#!/usr/bin/env python
"""Headline benchmark for the alix_spark engine.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Fields keyed to BASELINE.json's metric:
- ``index_docs_per_sec``      relational postings+stats build over documents
- ``webtext_index_docs_per_sec``  full pipeline (French analysis chain →
                                  compressed sharded segments) on the
                                  synthetic webtext corpus
- ``bm25_p50_ms``             Spark fan-out BM25-WAND top-10 latency
- ``bm25_serving_p50_ms``     pyarrow serving-path WAND latency (warm)
- ``scaling``                 two-parallelism index-build probe
                              (local[4] vs local[16]; the full
                              spark-submit run is scripts/scaling_bench.py
                              → BENCH.md)
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

HEADLINE = [
    "postings",
    "term_stats",
    "bm25_wand_and",
    "bm25_wand_or",
    "phrase_wand",
    "bm25_and",
    "theme_bm25",
    "keyness_g2",
    "part_keyness_tail",
    "cooc_window",
    "dedup_minhash",
    "ann_cosine",
    "token_counts",
]

COLLECT = {"bm25_wand_and", "bm25_wand_or", "phrase_wand", "bm25_and"}
# realistic page sizes for the probe: doc_scale 10 ≈ 950 analyzed
# tokens/doc (Common-Crawl-ish) — the chain dominates, as it would at
# web scale. 6k docs keeps the whole bench under ~5 min; the canonical
# larger-scale evidence + controls live in BENCH.md (12k-doc runs via
# scripts/scaling_bench.py).
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "6000"))
SCALING_DOC_SCALE = int(os.environ.get("SPARK_GRAFT_SCALING_DOC_SCALE", "10"))


def _scaling_probe(n_docs: int) -> dict:
    """Full-pipeline index build at local[4] vs local[16], each run in
    its own spark-submit JVM, interleaved best-of-N (the sandbox shows
    50-100% run-to-run wall variance; best-of measures the engine)."""
    from scripts.scaling_bench import run_pair

    repeats = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "1"))
    small, large, _runs = run_pair(4, n_docs, repeats, SCALING_DOC_SCALE)
    return {
        "n_docs": n_docs,
        "doc_scale": SCALING_DOC_SCALE,
        "repeats": repeats,
        "docs_per_sec_4c": small["docs_per_sec"],
        "docs_per_sec_16c": large["docs_per_sec"],
        "efficiency_4_to_16": round(
            large["docs_per_sec"] / (4.0 * small["docs_per_sec"]), 4
        ),
        "serving_p50_ms_16c": large["bm25_wand_p50_ms"],
    }


def main() -> None:
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    spark = get_spark(app="alix_spark_bench", master=f"local[{cpus}]")
    qmap = entry_queries.queries()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    qmap["doc_stats"](spark, sf_dir).count()  # warm JVM + parquet footers
    entry_queries._wand_index(spark, sf_dir)  # build the compressed index
    # once up front: bm25_wand_* timings below measure QUERY latency, not
    # the one-time segment build (reported via *_index_docs_per_sec)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.collect() if name in COLLECT else df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    # serving-path latency (pyarrow + WAND, warm cache)
    from alix_spark.query import wand

    idx = entry_queries._wand_index(spark, sf_dir)
    wand.query_local(idx, ["hash", "join"], k=10, mode="and")
    lat = []
    for terms, mode in [(["hash", "join"], "and"), (["merge"], "and"),
                        (["stream", "vector"], "or")]:
        t0 = time.perf_counter()
        wand.query_local(idx, terms, k=10, mode=mode)
        lat.append(time.perf_counter() - t0)

    spark.stop()

    # two-parallelism full-pipeline probe in clean subprocess JVMs
    try:
        scaling = _scaling_probe(SCALING_DOCS)
        webtext_dps = scaling["docs_per_sec_16c"]
    except Exception as e:  # pragma: no cover — probe must not sink the bench
        scaling = {"error": str(e)[:200]}
        webtext_dps = None

    index_build_s = timings["postings"] + timings["term_stats"]
    wand_lat = [timings["bm25_wand_and"], timings["bm25_wand_or"]]
    out = {
        "metric": "alix_spark headline: compressed-index build + BM25-WAND + lexicometry + dedup/ANN",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "index_docs_per_sec": round(n_docs / index_build_s, 2) if index_build_s else None,
        "webtext_index_docs_per_sec": webtext_dps,
        "bm25_p50_ms": round(statistics.median(wand_lat) * 1000.0, 2),
        "bm25_serving_p50_ms": round(statistics.median(lat) * 1000.0, 2),
        # small in-bench smoke probe — single-shot timings on a shared
        # box with 50-100% run variance; NOT the scaling evidence
        "scaling_probe_small": scaling,
        # canonical N-vs-4N evidence: interleaved best-of-N via
        # spark-submit (scripts/scaling_bench.py), with the
        # multiprocessing hardware-ceiling control — see BENCH.md
        "scaling_reference": {
            "see": "BENCH.md",
            "full_build_efficiency_measured_range": [0.24, 0.84],
            "chain_stage_efficiency": 0.77,
            "multiprocessing_ceiling_4_to_16": 0.90,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
