#!/usr/bin/env python
"""Machine thread-scaling ceiling control — no Spark involved.

Runs the SAME per-doc work the index build is dominated by (the French
analysis chain over synthetic webtext pages) in plain
``multiprocessing.Pool`` at N and 4N processes, interleaved best-of-R,
and reports the efficiency  throughput(4N) / (4 · throughput(N)).

Purpose: on a single shared box, 4N processes do not get 4× the memory
bandwidth or turbo budget, so even embarrassingly-parallel Python caps
below 1.0. This number is the *hardware ceiling* any engine measurement
on this box must be read against — it is emitted inside BENCH JSON next
to the Spark-measured efficiency so the scaling evidence carries its
own control.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HTMLS: list[bytes] = []


def _warm(_i: int) -> int:
    from alix_spark.analysis.chain import analyze

    return len(analyze("<p>bonjour le monde</p>"))


def _work(idx: list[int]) -> int:
    from alix_spark.analysis.chain import analyze

    c = 0
    for i in idx:
        c += len(analyze(_HTMLS[i]))
    return c


def _throughput(procs: int, n_docs: int) -> float:
    """docs/sec of the chain at `procs` worker processes (fork start so
    the corpus is inherited, not pickled; pools warmed before timing)."""
    ctx = mp.get_context("fork")
    chunks = [list(range(i, n_docs, procs * 4)) for i in range(procs * 4)]
    with ctx.Pool(procs) as pool:
        pool.map(_warm, range(procs))
        t0 = time.perf_counter()
        pool.map(_work, chunks)
        dt = time.perf_counter() - t0
    return n_docs / dt


def mp_ceiling(
    n: int = 8, n_docs: int = 1600, doc_scale: int = 10, repeats: int = 2
) -> dict:
    """Interleaved best-of-R ceiling measurement at n vs 4n procs."""
    global _HTMLS
    import numpy as np

    from alix_spark.corpus import webtext

    pdf = webtext._gen_batch(np.arange(n_docs), seed=42, doc_scale=doc_scale)
    _HTMLS = list(pdf["html"])
    best = {n: 0.0, 4 * n: 0.0}
    for _ in range(repeats):
        for procs in (n, 4 * n):
            best[procs] = max(best[procs], _throughput(procs, n_docs))
    eff = best[4 * n] / (4.0 * best[n])
    return {
        "workload": "analysis chain (no Spark), fork pool, warm, interleaved best-of",
        "n_docs": n_docs,
        "doc_scale": doc_scale,
        "repeats": repeats,
        "procs_N": n,
        "procs_4N": 4 * n,
        "docs_per_sec_N": round(best[n], 2),
        "docs_per_sec_4N": round(best[4 * n], 2),
        "ceiling_efficiency": round(eff, 4),
    }


if __name__ == "__main__":
    import json

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    print(json.dumps(mp_ceiling(n)))
