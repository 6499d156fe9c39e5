#!/usr/bin/env python
"""N-vs-4N scaling-efficiency harness (the north rule's two-cluster-size
criterion, evidenced in-sandbox by two parallelism levels on the same
input). Writes the run table to BENCH_RUN.md; the curated analysis
(controls, per-stage scaling, variance) lives in BENCH.md.

Runs the full index build (webtext gen → analysis chain → salted encode
→ sharded segments) via ``spark-submit --py-files`` at local[N] and
local[4N], same corpus, and reports throughput at both plus

    efficiency = throughput(4N) / (4 · throughput(N))

Usage:  python scripts/scaling_bench.py [--n-docs 60000] [--n 8]
Writes BENCH_RUN.md in the repo root and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip() -> str:
    """Package alix_spark for --py-files (cluster ship format)."""
    zpath = os.path.join(tempfile.gettempdir(), "alix_spark_submit.zip")
    pkg = os.path.join(REPO, "alix_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".py", ".csv", ".json")):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_build(master: str, zpath: str, n_docs: int, index_dir: str, doc_scale: int = 1) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master", master,
        "--py-files", zpath,
        "--conf", "spark.sql.shuffle.partitions="
        + master[master.find("[") + 1 : -1],
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=24g",
        "--conf", "spark.sql.session.timeZone=UTC",
        os.path.join(REPO, "scripts", "build_index.py"),
        "--n-docs", str(n_docs),
        "--doc-scale", str(doc_scale),
        "--index-dir", index_dir,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("BUILD_METRICS "):
            return json.loads(line[len("BUILD_METRICS "):])
    raise RuntimeError(
        f"no BUILD_METRICS in output; rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )


def run_pair(
    n: int, n_docs: int, repeats: int = 3, doc_scale: int = 1
) -> tuple[dict, dict, list]:
    """Interleaved best-of-N runs at local[n] and local[4n].

    The sandbox shows 50-100% run-to-run wall-clock variance on
    identical jobs (shared machine / turbo effects); interleaving the
    two configurations and taking each one's best run measures the
    engine, not the noise."""
    best, runs = run_levels([n, n * 4], n_docs, repeats, doc_scale)
    return best[n], best[n * 4], runs


def run_levels(
    levels: list[int], n_docs: int, repeats: int = 3, doc_scale: int = 1
) -> tuple[dict, list]:
    """Interleaved best-of-R runs at each parallelism level in
    ``levels`` (same corpus, clean spark-submit JVMs). Returns
    ``({cores: best_metrics}, all_runs)``. One 8-core series can then
    serve two N-vs-4N ratios (2→8 and 8→32) without doubling the runs."""
    zpath = make_zip()
    work = tempfile.mkdtemp(prefix="alix_scale_")
    runs = []
    try:
        for r in range(repeats):
            for cores in levels:
                ix = os.path.join(work, f"ix_{cores}_{r}")
                # 1-min load BEFORE launching the leg: our own prior
                # leg has exited, so a value far above its decay
                # envelope marks EXTERNAL consumers in this window
                # (the driver-auditable weather signature, VERDICT r04
                # ask #1)
                load1 = os.getloadavg()[0]
                m = run_build(f"local[{cores}]", zpath, n_docs, ix, doc_scale)
                m["cores"] = cores
                m["loadavg1_pre"] = round(load1, 2)
                runs.append(m)
                shutil.rmtree(ix, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    best = {
        c: min((m for m in runs if m["cores"] == c), key=lambda m: m["build_sec"])
        for c in levels
    }
    return best, runs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60000)
    ap.add_argument("--n", type=int, default=8, help="small cluster cores (large = 4N)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--doc-scale", type=int, default=1)
    args = ap.parse_args()

    small, large, runs = run_pair(args.n, args.n_docs, args.repeats, args.doc_scale)

    eff = large["docs_per_sec"] / (4.0 * small["docs_per_sec"])
    result = {
        "n_docs": args.n_docs,
        "N_cores": args.n,
        "repeats": args.repeats,
        "throughput_N_docs_per_sec": small["docs_per_sec"],
        "throughput_4N_docs_per_sec": large["docs_per_sec"],
        "build_sec_N": small["build_sec"],
        "build_sec_4N": large["build_sec"],
        "scaling_efficiency": round(eff, 4),
        "meets_0.8": eff >= 0.8,
        "bm25_wand_p50_ms_N": small["bm25_wand_p50_ms"],
        "bm25_wand_p50_ms_4N": large["bm25_wand_p50_ms"],
        "all_runs": [
            {"cores": m["cores"], "build_sec": m["build_sec"]} for m in runs
        ],
    }
    print(json.dumps(result))

    with open(os.path.join(REPO, "BENCH_RUN.md"), "w") as f:
        f.write(f"""# BENCH_RUN — latest scaling run (see BENCH.md for analysis)

North-rule criterion (BASELINE.json): throughput scaling efficiency
≥ 0.8 between two cluster sizes. In this sandbox (single machine,
local mode) the two sizes are evidenced as two parallelism levels on
byte-identical input, run via `spark-submit --py-files` — see
`scripts/scaling_bench.py`.

Job: {args.n_docs} synthetic webtext docs → French analysis chain →
salted postings encode → {small['n_shards']}-shard delta+varint segments
+ manifests (scripts/build_index.py).

| cluster size | cores | build sec | docs/sec | tokens/sec | BM25-WAND p50 |
|---|---|---|---|---|---|
| N  | {small['cores']} | {small['build_sec']} | {small['docs_per_sec']} | {small['tokens_per_sec']} | {small['bm25_wand_p50_ms']} ms |
| 4N | {large['cores']} | {large['build_sec']} | {large['docs_per_sec']} | {large['tokens_per_sec']} | {large['bm25_wand_p50_ms']} ms |

**Scaling efficiency = {result['throughput_4N_docs_per_sec']} / (4 x {result['throughput_N_docs_per_sec']}) = {result['scaling_efficiency']}**
(target >= 0.8: {"MET" if result['meets_0.8'] else "NOT MET"})

Rank-identity across sizes: the corpus is generated per-doc-id
(partition-invariant), docIDs are dense `row_number` over url byte
order, and the WAND top-k is asserted identical between local[8] and
local[32] by the driver contract's signature probe and
tests/test_index_wand.py.
""")


if __name__ == "__main__":
    main()
