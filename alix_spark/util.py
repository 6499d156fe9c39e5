"""Cross-engine helpers.

round6: deterministic 6-dp rounding defined as floor(x*1e6 + 0.5)/1e6 —
identical double ops on Spark and DuckDB, so both engines produce the
same bits even at exact .5 boundaries (bankers-vs-half-up divergence of
native round()). Used for every float column that the correctness
oracle hashes.
"""

from __future__ import annotations

import os
import tempfile
import threading
import zipfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def ensure_py_files(spark: SparkSession) -> None:
    """Ship the alix_spark package to Python workers.

    mapInPandas closures defined in this package pickle by reference,
    so executors must be able to import ``alix_spark`` regardless of
    the driver's cwd. This zips the package once per SparkContext and
    registers it via ``sc.addPyFile`` — the local-mode equivalent of
    ``spark-submit --py-files alix_spark.zip`` on a real cluster.
    Called lazily by every operator that creates a Python-UDF stage.
    """
    sc = spark.sparkContext
    if getattr(sc, "_alix_pyfiles_added", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"alix_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        # write-temp + atomic replace: a concurrent thread (registry
        # reload + build on fresh contexts) or a mid-write crash must
        # never let addPyFile ship a truncated zip that breaks every
        # executor import with BadZipFile (review batch 34)
        tmp = zpath + f".tmp-{threading.get_ident()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith((".py", ".csv")):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._alix_pyfiles_added = True


def dense_ranks(
    df, key: str, out: str, order_expr: Column | None = None,
    parts: int | None = None,
):
    """Deterministic dense 1-based ranks of ``key`` — without a global
    single-partition window.

    Scale shape (reference TermLexicon.java:46-53 dense-id semantics,
    re-expressed distributed): range-partition the skinny key column
    (parallel global sort), partition-local ``row_number``, then offset
    each partition by the preceding partitions' row counts — every stage
    parallel, ids identical at any parallelism. ``order_expr`` defaults
    to the key itself; pass ``F.encode(col, 'utf-8')`` for UTF-8 byte
    order.

    Returns a DataFrame ``(key, out)``.

    Determinism note: ``repartitionByRange`` samples its bounds with an
    RDD-id-dependent seed, so two *separate actions* over the same plan
    may cut ranges differently. The counts job therefore also collects
    each range's max key, and the rank job re-derives the bucket from
    those **frozen** bounds (broadcast range lookup) instead of
    re-running the sampler — the two jobs can never disagree.

    Preconditions (review batch 34): NULL keys RAISE in-plan — a NULL
    order key is counted into the partition offsets but dropped by the
    frozen-bounds join (ids stop being dense), and an all-NULL first
    range makes its (NULL, NULL] bucket match EVERY row (duplicate
    ids) — the silent-corruption twin of grouped_prefix_sums' explicit
    NULL-group rejection. Duplicate keys get DISTINCT consecutive ids
    in arbitrary tie order (this is row_number, not dense_rank over
    values): callers wanting one id per value must de-duplicate first
    (term_dict does; segments feeds pre-aggregated stats).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if order_expr is None:
        order_expr = F.col(key)
    if parts is None:
        parts = max(spark.sparkContext.defaultParallelism, 2)
    # ``parts``: callers that know the key cardinality should size this
    # (≈1 range per few hundred k keys) — 32 three-stage range tasks
    # over a 50k-term dictionary is pure scheduling overhead
    guarded = F.when(
        order_expr.isNull(),
        F.raise_error(F.lit(f"dense_ranks: NULL order key (column {key!r})")),
    ).otherwise(order_expr)
    keyed = df.select(key).withColumn("_ord", guarded)
    ranged = keyed.repartitionByRange(parts, F.col("_ord")).withColumn(
        "_pid", F.spark_partition_id()
    )
    stats = ranged.groupBy("_pid").agg(
        F.count("*").alias("n"), F.max("_ord").alias("hi")
    ).collect()
    stats = sorted((r for r in stats if r["n"] > 0), key=lambda r: r["_pid"])
    offsets = []
    acc = 1  # 1-based ids (0 = absent sentinel, TermLexicon style)
    for r in stats:
        offsets.append(acc)
        acc += r["n"]
    # frozen contiguous ranges as a broadcast (lo, hi] lookup table —
    # each row matches exactly one bucket. A nested CASE WHEN chain
    # would be O(parts) expression depth (Catalyst analysis blows up
    # at the hundreds-of-partitions scale this helper targets); the
    # broadcast join does the same comparisons without deep codegen.
    bounds = [r["hi"] for r in stats]
    rows = []
    for b, hi in enumerate(bounds):
        lo = bounds[b - 1] if b > 0 else None
        last = b == len(bounds) - 1
        rows.append((b, lo, None if last else hi, offsets[b]))
    from pyspark.sql import types as T

    ord_type = keyed.schema["_ord"].dataType
    bdf = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("_b", T.IntegerType()),
            T.StructField("_lo", ord_type),
            T.StructField("_hi", ord_type),
            T.StructField("_off", T.LongType()),
        ]),
    )
    cond = (
        (F.col("_lo").isNull() | (F.col("_ord") > F.col("_lo")))
        & (F.col("_hi").isNull() | (F.col("_ord") <= F.col("_hi")))
    )
    w = Window.partitionBy("_b").orderBy("_ord")
    return (
        keyed.join(F.broadcast(bdf), cond)
        .withColumn("_rn", F.row_number().over(w).cast("long"))
        .select(key, (F.col("_off") + F.col("_rn") - F.lit(1)).alias(out))
    )


MAX_BROADCAST_ROWS = 2_000_000


def maybe_broadcast(df, max_rows: int = MAX_BROADCAST_ROWS):
    """Broadcast hint only while the side is GENUINELY small (one
    count job decides). An unconditional ``F.broadcast`` on a
    data-dependent side — query-term hits, the vocabulary weights, a
    per-doc label table — ships the whole set to every executor and
    can OOM the driver on a stop-word-grade term or a web-scale
    vocabulary; above the cap the plain shuffle join is the correct
    plan (and AQE may still choose broadcast from real sizes)."""
    n = df.count()
    return F.broadcast(df) if n <= max_rows else df


def balance_partitions(df, min_parts: int | None = None):
    """Small-file guard: a table read from one or two parquet files
    arrives as 1-2 input splits, which SERIALIZES every downstream
    mapInPandas/Arrow stage no matter how many cores the session has
    (measured: the sf0.1 minhash shingle stage ran as 1 task on 32
    cores). Repartition up to the session default parallelism ONLY
    when below it — at production scale the input has thousands of
    splits and this is a no-op (no shuffle added)."""
    spark = df.sparkSession
    want = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


# Java regex \s includes \x0B (vertical tab); RE2's does not — a bare
# \S+ counts 'a\x0Bb' as 2 tokens in Spark but 1 in DuckDB. These
# explicit classes (backslash escape forms both engines parse
# identically) are the ONE whitespace definition any cross-engine
# word/token counting must use.
WS_CLASS = " \\t\\n\\x0B\\f\\r"
NONSPACE_RE = f"[^{WS_CLASS}]+"


def round6(c: Column) -> Column:
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def sql_round6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def grouped_prefix_sums(
    df,
    order_cols: list[str],
    sum_cols: list[str],
    group_cols: list[str] | None = None,
    num_parts: int | None = None,
    prefix: str = "before_",
):
    """Distributed EXCLUSIVE prefix sums over a global
    (group, order) sort — the shared engine under
    webpipe.pack_shards (global, one sum) and
    textstats.heaps_profile (per-source, two sums).

    A naive ``sum() over (order by …)`` window funnels the whole
    corpus through ONE task. Here: range-partition on
    (group_cols + order_cols) so ascending key ranges land on
    ascending partition ids, pin the assignment with an eager
    localCheckpoint (the totals pass and the cumsum pass MUST see the
    same split — RangePartitioner's sampling is not re-run identically
    across jobs), collect one totals row per partition×group (bounded
    by partitions × groups, the per-shard-manifest class),
    exclusive-sum those on the driver, then one Arrow pass adds each
    group's carry to its local running cumsum — batches arrive in
    order within a partition and groups are contiguous under the
    partition sort, so the carry is a scalar per (batch, group).

    Returns ``df``'s columns plus one long ``{prefix}{c}`` column per
    ``sum_cols`` entry: the sum of all EARLIER rows in (group, order)
    order (group-scoped when ``group_cols`` is non-empty, global
    otherwise); rows ordered by the partition sort. NULL group keys
    are rejected (pandas groupby NULL semantics diverge from SQL's) —
    callers filter or sentinel them first. Output column types derive
    from the input schema, so any key types work."""
    import pandas as pd  # worker-side; driver import is free

    group_cols = list(group_cols or [])
    order_cols = list(order_cols)
    sum_cols = list(sum_cols)
    spark = df.sparkSession
    ensure_py_files(spark)
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = group_cols + order_cols
    ranged = (
        df.repartitionByRange(num_parts, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = ranged.groupBy("_pid", *group_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    ).collect()
    zero = tuple(0 for _ in sum_cols)
    offsets: dict[tuple, tuple] = {}
    acc: dict[tuple, tuple] = {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        g = tuple(r[c] for c in group_cols)
        if any(v is None for v in g):
            raise ValueError(
                f"grouped_prefix_sums: NULL group key in {group_cols}; "
                "filter NULL-keyed rows before calling"
            )
        off = acc.get(g, zero)
        offsets[(r["_pid"],) + g] = off
        acc[g] = tuple(
            o + (r[c] or 0) for o, c in zip(off, sum_cols)
        )
    out_schema = ", ".join(
        [
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in ranged.schema.fields
            if f.name != "_pid"
        ]
        + [f"`{prefix}{c}` long" for c in sum_cols]
    )

    def gen(it):
        run: dict[tuple, tuple] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            for c in sum_cols:
                if pdf[c].isna().any():
                    # a NULL sum value would silently become NaN in the
                    # cumsum (the totals pass treats it as 0) —
                    # diverging from the documented SQL window
                    # semantics; reject like NULL group keys (review
                    # batch 34)
                    raise ValueError(
                        f"grouped_prefix_sums: NULL value in sum column "
                        f"{c!r}; coalesce or filter before calling"
                    )
            pid = int(pdf["_pid"].iloc[0])
            body = pdf.drop(columns=["_pid"])
            if not group_cols:
                off = offsets.get((pid,), zero)
                r0 = run.get((), zero)
                out = body.copy()
                for i, c in enumerate(sum_cols):
                    out[prefix + c] = (
                        off[i] + r0[i] + (pdf[c].cumsum() - pdf[c])
                    )
                run[()] = tuple(
                    r0[i] + int(pdf[c].sum()) for i, c in enumerate(sum_cols)
                )
                yield out
                continue
            # groups are contiguous under the partition sort; the
            # per-group loop is bounded by groups-per-batch (few),
            # everything inside is vectorized
            pieces = []
            for gt, sub in body.groupby(group_cols, sort=False):
                gt = gt if isinstance(gt, tuple) else (gt,)
                off = offsets.get((pid,) + gt, zero)
                r0 = run.get(gt, zero)
                out = sub.copy()
                for i, c in enumerate(sum_cols):
                    out[prefix + c] = (
                        off[i] + r0[i] + (sub[c].cumsum() - sub[c])
                    )
                run[gt] = tuple(
                    r0[i] + int(sub[c].sum()) for i, c in enumerate(sum_cols)
                )
                pieces.append(out)
            yield pd.concat(pieces)

    return ranged.mapInPandas(gen, out_schema)
