"""Table source/sink abstraction: catalog tables (Iceberg on a real
cluster) or parquet paths, one call.

The north rule stores the Common-Crawl landing table and the index
layout "in Iceberg". This sandbox ships no Iceberg runtime jar, so the
code is written against the FORMAT-NEUTRAL surfaces that Iceberg
implements — ``spark.read.table`` / ``DataFrameWriterV2`` (``writeTo``)
with catalog-qualified names — and falls back to parquet paths when
the reference is a filesystem path. On a cluster with
``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``
configured the SAME calls create/commit Iceberg tables with snapshot
isolation; nothing in this module (or its callers) is parquet-specific
beyond the path branch.

What Iceberg would add at 10^12 docs — and where this repo already has
the equivalent, so a catalog swap is config, not code:

- atomic snapshot commit      → versioned publish + CURRENT pointer
  (``segments.begin_publish``/``commit_publish``)
- readers pinned to snapshot  → engine handle frozen at open
  (``AlixEngine.__init__`` resolves the live version once)
- change detection            → ``publish_token`` (!= compare)
- partition pruning           → hive-partitioned shard layout +
  pyarrow/parquet predicate pushdown (asserted in tests/test_plans.py)

Table references:
- ``catalog.db.name`` / ``db.name`` (no path separator, no ``.parquet``
  suffix) → ``spark.read.table`` / ``writeTo`` (catalog path; Iceberg
  when the catalog is one)
- anything else → parquet path
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def is_table_ref(ref: str) -> bool:
    """True for a catalog table reference, False for a path."""
    return (
        "/" not in ref
        and "\\" not in ref
        and not ref.endswith(".parquet")
    )


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """The landing/index table behind ``ref`` (catalog or path)."""
    if is_table_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` as ``ref``.

    Catalog refs use the V2 writer (``writeTo``): ``createOrReplace``
    is an ATOMIC replacement on ACID catalogs (Iceberg snapshot
    commit), ``append`` a transactional append; the V1 managed-table
    writer is the fallback ONLY when the catalog reports the V2
    operation unsupported (the plain session catalog) — real write
    errors (schema mismatch, permissions) always propagate. All four
    save modes keep parquet-path semantics: ``overwrite`` replaces,
    ``append`` adds (creating a missing table), ``ignore`` is a no-op
    on an existing table, ``error``/``errorifexists`` refuses one.
    Paths use the parquet writer; atomicity there comes from the
    caller's versioned-publish protocol
    (segments.begin_publish/commit_publish)."""
    # normalize like the V1 writer does internally: Spark accepts
    # 'ErrorIfExists'/'Ignore' case-insensitively on the path branch,
    # and an unnormalized capitalized mode on the catalog branch would
    # miss every guard below and fall through to the atomic REPLACE —
    # clobbering the table the caller asked to protect (review batch
    # 31). Unknown modes are rejected for the same reason.
    mode = str(mode).lower()
    if mode not in ("overwrite", "append", "ignore", "error", "errorifexists"):
        raise ValueError(f"write_table: unknown save mode {mode!r}")
    if is_table_ref(ref):
        _write_catalog(df, ref, mode, partition_by)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)


def _v2_unsupported(e: Exception) -> bool:
    """True when the catalog rejected the V2 OPERATION itself (not the
    data): only then may the V1 writer take over."""
    msg = str(e)
    return (
        "UNSUPPORTED_FEATURE" in msg
        or "does not support" in msg
        or "Cannot write into v1 table" in msg
    )


def _write_catalog(df, ref, mode, partition_by):
    from pyspark.errors import AnalysisException

    exists = df.sparkSession.catalog.tableExists(ref)
    if mode == "ignore" and exists:
        return
    if mode in ("error", "errorifexists") and exists:
        raise ValueError(f"table already exists: {ref}")

    w = df.writeTo(ref)
    if partition_by:
        from pyspark.sql import functions as F

        w = w.partitionedBy(*[F.col(c) for c in partition_by])
    try:
        if mode == "append" and exists:
            w.append()
        elif mode == "append":
            w.create()  # first micro-batch of an ingest
        elif exists:
            w.createOrReplace()  # atomic RTAS / snapshot commit
        else:
            w.create()
        return
    except AnalysisException as e:
        if not _v2_unsupported(e):
            raise
    wr = df.write.mode("append" if mode == "append" else "overwrite")
    if partition_by:
        wr = wr.partitionBy(*partition_by)
    wr.saveAsTable(ref)
