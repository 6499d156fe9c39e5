"""Table source/sink abstraction: catalog-table and parquet-path
branches of alix_spark.sources (the Iceberg seam — same calls, catalog
swap is configuration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark import sources


def test_is_table_ref():
    assert sources.is_table_ref("db.landing")
    assert sources.is_table_ref("iceberg.crawl.pages")
    assert sources.is_table_ref("pages")
    assert not sources.is_table_ref("/data/pages.parquet")
    assert not sources.is_table_ref("data/pages")
    assert not sources.is_table_ref("pages.parquet")


def test_parquet_path_round_trip(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    )
    path = str(tmp_path / "t.parquet")
    sources.write_table(df, path, partition_by=["p"])
    back = sources.read_table(spark, path)
    assert back.count() == 10
    # partitioned layout on disk (partition pruning at scale)
    assert (tmp_path / "t.parquet" / "p=0").is_dir()


def _fresh_table(spark, name):
    """Drop the table AND its leftover warehouse location: the
    session catalog forgets managed tables across sessions while their
    directories persist, and a stale location fails V2 create."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        wh.removeprefix("file:") + "/" + name, ignore_errors=True
    )


def test_catalog_table_round_trip(spark):
    """The catalog branch — the calls Iceberg implements. On the
    sandbox's session catalog the V2 writer handles create and the V1
    fallback handles replace/append; with an Iceberg catalog the V2
    path does all three atomically."""
    _fresh_table(spark, "src_demo")
    df = spark.range(5).select(F.col("id").alias("x"))
    sources.write_table(df, "src_demo")
    assert sources.read_table(spark, "src_demo").count() == 5
    # overwrite replaces
    sources.write_table(df.filter("x < 2"), "src_demo")
    assert sources.read_table(spark, "src_demo").count() == 2
    # append adds
    sources.write_table(df, "src_demo", mode="append")
    assert sources.read_table(spark, "src_demo").count() == 7
    spark.sql("DROP TABLE IF EXISTS src_demo")


def test_append_creates_missing_table(spark):
    _fresh_table(spark, "src_fresh")
    df = spark.range(3).select(F.col("id").alias("x"))
    sources.write_table(df, "src_fresh", mode="append")
    assert sources.read_table(spark, "src_fresh").count() == 3
    spark.sql("DROP TABLE IF EXISTS src_fresh")


def test_build_from_table_ref(spark, tmp_path):
    """End-to-end: an index built from a catalog-table landing corpus
    equals one built from the same data as a parquet path."""
    from alix_spark.corpus import webtext
    from alix_spark.engine import AlixEngine

    _fresh_table(spark, "src_landing")
    corpus = webtext.webtext(spark, 20, seed=5, partitions=2)
    sources.write_table(corpus, "src_landing")
    eng = AlixEngine.build(
        spark,
        sources.read_table(spark, "src_landing"),
        str(tmp_path / "ix"),
        n_shards=2,
    )
    hits = eng.search("ville")
    eng2 = AlixEngine.build(
        spark, corpus, str(tmp_path / "ix2"), n_shards=2
    )
    assert hits == eng2.search("ville")
    spark.sql("DROP TABLE IF EXISTS src_landing")


def test_catalog_mode_semantics(spark):
    """ignore/error modes must honor path-writer semantics on catalog
    refs too — never silently replace an existing table."""
    _fresh_table(spark, "src_modes")
    df = spark.range(4).select(F.col("id").alias("x"))
    sources.write_table(df, "src_modes")
    # ignore: no-op on existing
    sources.write_table(df.filter("x < 1"), "src_modes", mode="ignore")
    assert sources.read_table(spark, "src_modes").count() == 4
    # error: refuses existing
    with pytest.raises(ValueError):
        sources.write_table(df, "src_modes", mode="error")
    # capitalized spellings must hit the same guards, not fall through
    # to the atomic replace (review batch 31); unknown modes rejected
    with pytest.raises(ValueError):
        sources.write_table(df, "src_modes", mode="ErrorIfExists")
    sources.write_table(df.filter("x < 1"), "src_modes", mode="Ignore")
    assert sources.read_table(spark, "src_modes").count() == 4
    with pytest.raises(ValueError, match="unknown save mode"):
        sources.write_table(df, "src_modes", mode="clobber")
    assert sources.read_table(spark, "src_modes").count() == 4
    _fresh_table(spark, "src_modes")


def test_catalog_append_schema_mismatch_raises(spark):
    """A schema-mismatch append must surface the real error, not be
    silently retried through the V1 writer."""
    _fresh_table(spark, "src_schema")
    df = spark.range(3).select(F.col("id").alias("x"))
    sources.write_table(df, "src_schema")
    bad = spark.range(3).select(
        F.col("id").alias("x"), F.lit("extra").alias("y")
    )
    with pytest.raises(Exception) as e:
        sources.write_table(bad, "src_schema", mode="append")
    assert "y" in str(e.value) or "column" in str(e.value).lower()
    assert sources.read_table(spark, "src_schema").count() == 3
    spark.sql("DROP TABLE IF EXISTS src_schema")
