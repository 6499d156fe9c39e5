"""Packed build path == exploded build path, bit for bit.

The packed path (analyzed_packed → bucketized_tokens →
build_index_packed) is the scale path: it shuffles ~n_docs ×
SALT_BUCKETS array rows instead of one row per token. These tests pin
that every table it writes — postings blocks including the varint
byte payloads, doc_stats, term_stats, corpus.json — is identical to
what the exploded build_index writes for the same corpus.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_packed, analyzed_tokens
from alix_spark.corpus import webtext as wt
from alix_spark.index import segments

N_DOCS = 120
N_SHARDS = 4


@pytest.fixture(scope="module")
def both_indexes(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("packed_vs_exploded")
    corpus = wt.webtext(spark, N_DOCS, seed=7, partitions=4).cache()
    corpus.count()
    ids = wt.url_ranks(corpus)

    tok = (
        analyzed_tokens(corpus, id_col="url", id_type="string", light=True)
        .join(F.broadcast(ids), "url")
        .select("doc_id", "pos", "term")
    )
    exploded_dir = str(base / "exploded")
    segments.build_index(spark, tok, exploded_dir, n_shards=N_SHARDS)

    packed = (
        analyzed_packed(corpus, id_col="url", id_type="string")
        .join(F.broadcast(ids), "url")
        .select("doc_id", "terms", "poss")
    )
    packed_dir = str(base / "packed")
    segments.build_index_packed(spark, packed, packed_dir, n_shards=N_SHARDS)

    corpus.unpersist()
    return exploded_dir, packed_dir


def _sorted_rows(spark, path, order_cols):
    df = spark.read.parquet(path)
    return df.orderBy(*order_cols).collect(), df.columns


def test_postings_bit_identical(spark, both_indexes):
    exploded_dir, packed_dir = both_indexes
    a, cols_a = _sorted_rows(
        spark, os.path.join(exploded_dir, "postings"), ["shard", "term", "block_id"]
    )
    b, cols_b = _sorted_rows(
        spark, os.path.join(packed_dir, "postings"), ["shard", "term", "block_id"]
    )
    assert sorted(cols_a) == sorted(cols_b)
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        da, db = ra.asDict(), rb.asDict()
        assert da == db, f"block mismatch: {da['term']}/{da['block_id']}"


def test_doc_stats_identical(spark, both_indexes):
    exploded_dir, packed_dir = both_indexes
    a, _ = _sorted_rows(spark, os.path.join(exploded_dir, "doc_stats"), ["doc_id"])
    b, _ = _sorted_rows(spark, os.path.join(packed_dir, "doc_stats"), ["doc_id"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    # schema (types included) identical
    sa = spark.read.parquet(os.path.join(exploded_dir, "doc_stats")).schema
    sb = spark.read.parquet(os.path.join(packed_dir, "doc_stats")).schema
    assert {f.name: f.dataType for f in sa} == {f.name: f.dataType for f in sb}


def test_term_stats_identical(spark, both_indexes):
    exploded_dir, packed_dir = both_indexes
    a, _ = _sorted_rows(spark, os.path.join(exploded_dir, "term_stats"), ["term"])
    b, _ = _sorted_rows(spark, os.path.join(packed_dir, "term_stats"), ["term"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    sa = spark.read.parquet(os.path.join(exploded_dir, "term_stats")).schema
    sb = spark.read.parquet(os.path.join(packed_dir, "term_stats")).schema
    assert {f.name: f.dataType for f in sa} == {f.name: f.dataType for f in sb}


def test_corpus_meta_identical(both_indexes):
    exploded_dir, packed_dir = both_indexes
    with open(os.path.join(exploded_dir, "corpus.json")) as f:
        a = json.load(f)
    with open(os.path.join(packed_dir, "corpus.json")) as f:
        b = json.load(f)
    # publish_token is unique per publish BY DESIGN (serving-cache /
    # registry change detection) — everything else must match
    a.pop("publish_token"), b.pop("publish_token")
    assert a == b


def test_wand_results_identical(spark, both_indexes):
    from alix_spark.query import wand

    exploded_dir, packed_dir = both_indexes
    for terms, mode in [(["ville", "roi"], "and"), (["guerre"], "and"),
                        (["histoire", "paix"], "or")]:
        ra = wand.query_local(exploded_dir, terms, k=10, mode=mode)
        rb = wand.query_local(packed_dir, terms, k=10, mode=mode)
        assert ra == rb


def test_fused_chain_bucketize_identical(spark, tmp_path, both_indexes):
    """The FUSED analyze+bucketize operator (one Python pass over
    (doc_id, html) — the build's hot path) writes an index bit-identical
    to the two-pass packed path and the exploded path."""
    exploded_dir, _ = both_indexes
    corpus = wt.webtext(spark, N_DOCS, seed=7, partitions=4)
    with_ids = corpus.join(
        F.broadcast(wt.url_ranks(corpus)), "url"
    ).select("doc_id", "html")
    buck = segments.analyzed_bucketized(with_ids, N_SHARDS)
    fused_dir = str(tmp_path / "fused")
    segments.build_index_packed(
        spark, buck, fused_dir, n_shards=N_SHARDS, bucketized=True
    )
    a, _ = _sorted_rows(
        spark, os.path.join(exploded_dir, "postings"),
        ["shard", "term", "block_id"],
    )
    b, _ = _sorted_rows(
        spark, os.path.join(fused_dir, "postings"),
        ["shard", "term", "block_id"],
    )
    assert len(a) == len(b) and len(a) > 0
    for ra, rb in zip(a, b):
        assert ra.asDict() == rb.asDict()
    at, _ = _sorted_rows(spark, os.path.join(exploded_dir, "term_stats"), ["term"])
    bt, _ = _sorted_rows(spark, os.path.join(fused_dir, "term_stats"), ["term"])
    assert [r.asDict() for r in at] == [r.asDict() for r in bt]


def test_packed_resume_skips_done_shards(spark, tmp_path):
    """Resume semantics survive in the packed path: existing shard
    manifests are honored and only missing shards rebuild."""
    corpus = wt.webtext(spark, 40, seed=3, partitions=2)
    ids = wt.url_ranks(corpus)
    packed = (
        analyzed_packed(corpus, id_col="url", id_type="string")
        .join(F.broadcast(ids), "url")
        .select("doc_id", "terms", "poss")
    )
    idx = str(tmp_path / "ix")
    meta1 = segments.build_index_packed(spark, packed, idx, n_shards=N_SHARDS)
    assert meta1["resumed_from"] == []
    # drop one shard's manifest, resume: only that shard rebuilds
    os.remove(segments._manifest_path(idx, 2))
    meta2 = segments.build_index_packed(
        spark, packed, idx, n_shards=N_SHARDS, resume=True
    )
    assert meta2["resumed_from"] == [0, 1, 3]
    assert os.path.exists(segments._manifest_path(idx, 2))


def test_negative_doc_ids_index_identically(spark, tmp_path):
    """pmod sharding: hash-derived NEGATIVE doc_ids must land in a
    valid shard and index in BOTH build paths (review batch 28 — the
    exploded path's % silently dropped them)."""
    tok = spark.createDataFrame(
        [(-5, 0, "neg"), (-5, 1, "word"), (3, 0, "pos"), (3, 1, "word")],
        "doc_id long, pos int, term string",
    )
    exp_dir = str(tmp_path / "exp")
    segments.build_index(spark, tok, exp_dir, n_shards=N_SHARDS)
    meta = segments.read_meta(exp_dir)
    assert meta["corpus_docs"] == 2
    post = spark.read.parquet(os.path.join(exp_dir, "postings"))
    # the negative doc's private term is present, in a nonnegative shard
    neg = post.filter(F.col("term") == "neg").collect()
    assert len(neg) == 1 and neg[0]["shard"] == (-5) % N_SHARDS
    ds = spark.read.parquet(os.path.join(exp_dir, "doc_stats")).collect()
    assert {r["doc_id"]: r["shard"] for r in ds} == {
        -5: (-5) % N_SHARDS, 3: 3 % N_SHARDS
    }

    packed = tok.groupBy("doc_id").agg(
        F.collect_list("term").alias("terms"),
        F.collect_list("pos").alias("poss"),
    )
    pk_dir = str(tmp_path / "pk")
    segments.build_index_packed(spark, packed, pk_dir, n_shards=N_SHARDS)
    a = {
        (r["shard"], r["term"]): (r["n"], bytes(r["doc_bytes"]))
        for r in post.collect()
    }
    b = {
        (r["shard"], r["term"]): (r["n"], bytes(r["doc_bytes"]))
        for r in spark.read.parquet(os.path.join(pk_dir, "postings")).collect()
    }
    assert a == b


def test_resume_rejects_incompatible_manifests(spark, tmp_path):
    """A resume with a different n_shards (or codec format) must raise,
    not silently mark foreign shards done and publish a partial corpus
    (review batch 28)."""
    tok = spark.createDataFrame(
        [(i, 0, f"w{i}") for i in range(8)], "doc_id long, pos int, term string"
    )
    idx = str(tmp_path / "ix")
    segments.build_index(spark, tok, idx, n_shards=4)
    with pytest.raises(ValueError, match="incompatible"):
        segments.build_index(spark, tok, idx, n_shards=2, resume=True)
    # a format bump likewise refuses to resume over the old tree
    mpath = segments._manifest_path(idx, 0)
    m = json.load(open(mpath))
    m["format"] = "delta-varint-v0"
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="incompatible"):
        segments.build_index(spark, tok, idx, n_shards=4, resume=True)


def test_bucketize_tolerates_null_arrays():
    """NULL terms/poss arrays normalize to empty docs instead of
    TypeError-ing the Arrow batch (review batch 28)."""
    import numpy as np

    out = segments._bucketize_arrays(
        np.array([1, 2]), [None, ["a"]], [None, [0]], 4, 4
    )
    assert out is not None and set(out["doc_id"]) == {2}
