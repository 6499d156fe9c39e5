"""IndexRegistry poll/reload/unload semantics (reference
web/.../IndexRegistry.java + the servlet's 10 s poll)."""

from __future__ import annotations

import os
import shutil

from alix_spark.corpus import webtext
from alix_spark.engine import AlixEngine
from alix_spark.index.registry import IndexRegistry


def _build(spark, corpus, path, n_shards=2):
    AlixEngine.build(spark, corpus, path, n_shards=n_shards)


def test_registry_load_reload_unload(spark, tmp_path):
    root = str(tmp_path / "indexes")
    os.makedirs(root)
    corpus = webtext.webtext(spark, 30, seed=31, partitions=2).persist()
    corpus.count()

    reg = IndexRegistry(spark, root)
    assert reg.poll() == {}

    # publish index "a" → loaded on next poll
    _build(spark, corpus, os.path.join(root, "a"))
    assert reg.poll() == {"a": "loaded"}
    assert reg.names() == ["a"]
    hits = reg.get("a").search("ville")
    assert hits

    # untouched → no change
    assert reg.poll() == {}

    # republish (rebuild rewrites corpus.json last) → reloaded
    old_handle = reg.get("a")
    os.utime(os.path.join(root, "a", "corpus.json"))
    assert reg.poll() == {"a": "reloaded"}
    assert reg.get("a") is not old_handle
    assert reg.get("a").search("ville") == hits  # same frozen content

    # a second index appears; the first is removed
    _build(spark, corpus, os.path.join(root, "b"))
    shutil.rmtree(os.path.join(root, "a"))
    assert reg.poll() == {"b": "loaded", "a": "unloaded"}
    assert reg.names() == ["b"]


def test_registry_ignores_half_built(spark, tmp_path):
    root = str(tmp_path / "indexes")
    os.makedirs(os.path.join(root, "partial"))  # no corpus.json marker
    reg = IndexRegistry(spark, root)
    assert reg.poll() == {}
    assert reg.names() == []


def test_serving_cache_invalidated_on_republish(spark, tmp_path):
    """The pyarrow serving-path cache must drop its file listing when
    the publish marker changes — a dynamic-partition-overwrite rebuild
    deletes the old fragments, so a stale handle would raise or serve
    stale postings."""
    from alix_spark.index import segments, simple
    from alix_spark.query import wand

    docs1 = spark.createDataFrame(
        [(i, "alpha beta " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    docs2 = spark.createDataFrame(
        [(i, "gamma delta " * (i + 1)) for i in range(4)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "ix")
    segments.build_index(spark, simple.tokens(docs1), idx, n_shards=2)
    assert wand.query_local(idx, ["alpha"], k=10)
    import time

    time.sleep(0.01)
    segments.build_index(spark, simple.tokens(docs2), idx, n_shards=2)
    # old vocabulary gone, new one served — no stale listing errors
    assert wand.query_local(idx, ["alpha"], k=10) == []
    assert wand.query_local(idx, ["gamma"], k=10)


def test_registry_watch_bounded(spark, tmp_path):
    root = str(tmp_path / "indexes")
    os.makedirs(root)
    reg = IndexRegistry(spark, root)
    results = list(reg.watch(interval_s=0.0, max_polls=3))
    assert results == [{}, {}, {}]
