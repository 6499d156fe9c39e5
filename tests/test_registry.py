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

    # grace 0: this test exercises immediate unload (the default keeps
    # a grace window so transient unreadability never drops a handle)
    reg = IndexRegistry(spark, root, unload_grace_s=0.0)
    assert reg.poll() == {}

    # publish index "a" → loaded on next poll
    _build(spark, corpus, os.path.join(root, "a"))
    assert reg.poll() == {"a": "loaded"}
    assert reg.names() == ["a"]
    hits = reg.get("a").search("ville")
    assert hits

    # untouched → no change
    assert reg.poll() == {}

    # republish (rebuild rewrites corpus.json last, with a fresh
    # publish_token) → reloaded; mtime alone changing is NOT a publish
    import json

    marker = os.path.join(root, "a", "corpus.json")
    os.utime(marker)
    assert reg.poll() == {}
    old_handle = reg.get("a")
    with open(marker) as f:
        meta = json.load(f)
    meta["publish_token"] = meta["publish_token"] + "-r2"
    with open(marker, "w") as f:
        json.dump(meta, f)
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


def _build_small(spark, idx, marker_word: str, n: int = 6):
    from alix_spark.index import segments, simple

    docs = spark.createDataFrame(
        [(i, f"{marker_word} commun " * (i + 1)) for i in range(n)],
        "doc_id long, text string",
    )
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=2)


def test_versioned_publish_atomic(spark, tmp_path):
    """begin_publish/commit_publish: readers only ever see a COMPLETE
    index; a handle opened on version A keeps reading A's (untouched)
    files while B is built and published; gc respects the live one."""
    from alix_spark.index import segments
    from alix_spark.query import wand

    root_ix = str(tmp_path / "ix")  # the versioned publish root
    s1, t1 = segments.begin_publish(root_ix)
    _build_small(spark, s1, "alpha")
    # not yet committed: no CURRENT, no complete index at the root
    assert segments.publish_marker(root_ix) is None
    v1 = segments.commit_publish(root_ix, s1, t1)
    assert segments.resolve_current(root_ix) == v1
    assert wand.query_local(root_ix, ["alpha"], k=10)

    eng_v1 = AlixEngine(spark, root_ix)
    assert eng_v1.index_dir == v1

    # republish with different content — v1's files never touched
    s2, t2 = segments.begin_publish(root_ix)
    _build_small(spark, s2, "gamma")
    v2 = segments.commit_publish(root_ix, s2, t2)
    assert segments.resolve_current(root_ix) == v2
    # frozen v1 handle still serves v1 content
    assert eng_v1.search("alpha")
    # fresh resolution serves v2 (cache keyed by publish token)
    assert wand.query_local(root_ix, ["alpha"], k=10) == []
    assert wand.query_local(root_ix, ["gamma"], k=10)

    # gc: grace window keeps v1, grace 0 removes it, live v2 kept
    assert segments.gc_versions(root_ix, grace_s=3600.0) == []
    assert segments.gc_versions(root_ix, grace_s=0.0) == [t1]
    assert os.path.isdir(v2) and not os.path.isdir(v1)
    assert wand.query_local(root_ix, ["gamma"], k=10)


def test_registry_versioned_root_and_same_mtime_republish(spark, tmp_path):
    """The registry serves versioned publish roots, and detects a
    republish even when corpus.json mtimes collide (token !=, not
    mtime >)."""
    from alix_spark.index import segments

    root = str(tmp_path / "indexes")
    ix = os.path.join(root, "a")
    s1, t1 = segments.begin_publish(ix)
    _build_small(spark, s1, "alpha")
    v1 = segments.commit_publish(ix, s1, t1)

    reg = IndexRegistry(spark, root)
    assert reg.poll() == {"a": "loaded"}
    assert reg.get("a").search("alpha")

    s2, t2 = segments.begin_publish(ix)
    _build_small(spark, s2, "gamma")
    v2 = segments.commit_publish(ix, s2, t2)
    # force identical mtimes on both versions' markers: mtime cannot
    # distinguish the publishes — the token must
    st = os.stat(os.path.join(v1, "corpus.json"))
    os.utime(os.path.join(v2, "corpus.json"), (st.st_atime, st.st_mtime))
    assert reg.poll() == {"a": "reloaded"}
    assert reg.get("a").search("gamma")
    assert reg.get("a").search("alpha") == []


def test_registry_failed_open_keeps_last_good(spark, tmp_path, monkeypatch):
    """A republish whose engine open fails must NOT drop the serving
    handle — last good keeps serving, retry next poll."""
    import json

    import alix_spark.engine as engine_mod

    root = str(tmp_path / "indexes")
    ix = os.path.join(root, "a")
    os.makedirs(root)
    _build_small(spark, ix, "alpha")
    reg = IndexRegistry(spark, root)
    assert reg.poll() == {"a": "loaded"}
    good = reg.get("a")

    # bump the token so a reload is attempted, but make the open fail
    marker = os.path.join(ix, "corpus.json")
    with open(marker) as f:
        meta = json.load(f)
    meta["publish_token"] += "-broken"
    with open(marker, "w") as f:
        json.dump(meta, f)

    real = engine_mod.AlixEngine

    class Boom:
        def __init__(self, *a, **k):
            raise RuntimeError("half-published")

    monkeypatch.setattr(engine_mod, "AlixEngine", Boom)
    assert reg.poll() == {"a": "load_failed"}
    assert reg.get("a") is good  # still serving
    # next poll with a working open recovers
    monkeypatch.setattr(engine_mod, "AlixEngine", real)
    assert reg.poll() == {"a": "reloaded"}


def test_registry_unload_grace(spark, tmp_path):
    """A vanished index keeps serving through the grace window (the
    reference's unload grace for in-flight queries)."""
    root = str(tmp_path / "indexes")
    ix = os.path.join(root, "a")
    os.makedirs(root)
    _build_small(spark, ix, "alpha")
    reg = IndexRegistry(spark, root, unload_grace_s=3600.0)
    assert reg.poll() == {"a": "loaded"}
    shutil.rmtree(ix)
    assert reg.poll() == {}  # within grace: still serving
    assert reg.names() == ["a"]
    reg.unload_grace_s = 0.0
    assert reg.poll() == {"a": "unloaded"}
    assert reg.names() == []


def test_reload_and_unload_close_superseded_engines(spark, tmp_path, monkeypatch):
    """Republish and unload must close() the superseded handle —
    every republish would otherwise leak one persisted vocabulary
    cache in a long-lived serving process (review batch 28)."""
    import json

    root = str(tmp_path / "indexes")
    os.makedirs(root)
    _build_small(spark, os.path.join(root, "demo"), "alpha")
    reg = IndexRegistry(spark, root, unload_grace_s=0.0)
    reg.poll()
    eng1 = reg.get("demo")
    closed = []
    monkeypatch.setattr(
        AlixEngine, "close", lambda self: closed.append(id(self))
    )
    marker = os.path.join(root, "demo", "corpus.json")
    with open(marker) as f:
        meta = json.load(f)
    meta["publish_token"] = meta["publish_token"] + "-r2"
    with open(marker, "w") as f:
        json.dump(meta, f)
    assert reg.poll() == {"demo": "reloaded"}
    assert closed == [id(eng1)]
    eng2 = reg.get("demo")
    shutil.rmtree(os.path.join(root, "demo"))
    assert reg.poll() == {"demo": "unloaded"}
    assert closed == [id(eng1), id(eng2)]


def test_engine_close_is_idempotent_and_recomputes(spark, tmp_path):
    idx = str(tmp_path / "ix")
    _build_small(spark, idx, "beta")
    eng = AlixEngine(spark, idx)
    w1 = eng.theme_weights().collect()
    eng.close()
    eng.close()  # idempotent
    w2 = eng.theme_weights().collect()  # recomputes after release
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
