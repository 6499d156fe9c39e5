"""Index registry: discover, open, and hot-reload frozen indexes.

Re-expresses the reference's ``IndexRegistry`` (web/.../IndexRegistry.
java:1-40 + AlixServlet.java:76-77,190-191): a root directory holds one
subdirectory per named index; a poll (every 10 s in the servlet) loads
new indexes, reloads changed ones, and unloads removed ones.

Publish/change detection mirrors the reference's atomic-rename model
(build into ``<name>_tmp``, rename over ``<name>``; fileKey change
token): each index is either a plain tree or a **versioned publish
root** (``CURRENT`` pointer + ``versions/<token>/`` trees — see
``segments.begin_publish``/``commit_publish``), and the change token is
the live version's ``publish_token`` from ``corpus.json`` (mtime
fallback for old trees). Tokens compare with ``!=`` — ANY republish is
seen, including two inside one mtime quantum. A failed engine open
keeps the last good handle; a vanished index is only unloaded after a
grace window, so in-flight queries drain (the reference's unload
grace).

No HTTP layer (out of scope — the reference's servlet); the registry is
the embeddable piece a serving process polls."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from alix_spark.index import segments


class IndexRegistry:
    """Registry over ``root/<name>/`` index directories."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        unload_grace_s: float = 30.0,
    ):
        # unload_grace_s > 0 by default: a transiently-unreadable
        # corpus.json (an in-place rebuild's rmtree window, a slow NFS
        # stat) must NOT instantly unload a healthy serving engine —
        # the docstring's "in-flight queries drain" promise. Tests that
        # need immediate unload pass 0 explicitly.
        self.spark = spark
        self.root = root
        self.unload_grace_s = unload_grace_s
        self._engines: dict[str, object] = {}
        self._tokens: dict[str, str] = {}
        self._missing_since: dict[str, float] = {}

    # ------------------------------------------------------------ poll

    def poll(self) -> dict[str, str]:
        """One poll pass. Returns {name: "loaded"|"reloaded"|"unloaded"|
        "load_failed"} for every index whose state changed. A failed
        open (half-published, corrupt, transient IO) NEVER drops an
        already-serving handle — the last good engine keeps serving and
        the reload retries next poll."""
        from alix_spark.engine import AlixEngine

        changes: dict[str, str] = {}
        seen = set()
        try:
            names = sorted(os.listdir(self.root)) if os.path.isdir(self.root) else []
        except OSError:
            # the ROOT itself vanished between the isdir check and the
            # listing (the same TOCTOU class the per-index marker read
            # already survives) — an embedded watch() loop must not die
            # on one transient race (review batch 32)
            names = []
        if names:
            for name in names:
                try:
                    token = segments.publish_marker(
                        os.path.join(self.root, name)
                    )
                except OSError:
                    # rmtree'd between the existence check and the
                    # marker read (TOCTOU) — treat as half-built; a
                    # long-lived watch loop must survive any single
                    # index's filesystem races
                    token = None
                if token is None:
                    continue  # half-built or foreign directory: skip
                seen.add(name)
                self._missing_since.pop(name, None)
                if name in self._engines and token == self._tokens.get(name):
                    continue
                try:
                    engine = AlixEngine(
                        self.spark, os.path.join(self.root, name)
                    )
                except Exception:
                    # keep the last good handle (if any); retry next poll
                    changes[name] = "load_failed"
                    continue
                changes[name] = "reloaded" if name in self._engines else "loaded"
                old = self._engines.get(name)
                self._engines[name] = engine
                self._tokens[name] = token
                if old is not None:
                    # release the superseded handle's persisted caches
                    # — every republish would otherwise leak one
                    # vocabulary-sized cache entry (review batch 28)
                    old.close()
        now = time.time()
        for name in list(self._engines):
            if name in seen:
                continue
            first_missing = self._missing_since.setdefault(name, now)
            if now - first_missing >= self.unload_grace_s:
                self._engines.pop(name).close()
                self._tokens.pop(name, None)
                del self._missing_since[name]
                changes[name] = "unloaded"
        return changes

    def watch(self, interval_s: float = 10.0, max_polls: int | None = None):
        """Generator of poll results every ``interval_s`` (the
        servlet's 10 s default); ``max_polls`` bounds it for tests."""
        n = 0
        while max_polls is None or n < max_polls:
            yield self.poll()
            n += 1
            if max_polls is None or n < max_polls:
                time.sleep(interval_s)

    # ------------------------------------------------------------- get

    def names(self) -> list[str]:
        return sorted(self._engines)

    def get(self, name: str):
        """The current frozen engine handle for a loaded index."""
        return self._engines[name]
