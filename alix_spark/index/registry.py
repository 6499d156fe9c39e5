"""Index registry: discover, open, and hot-reload frozen indexes.

Re-expresses the reference's ``IndexRegistry`` (web/.../IndexRegistry.
java:1-40 + AlixServlet.java:76-77,190-191): a root directory holds one
subdirectory per named index; a poll (every 10 s in the servlet) loads
new indexes, reloads changed ones, and unloads removed ones. The
reference detects a republish by the atomic directory rename
(``name_tmp`` → ``name``); here the publish marker is the index's
``corpus.json`` mtime — rewritten last by ``segments.build_index`` and
by the streaming compaction, so a newer mtime ⇔ a completed republish
(the Iceberg-snapshot analogue).

No HTTP layer (out of scope — the reference's servlet); the registry is
the embeddable piece a serving process polls."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession


class IndexRegistry:
    """Registry over ``root/<name>/`` index directories."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._engines: dict[str, object] = {}
        self._mtimes: dict[str, float] = {}

    # ------------------------------------------------------------ poll

    def _marker(self, name: str) -> str:
        return os.path.join(self.root, name, "corpus.json")

    def poll(self) -> dict[str, str]:
        """One poll pass. Returns {name: "loaded"|"reloaded"|"unloaded"}
        for every index whose state changed."""
        from alix_spark.engine import AlixEngine

        changes: dict[str, str] = {}
        seen = set()
        if os.path.isdir(self.root):
            for name in sorted(os.listdir(self.root)):
                marker = self._marker(name)
                if not os.path.exists(marker):
                    continue  # half-built or foreign directory: skip
                seen.add(name)
                mtime = os.path.getmtime(marker)
                if name not in self._engines:
                    self._engines[name] = AlixEngine(
                        self.spark, os.path.join(self.root, name)
                    )
                    self._mtimes[name] = mtime
                    changes[name] = "loaded"
                elif mtime > self._mtimes[name]:
                    # republish completed: swap in a fresh frozen handle
                    self._engines[name] = AlixEngine(
                        self.spark, os.path.join(self.root, name)
                    )
                    self._mtimes[name] = mtime
                    changes[name] = "reloaded"
        for name in list(self._engines):
            if name not in seen:
                del self._engines[name]
                del self._mtimes[name]
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
