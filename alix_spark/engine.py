"""User-facing engine facade: the reference's query operations, one
object.

The reference serves 9 operations over ``/{index}/{op}`` (AlixServlet +
Op.dispatch, web/.../AlixServlet.java:124-165): results (concordance /
BM25), terms (ranked/keyness), chrono (histogram), cooc, clades (CA
map), suggest, plus ingest tooling. This facade binds them to one
built corpus + index so a reference user can switch call-for-call:

    eng = AlixEngine.build(spark, corpus_df, "/data/alix_index")
    eng.search("l'homme \\"chemin de fer\\" vil*")   # parsed query → top-k
    eng.concordance("ville")                         # KWIC lines
    eng.terms()                                      # theme ranking
    eng.terms(focus=F.col("lang") == "fr")           # keyness vs rest
    eng.chrono()                                     # time histogram
    eng.cooc("ville")                                # windowed cooc
    eng.clades()                                     # CA factor map
    eng.suggest("vil")                               # completion

All heavy state lives in the index directory (frozen, republishable —
LuceneIndex.java:36-43 semantics); the facade itself is stateless
glue over :mod:`alix_spark.index`, :mod:`alix_spark.query` and
:mod:`alix_spark.lexicometry`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from alix_spark.analysis.chain import analyzed_tokens
from alix_spark.corpus.webtext import url_ranks
from alix_spark.index import segments
from alix_spark.lexicometry import cooc as cooc_mod
from alix_spark.lexicometry import keyness as keyness_mod
from alix_spark.lexicometry import suggest as suggest_mod
from alix_spark.lexicometry import svd as svd_mod
from alix_spark.lexicometry import theme as theme_mod
from alix_spark.query import kwic as kwic_mod
from alix_spark.query import parser, wand


def _fold_clause(c, fold):
    """Apply a term-folding function to every term of a parsed clause
    (wildcard patterns fold too — the expansions run on folded terms)."""
    if isinstance(c, parser.TermClause):
        return parser.TermClause(fold(c.term))
    if isinstance(c, parser.OrClause):
        return parser.OrClause([fold(t) for t in c.terms])
    if isinstance(c, parser.PhraseClause):
        return parser.PhraseClause([fold(t) for t in c.terms], c.slop, c.ordered)
    if isinstance(c, parser.WildcardClause):
        return parser.WildcardClause(fold(c.pattern))
    return c


# one home for the case-flip rule (the in-memory and pushdown wildcard
# expanders must agree): parser.flip_leading_case
_flip_leading_case = parser.flip_leading_case


def _prefix_upper_bound(prefix: str) -> str | None:
    """Smallest string greater than every string starting with
    ``prefix``, for a pushdown range filter — or None when no such
    bound exists. A bare ``chr(ord(last) + 1)`` breaks at codepoint
    boundaries: U+10FFFF has no successor (ValueError) and
    incrementing U+D7FF lands on a lone surrogate pyarrow cannot
    encode into a filter literal (review batch 31). Skip the
    surrogate block, and carry into the preceding character when the
    last one has no valid successor."""
    for i in range(len(prefix) - 1, -1, -1):
        nxt = ord(prefix[i]) + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000
        if nxt <= 0x10FFFF:
            return prefix[:i] + chr(nxt)
    return None  # prefix is all U+10FFFF: >= alone bounds it


class AlixEngine:
    """A frozen index + its source corpus, queryable."""

    def __init__(self, spark: SparkSession, index_dir: str, corpus: DataFrame | None = None):
        self.spark = spark
        # a versioned publish root (CURRENT + versions/<token>/) resolves
        # to its live version ONCE at open: this handle is frozen — a
        # concurrent republish never changes the files it reads. The
        # UNRESOLVED root is kept too: sibling indexes (the `_ascii`
        # derived field) hang off the root, not off a version dir.
        self.index_root = index_dir
        self.index_dir = segments.resolve_current(index_dir)
        self.meta = segments.read_meta(self.index_dir)
        self.corpus = corpus
        self._tok: DataFrame | None = None
        self._rail: DataFrame | None = None
        self._ids: DataFrame | None = None
        self._has_positions: bool | None = None
        self._vocab: set[str] | None = None
        self._theme_weights: DataFrame | None = None
        # the HTTP layer serves one handle from many threads — lazy
        # init of the weights cache must not run the full-vocabulary
        # job twice (and leak the loser's persisted blocks)
        import threading

        self._tw_lock = threading.Lock()
        # Hunspell sidecar (reference HunspellCompiler output next to
        # the index): when present, query terms resolve roots-first
        self._hunspell = None
        dic = os.path.join(self.index_dir, "hunspell", "text.dic")
        aff = os.path.join(self.index_dir, "hunspell", "text.aff")
        if os.path.exists(dic) and os.path.exists(aff):
            from alix_spark.query.hunspell import Hunspell

            self._hunspell = Hunspell.load(aff, dic)

    # ------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        index_dir: str,
        n_shards: int = 16,
        tagger_path: str | None = None,
        resume: bool = False,
        ascii_variant: bool = False,
    ) -> "AlixEngine":
        """Corpus table (input_hint schema) → analysis chain →
        compressed sharded index → engine handle.

        ``ascii_variant=True`` additionally indexes the SAME analyzed
        content under ``<index_dir>_ascii`` with diacritics folded —
        the reference's derived TEXT field (``<name>_ascii``,
        AlixLuceneConsumer.java:185-204 re-index with the ``*_ascii``
        analyzer route, FrenchAnalyzer.java:326-333). Folding is one
        JVM-side ``translate`` over the already-analyzed token table,
        so the chain runs once for both fields."""
        from pyspark.storagelevel import StorageLevel

        ids = url_ranks(corpus)
        if not ascii_variant:
            # the scale path: dense ids join onto the landing table,
            # then ONE fused Arrow pass runs the chain AND the per-doc
            # bucket roll-up — the token payload shuffles as packed
            # array rows (~2 orders of magnitude fewer rows than
            # one-per-token; tests/test_packed_build.py asserts the
            # result bit-identical to the exploded build)
            with_ids = corpus.join(ids, "url").select("doc_id", "html")
            buck = segments.analyzed_bucketized(
                with_ids, n_shards, tagger_path=tagger_path
            )
            segments.build_index_packed(
                spark, buck, index_dir, n_shards=n_shards, resume=resume,
                bucketized=True,
            )
            return cls(spark, index_dir, corpus)
        # ascii-variant build: the exploded token table is the shape the
        # JVM-side fold (one translate over the term column) applies to,
        # and the chain still runs once for both fields
        tok_url = analyzed_tokens(
            corpus, id_col="url", id_type="string", light=True,
            tagger_path=tagger_path,
        )
        tok = tok_url.join(ids, "url").select("doc_id", "pos", "term")
        tok = tok.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            segments.build_index(
                spark, tok, index_dir, n_shards=n_shards, resume=resume
            )
            from alix_spark.lexicometry.suggest import FOLD_DST, FOLD_SRC

            # lower + fold, matching the query side's fold_query — a
            # capitalized indexed term ("Paris") must be reachable from
            # the folded query term ("paris")
            folded = tok.withColumn(
                "term", F.lower(F.translate("term", FOLD_SRC, FOLD_DST))
            )
            segments.build_index(
                spark, folded, index_dir + "_ascii", n_shards=n_shards,
                resume=resume,
            )
        finally:
            # a failed build must not pin the exploded token table for
            # the session's lifetime (the segments.py try/finally
            # standard, review batch 28)
            tok.unpersist()
        return cls(spark, index_dir, corpus)

    # ---------------------------------------------------- token access

    def _url_ids(self) -> DataFrame:
        """The frozen corpus's (url, doc_id) map, computed ONCE per
        handle: util.dense_ranks runs an eager range-partition +
        per-partition-count collect job at construction, and the
        mapping is constant for a frozen corpus — rebuilding it per
        terms(focus)/clades/chrono/suggest(population) call paid that
        corpus-wide job again each time (review batch 31)."""
        if self._ids is None:
            self._ids = url_ranks(self.corpus)
        return self._ids

    def tokens(self) -> DataFrame:
        """Analyzed token table with dense docIDs (cached)."""
        if self._tok is None:
            if self.corpus is None:
                raise ValueError("engine opened without a corpus table")
            tok_url = analyzed_tokens(self.corpus, id_col="url", id_type="string")
            ids = self._url_ids()
            self._tok = (
                tok_url.join(ids, "url")
                .select("doc_id", "pos", "term", "pos_tag", "lemma")
                .persist()
            )
        return self._tok

    def _index_has_positions(self) -> bool:
        """True when the frozen index carries the positions channel —
        probe ONE block row via pyarrow (no Spark job)."""
        if self._has_positions is None:
            import pyarrow.dataset as ds

            dset = ds.dataset(
                os.path.join(self.index_dir, "postings"), format="parquet",
                partitioning="hive",
            )
            head = dset.head(1, columns=["pos_bytes"])
            self._has_positions = bool(
                len(head) and head["pos_bytes"][0].as_py()
            )
        return self._has_positions

    def rail(self) -> DataFrame:
        """``(doc_id, pos, term)`` token rail for lexicometry ops.

        Served from the FROZEN index when it carries positions — the
        postings decode (segments.decoded_rail) never re-runs the
        analysis chain, matching the reference's serving model (terms/
        cooc/concordance read the TermStats/TermRail sidecars, never
        the corpus). Falls back to the chain only for an engine opened
        on a corpus without a positional index."""
        if self._rail is None:
            if self._index_has_positions():
                self._rail = segments.decoded_rail(self.spark, self.index_dir)
            else:
                self._rail = self.tokens().select("doc_id", "pos", "term")
        return self._rail

    def vocabulary(self) -> set[str]:
        """Full term set on the driver — demo/test convenience only; the
        search path resolves terms with pushdown lookups instead
        (at a web-scale vocabulary this collect is the wrong tool)."""
        if self._vocab is None:
            ts = self.spark.read.parquet(os.path.join(self.index_dir, "term_stats"))
            self._vocab = {r["term"] for r in ts.select("term").collect()}
        return self._vocab

    # ----------------------------------------------------------- search

    def _member(self, term: str, index_dir: str | None = None) -> bool:
        """Dictionary membership via pyarrow predicate pushdown on the
        term_stats parquet — reads only matching rows, never the
        vocabulary (reference resolves terms against the TermsEnum the
        same way, SpanQueryParser.java:482-518). The dataset handle is
        the serving path's cached, republish-invalidated one."""
        return bool(wand._term_dfs(index_dir or self.index_dir, [term]))

    def _expand(self, pattern: str, index_dir: str | None = None) -> list[str]:
        """Wildcard expansion, capped at 256 (SpanQueryParser.java:52),
        PLUS the leading-case-flipped alternative: the reference builds
        a joker clause for the pattern as typed OR with its first
        letter's case inverted (SpanQueryParser.java:327-374
        flipLeadingCase/jokerClause), so ``Vill*`` also matches
        ``ville`` and ``vill*`` also matches ``Ville``. Each spelling
        expands under its own cap, then the union dedups (the
        SpanOrQuery of two bounded rewrites).

        The leading literal prefix bounds the dictionary scan to a
        byte range (the TermsEnum seek analogue); a pattern with no
        prefix scans the skinny term column only."""
        out = self._expand_one(pattern, index_dir)
        flipped = _flip_leading_case(pattern)
        if flipped is not None:
            seen = set(out)
            out = out + [
                t for t in self._expand_one(flipped, index_dir)
                if t not in seen
            ]
        return out

    def _expand_one(self, pattern: str, index_dir: str | None = None) -> list[str]:
        """One exact wildcard spelling → matching dictionary terms."""
        import pyarrow.dataset as ds

        prefix = ""
        for ch in pattern:
            if ch in "*?":
                break
            prefix += ch
        dset = wand.term_stats_dataset(index_dir or self.index_dir)
        flt = None
        if prefix:
            hi = _prefix_upper_bound(prefix)
            flt = ds.field("term") >= prefix
            if hi is not None:
                flt = flt & (ds.field("term") < hi)
        terms = dset.to_table(columns=["term"], filter=flt)["term"].to_pylist()
        rx = parser.glob_to_regex(pattern)
        out = [t for t in sorted(terms) if rx.match(t)]
        return out[: parser.MAX_EXPANSIONS]

    def search(self, q: str, k: int = 10, ascii: bool = False) -> list[tuple[int, float]]:
        """Parsed query → BM25 top-k (serving path). Clause-wise
        semantics (reference BooleanQuery-of-spans, OpResults.java:
        248-257): AND across clauses, disjunction inside ``( … )``
        groups, positional match for quoted phrases, wildcards
        expanded; score = Σ clause BM25 contributions. Homogeneous
        queries take the pruned fast paths (WAND / phrase matcher).

        ``ascii=True`` runs the query against the derived
        ``<index_root>_ascii`` field with diacritics folded on both the
        query terms and the index — accent-insensitive search, the
        reference's ``*_ascii`` route (FrenchAnalyzer.java:326-333).
        The sibling hangs off the publish ROOT (resolved to its own
        live version), not off this handle's version directory."""
        idx = (
            segments.resolve_current(self.index_root + "_ascii")
            if ascii
            else self.index_dir
        )
        clauses = parser.parse(q)
        if ascii:
            from alix_spark.lexicometry.suggest import fold_query

            clauses = [_fold_clause(c, fold_query) for c in clauses]
            roots = None  # the Hunspell sidecar is in the unfolded field
        else:
            roots = self._hunspell.roots if self._hunspell is not None else None
        clauses = parser.resolve_with(
            clauses,
            lambda t: self._member(t, idx),
            lambda p: self._expand(p, idx),
            roots=roots,
        )
        if not clauses:
            return []
        if all(isinstance(c, parser.TermClause) for c in clauses):
            return wand.query_local(
                idx, [c.term for c in clauses], k=k, mode="and"
            )
        if len(clauses) == 1 and isinstance(clauses[0], parser.OrClause):
            return wand.query_local(idx, clauses[0].terms, k=k, mode="or")
        # phrases and mixed queries: clause-wise serving-path evaluator
        # (no Spark job — wand.phrase_topk remains the cluster fan-out
        # API for batch workloads)
        return wand.query_local_mixed(idx, clauses, k=k)

    def concordance(self, term: str, width: int = 5, limit: int = 100) -> DataFrame:
        """KWIC lines (reference OpResults concordance view) — served
        from the index rail, never re-analyzing the corpus."""
        return kwic_mod.kwic(self.rail(), term, width=width, limit=limit)

    # ------------------------------------------------------ lexicometry

    def _bm25_inputs(self):
        """(postings, doc_stats, term_stats, corpus_stats) for the
        theme/keyness scorers.

        When the engine sits on a built index these come straight from
        the index: postings decode distributed from the compressed
        blocks, stats from the sidecar parquets and corpus.json — zero
        analysis-chain work (the reference's TermStats sidecar serving
        model). The chain fallback only exists for an engine opened on
        a corpus with no index directory."""
        if os.path.isdir(os.path.join(self.index_dir, "postings")):
            post = segments.decoded_postings(self.spark, self.index_dir).select(
                "term", "doc_id", "tf"
            )
            dstats = self.spark.read.parquet(
                os.path.join(self.index_dir, "doc_stats")
            ).select("doc_id", "dl")
            tstats = self.spark.read.parquet(
                os.path.join(self.index_dir, "term_stats")
            ).select("term", "df", "cf")
            cstats = self.spark.createDataFrame(
                [(
                    int(self.meta["corpus_docs"]),
                    int(self.meta["corpus_tokens"]),
                    float(self.meta["avgdl"]),
                )],
                "corpus_docs long, corpus_tokens long, avgdl double",
            )
            return post, dstats, tstats, cstats
        from alix_spark.index import simple

        tok = self.tokens().select("doc_id", "pos", "term")
        return (
            simple.postings(tok),
            simple.doc_stats(tok).select("doc_id", "dl"),
            simple.term_stats(tok),
            simple.corpus_stats(tok).select(
                "corpus_docs", "corpus_tokens", "avgdl"
            ),
        )

    def _corpus_required(self, op: str) -> None:
        """Ops that filter or read the source table need the corpus the
        engine was opened with; an index-only handle (the registry's
        shape) gets a clear error, not an AttributeError."""
        if self.corpus is None:
            raise ValueError(
                f"{op} needs the corpus table; engine was opened index-only"
            )

    def terms(
        self,
        focus=None,
        scorer: str = "g2",
        top: int = 50,
        start: int | None = None,
        end: int | None = None,
    ) -> DataFrame:
        """Ranked terms: theme weights for the whole corpus, keyness
        focus-vs-rest when a focus predicate over the corpus is given,
        or chrono-partitioned contrastive terms when ``start``/``end``
        bound a day-of-year focus interval (reference OpTerms branches
        1/2/3 — the year query branch, OpTerms.java:115-136; this
        corpus spans one crawl year so the calendar axis is the day)."""
        if start is not None or end is not None:
            if start is None or end is None:
                raise ValueError("start and end must be given together")
            if focus is not None:
                # the chrono branch has its own focus (the interval)
                # and its own scorer — silently dropping the caller's
                # predicate would answer a different question (review
                # batch 31)
                raise ValueError(
                    "terms: focus cannot be combined with start/end "
                    "(the chrono branch's focus IS the interval)"
                )
            return self._terms_chrono(start, end, top)
        if focus is not None:
            self._corpus_required("terms(focus=...)")
        if focus is None:
            return (
                self.theme_weights()
                .orderBy(F.desc("score"), F.asc("term"))
                .limit(top)
            )
        focus_docs = (
            self.corpus.filter(focus)
            .join(self._url_ids(), "url")
            .select("doc_id")
        )
        return keyness_mod.keyness(
            self.rail().select("doc_id", "term"), focus_docs, scorer, top=top
        )

    def _terms_chrono(self, start: int, end: int, top: int) -> DataFrame:
        """OpTerms branch 3 (OpTerms.java:115-136): Partition.build over
        the calendar axis with the focus interval kept indivisible and
        ~12 repaired non-focus periods, scored with the reference's
        default PartScorer.LogLikelihoodTail (minPartTokens=1000)."""
        from alix_spark.lexicometry import partition

        self._corpus_required("terms(start=, end=)")
        doc_values = (
            self.corpus.join(self._url_ids(), "url")
            .select("doc_id", F.dayofyear("warc_ts").alias("value"))
        )
        doc_tokens = self._bm25_inputs()[1]
        doc_parts, focus_part, _periods = partition.build_chrono_parts(
            doc_values, doc_tokens, start, end
        )
        return partition.partition_keyness(
            self.rail().select("doc_id", "term"),
            doc_parts,
            focus_part,
            scorer="tail",
            min_part_tokens=partition.MIN_PART_TOKENS,
            top=top,
        )

    def chrono(self) -> DataFrame:
        """Docs per month of crawl date (reference OpChrono)."""
        self._corpus_required("chrono")
        return (
            self.corpus.groupBy(
                F.year("warc_ts").alias("y"), F.month("warc_ts").alias("m")
            )
            .agg(F.count("*").alias("docs"))
            .orderBy("y", "m")
        )

    def cooc(self, pivot: str, left: int = 5, right: int = 5, top: int = 50) -> DataFrame:
        return cooc_mod.cooc_counts(
            self.rail(), pivot, left=left, right=right, top=top,
        )

    # ------------------------------------------- CLI corpus utilities

    def unknowns(self, top: int = 2000) -> DataFrame:
        """Ranked unknown-token report (reference cli/Unknowns.java —
        the piaget-errors.txt dictionary-tuning workflow). Needs the
        corpus: unknown-ness is decided on the chain's lemma channel,
        which the frozen index does not store."""
        from alix_spark.corpus.unknowns import unknowns_from_chain

        self._corpus_required("unknowns")
        return unknowns_from_chain(self.tokens(), top=top)

    def expressions(self, top: int = 2000) -> DataFrame:
        """Multiword-expression harvest (reference cli/Expressions.java:
        non-overlapping trigrams of consecutive content words)."""
        from alix_spark.corpus.expressions import chain_skip_expr, expressions

        self._corpus_required("expressions")
        return expressions(self.tokens(), chain_skip_expr(), top=top)

    def keywords(self, top: int = 10) -> DataFrame:
        """Per-document keyword panels (reference cli/Keywords.java) —
        served from the frozen index stats, never re-analyzing."""
        from alix_spark.lexicometry.keywords import doc_keywords

        return doc_keywords(*self._bm25_inputs(), top=top)

    def spell(self, q: str, max_dist: int = 2, top: int = 10) -> DataFrame:
        """Spelling suggestions against the index dictionary (reference
        cli/SpellSugg.java re-expressed — Levenshtein ≤ max_dist,
        dist asc / cf desc)."""
        _post, _dstats, tstats, _cstats = self._bm25_inputs()
        return suggest_mod.suggest_spell(tstats, q, max_dist=max_dist, top=top)

    def clades(self, top_terms: int = 100, axes: int = 2):
        """Correspondence-analysis factor map over lang parts
        (reference OpClades)."""
        self._corpus_required("clades")
        parts = (
            self.corpus.select("url", F.col("lang").alias("part"))
            .join(self._url_ids(), "url")
            .select("doc_id", "part")
        )
        return svd_mod.ca_map(
            self.rail().select("doc_id", "term"), parts,
            top_terms=top_terms, axes=axes,
        )

    def theme_weights(self) -> DataFrame:
        """Full-vocabulary theme weights, computed ONCE per engine
        handle and persisted (the reference's TermStats.termWeights
        sidecar: snippet scoring reads it per request, never
        recomputing — OpResults.java:98-101). The handle is frozen to
        one index version, so the cache can never serve stale
        weights."""
        if self._theme_weights is None:
            with self._tw_lock:
                if self._theme_weights is None:
                    tw = theme_mod.theme_weights(
                        *self._bm25_inputs(), top=None
                    ).persist()
                    tw.count()
                    self._theme_weights = tw
        return self._theme_weights

    def close(self) -> None:
        """Release this handle's Spark-side caches: the persisted
        theme-weights vocabulary AND the persisted analyzed token
        table (tokens() — the LARGER cache, review batch 31). Dataset
        persist entries live in Spark's CacheManager, NOT in driver
        GC — a long-lived serving process that drops superseded
        handles without close() leaks one cache per republish (review
        batch 28). Idempotent; the handle stays usable (everything
        recomputes on next use)."""
        with self._tw_lock:
            tw, self._theme_weights = self._theme_weights, None
        tok, self._tok = self._tok, None
        # _rail may BE the token table's projection; _ids is unpersisted
        # lineage but droppable state all the same
        self._rail = None
        self._ids = None
        for h in (tw, tok):
            if h is not None:
                try:
                    h.unpersist()
                except Exception:
                    pass  # session already stopped: nothing left to free

    def suggest(self, q: str, top: int = 20, population=None) -> DataFrame:
        """Folded prefix/infix completion. With ``population`` (a
        predicate over the corpus), completions rank by the CURRENT
        doc-population's freq instead of the global cf
        (TermSuggest.java:141 population-scoped ranking)."""
        if population is not None:
            self._corpus_required("suggest(population=...)")
            pop_docs = (
                self.corpus.filter(population)
                .join(self._url_ids(), "url")
                .select("doc_id")
            )
            return suggest_mod.suggest_population(
                self.rail().select("doc_id", "term"), pop_docs, q, top=top
            )
        # global path: the SHARED no-Spark fold+rank table
        # (suggest_mod.suggest_local — cached per publish token, also
        # the SQL alix_suggest backend) — autocomplete is a
        # per-keystroke serving op and must not pay a Spark job per
        # call; ranking is asserted identical to suggest_folded
        return self.spark.createDataFrame(
            suggest_mod.suggest_local(self.index_dir, q, top=top),
            "term string, cf long",
        )
