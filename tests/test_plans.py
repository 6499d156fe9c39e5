"""Physical-plan audits: the scale-critical properties the briefing
demands must be visible in `explain()` output — filter pushdown into
the parquet scan of the postings table, column pruning on wide tables,
and no Python stage in pure-relational paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.index import segments, simple


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = simple.tokens(docs)
    idx = str(tmp_path_factory.mktemp("planidx") / "ix")
    segments.build_index(spark, tok, idx, n_shards=2)
    return idx


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_term_filter_pushed_down(spark, small_index):
    """WAND's postings read must push `term IN (...)` into the scan —
    at 10^12 docs this is the difference between reading two posting
    lists and reading the whole index."""
    post = spark.read.parquet(f"{small_index}/postings").filter(
        F.col("term").isin(["hash", "join"])
    )
    plan = _plan(post)
    assert "PushedFilters" in plan
    assert "In(term" in plan or "term" in plan.split("PushedFilters")[1][:200]


def test_documents_scan_prunes_columns(spark):
    """A 2-column projection must not read the wide text column."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.select("doc_id", "lang").filter(F.col("lang") == "fr")
    plan = _plan(q)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema
    assert "doc_id" in read_schema and "lang" in read_schema


def test_relational_path_has_no_python_stage(spark):
    """Token/stats/BM25 jobs must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython / mapInPandas in the plan)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = simple.tokens(docs)
    from alix_spark.query import bm25

    q = bm25.bm25_topk(
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
        ["hash", "join"],
    )
    plan = _plan(q)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                   "MapInPandas"):
        assert marker not in plan


def test_aggregation_is_jvm_hash_agg(spark):
    """The hot aggregation path is JVM HashAggregate with a map-side
    partial phase (codegen-eligible; under AQE the WholeStageCodegen
    wrapper only materializes per-stage at runtime, so we assert the
    plan shape + the codegen switch instead of the wrapper node)."""
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == "true"
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = simple.tokens(docs)
    plan = _plan(simple.term_stats(tok))
    assert "HashAggregate" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_bm25_inputs_share_one_tokenize_exchange(spark):
    """The four BM25 stat tables derive from ONE postings aggregate:
    the joined theme plan must reuse the (term, doc_id) shuffle instead
    of re-tokenizing the corpus per table (VERDICT r3 ask #3 — at 100TB
    each extra branch is a full corpus scan + explode)."""
    from alix_spark import entry_queries as eq
    from alix_spark.lexicometry import theme

    df = theme.theme_weights(*eq._bm25_inputs(spark, "/root/testdata/sf0.001"), top=50)
    df.collect()  # AQE materializes reuse lazily (CLAUDE.md): read the FINAL plan
    plan = _plan(df)
    reused = [l for l in plan.splitlines() if "ReusedExchange" in l]
    assert any("doc_id" in l and "term" in l for l in reused), plan[:3000]


def test_url_filter_blocklist_is_hash_join_not_nested_loop(spark):
    """The blocklist dim must equi-join (Broadcast/ShuffledHashJoin),
    never BroadcastNestedLoopJoin — a per-row scan of the blocklist is
    O(corpus x blocklist) at 10^12 URLs."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://"), "source", F.lit(".example.com/p")).alias("url"),
    )
    plan = _plan(webpipe.url_filter(urls, blocklist=["src3.example.com"]))
    assert "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_classifier_and_split_have_no_python_stage(spark):
    """The hashed-bigram classifier and fold assignment are pure
    column-expression paths: md5/conv/arrays_zip stay JVM-side."""
    from alix_spark.textops import textstats, webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        textstats.classifier_scores(docs),
        webpipe.data_split(docs),
        textstats.script_profile(docs),
        textstats.gopher_rules(docs),
    ):
        plan = _plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_length_outliers_windows_only_the_histogram(spark):
    """The exact-quantile plan must window the AGGREGATED histogram,
    not the corpus: every Window node's child subtree contains the
    n_tokens hash aggregation (the single-partition step is bounded by
    distinct lengths, never by docs)."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(webpipe.length_outliers(docs))
    assert "Window" in plan
    window_tail = plan[plan.index("Window"):]
    assert "HashAggregate" in window_tail


def test_source_overlap_is_equi_join_no_python(spark):
    """The overlap matrix joins on the content hash (hash join or
    sort-merge, never a nested-loop/cartesian pair scan) and stays
    fully JVM-side."""
    from alix_spark.textops import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup.source_overlap(docs))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_winnowing_has_no_shuffle_below_the_python_stage(spark):
    """Winnowing selection is per-document: the Arrow stage must sit
    directly on the scan (full text locality — zero shuffles at any
    corpus size; only the final presentation sort exchanges)."""
    from alix_spark.textops import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.winnowing(docs))
    below = plan[plan.index("MapInPandas"):]
    assert "Exchange" not in below


def test_ccnet_windows_only_the_bin_histogram(spark):
    """The per-source tercile walk must window the aggregated
    (source, bin) histogram, never the corpus, and the whole path
    stays JVM-side (the LM join plan is lm_scores', already audited)."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(webpipe.ccnet_buckets(docs))
    assert "Window" in plan
    assert "HashAggregate" in plan[plan.index("Window"):]
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_c4_and_sampling_weights_stay_jvm_side(spark):
    """c4_clean is per-row column expressions (no shuffle at all);
    sampling_weights is one hash aggregation + broadcast totals —
    neither may contain a Python stage."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (webpipe.c4_clean(docs), webpipe.sampling_weights(docs)):
        plan = _plan(df)
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_centroid_similarity_aggregates_before_pairing(spark):
    """The pairwise cosine join must consume the aggregated centroid
    table (HashAggregate below the join), never pair raw vectors, and
    the whole path stays JVM-side."""
    from alix_spark.textops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(similarity.centroid_similarity(emb))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "partial_avg" in plan or "partial_" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_gram_emitters_run_one_arrow_pass(spark):
    """onion_ratio's gram table feeds the totals agg AND the join
    probe; dsir_weights' feature table feeds the bucket agg AND the
    delta join. Both must pin the shared gram_multiplicities pass
    (lazy localCheckpoint, review batch 24) so the tokenize+md5 Arrow
    stage appears in the plan as a reused checkpoint scan — never as
    two or three MapInPandas subtrees."""
    from alix_spark.textops import dedup, webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        dedup.onion_ratio(docs),
        webpipe.dsir_weights(docs, F.col("source") == "src1"),
    ):
        plan = _plan(df)
        assert plan.count("MapInPandas") < 2
        assert "ExistingRDD" in plan  # the pinned gram pass


def test_bloom_probe_is_broadcast_and_shuffle_free(spark):
    """bloom_membership's probe side must be k chained BROADCAST hash
    joins over a structurally bounded (<= m_bits/32 rows) filter —
    never a sort-merge join, never a Python stage, and the ONLY
    shuffles anywhere are the build side's position collapse/bit-pack
    aggregations plus the presentation sort (at 10^12 candidates a
    shuffled probe would move the whole corpus; the broadcast gate
    moves m_bits/8 bytes)."""
    from alix_spark.textops import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dedup.bloom_membership(docs, F.col("doc_id") % 3 == 0)
    plan = _plan(out)
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    # the packed filter is PINNED (lazy localCheckpoint) so the
    # reference-corpus build runs once, not once per broadcast — the
    # probe plan holds no hash shuffle at all (the trailing
    # rangepartitioning exchange is the contract orderBy)
    assert plan.count("hashpartitioning") == 0
    assert "ExistingRDD" in plan


def test_collocations_single_emit_and_topk(spark):
    """collocations must tokenize/emit ONCE (pinned gram pass feeding
    margins, total and probe), keep the margin joins off sort-merge,
    and take the final top-k via TakeOrderedAndProject — never a full
    global sort of the bigram table."""
    from alix_spark.textops import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textstats.collocations(docs, min_count=2, top=50)
    plan = _plan(out)
    assert plan.count("MapInPandas") == 0  # pinned: shows as ExistingRDD
    assert "ExistingRDD" in plan
    assert "TakeOrderedAndProject" in plan


def test_fineweb_clean_no_shuffle_no_python(spark):
    """fineweb_clean is the c4_clean family: per-row array expressions
    only — no Exchange other than the presentation sort, no Python
    stage (a posexplode of the line stream would shuffle the corpus
    at 10^12 pages)."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(webpipe.fineweb_clean(docs))
    assert "hashpartitioning" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_refinedweb_lines_no_shuffle_no_python(spark):
    """refinedweb_lines is the c4_clean family: per-row array
    expressions only — no hash shuffle, no Python stage."""
    from alix_spark.textops import webpipe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(webpipe.refinedweb_lines(docs))
    assert "hashpartitioning" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_source_divergence_broadcasts_the_pair_skeleton(spark):
    """The pair fan-out must be broadcast HASH joins against the tiny
    (sa, sb) skeleton — an OR-condition or cross formulation would go
    BroadcastNestedLoopJoin and re-scan the counts table per pair."""
    from alix_spark.textops import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.source_divergence(docs))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 4  # 2 skeleton + ha + hb
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_embedding_stats_single_scan_no_python(spark):
    """One scan + map-side-combined groupBy(label): no join, no Python
    stage, no shuffle of vector payloads (the agg ships only the
    per-label partials)."""
    from alix_spark.textops.similarity import embedding_stats

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(embedding_stats(emb))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Join"):
        assert marker not in plan
    # partial + final aggregation pairs (label agg), orderBy exchange
    assert plan.count("HashAggregate") >= 2


def test_doc_freq_spectrum_all_hash_aggs(spark):
    """The three roll-ups (term x doc -> term -> df) must all be hash
    aggregations with map-side partials — no window, no sort-based agg
    over the corpus, no Python."""
    from alix_spark.textops import textstats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(textstats.doc_freq_spectrum(docs))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Window"):
        assert marker not in plan
    assert plan.count("HashAggregate") >= 6  # 3 roll-ups x partial/final
