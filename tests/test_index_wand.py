"""Spark-level tests: corpus generator contract, byte-identical
goldens, compressed index build + resume, block-max WAND rank-identity
vs the brute-force BM25 oracle (SURVEY.md §5 test plan)."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

from alix_spark.analysis.chain import analyze, analyzed_tokens, extract_text, extracted_text
from alix_spark.corpus import webtext
from alix_spark.index import segments, simple
from alix_spark.query import bm25, wand

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "webtext_goldens.json")


# ------------------------------------------------------------- goldens


def load_goldens():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


def test_extracted_text_byte_identical_vs_goldens():
    """The north rule's invariant: byte-identical extracted text per url
    against committed goldens."""
    g = load_goldens()
    pdf = webtext._gen_batch(np.arange(g["n_docs"]), seed=g["seed"])
    by_url = {d["url"]: d for d in g["docs"]}
    for _, row in pdf.iterrows():
        want = by_url[row["url"]]
        got = extract_text(row["html"])
        assert got == want["text"], row["url"]
        assert hashlib.md5(got.encode("utf-8")).hexdigest() == want["text_md5"]


def test_analyzed_tokens_identical_vs_goldens():
    g = load_goldens()
    pdf = webtext._gen_batch(np.arange(g["n_docs"]), seed=g["seed"])
    by_url = {d["url"]: d for d in g["docs"]}
    for _, row in pdf.iterrows():
        want = [tuple(t) for t in by_url[row["url"]]["tokens"]]
        got = [(t[0], t[1], t[2], t[3]) for t in analyze(row["html"])]
        assert got == want, row["url"]


def test_corpus_roundtrip_extraction():
    pdf = webtext._gen_batch(np.arange(40), seed=7)
    for _, row in pdf.iterrows():
        assert extract_text(row["html"]) == row["text"]


# ------------------------------------------------- distributed corpus


def test_corpus_partition_invariance(spark):
    """Same corpus bytes regardless of partition count (cluster-size
    determinism prerequisite for the N vs 4N scaling runs)."""
    a = webtext.webtext(spark, 60, seed=5, partitions=2).orderBy("url").collect()
    b = webtext.webtext(spark, 60, seed=5, partitions=16).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_spark_extraction_matches_local(spark):
    corpus = webtext.webtext(spark, 30, seed=42, partitions=4)
    got = {r["url"]: r["text"] for r in extracted_text(corpus).collect()}
    want = {r["url"]: r["text"] for r in corpus.select("url", "text").collect()}
    assert got == want


def test_spark_analyzed_tokens_match_local(spark):
    corpus = webtext.doc_ids(webtext.webtext(spark, 12, seed=42, partitions=3))
    tok = analyzed_tokens(corpus).orderBy("doc_id", "pos", "term").collect()
    local = []
    for r in corpus.select("doc_id", "html").collect():
        for term, pos, tag, lemma in analyze(bytes(r["html"])):
            local.append((r["doc_id"], pos, term, tag, lemma))
    local.sort(key=lambda t: (t[0], t[1], t[2]))
    assert [(r["doc_id"], r["pos"], r["term"], r["pos_tag"], r["lemma"]) for r in tok] == local


# ------------------------------------------------------ varint blocks


def test_varint_roundtrip():
    rng = np.random.default_rng(3)
    for size in [0, 1, 7, 200, 5000]:
        a = rng.integers(0, 1 << 40, size=size)
        assert (segments.varint_decode(segments.varint_encode(a), size) == a).all()


def test_block_encoding_roundtrip():
    rng = np.random.default_rng(4)
    docs = np.sort(rng.choice(100000, 1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, 1000).astype(np.int64)
    dls = rng.integers(10, 500, 1000).astype(np.int64)
    rows = segments._encode_term_group(0, "t", docs, tfs, dls, avgdl=100.0)
    import pandas as pd

    got_docs, got_tfs, got_dls = [], [], []
    for row in rows:
        d, t, dl = segments.decode_block(
            pd.Series(dict(zip(
                ["shard", "term", "block_id", "n", "max_doc", "max_tf",
                 "block_ub", "doc_bytes", "tf_bytes", "dl_bytes"], row)))
        )
        got_docs.append(d)
        got_tfs.append(t)
        got_dls.append(dl)
    assert (np.concatenate(got_docs) == docs).all()
    assert (np.concatenate(got_tfs) == tfs).all()
    assert (np.concatenate(got_dls) == dls).all()


# ----------------------------------------------- WAND kernel fuzzing


ENC_COLS = ["shard", "term", "block_id", "n", "max_doc", "max_tf",
            "block_ub", "doc_bytes", "tf_bytes", "dl_bytes", "pos_bytes"]


def _mk_cursor(idf, docs, tfs, dls, avgdl):
    import pandas as pd

    rows = segments._encode_term_group(0, "t", docs, tfs, dls, avgdl)
    return wand._Cursor(idf, pd.DataFrame(rows, columns=ENC_COLS))


def _brute_py(posting_sets, idfs, avgdl, k, mode):
    import math

    from alix_spark.query.bm25 import B, K1

    scores: dict[int, float] = {}
    hits: dict[int, int] = {}
    for (docs, tfs, dls), idf in zip(posting_sets, idfs):
        for d, tf, dl in zip(docs, tfs, dls):
            norm = K1 * (1.0 - B + B * dl / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1.0) / (tf + norm)
            hits[d] = hits.get(d, 0) + 1
    items = [
        (math.floor(s * 1e6 + 0.5) / 1e6, d)
        for d, s in scores.items()
        if mode == "or" or hits[d] == len(posting_sets)
    ]
    items.sort(key=lambda t: (-t[0], t[1]))
    return [(d, s) for s, d in items[:k]]


@pytest.mark.parametrize("mode", ["or", "and"])
def test_wand_kernel_fuzz_vs_bruteforce(mode):
    """1,500 random posting sets per mode: wand_shard_topk must be
    rank- AND score-identical to brute-force BM25 in the round6 domain.
    Catches the or-mode pivot tie-extension bug (ADVICE r1: cursors
    parked on the pivot doc excluded from the block-max bound) and
    k-boundary ties decided on unrounded scores."""
    import math

    rng = np.random.default_rng(20260817)
    for trial in range(1500):
        n_terms = int(rng.integers(1, 5))
        universe = int(rng.integers(20, 400))
        dls_all = rng.integers(5, 300, size=universe + 1).astype(np.int64)
        posting_sets, idfs, cursors = [], [], []
        for _ in range(n_terms):
            df_t = int(rng.integers(1, universe + 1))
            docs = np.sort(
                rng.choice(universe + 1, size=df_t, replace=False)
            ).astype(np.int64)
            tfs = rng.integers(1, 25, size=df_t).astype(np.int64)
            dls = dls_all[docs]
            posting_sets.append((docs, tfs, dls))
            idf = math.log(1.0 + (universe - df_t + 0.5) / (df_t + 0.5))
            idfs.append(max(idf, 0.01))
        avgdl = float(dls_all.mean())
        k = int(rng.choice([1, 3, 10]))
        cursors = [
            _mk_cursor(idf, d, t, dl, avgdl)
            for (d, t, dl), idf in zip(posting_sets, idfs)
        ]
        got = wand.wand_shard_topk(cursors, k, avgdl, mode=mode)
        want = _brute_py(posting_sets, idfs, avgdl, k, mode)
        assert got == want, f"trial {trial}: {got} != {want}"


# --------------------------------------------------- index + WAND e2e


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    tok = simple.tokens(docs)
    idx = str(tmp_path_factory.mktemp("idx") / "ix")
    segments.build_index(spark, tok, idx, n_shards=4)
    return idx, tok


QUERIES = [
    (["hash", "join"], "and"),
    (["merge"], "and"),
    (["stream", "vector"], "or"),
    (["sort", "merge", "scan"], "or"),
    (["zzz_missing"], "and"),
    (["zzz_missing", "merge"], "or"),
]


def _brute(tok, terms, mode, k=10):
    return bm25.bm25_topk(
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
        terms, k=k, mode=mode,
    )


@pytest.mark.parametrize("terms,mode", QUERIES)
def test_wand_rank_identical_to_bruteforce(spark, built_index, terms, mode):
    idx, tok = built_index
    w = [(r["doc_id"], r["score"]) for r in wand.wand_topk(spark, idx, terms, mode=mode).collect()]
    b = [(r["doc_id"], r["score"]) for r in _brute(tok, terms, mode).collect()]
    assert w == b


def test_dl_join_path_bit_identical(spark, built_index, tmp_path):
    """The 10^12-doc dl path (shuffle join instead of driver broadcast)
    must produce a bit-identical index: same encoded posting blocks,
    same term_ids, same stats."""
    idx, tok = built_index
    idx2 = str(tmp_path / "ix_join")
    segments.build_index(spark, tok, idx2, n_shards=4, dl_broadcast_max=0)

    def canon(d, table, keys):
        rows = [tuple(r) for r in spark.read.parquet(f"{d}/{table}").collect()]
        return sorted(rows, key=lambda t: tuple(str(x) for x in t))

    for table in ["postings", "doc_stats", "term_stats"]:
        a = canon(idx, table, None)
        b = canon(idx2, table, None)
        assert a == b, table
    assert segments.read_meta(idx)["avgdl"] == segments.read_meta(idx2)["avgdl"]


def test_dense_ranks_rejects_null_keys(spark):
    """Review batch 34: a NULL order key was counted into the
    partition offsets but dropped by the frozen-bounds join (ids not
    dense), and an all-NULL first range matched EVERY row (duplicate
    ids) — NULL keys now raise in-plan."""
    import pytest

    from alix_spark.util import dense_ranks

    df = spark.createDataFrame([("b",), (None,)], "k string")
    with pytest.raises(Exception, match="NULL order key"):
        dense_ranks(df, "k", "id").collect()


def test_dense_ranks_matches_global_window(spark):
    """util.dense_ranks (range-partitioned parallel rank) must equal the
    single-task global row_number it replaces, at any parallelism."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from alix_spark.util import dense_ranks

    terms = [f"t{i:03d}" for i in range(97)] + ["é", "a", "zz", "Z", "0"]
    df = spark.createDataFrame([(t,) for t in terms], "term string").repartition(7)
    order = F.encode(F.col("term"), "utf-8")
    got = {
        r["term"]: r["term_id"]
        for r in dense_ranks(df, "term", "term_id", order_expr=order).collect()
    }
    want = {
        r["term"]: r["term_id"]
        for r in df.withColumn(
            "term_id",
            F.row_number().over(Window.orderBy(order)).cast("long"),
        ).collect()
    }
    assert got == want


def test_index_manifests_and_meta(built_index):
    idx, _ = built_index
    meta = segments.read_meta(idx)
    assert meta["n_shards"] == 4
    total_postings = 0
    for s in range(4):
        with open(segments._manifest_path(idx, s)) as f:
            m = json.load(f)
        assert m["format"] == segments.FORMAT_VERSION
        total_postings += m["n_postings"]
    assert total_postings > 0


def test_index_resume_rebuilds_missing_shard(spark, built_index):
    idx, tok = built_index
    before = [(r["doc_id"], r["score"])
              for r in wand.wand_topk(spark, idx, ["hash", "join"]).collect()]
    os.remove(segments._manifest_path(idx, 2))
    meta = segments.build_index(spark, tok, idx, n_shards=4, resume=True)
    assert meta["resumed_from"] == [0, 1, 3]
    after = [(r["doc_id"], r["score"])
             for r in wand.wand_topk(spark, idx, ["hash", "join"]).collect()]
    assert before == after


def test_index_resume_rebuilds_corrupt_manifest_shard(spark, built_index):
    """A truncated/half-written manifest — the crashed-run artifact
    resume exists for — must count as shard-not-done and be rebuilt,
    not abort the whole resume with a raw JSONDecodeError (ADVICE
    r04). A READABLE manifest from an incompatible build still raises."""
    import json as _json

    import pytest

    idx, tok = built_index
    with open(segments._manifest_path(idx, 1), "w") as f:
        f.write('{"n_shards": 4, "form')  # truncated mid-write
    meta = segments.build_index(spark, tok, idx, n_shards=4, resume=True)
    assert meta["resumed_from"] == [0, 2, 3]
    # readable-but-incompatible must still fail loudly
    with open(segments._manifest_path(idx, 1)) as f:
        m = _json.load(f)
    m["n_shards"] = 8
    with open(segments._manifest_path(idx, 1), "w") as f:
        _json.dump(m, f)
    with pytest.raises(ValueError, match="incompatible"):
        segments.build_index(spark, tok, idx, n_shards=4, resume=True)
    # restore for any later test sharing the fixture
    m["n_shards"] = 4
    with open(segments._manifest_path(idx, 1), "w") as f:
        _json.dump(m, f)


def test_wand_on_analyzed_french_corpus(spark, tmp_path):
    """End-to-end on the webtext corpus: html → analysis chain →
    compressed index → WAND, vs brute force over the same tokens."""
    corpus = webtext.doc_ids(webtext.webtext(spark, 80, seed=11, partitions=4))
    tok = analyzed_tokens(corpus).select("doc_id", "pos", "term")
    idx = str(tmp_path / "ix")
    segments.build_index(spark, tok, idx, n_shards=4)
    for terms, mode in [(["ville", "roi"], "and"), (["guerre", "paix"], "or")]:
        w = [(r["doc_id"], r["score"])
             for r in wand.wand_topk(spark, idx, terms, mode=mode).collect()]
        b = [(r["doc_id"], r["score"])
             for r in _brute(tok, terms, mode).collect()]
        assert w == b
        assert len(w) > 0


def test_ordered_slop_alternative_positions(spark, tmp_path):
    """Ordered near with slop>0 and 3 terms must consider ALL next-term
    positions in the slop window, not just the nearest: a@0 b@{1,2} c@4
    with slop=1 matches via b@2 (review regression)."""
    from alix_spark.index import segments, simple
    from alix_spark.query import wand

    docs = spark.createDataFrame(
        [(1, "alpha bravo bravo pad charlie")],  # a@0 b@1 b@2 c@4
        "doc_id long, text string",
    )
    idx = str(tmp_path / "slopix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=1)
    hits = wand.phrase_topk(
        spark, idx, ["alpha", "bravo", "charlie"], slop=1, ordered=True, k=5
    ).collect()
    assert [r["doc_id"] for r in hits] == [1]
    # and slop=0 still rejects it (gap between bravo and charlie)
    none = wand.phrase_topk(
        spark, idx, ["alpha", "bravo", "charlie"], slop=0, ordered=True, k=5
    ).collect()
    assert none == []


def test_build_empty_corpus_raises(spark, tmp_path):
    from alix_spark.index import segments, simple

    import pytest as _pytest

    docs = spark.createDataFrame([], "doc_id long, text string")
    with _pytest.raises(ValueError, match="empty token table"):
        segments.build_index(
            spark, simple.tokens(docs), str(tmp_path / "emptyix"), n_shards=2
        )


def test_gc_grace_counts_from_supersession(spark, tmp_path):
    """A version that served for a long time still gets its full drain
    window after being superseded; in-flight .tmp staging dirs are
    never collected before stale_staging_s."""
    import os
    import time

    from alix_spark.index import segments, simple

    root_ix = str(tmp_path / "ix")
    docs = spark.createDataFrame(
        [(1, "alpha commun"), (2, "alpha autre")], "doc_id long, text string"
    )
    s1, t1 = segments.begin_publish(root_ix)
    segments.build_index(spark, simple.tokens(docs), s1, n_shards=1)
    v1 = segments.commit_publish(root_ix, s1, t1)
    # age the version dir's mtime far beyond any grace
    old = time.time() - 10_000
    os.utime(v1, (old, old))
    # an in-flight staging build exists
    s2, t2 = segments.begin_publish(root_ix)
    # gc with a tiny grace: v1 is LIVE (kept); staging kept (fresh)
    assert segments.gc_versions(root_ix, grace_s=1.0) == []
    # supersede v1 now
    segments.build_index(spark, simple.tokens(docs), s2, n_shards=1)
    segments.commit_publish(root_ix, s2, t2)
    # despite the ancient mtime, v1 was superseded milliseconds ago —
    # a generous grace keeps it (drain window counts from supersession)
    assert segments.gc_versions(root_ix, grace_s=3600.0) == []
    assert os.path.isdir(v1)
    # zero grace collects it
    assert segments.gc_versions(root_ix, grace_s=0.0) == [t1]


def test_bucketized_tokens_custom_id_col(spark):
    """bucketized_tokens with a non-default id column must not KeyError
    in the executor closure (review regression)."""
    from alix_spark.index import segments

    packed = spark.createDataFrame(
        [(7, ["a", "b", "a"], [0, 1, 2])],
        "page_id long, terms array<string>, poss array<int>",
    )
    rows = segments.bucketized_tokens(
        packed, n_shards=2, id_col="page_id"
    ).collect()
    assert rows and all(r["doc_id"] == 7 for r in rows)


def test_build_empty_does_not_clobber_live_index(spark, tmp_path):
    """The empty-input guard must fire BEFORE the old index is
    destroyed (review regression: rmtree ran first, so a rebuild fed an
    accidentally-empty corpus deleted the live index, then raised)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "liveix")
    segments.build_index(spark, simple.tokens(docs), idx, n_shards=2)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty token table"):
        segments.build_index(spark, simple.tokens(empty), idx, n_shards=2)
    # the live index survived and still serves
    assert segments.read_meta(idx)["corpus_docs"] == 2
    assert wand.query_local(idx, ["beta"], k=5)


def test_empty_shards_get_manifests_and_resume_converges(spark, tmp_path):
    """Shards that receive no postings are still DONE: without their
    zero-row manifests, resume=True re-ran the full encode scan on
    every restart (review regression)."""
    docs = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, text string"
    )
    idx = str(tmp_path / "sparseix")
    tok = simple.tokens(docs)
    segments.build_index(spark, tok, idx, n_shards=4)
    for s in range(4):
        assert os.path.exists(segments._manifest_path(idx, s)), s
    meta = segments.build_index(spark, tok, idx, n_shards=4, resume=True)
    assert meta["resumed_from"] == [0, 1, 2, 3]


def test_positionless_index_refuses_phrase(spark, tmp_path):
    """Phrase/near on an index built with_positions=False must raise,
    not zero-fill positions (review regression: unordered near counted
    every all-terms doc as a match)."""
    from alix_spark.query import parser

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta delta alpha")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "nopos")
    segments.build_index(
        spark, simple.tokens(docs), idx, n_shards=1, with_positions=False
    )
    clauses = [parser.PhraseClause(terms=["alpha", "beta"], slop=0,
                                   ordered=True)]
    with pytest.raises(ValueError, match="with_positions"):
        wand.query_local_mixed(idx, clauses, k=5)


def test_mixed_duplicate_term_scored_once(spark, built_index):
    """Duplicate MUST terms collapse in the mixed path exactly like the
    all-terms fast path's sorted(set(terms)) (review regression: the
    mixed path summed one score map per duplicate clause)."""
    from alix_spark.query import parser

    idx, _ = built_index
    once = wand.query_local_mixed(
        idx, [parser.TermClause("hash"), parser.TermClause("join")], k=10
    )
    dup = wand.query_local_mixed(
        idx,
        [parser.TermClause("hash"), parser.TermClause("hash"),
         parser.TermClause("join")],
        k=10,
    )
    assert once and dup == once
    fast = wand.query_local(idx, ["hash", "hash", "join"], k=10, mode="and")
    assert [(d, round(s, 6)) for d, s in dup] == [
        (d, round(s, 6)) for d, s in fast
    ]


def test_missing_index_clear_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="no index at"):
        wand.term_stats_dataset(str(tmp_path / "never_built"))
