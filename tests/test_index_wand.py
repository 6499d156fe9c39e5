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
