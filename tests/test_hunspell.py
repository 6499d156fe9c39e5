"""Hunspell root expansion: aff/dic parsing, root lookup, build-time
sidecar compile, and query-side roots-first resolution (reference
SpanQueryParser.java:482-518 + HunspellCompiler.java)."""

from __future__ import annotations

import os

import pytest

from alix_spark.query.hunspell import Hunspell, compile_sidecar

AFF = """SET UTF-8

SFX S Y 1
SFX S 0 s .

SFX R Y 2
SFX R er ons er
SFX R er ez er

PFX P Y 1
PFX P 0 re .
"""

DIC = """4
ville/S
parler/R
faire/P
chat/S po:noun
"""


@pytest.fixture()
def h():
    return Hunspell.loads(AFF, DIC)


def test_headword_is_its_own_root(h):
    assert h.roots("ville") == ["ville"]


def test_suffix_rule_roots(h):
    assert h.roots("villes") == ["ville"]
    assert h.roots("parlons") == ["parler"]
    assert h.roots("parlez") == ["parler"]


def test_suffix_condition_respected(h):
    # 'chatons' would need an 'er' root for the R rule; 'chat' only has S
    assert h.roots("chatons") == []
    assert h.roots("chats") == ["chat"]


def test_prefix_rule_roots(h):
    assert h.roots("refaire") == ["faire"]


def test_apostrophe_folding(h):
    h2 = Hunspell.loads(AFF, "1\naujourd’hui\n")
    assert h2.roots("aujourd'hui") == ["aujourd'hui"]
    assert h2.roots("aujourd’hui") == ["aujourd'hui"]


def test_unknown_word_no_roots(h):
    assert h.roots("xyzzy") == []


def test_morph_field_headword_cut(h):
    # 'chat po:noun' keeps the full headword 'chat'
    assert "chat" in h.words


# ---------------------------------------------------- sidecar compile


def test_compile_sidecar_filters_to_vocabulary(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = tmp_path / "ix"
    os.makedirs(idx / "term_stats")
    pq.write_table(
        pa.table({"term": ["ville", "roi"], "df": [3, 2], "cf": [7, 4]}),
        idx / "term_stats" / "part-0.parquet",
    )
    src_dic = "3\nville/S fr:999\nroi\nabsent/S\n"
    aff_path, dic_path = compile_sidecar(str(idx), src_dic, AFF)
    dic = open(dic_path, encoding="utf-8").read().splitlines()
    assert dic[0] == "2"
    assert "ville/S fr:7" in dic
    assert "roi fr:4" in dic
    assert not any("absent" in ln for ln in dic)
    assert open(aff_path, encoding="utf-8").read() == AFF
    h = Hunspell.load(aff_path, dic_path)
    assert h.roots("villes") == ["ville"]


# ------------------------------------------------- engine integration


def test_engine_roots_first_resolution(spark, tmp_path):
    from alix_spark.corpus import webtext
    from alix_spark.engine import AlixEngine

    corpus = webtext.webtext(spark, 60, seed=23, partitions=4).persist()
    corpus.count()
    idx = str(tmp_path / "ix")
    eng = AlixEngine.build(spark, corpus, idx, n_shards=4)
    # an unseen inflection derivable only through the sidecar rule
    assert eng.search("guerrex") == []
    compile_sidecar(idx, "1\nguerre/Z\n", "SET UTF-8\n\nSFX Z Y 1\nSFX Z 0 x .\n")
    eng2 = AlixEngine(spark, idx, corpus)
    want = eng2.search("guerre")
    assert want and eng2.search("guerrex") == want
