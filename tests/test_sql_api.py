"""SQL table-function surface tests (alix_bm25 / alix_phrase /
alix_suggest UDTFs vs the underlying engines)."""

from __future__ import annotations

import pytest

from alix_spark import sql_api
from alix_spark.index import segments, simple
from alix_spark.query import wand


@pytest.fixture(scope="module")
def sql_index(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tok = simple.tokens(docs)
    idx = str(tmp_path_factory.mktemp("sqlidx") / "ix")
    segments.build_index(spark, tok, idx, n_shards=4)
    sql_api.register(spark)
    return idx


def test_sql_bm25_matches_engine(spark, sql_index):
    got = [
        (r["doc_id"], r["score"])
        for r in spark.sql(
            f"SELECT * FROM alix_bm25('{sql_index}', 'hash,join', 10, 'and')"
        ).collect()
    ]
    want = wand.query_local(sql_index, ["hash", "join"], k=10, mode="and")
    assert got == want and len(got) == 10


def test_sql_phrase_k_nonpositive_yields_no_rows(spark, sql_index):
    """k<=0 must yield nothing — hits[:-1] silently dropped only the
    LAST match before (review batch 31; the wand-side k guard from
    batch 29 did not cover this UDTF's direct slice)."""
    for k in (0, -1):
        rows = spark.sql(
            f"SELECT * FROM alix_phrase('{sql_index}', 'order,fast', 0, {k})"
        ).collect()
        assert rows == []


def test_sql_phrase(spark, sql_index):
    rows = spark.sql(
        f"SELECT * FROM alix_phrase('{sql_index}', 'order,fast', 0, 100)"
    ).collect()
    assert len(rows) > 0
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)


def test_sql_suggest(spark, sql_index):
    rows = spark.sql(
        f"SELECT * FROM alix_suggest('{sql_index}', 'sc', 5)"
    ).collect()
    assert all(r["term"].startswith("sc") for r in rows)
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)


def test_sql_unknown_terms_empty(spark, sql_index):
    assert (
        spark.sql(
            f"SELECT * FROM alix_bm25('{sql_index}', 'zzzz', 10, 'and')"
        ).count()
        == 0
    )


def test_csv_terms_stripped(spark, sql_index):
    """'a, b' with natural spaces must match like 'a,b' (review fix)."""
    a = spark.sql(
        f"SELECT * FROM alix_bm25('{sql_index}', 'hash, join', 5, 'and')"
    ).collect()
    b = spark.sql(
        f"SELECT * FROM alix_bm25('{sql_index}', 'hash,join', 5, 'and')"
    ).collect()
    assert a == b and a


def test_alix_spell_matches_spark_path(spark, sql_index):
    """SQL alix_spell == suggest_spell (Spark) on the same index: same
    candidates, same distances, same (dist, cf, term) ranking."""
    from alix_spark.index import simple
    from alix_spark.lexicometry.suggest import suggest_spell

    rows = spark.sql(
        f"SELECT * FROM alix_spell('{sql_index}', 'tabel', 2, 10)"
    ).collect()
    got = [(r["term"], r["dist"], r["cf"]) for r in rows]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = [
        (r["term"], r["dist"], r["cf"])
        for r in suggest_spell(
            simple.term_stats(simple.tokens(docs)), "tabel", max_dist=2, top=10
        ).collect()
    ]
    assert got == want and got
