"""Dedup operator tests: hot-shingle df-cap (the web-scale candidate
bound) and cross-tier consistency on a corpus with seeded duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.textops import dedup


@pytest.fixture(scope="module")
def hot_corpus(spark):
    """8 docs, every one carrying the same boilerplate trigram run
    ("all rights reserved worldwide notice"); docs 0/1 and 2/3 are true
    near-duplicates beyond the boilerplate."""
    boiler = "all rights reserved worldwide notice"
    rows = [
        (0, f"{boiler} alpha beta gamma delta epsilon zeta"),
        (1, f"{boiler} alpha beta gamma delta epsilon eta"),
        (2, f"{boiler} red orange yellow green blue indigo"),
        (3, f"{boiler} red orange yellow green blue violet"),
        (4, f"{boiler} one unique sentence four five six"),
        (5, f"{boiler} seven eight nine ten eleven twelve"),
        (6, f"{boiler} lorem ipsum dolor sit amet consectetur"),
        (7, f"{boiler} quick brown fox jumps over dog"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_bounds_candidates(spark, hot_corpus):
    """With threshold=0 every candidate pair surfaces. Uncapped, the
    boilerplate shingle makes ALL C(8,2)=28 pairs candidates (the
    quadratic blow-up); with max_shingle_df=2 only pairs sharing a
    non-ubiquitous shingle survive the join."""
    uncapped = dedup.jaccard_pairs(hot_corpus, threshold=0.0).collect()
    assert len(uncapped) == 28
    capped = dedup.jaccard_pairs(
        hot_corpus, threshold=0.0, max_shingle_df=2
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert got == {(0, 1), (2, 3)}


def test_hot_shingle_cap_keeps_true_near_dups(spark, hot_corpus):
    """The true near-dup pairs stay above a working threshold with the
    cap on (their overlap lives in the rare shingles)."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(
            hot_corpus, threshold=0.3, max_shingle_df=2
        ).collect()
    }
    assert (0, 1) in pairs and (2, 3) in pairs


def test_cap_none_is_exact(spark, hot_corpus):
    """Default (no cap) is the exact oracle-matched semantics: jac
    computed over the full shingle sets."""
    rows = dedup.jaccard_pairs(hot_corpus, threshold=0.5).collect()
    for r in rows:
        assert 0.5 <= r["jac"] <= 1.0
    assert {(r["doc_a"], r["doc_b"]) for r in rows} >= {(0, 1), (2, 3)}


def test_simhash_blocking_complete_for_threshold(spark):
    """Pigeonhole blocking must use max_hamming+1 chunks: a pair whose
    differing bits spread one-per-old-chunk (bits 0,15,30,45) is within
    Hamming 4 and MUST be found (review regression — 4 fixed chunks
    missed it)."""
    from alix_spark.textops import dedup

    offs, masks = dedup.simhash_chunks(12)
    assert len(offs) == 13
    assert sum(m.bit_length() for m in masks) == dedup.SIMHASH_BITS

    # synthesize two fingerprints differing at bits 0/15/30/45 via a
    # direct candidate check on the chunk keys
    a = 0
    b = (1 << 0) | (1 << 15) | (1 << 30) | (1 << 45)
    shared = any(
        ((a >> off) & m) == ((b >> off) & m) for off, m in zip(offs, masks)
    )
    assert shared, "13-chunk blocking must give the pair a shared key"
    old_offs = [0, 15, 30, 45]
    assert not any(
        ((a >> off) & 32767) == ((b >> off) & 32767) for off in old_offs
    ), "the old 4x15 blocking loses exactly this pair"


def test_minhash_rejects_indivisible_bands(spark):
    from alix_spark.textops import dedup

    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(docs, num_perm=64, bands=10)


def test_jaccard_string_ids_and_null_text(spark):
    """url keys flow through the jaccard/minhash tiers (doc_shingles
    previously hardcoded `doc_id long`), and NULL text rows (failed
    fetches) are skipped instead of crashing the executor (review
    regressions)."""
    docs = spark.createDataFrame(
        [
            ("https://a/1", "un deux trois quatre cinq"),
            ("https://a/2", "un deux trois quatre six"),
            ("https://a/3", None),
        ],
        "url string, text string",
    )
    pairs = dedup.jaccard_pairs(
        docs, threshold=0.1, id_col="url", n=3
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [
        ("https://a/1", "https://a/2")
    ]
    mh = dedup.minhash_lsh_pairs(
        docs, threshold=0.1, id_col="url", num_perm=16, bands=8, n=3
    ).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in mh] == [
        ("https://a/1", "https://a/2")
    ]
    fps = dedup.simhash_fingerprints(docs, id_col="url").collect()
    assert {r["doc_id"]: r["simhash"] for r in fps}["https://a/3"] == 0


def test_embedding_dup_pairs_finds_near_identical(spark):
    """Semantic-dedup tier: near-identical embeddings land in the same
    sign bucket (they disagree with a hyperplane with prob θ/π ≈ 0) and
    survive the exact-cosine verify; orthogonal ones never appear."""
    import numpy as np

    from alix_spark.textops.dedup import embedding_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=64)
    near = base + rng.normal(scale=0.01, size=64)  # cos ≈ 0.9999
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in near]),
    ] + [
        (i, [float(x) for x in rng.normal(size=64)]) for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_dup_pairs(emb, threshold=0.95).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]
    assert got[0]["cos"] > 0.99
    # precision is 1.0 by construction: every reported pair re-verifies
    import math

    by_id = {i: np.array(v) for i, v in rows}
    for r in got:
        a, b = by_id[r["id_a"]], by_id[r["id_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert math.floor(cos * 1e6 + 0.5) / 1e6 >= 0.95


class TestDupSpans:
    def test_overlapping_windows_merge_into_one_span(self, spark):
        # docs 1 and 2 share tokens c..h (6 tokens); with k=4 the
        # duplicated starts in doc 1 are positions 2,3,4 (c d e f,
        # d e f g, e f g h) -> ONE merged span covering c..h
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),
                (2, "x y c d e f g h z w"),
                (3, "p q r s t u v m n o"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in dedup.dup_spans(docs, k=4).collect()}
        assert rows[1]["n_spans"] == 1 and rows[1]["dup_tokens"] == 6
        assert rows[2]["n_spans"] == 1 and rows[2]["dup_tokens"] == 6
        assert rows[3]["n_spans"] == 0 and rows[3]["dup_tokens"] == 0
        assert rows[1]["dup_ratio"] == 0.6
        assert rows[1]["n_tokens"] == 10

    def test_disjoint_duplicated_regions_stay_separate_spans(self, spark):
        # two shared 4-gram regions separated by a unique gap
        docs = spark.createDataFrame(
            [
                (1, "c d e f GAP1 GAP2 GAP3 w x y z"),
                (2, "c d e f QQQ1 QQQ2 QQQ3 w x y z"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in dedup.dup_spans(docs, k=4).collect()}
        assert rows[1]["n_spans"] == 2
        assert rows[1]["dup_tokens"] == 8

    def test_min_df_counts_distinct_docs_not_occurrences(self, spark):
        # doc 1 repeats its own 4-gram twice; no OTHER doc has it, so
        # with min_df=2 (distinct docs) nothing is flagged
        docs = spark.createDataFrame(
            [
                (1, "c d e f m n o p c d e f"),
                (2, "q r s t u v w x y z a b"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in dedup.dup_spans(docs, k=4).collect()}
        assert rows[1]["n_spans"] == 0 and rows[2]["n_spans"] == 0

    def test_short_and_null_docs_zero_rows_kept(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, None), (3, "a b c d e"), (4, "a b c d e")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in dedup.dup_spans(docs, k=4).collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert rows[1] == (1, 2, 0, 0, 0.0) or (
            rows[1]["n_tokens"] == 2 and rows[1]["dup_ratio"] == 0.0
        )
        assert rows[2]["n_tokens"] == 0 and rows[2]["dup_ratio"] == 0.0
        # docs 3 and 4 are verbatim dups: one span covering everything
        assert rows[3]["n_spans"] == 1 and rows[3]["dup_tokens"] == 5
        assert rows[3]["dup_ratio"] == 1.0

    def test_args_validated(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            dedup.dup_spans(docs, k=0)
        with pytest.raises(ValueError):
            dedup.dup_spans(docs, min_df=1)


class TestSourceOverlap:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "source string, text string")
        return {
            (r["source_a"], r["source_b"]): r
            for r in dedup.source_overlap(df, **kw).collect()
        }

    def test_known_matrix_and_overlap_coefficient(self, spark):
        got = self._run(
            spark,
            [
                ("s1", "A"), ("s1", "B"),
                ("s2", "B"), ("s2", "C"),
                ("s3", "B"),
            ],
        )
        assert got[("s1", "s2")]["n_shared"] == 1
        assert got[("s1", "s2")]["overlap"] == 0.5  # 1 / min(2, 2)
        assert got[("s1", "s3")]["overlap"] == 1.0  # 1 / min(2, 1)
        assert got[("s2", "s3")]["overlap"] == 1.0

    def test_df_cap_drops_universal_boilerplate(self, spark):
        # B is in 3 sources > cap 2 -> excluded from the matrix
        got = self._run(
            spark,
            [("s1", "A"), ("s1", "B"), ("s2", "B"), ("s2", "C"), ("s3", "B")],
            max_sources_per_text=2,
        )
        assert got == {}

    def test_within_source_dups_collapse_and_null_excluded(self, spark):
        got = self._run(
            spark,
            [
                ("s1", "A"), ("s1", "A"), ("s1", None),
                ("s2", "A"), ("s2", None),
            ],
        )
        # A counts once per source; NULL texts carry no content
        assert got[("s1", "s2")]["n_shared"] == 1
        assert got[("s1", "s2")]["overlap"] == 1.0  # 1 / min(1, 1)


def test_onion_ratio_gate_semantics(spark):
    """Whole-doc duplicates hit ratio 1.0 and drop; a doc sharing only
    a prefix run keeps when clean grams outweigh duplicates; short and
    NULL docs carry no evidence (NULL ratio, keep). Within-doc repeats
    count as duplicate positions (the order-independent restatement)."""
    dup = "one two three four five six seven eight nine ten"
    rows = [
        (0, dup),                         # exact dup of 1 -> ratio 1.0
        (1, dup),
        # shares only its leading 5-gram 'one two three four five'
        # with the duplicate pair — a single duplicate position
        (2, "one two three four five apple pear plum fig date kiwi"),
        (3, "short doc"),                 # < 5 tokens -> no grams
        (4, None),                        # NULL text -> no grams
        # internal repeat: the same 5-gram twice within ONE doc
        (5, "a b c d e a b c d e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup.onion_ratio(df, n=5).collect()}
    assert len(out) == 6
    assert out[0]["dup_ratio"] == 1.0 and not out[0]["keep"]
    assert out[1]["dup_ratio"] == 1.0 and not out[1]["keep"]
    # doc 2: 7 gram positions, exactly 1 duplicate -> keep
    assert out[2]["n_grams"] == 7 and out[2]["dup_grams"] == 1
    assert out[2]["keep"]
    assert out[3]["n_grams"] == 0 and out[3]["dup_ratio"] is None
    assert out[3]["keep"] and out[4]["keep"]
    assert out[4]["n_grams"] == 0
    # doc 5: 6 positions; 'a b c d e' occurs at 0 and 5 (2 dup
    # positions); the straddling grams are unique -> 2/6, keep
    assert out[5]["n_grams"] == 6 and out[5]["dup_grams"] == 2
    assert out[5]["keep"]


class TestBloomMembership:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_no_false_negatives_and_verdicts(self, spark):
        from alix_spark.textops import dedup

        df = self._df(
            spark,
            [
                (0, "alpha beta"),
                (1, "gamma delta"),
                (2, "alpha beta"),
                (3, None),
                (4, "unique text"),
                (5, "gamma delta"),
                (6, "alpha beta"),
                (7, None),
            ],
        )
        out = dedup.bloom_membership(
            df, F.col("doc_id") % 3 == 0, m_bits=1 << 12
        )
        rows = {r.doc_id: (r.n_hits, r.maybe_dup) for r in out.collect()}
        # ref = {0, 6: 'alpha beta', 3: NULL}; candidates = 1,2,4,5,7
        assert set(rows) == {1, 2, 4, 5, 7}
        # false negatives are impossible: doc 2 duplicates ref content
        assert rows[2] == (4, True)
        # distinct contents (false positives vanish at this m/n)
        assert rows[1] == (1, False) or rows[1][1] is False
        assert rows[4][1] is False and rows[5][1] is False
        # NULL text carries no content -> NULL verdicts
        assert rows[7] == (None, None)

    def test_partitioning_invariance_and_string_ids(self, spark):
        from alix_spark.textops import dedup

        rows = [(f"d{i:03d}", f"text number {i % 5}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        ref = F.substring("doc_id", 2, 3).cast("int") % 2 == 0
        a = dedup.bloom_membership(df, ref, m_bits=1 << 10).collect()
        b = dedup.bloom_membership(
            df.repartition(7), ref, m_bits=1 << 10
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        # every candidate's text also exists in the ref half (i%5
        # cycles both halves) -> all maybe_dup
        assert all(r.maybe_dup for r in a)

    def test_parameter_validation(self, spark):
        from alix_spark.textops import dedup

        df = self._df(spark, [(0, "x")])
        with pytest.raises(ValueError, match="k must be"):
            dedup.bloom_membership(df, F.lit(True), k=5)
        with pytest.raises(ValueError, match="m_bits"):
            dedup.bloom_membership(df, F.lit(True), m_bits=16)


class TestDedupCanonical:
    def test_keeper_is_highest_quality_then_min_id(self, spark):
        # docs 1/2 near-dup (2 is a truncation -> fewer tokens ->
        # lower quality); docs 4/5 identical text (quality tie ->
        # min id wins); doc 3 is a singleton and never appears
        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta"),
                (3, "completely unrelated content lives here now"),
                (4, "shared duplicate page body text here"),
                (5, "shared duplicate page body text here"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r
            for r in dedup.dedup_canonical(df, threshold=0.3).collect()
        }
        assert set(rows) == {1, 2, 4, 5}
        assert rows[1].keep is True and rows[1].keeper_id == 1
        assert rows[2].keep is False and rows[2].keeper_id == 1
        assert rows[1].quality > rows[2].quality
        # quality tie -> lower doc id keeps
        assert rows[4].quality == rows[5].quality
        assert rows[4].keep is True and rows[5].keeper_id == 4
        # one keeper per group
        assert rows[1].group_id == rows[2].group_id
        assert rows[4].group_id == rows[5].group_id

    def test_string_ids_and_null_text(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "the same page body appears twice here"),
                ("b", "the same page body appears twice here"),
                ("c", None),
            ],
            "doc_id string, text string",
        )
        rows = {
            r.doc_id: r
            for r in dedup.dedup_canonical(df, threshold=0.3).collect()
        }
        assert set(rows) == {"a", "b"}
        assert rows["a"].keep is True and rows["b"].keeper_id == "a"


def test_dedup_canonical_keeper_invariants(spark, hot_corpus):
    """Exactly one keeper per group; the keeper's quality is the group
    maximum; every member points at its group's keeper; invariant
    under input repartitioning."""
    from alix_spark.textops import dedup as dd

    out = dd.dedup_canonical(hot_corpus, threshold=0.2).collect()
    assert out, "hot_corpus must produce at least one dup cluster"
    by_group = {}
    for r in out:
        by_group.setdefault(r.group_id, []).append(r)
    for members in by_group.values():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        k = keepers[0]
        assert all(m.keeper_id == k.doc_id for m in members)
        assert all(m.quality <= k.quality for m in members)
        # tie-break: no higher-or-equal quality with a smaller id
        assert all(
            (m.quality, -m.doc_id) <= (k.quality, -k.doc_id) for m in members
        )
    b = [
        tuple(r)
        for r in dd.dedup_canonical(
            hot_corpus.repartition(5), threshold=0.2
        ).collect()
    ]
    assert sorted(tuple(r) for r in out) == sorted(b)
