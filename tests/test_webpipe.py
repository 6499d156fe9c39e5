"""Unit tests for the web-pipeline hygiene operators (webpipe +
textstats.repetition_scores) on hand-built fixtures — the contract
oracle covers the distributional case; these pin the semantics the
synthetic corpus can't reach (repeated 5-grams, every URL dirt form,
PII edge shapes)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from alix_spark.textops import textstats, webpipe


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "doc_id long, url string")
    rows = df.select(webpipe.canonical_url(F.col("url")).alias("c")).collect()
    return [r["c"] for r in rows]


class TestCanonicalUrl:
    def test_scheme_host_lowered_ports_params_dropped(self, spark):
        got = _canon(
            spark,
            [
                "HTTP://WWW.Example.COM:80/a/b?utm_source=x&q=1#frag",
                "https://example.com:443/a/",
                "https://example.com:8443/a",  # non-default port kept
                "http://example.com/?utm_campaign=a&utm_medium=b",
                "http://example.com/p?page=2&utm_term=z",
            ],
        )
        assert got == [
            "http://www.example.com/a/b?q=1",
            "https://example.com/a",
            "https://example.com:8443/a",
            "http://example.com",
            "http://example.com/p?page=2",
        ]

    def test_literal_question_mark_in_values_is_data(self, spark):
        # RFC 3986: only the FIRST '?' delimits; later raw '?'s are
        # value data. A '?utm_' embedded in a redirect-target value
        # must survive, and both engines must agree on multiplicity.
        got = _canon(
            spark,
            [
                "http://a.com/p?ref=http://b.com/?utm_a=1&q=2",
                "http://a.com/p?a=x?utm_b=1&c=2?utm_d=3&e=4",
            ],
        )
        assert got == [
            "http://a.com/p?ref=http://b.com/?utm_a=1&q=2",
            "http://a.com/p?a=x?utm_b=1&c=2?utm_d=3&e=4",
        ]

    def test_utm_only_stripped_at_param_boundaries(self, spark):
        # 'utm_…=' in a PATH segment or inside another param's VALUE
        # is content, not tracking — stripping it collapses distinct
        # pages into one canon form
        got = _canon(
            spark,
            [
                "http://a.com/blog/utm_source=x/article-1",
                "http://a.com/blog/utm_source=y/article-2",
                "http://a.com/p?ref=utm_source=abc&q=1",
                "http://a.com/p?utm_source=a&utm_medium=b&q=1",
                "http://a.com/p?utm_source=a&utm_medium=b",
            ],
        )
        assert got == [
            "http://a.com/blog/utm_source=x/article-1",
            "http://a.com/blog/utm_source=y/article-2",
            "http://a.com/p?ref=utm_source=abc&q=1",
            "http://a.com/p?q=1",
            "http://a.com/p",
        ]

    def test_identical_after_canon_group_together(self, spark):
        df = spark.createDataFrame(
            [
                (3, "HTTP://A.com/x?utm_source=f"),
                (1, "http://a.com/x#top"),
                (2, "http://a.com/x/"),
                (9, "https://b.com/only"),
            ],
            "doc_id long, url string",
        )
        rows = webpipe.url_dup_groups(df).collect()
        assert len(rows) == 1
        assert rows[0]["canon_url"] == "http://a.com/x"
        assert rows[0]["n_urls"] == 3 and rows[0]["keeper"] == 1


class TestScrubPii:
    def test_counts_and_redaction(self, spark):
        text = (
            "write to jane.doe+x@corp.example.org or call +1-212-867-5309; "
            "server 192.168.1.10 and 10.0.0.1 are internal"
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = webpipe.scrub_pii(df).collect()[0]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 2)
        clean = (
            "write to <EMAIL> or call <PHONE>; "
            "server <IP> and <IP> are internal"
        )
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()

    def test_real_nanp_phone_shapes_match(self, spark):
        texts = [
            "call (212) 867-5309 today",
            "call (212)867-5309 today",
            "call 212-555-0199 today",
            "call 212.555.0199 today",
            "call +1 (212) 867-5309 today",
            "call 1-212-555-0199 today",  # bare long-distance prefix
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = webpipe.scrub_pii(df).collect()
        assert all(r["n_phones"] == 1 for r in rows)

    def test_phone_non_matches(self, spark):
        # dates, dotted versions, and digit runs around a phone-shaped
        # core must not be redacted
        texts = [
            "dated 2026-08-19 here",
            "version 1.2.3 rc4",
            "serial 12345-678-90123 unit",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = webpipe.scrub_pii(df).collect()
        assert all(r["n_phones"] == 0 for r in rows)

    def test_ip_octets_bounded(self, spark):
        texts = [
            "release 10.20.300.456 notes",  # out-of-range octets
            "grid 999.999.999.999 cells",
            "host 255.255.255.255 up",  # boundary: valid
            "host 0.0.0.0 any",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {r["doc_id"]: r["n_ips"] for r in webpipe.scrub_pii(df).collect()}
        assert got == {0: 0, 1: 0, 2: 1, 3: 1}

    def test_no_pii_is_all_zero(self, spark):
        df = spark.createDataFrame([(1, "nothing here")], "doc_id long, text string")
        r = webpipe.scrub_pii(df).collect()[0]
        assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (0, 0, 0)
        assert r["clean_md5"] == hashlib.md5(b"nothing here").hexdigest()


class TestRepetition:
    def test_loop_text_channels(self, spark):
        # "click here " * 6 -> 12 tokens; top bigram ('click','here') 6
        # of 11; dup 5-grams: 8 slots, 5 distinct
        df = spark.createDataFrame(
            [(1, "click here " * 6), (2, "a b c d e f g h")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in textstats.repetition_scores(df).collect()}
        r1 = rows[1]
        assert r1["n_tokens"] == 12
        assert r1["top2_frac"] == round(6 / 11, 6) or abs(r1["top2_frac"] - 6 / 11) < 1e-6
        assert r1["dup5_frac"] > 0.3
        r2 = rows[2]  # all-distinct text: no repetition anywhere
        assert r2["top2_frac"] == pytest.approx(1 / 7, abs=1e-6)
        assert r2["dup5_frac"] == 0.0

    def test_short_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "one two three four"), (2, "one two three four five")],
            "doc_id long, text string",
        )
        got = [r["doc_id"] for r in textstats.repetition_scores(df).collect()]
        assert got == [2]


class TestDomainStats:
    def test_rollup(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the and of to in is a", "en", "s1"),
                (2, "the the the the the", "en", "s1"),
                (3, "le la les de et un est", "fr", "s2"),
                (4, "", "fr", "s2"),  # tokenless: excluded
            ],
            "doc_id long, text string, lang string, source string",
        )
        rows = {r["source"]: r for r in webpipe.domain_stats(df).collect()}
        assert rows["s1"]["n_docs"] == 2 and rows["s2"]["n_docs"] == 1
        assert rows["s1"]["n_langs"] == 1
        assert rows["s1"]["sum_chars"] == len("the and of to in is a") + len(
            "the the the the the"
        )
        assert 0.0 < rows["s1"]["mean_quality"] < 1.0


class TestDupGroups:
    def test_transitive_chain_and_cliques(self, spark):
        from alix_spark.textops.dedup import dup_groups

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 7)],
            "doc_a long, doc_b long",
        )
        got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
        assert got == {
            1: 1, 2: 1, 3: 1, 7: 1,          # chain 1-2-3-7: transitive
            10: 10, 11: 10,
            20: 20, 21: 20, 22: 20, 23: 20,
        }

    def test_reversed_edge_direction_is_symmetric(self, spark):
        from alix_spark.textops.dedup import dup_groups

        pairs = spark.createDataFrame(
            [(5, 1), (2, 5)], "doc_a long, doc_b long"
        )
        got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
        assert got == {1: 1, 2: 1, 5: 1}

    def test_empty_pairs(self, spark):
        from alix_spark.textops.dedup import dup_groups

        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        assert dup_groups(pairs).count() == 0

    def test_adversarial_100_hop_path_converges(self, spark):
        """Pointer jumping (label ← label(label)) gives O(log D)
        convergence: a 100-hop path graph — diameter far beyond
        max_iter=25 under plain min-propagation — must converge
        instead of raising (VERDICT r04 ask #6). Run with a reversed,
        shuffled edge ordering so the result can't depend on input
        order."""
        import random

        from alix_spark.textops.dedup import dup_groups

        edges = [(i + 1, i) for i in range(100)]  # reversed direction
        random.Random(7).shuffle(edges)
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
        assert got == {i: 0 for i in range(101)}


class TestContamination:
    def test_overlap_counts(self, spark):
        ev = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], "doc_id long, text string"
        )
        train = spark.createDataFrame(
            [
                (1, "the quick brown fox runs away"),
                (2, "completely different text entirely here"),
                (3, "too short"),  # < 3 tokens: no trigram, no row
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in webpipe.contamination(train, ev).collect()}
        assert set(rows) == {1, 2}
        # doc1 trigrams: 'the quick brown', 'quick brown fox',
        # 'brown fox runs', 'fox runs away' — first two hit the eval set
        assert (rows[1]["n_grams"], rows[1]["n_hit"]) == (4, 2)
        assert rows[1]["hit_frac"] == pytest.approx(0.5, abs=1e-9)
        # clean docs stay in the report with zero hits
        assert (rows[2]["n_grams"], rows[2]["n_hit"]) == (3, 0)
        assert rows[2]["hit_frac"] == 0.0

    def test_duplicate_eval_docs_do_not_double_count(self, spark):
        ev = spark.createDataFrame(
            [(100, "a b c d"), (101, "a b c d")], "doc_id long, text string"
        )
        train = spark.createDataFrame([(1, "a b c x")], "doc_id long, text string")
        r = webpipe.contamination(train, ev).collect()[0]
        assert (r["n_grams"], r["n_hit"]) == (2, 1)  # only 'a b c' hits


class TestPackShards:
    def test_offsets_and_boundaries(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * n)) for i, n in enumerate([4, 3, 5, 2, 6])],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r for r in webpipe.pack_shards(docs, budget=7).collect()
        }
        # running offsets 0,4,7,12,14 -> shards 0,0,1,1,2
        assert [rows[i]["tok_offset"] for i in range(5)] == [0, 4, 7, 12, 14]
        assert [rows[i]["shard_id"] for i in range(5)] == [0, 0, 1, 1, 2]

    def test_partitioning_invariance(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(["tok"] * (1 + i % 9))) for i in range(200)],
            "doc_id long, text string",
        )
        one = webpipe.pack_shards(docs, budget=50, num_parts=1).collect()
        many = webpipe.pack_shards(docs, budget=50, num_parts=7).collect()
        assert [tuple(r) for r in one] == [tuple(r) for r in many]

    def test_hash_order_is_a_deterministic_permutation(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(["tok"] * (1 + i % 9))) for i in range(120)],
            "doc_id long, text string",
        )
        a = webpipe.pack_shards(docs, budget=40, order="hash", num_parts=1).collect()
        b = webpipe.pack_shards(docs, budget=40, order="hash", num_parts=5).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]  # split-invariant
        by_id = webpipe.pack_shards(docs, budget=40).collect()
        # same docs, same token totals, different packing order
        assert {r["doc_id"] for r in a} == {r["doc_id"] for r in by_id}
        assert sum(r["n_tokens"] for r in a) == sum(r["n_tokens"] for r in by_id)
        assert [r["tok_offset"] for r in a] != [r["tok_offset"] for r in by_id]
        # offsets are a dense prefix-sum permutation: sorted by offset,
        # each doc starts where the previous one ended
        seq = sorted(a, key=lambda r: r["tok_offset"])
        run = 0
        for r in seq:
            assert r["tok_offset"] == run
            run += r["n_tokens"]

    def test_bad_order_rejected(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            webpipe.pack_shards(docs, order="random")

    def test_empty_text_occupies_no_budget(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, ""), (3, "d e")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in webpipe.pack_shards(docs, budget=4).collect()}
        assert rows[2]["n_tokens"] == 0
        assert rows[2]["tok_offset"] == 3 and rows[3]["tok_offset"] == 3


class TestStratifiedSample:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
        )

    def test_rate_one_keeps_all_rate_zero_drops_all(self, spark):
        docs = self._docs(spark)
        got = webpipe.stratified_sample(docs, {"s0": 1.0, "s1": 0.0}).collect()
        strata = {r["stratum"] for r in got}
        assert strata == {"s0"}  # s1 zeroed, s2 at default 0.0
        assert len(got) == 30
        assert all(0 <= r["sample_key"] < (1 << 24) for r in got)

    def test_default_rate_applies_to_unknown_strata(self, spark):
        docs = self._docs(spark)
        got = webpipe.stratified_sample(docs, {"s0": 0.0}, default_rate=1.0).collect()
        assert {r["stratum"] for r in got} == {"s1", "s2"}
        assert len(got) == 60

    def test_deterministic_and_seed_sensitive(self, spark):
        docs = self._docs(spark)
        a = webpipe.stratified_sample(docs, {}, default_rate=0.5, seed="x").collect()
        b = webpipe.stratified_sample(docs, {}, default_rate=0.5, seed="x").collect()
        c = webpipe.stratified_sample(docs, {}, default_rate=0.5, seed="y").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert {r["doc_id"] for r in a} != {r["doc_id"] for r in c}

    def test_membership_is_monotone_in_rate(self, spark):
        # a doc kept at rate r stays kept at any r' > r (the property
        # that makes incremental mix re-weighting consistent)
        docs = self._docs(spark)
        lo = {r["doc_id"] for r in webpipe.stratified_sample(docs, {}, 0.3).collect()}
        hi = {r["doc_id"] for r in webpipe.stratified_sample(docs, {}, 0.7).collect()}
        assert lo <= hi


class TestLineDedup:
    def test_boilerplate_lines_removed_everywhere(self, spark):
        bp = "Subscribe to our newsletter"
        docs = spark.createDataFrame(
            [
                (1, f"real content one\n{bp}\nmore text"),
                (2, f"{bp}\nother content"),
                (3, f"unique doc\n  {bp}  "),  # padded: same trimmed form
                (4, "nothing shared here"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in webpipe.line_dedup(docs, min_df=3).collect()}
        assert rows[1]["n_removed"] == 1 and rows[1]["n_lines"] == 3
        assert rows[2]["n_removed"] == 1
        assert rows[3]["n_removed"] == 1  # trimmed match, padded original
        assert rows[4]["n_removed"] == 0
        assert (
            rows[1]["clean_md5"]
            == hashlib.md5(b"real content one\nmore text").hexdigest()
        )
        assert rows[4]["clean_md5"] == hashlib.md5(b"nothing shared here").hexdigest()

    def test_blank_lines_never_counted_or_removed(self, spark):
        docs = spark.createDataFrame(
            [(i, "keep\n\nalso keep") for i in range(1, 5)],
            "doc_id long, text string",
        )
        rows = webpipe.line_dedup(docs, min_df=5).collect()
        # blank line occurs in 4 docs but is exempt; nothing hits df 5
        assert all(r["n_removed"] == 0 for r in rows)
        expect = hashlib.md5(b"keep\n\nalso keep").hexdigest()
        assert all(r["clean_md5"] == expect for r in rows)

    def test_fully_boilerplate_doc_hashes_empty(self, spark):
        docs = spark.createDataFrame(
            [(1, "same line"), (2, "same line"), (3, "same line")],
            "doc_id long, text string",
        )
        rows = webpipe.line_dedup(docs, min_df=3).collect()
        assert all(r["n_removed"] == 1 for r in rows)
        assert all(r["clean_md5"] == hashlib.md5(b"").hexdigest() for r in rows)


class TestPassageChunks:
    def test_overlapping_windows_and_remainder(self, spark):
        import hashlib as h

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(10))),
                (2, " ".join(f"v{i}" for i in range(11))),
            ],
            "doc_id long, text string",
        )
        rows = webpipe.passage_chunks(docs, size=4, stride=3).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # len 10: starts 0,3,6 — chunk 2 (w6-w9) reaches the end, so
        # start 9 (wholly contained in chunk 2) is NOT emitted
        assert [(r["chunk_id"], r["n_tokens"]) for r in by_doc[1]] == [
            (0, 4), (1, 4), (2, 4),
        ]
        assert by_doc[1][1]["chunk_md5"] == h.md5(b"w3 w4 w5 w6").hexdigest()
        # len 11: start 9 DOES add v10 -> remainder chunk of 2
        assert [(r["chunk_id"], r["n_tokens"]) for r in by_doc[2]] == [
            (0, 4), (1, 4), (2, 4), (3, 2),
        ]
        assert by_doc[2][3]["chunk_md5"] == h.md5(b"v9 v10").hexdigest()

    def test_exact_multiple_has_no_empty_tail_chunk(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        rows = webpipe.passage_chunks(docs, size=3, stride=3).collect()
        # len 6, stride 3: starts 0,3 only — never a start AT len
        assert [(r["chunk_id"], r["n_tokens"]) for r in rows] == [(0, 3), (1, 3)]

    def test_default_stride_is_disjoint_and_args_validated(self, spark):
        docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        rows = webpipe.passage_chunks(docs, size=2).collect()
        assert [(r["chunk_id"], r["n_tokens"]) for r in rows] == [
            (0, 2), (1, 2), (2, 1),
        ]
        with pytest.raises(ValueError):
            webpipe.passage_chunks(docs, size=0)


class TestLmScores:
    def test_hand_computed_bigram_model(self, spark):
        import math

        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat ran"), (3, "a")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in textstats.lm_scores(docs).collect()}
        # train bigrams: (the,cat)x2 (cat,sat) (cat,ran); c1: the=2 cat=2
        # V=5; doc1 nll = -[ln(2.5/4.5) + ln(1.5/4.5)]/2
        assert set(rows) == {1, 2}  # doc 3 has no bigram
        expect = -(math.log(2.5 / 4.5) + math.log(1.5 / 4.5)) / 2
        assert rows[1]["n_bigrams"] == 2
        assert rows[1]["avg_nll"] == pytest.approx(expect, abs=1e-6)
        assert rows[2]["avg_nll"] == rows[1]["avg_nll"]  # symmetric corpus

    def test_out_of_domain_scores_higher(self, spark):
        train = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(10)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "zxq wvu tsr qpo nml kji")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r["avg_nll"]
            for r in textstats.lm_scores(docs, train_docs=train).collect()
        }
        assert rows[2] > rows[1]  # unseen bigrams cost more


class TestTrainingShard:
    def test_each_gate_drops_its_doc(self, spark):
        stop = "the and of to in is a"  # stop-heavy base for quality
        good = f"{stop} quick brown fox jumps over lazy dog near river"
        dup = good + " tail"  # near-dup of good (high shingle overlap)
        loopy = ("spam ham " * 20).strip()  # top2 repetition
        junk = "zxq zxq wvu wvu tsr"  # no stopwords, low ttr: quality .38
        docs = spark.createDataFrame(
            [(1, good), (2, dup), (3, loopy), (4, junk), (5, "tiny doc")],
            "doc_id long, text string",
        )
        kept = webpipe.training_shard(
            docs, min_quality=0.5, max_top2=0.4, jaccard_threshold=0.5
        )
        rows = {r["doc_id"]: r for r in kept.collect()}
        # 2 = near-dup non-keeper, 3 = repetition, 4 = quality,
        # 5 = sub-5-token; only the keeper survives
        assert set(rows) == {1}
        import hashlib

        assert rows[1]["clean_md5"] == hashlib.md5(good.encode()).hexdigest()
        assert rows[1]["n_tokens"] == len(good.split())


class TestNormalizeText:
    def _norm(self, spark, texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r for r in textstats.normalize_text(df).collect()
        }

    def test_nfc_composes_and_md5_matches(self, spark):
        rows = self._norm(spark, ["café noir"])
        r = rows[0]
        assert r["n_chars_raw"] == 10 and r["n_chars_norm"] == 9
        assert r["changed"] is True
        assert (
            r["norm_md5"]
            == hashlib.md5("café noir".encode("utf-8")).hexdigest()
        )

    def test_format_chars_dropped_controls_squashed(self, spark):
        rows = self._norm(
            spark,
            [
                "zero​width­gone",
                "bell\x07here",
                "a\r\nb\rc",
                "x  \t y",
                " lead and trail \t",
            ],
        )
        assert rows[0]["norm_md5"] == hashlib.md5(b"zerowidthgone").hexdigest()
        assert rows[1]["norm_md5"] == hashlib.md5(b"bell here").hexdigest()
        assert rows[2]["norm_md5"] == hashlib.md5(b"a\nb\nc").hexdigest()
        assert rows[3]["norm_md5"] == hashlib.md5(b"x y").hexdigest()
        assert rows[4]["norm_md5"] == hashlib.md5(b"lead and trail").hexdigest()

    def test_clean_text_unchanged(self, spark):
        rows = self._norm(spark, ["already clean text"])
        assert rows[0]["changed"] is False
        assert rows[0]["n_chars_raw"] == rows[0]["n_chars_norm"]

    def test_null_text_yields_null_channels(self, spark):
        df = spark.createDataFrame(
            [(1, "ok"), (2, None)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in textstats.normalize_text(df).collect()}
        assert rows[2]["norm_md5"] is None
        assert rows[2]["n_chars_raw"] is None
        assert rows[2]["changed"] is None
        assert rows[1]["changed"] is False


class TestClassifierScores:
    @staticmethod
    def _w(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % 2001 - 1000

    def test_hand_computed_weights(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "solo")], "doc_id long, text string"
        )
        rows = {
            r["doc_id"]: r for r in textstats.classifier_scores(df).collect()
        }
        expect = self._w("alpha beta") + self._w("beta gamma")
        assert set(rows) == {1}  # sub-2-token doc has no bigram
        assert rows[1]["n_bigrams"] == 2
        assert rows[1]["w_sum"] == expect
        assert rows[1]["keep"] is (expect > 0)
        assert rows[1]["clf_score"] == pytest.approx(expect / 2000.0, abs=1e-6)

    def test_multiplicity_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "x y x y")], "doc_id long, text string"
        )
        r = textstats.classifier_scores(df).collect()[0]
        assert r["n_bigrams"] == 3
        assert r["w_sum"] == 2 * self._w("x y") + self._w("y x")


class TestZipfProfile:
    def test_slope_matches_numpy_ols(self, spark):
        import numpy as np

        # f = 48/rank exactly: ln f is linear in ln rank, slope -1
        words = []
        for i, f in enumerate([48, 24, 16, 12]):
            words += [f"w{i}"] * f
        df = spark.createDataFrame(
            [(1, " ".join(words), "s1")], "doc_id long, text string, source string"
        )
        r = textstats.zipf_profile(df).collect()[0]
        freqs = np.array([48.0, 24.0, 16.0, 12.0])
        ranks = np.arange(1, 5, dtype=float)
        slope, _ = np.polyfit(np.log(ranks), np.log(freqs), 1)
        assert r["n_terms"] == 4 and r["top_freq"] == 48
        assert r["slope"] == pytest.approx(slope, abs=1e-6)
        assert r["slope"] == pytest.approx(-1.0, abs=1e-6)
        assert r["r2"] == pytest.approx(1.0, abs=1e-6)

    def test_rank_ties_break_term_asc_and_top_n(self, spark):
        df = spark.createDataFrame(
            [(1, "b b a a c", "s1")], "doc_id long, text string, source string"
        )
        r = textstats.zipf_profile(df, top_n=2).collect()[0]
        # ranks: a=1, b=2 (tie at freq 2 broken term-asc), c cut by top_n
        assert r["n_terms"] == 2 and r["top_freq"] == 2


class TestUrlFilter:
    def _run(self, spark, urls, **kw):
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
        )
        return {r["doc_id"]: r for r in webpipe.url_filter(df, **kw).collect()}

    def test_rules_and_precedence(self, spark):
        rows = self._run(
            spark,
            [
                "https://ok.site.com/a/b?x=1",
                "https://spam.example.net/a",  # regdom blocked
                "https://sub.deep.spam.example.net/a/b/c/d/e/f/g/h",  # blocked wins over depth
                "https://ok.site.com/a/b/c/d/e/f/g",  # depth 7
                "https://ok.site.com/p?a=1&b=2&c=3&d=4",  # 4 params
                "https://ok.site.com/p?a=" + "x" * 300,  # long
            ],
            blocklist=["spam.example.net"],
            max_depth=6,
            max_params=3,
            max_len=200,
        )
        assert rows[0]["blocked"] is False and rows[0]["reason"] is None
        assert rows[1]["reason"] == "blocked_domain"
        assert rows[2]["reason"] == "blocked_domain"  # subdomain + first-match
        assert rows[3]["reason"] == "depth"
        assert rows[4]["reason"] == "params"
        assert rows[5]["reason"] == "length"

    def test_exact_host_blocks_but_sibling_survives(self, spark):
        rows = self._run(
            spark,
            ["https://ads.site.org/x", "https://www.site.org/x"],
            blocklist=["ads.site.org"],
        )
        assert rows[0]["blocked"] is True
        assert rows[1]["blocked"] is False

    def test_empty_blocklist_structural_only(self, spark):
        rows = self._run(
            spark, ["https://a.com/" + "s/" * 10], blocklist=[], max_depth=6
        )
        assert rows[0]["reason"] == "depth"


class TestLengthOutliers:
    def test_discrete_thresholds_inclusive(self, spark):
        # 20 docs with 1..20 tokens; p10/p90 -> k_lo=2, k_hi=18
        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * i)) for i in range(1, 21)],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in webpipe.length_outliers(docs, lo_pct=10, hi_pct=90).collect()
        }
        assert rows[1]["t_lo"] == 2 and rows[1]["t_hi"] == 18
        assert rows[1]["reason"] == "short"
        assert rows[2]["outlier"] is False  # threshold inclusive
        assert rows[18]["outlier"] is False
        assert rows[19]["reason"] == "long"
        assert rows[20]["reason"] == "long"

    def test_duplicate_lengths_histogram(self, spark):
        # histogram path: many docs share a length
        docs = spark.createDataFrame(
            [(i, "a b c") for i in range(10)] + [(100, "a"), (101, " ".join(["w"] * 50))],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in webpipe.length_outliers(docs, lo_pct=10, hi_pct=90).collect()
        }
        # n=12, k_lo=ceil(1.2)=2 -> t_lo=3 (2nd smallest), k_hi=ceil(10.8)=11 -> t_hi=3
        assert rows[0]["t_lo"] == 3 and rows[0]["t_hi"] == 3
        assert rows[100]["reason"] == "short"
        assert rows[101]["reason"] == "long"
        assert rows[5]["outlier"] is False


class TestReviewBatch18:
    def test_zwnj_between_base_and_mark_composes(self, spark):
        # format-char strip runs BEFORE NFC: 'e' ZWNJ U+0301 and a
        # plain precomposed 'é' must hash identically
        df = spark.createDataFrame(
            [(1, "caf e‌́ x"), (2, "caf é x")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in textstats.normalize_text(df).collect()}
        assert rows[1]["norm_md5"] == rows[2]["norm_md5"]

    def test_fragment_question_mark_is_not_a_query(self, spark):
        df = spark.createDataFrame(
            [(1, "https://app.example.com/#/route?a=1&b=2&c=3&d=4")],
            "doc_id long, url string",
        )
        r = webpipe.url_filter(df, max_params=3).collect()[0]
        assert r["blocked"] is False  # RFC 3986: that '?' is fragment data

    def test_scheme_relative_url_hits_blocklist(self, spark):
        df = spark.createDataFrame(
            [(1, "//spam.example.net/x"), (2, "//ok.example.org/x")],
            "doc_id long, url string",
        )
        rows = {
            r["doc_id"]: r
            for r in webpipe.url_filter(df, blocklist=["spam.example.net"]).collect()
        }
        assert rows[1]["reason"] == "blocked_domain"
        assert rows[2]["blocked"] is False

    def test_duplicate_rows_gate_per_row(self, spark):
        df = spark.createDataFrame(
            [(1, "https://a.com/x"), (1, "https://a.com/x")],
            "doc_id long, url string",
        )
        out = webpipe.url_filter(df).collect()
        assert len(out) == 2  # per-row gate, never a dedup


class TestScriptProfile:
    def test_counts_and_dominance(self, spark):
        df = spark.createDataFrame(
            [
                (1, "hello мир"),
                (2, "привет мир как"),
                (3, "漢字 かな"),
                (4, "1234 !!"),
                (5, "αβγ"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in textstats.script_profile(df).collect()}
        assert rows[1]["latin"] == 5 and rows[1]["cyrillic"] == 3
        assert rows[1]["script_pred"] == "latin"
        assert rows[2]["script_pred"] == "cyrillic"
        assert rows[3]["script_pred"] == "cjk" and rows[3]["cjk"] == 4
        assert rows[4]["script_pred"] is None and rows[4]["n_letters"] == 0
        assert rows[5]["script_pred"] == "greek"

    def test_tie_breaks_name_asc(self, spark):
        df = spark.createDataFrame([(1, "ab мы")], "doc_id long, text string")
        r = textstats.script_profile(df).collect()[0]
        # latin 2, cyrillic 2 -> tie broken by script name ascending
        assert r["script_pred"] == "cyrillic"


class TestDataSplit:
    def test_assignment_matches_md5_buckets(self, spark):
        docs = spark.createDataFrame(
            [(i, "x") for i in range(200)], "doc_id long, text string"
        )
        rows = webpipe.data_split(docs, seed="alix").collect()
        for r in rows:
            b = int(hashlib.md5(f"alix:{r['doc_id']}".encode()).hexdigest()[:15], 16) % 100
            assert r["bucket"] == b
            want = "train" if b < 98 else ("valid" if b < 99 else "test")
            assert r["split"] == want

    def test_custom_splits_and_validation(self, spark):
        docs = spark.createDataFrame(
            [(i, "x") for i in range(50)], "doc_id long, text string"
        )
        rows = webpipe.data_split(
            docs, splits=[("a", 50), ("b", 50)], seed="s"
        ).collect()
        assert {r["split"] for r in rows} <= {"a", "b"}
        assert all(
            (r["split"] == "a") == (r["bucket"] < 50) for r in rows
        )
        with pytest.raises(ValueError):
            webpipe.data_split(docs, splits=[("a", 60), ("b", 50)])
        with pytest.raises(ValueError):
            webpipe.data_split(docs, splits=[("a", 100), ("b", 0)])

    def test_membership_stable_under_corpus_growth(self, spark):
        small = spark.createDataFrame(
            [(i, "x") for i in range(30)], "doc_id long, text string"
        )
        big = spark.createDataFrame(
            [(i, "x") for i in range(60)], "doc_id long, text string"
        )
        a = {r["doc_id"]: r["split"] for r in webpipe.data_split(small).collect()}
        b = {r["doc_id"]: r["split"] for r in webpipe.data_split(big).collect()}
        assert all(b[k] == v for k, v in a.items())


class TestReviewBatch19:
    def test_symbol_only_doc_gets_null_pred(self, spark):
        df = spark.createDataFrame(
            [(1, "5 × 3 ÷ 2"), (2, None)], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in textstats.script_profile(df).collect()}
        assert rows[1]["n_letters"] == 0 and rows[1]["script_pred"] is None
        assert rows[2]["script_pred"] is None and rows[2]["n_letters"] is None

    def test_md5_key_identical_across_ops(self, spark):
        # pack_shards(order=hash), data_split and stratified_sample all
        # derive from ONE helper; pin the key value itself
        docs = spark.createDataFrame([(7, "x")], "doc_id long, text string")
        r = webpipe.data_split(docs, seed="alix").collect()[0]
        want = int(hashlib.md5(b"alix:7").hexdigest()[:15], 16) % 100
        assert r["bucket"] == want
        with pytest.raises(ValueError):
            webpipe.md5_key("s", "doc_id", 16)


class TestStringIdsNewOps:
    """Round-3 hardening contract: every textops operator tolerates
    string doc ids (and NULL text where defined) — the new gates too."""

    def test_all_new_gates_accept_string_ids(self, spark):
        docs = spark.createDataFrame(
            [("a", "hello world one two three"), ("b", None)],
            "doc_id string, text string",
        )
        got = {r["doc_id"] for r in textstats.normalize_text(docs).collect()}
        assert got == {"a", "b"}
        assert textstats.classifier_scores(docs).collect()[0]["doc_id"] == "a"
        assert {r["doc_id"] for r in textstats.script_profile(docs).collect()} == {"a", "b"}
        lo = {r["doc_id"]: r for r in webpipe.length_outliers(docs).collect()}
        assert set(lo) == {"a", "b"} and lo["b"]["n_tokens"] == 0
        ds = {r["doc_id"]: r for r in webpipe.data_split(docs).collect()}
        assert ds["a"]["bucket"] == int(hashlib.md5(b"alix:a").hexdigest()[:15], 16) % 100
        urls = spark.createDataFrame(
            [("a", "https://x.com/p")], "doc_id string, url string"
        )
        assert webpipe.url_filter(urls).collect()[0]["doc_id"] == "a"
        mix_docs = spark.createDataFrame(
            [("a", "hello world one two three", "s1"), ("b", None, "s1")],
            "doc_id string, text string, source string",
        )
        mr = webpipe.mix_report(mix_docs).collect()
        # the NULL-text doc lands in a cell with 0 tokens, not kept
        assert sum(r["n_docs"] for r in mr) == 2
        assert sum(r["sum_tokens"] for r in mr) == 5
        assert sum(r["kept_tokens"] for r in mr) in (0, 5)


class TestMixReport:
    def test_totals_and_gate_counts(self, spark):
        def kept(text):
            toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower()) if t]
            w = sum(
                int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:4], 16) % 2001 - 1000
                for a, b in zip(toks, toks[1:])
            )
            return w > 0 and len(toks) >= 2

        rows_in = [
            (1, "alpha beta gamma delta", "s1"),
            (2, "epsilon zeta eta", "s1"),
            (3, "solo", "s2"),  # <2 tokens: never kept
            (4, "theta iota kappa", "s2"),
        ]
        docs = spark.createDataFrame(rows_in, "doc_id long, text string, source string")
        got = {
            (r["source"], r["split"]): r
            for r in webpipe.mix_report(docs, seed="alix").collect()
        }
        # every doc lands in exactly one (source, split) cell
        assert sum(r["n_docs"] for r in got.values()) == 4
        assert sum(r["sum_tokens"] for r in got.values()) == 4 + 3 + 1 + 3
        want_kept = sum(1 for _, t, _ in rows_in if kept(t))
        assert sum(r["n_kept"] for r in got.values()) == want_kept
        # kept_tokens only counts gate survivors
        for r in got.values():
            assert r["kept_tokens"] <= r["sum_tokens"]
            assert r["n_kept"] <= r["n_docs"]

    def test_split_validation(self, spark):
        docs = spark.createDataFrame([(1, "x", "s")], "doc_id long, text string, source string")
        with pytest.raises(ValueError):
            webpipe.mix_report(docs, splits=[("a", 99)])


class TestTokenEntropy:
    def test_known_values_and_null_contract(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a a a"), (3, None), (4, "a b c d")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in textstats.token_entropy(df).collect()}
        assert (rows[1]["n_tokens"], rows[1]["n_types"]) == (4, 2)
        assert rows[1]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
        # single-type doc pinned to EXACTLY 0.0 (the systematic
        # floor-boundary half-case)
        assert rows[2]["entropy"] == 0.0
        # zero evidence -> zero counts, NULL entropy (lang-ID contract)
        assert (rows[3]["n_tokens"], rows[3]["n_types"]) == (0, 0)
        assert rows[3]["entropy"] is None
        # uniform distribution -> ln(k)
        assert rows[4]["entropy"] == pytest.approx(math.log(4), abs=1e-6)

    def test_no_python_stage(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = (
            textstats.token_entropy(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


class TestHeapsProfile:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_cumulative_points_match_numpy_ols(self, spark):
        import numpy as np

        # s1 docs in id order: cum_toks 2,4,5 ; cum_vocab 2,3,4
        df = self._df(
            spark, [(1, "a b", "s1"), (2, "a c", "s1"), (3, "d", "s1")]
        )
        r = textstats.heaps_profile(df).collect()[0]
        slope, _ = np.polyfit(
            np.log([2.0, 4.0, 5.0]), np.log([2.0, 3.0, 4.0]), 1
        )
        assert (r["n_points"], r["total_tokens"], r["vocab"]) == (3, 5, 4)
        assert r["beta"] == pytest.approx(slope, abs=2e-6)

    def test_partitioning_invariance(self, spark):
        # the distributed prefix sum must not depend on the range
        # split: same rows, different input partitioning / num_parts
        rows = [
            (i, f"w{i % 7} w{i % 3} common", f"s{i % 2}") for i in range(40)
        ]
        a = [
            tuple(r)
            for r in textstats.heaps_profile(
                self._df(spark, rows), num_parts=1
            ).collect()
        ]
        b = [
            tuple(r)
            for r in textstats.heaps_profile(
                self._df(spark, rows).repartition(13), num_parts=5
            ).collect()
        ]
        assert a == b and len(a) == 2

    def test_string_ids_and_null_text(self, spark):
        df = spark.createDataFrame(
            [("a", "x y", "s1"), ("b", None, "s1"), ("c", "x z", "s1")],
            "doc_id string, text string, source string",
        )
        r = textstats.heaps_profile(df).collect()[0]
        # the NULL-text doc contributes a zero-growth point
        assert (r["n_points"], r["total_tokens"], r["vocab"]) == (3, 4, 3)

    def test_null_source_excluded(self, spark):
        # a record without a source attribution has no curve to belong
        # to — excluded, matching the oracle's WHERE source IS NOT NULL
        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "a c", None), (3, "d", "s1")],
            "doc_id long, text string, source string",
        )
        rows = textstats.heaps_profile(df).collect()
        assert [r["source"] for r in rows] == ["s1"]
        assert (rows[0]["n_points"], rows[0]["total_tokens"]) == (2, 3)

    def test_integer_group_key(self, spark):
        # the prefix-sum engine derives output types from the input
        # schema, so non-string group keys work
        df = spark.createDataFrame(
            [(1, "a b", 7), (2, "a c", 7), (3, "q", 9)],
            "doc_id long, text string, source long",
        )
        rows = {r["source"]: r for r in textstats.heaps_profile(df).collect()}
        assert rows[7]["vocab"] == 3 and rows[9]["vocab"] == 1

    def test_pretokenized_column_reused(self, spark):
        df = spark.createDataFrame(
            [(1, "ignored", "s1")], "doc_id long, text string, source string"
        ).withColumn("toks", F.split(F.lit("a b a"), " "))
        r = textstats.heaps_profile(df, toks_col="toks").collect()[0]
        assert (r["total_tokens"], r["vocab"]) == (3, 2)


class TestGroupedPrefixSums:
    def test_null_group_key_rejected(self, spark):
        from alix_spark.util import grouped_prefix_sums

        df = spark.createDataFrame(
            [("s1", 1, 2), (None, 2, 3)], "g string, o long, v long"
        )
        with pytest.raises(ValueError, match="NULL group key"):
            grouped_prefix_sums(df, ["o"], ["v"], group_cols=["g"]).collect()

    def test_null_sum_value_rejected(self, spark):
        """Review batch 34: a NULL sum value became NaN in the Arrow
        cumsum while the totals pass counted it as 0 — silently
        diverging from the documented SQL window; reject like NULL
        group keys."""
        import pytest as _pytest

        from alix_spark.util import grouped_prefix_sums

        df = spark.createDataFrame(
            [("s1", 1, 2), ("s1", 2, None)], "g string, o long, v long"
        )
        with _pytest.raises(Exception, match="NULL value in sum column"):
            grouped_prefix_sums(df, ["o"], ["v"], group_cols=["g"]).collect()

    def test_global_and_grouped_exclusive_sums(self, spark):
        from alix_spark.util import grouped_prefix_sums

        df = spark.createDataFrame(
            [("s1", 1, 10), ("s1", 2, 20), ("s2", 1, 5), ("s2", 3, 7)],
            "g string, o long, v long",
        )
        got = {
            (r["g"], r["o"]): r["before_v"]
            for r in grouped_prefix_sums(
                df, ["o"], ["v"], group_cols=["g"], num_parts=3
            ).collect()
        }
        assert got == {("s1", 1): 0, ("s1", 2): 10, ("s2", 1): 0, ("s2", 3): 5}
        glob = {
            r["o"]: r["before_v"]
            for r in grouped_prefix_sums(
                df.groupBy("o").agg(F.sum("v").cast("long").alias("v")),
                ["o"],
                ["v"],
                num_parts=2,
            ).collect()
        }
        assert glob == {1: 0, 2: 15, 3: 35}


class TestGopherRules:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in textstats.gopher_rules(df).collect()}

    def test_keep_and_each_gate_direction(self, spark):
        good = "the cat and dog run fast " * 10  # 60 words, 2 stop kinds
        got = self._run(
            spark,
            [
                (1, good),
                (2, "\n".join("- item" for _ in range(20))),  # all bullets
                (3, "a...\nb...\nc"),  # 2/3 lines end ...
                (4, good + " " + " ".join("#" * 1 for _ in range(30))),
                (5, "the cat and dog"),  # too short
                (6, "123 456 " * 30),  # no alpha words
                (7, "supercalifragilisticexpialidocious " * 60),
                (8, None),
            ],
        )
        assert got[1]["keep"] is True
        assert got[1]["n_words"] == 60 and got[1]["n_stop_kinds"] == 2
        assert got[2]["keep"] is False and got[2]["bullet_line_ratio"] == 1.0
        assert got[3]["keep"] is False and got[3]["ellipsis_line_ratio"] == 0.666667
        assert got[4]["keep"] is False  # 30 symbols vs 90 words
        assert got[5]["keep"] is False and got[5]["n_words"] == 4
        assert got[6]["keep"] is False and got[6]["alpha_ratio"] == 0.0
        assert got[7]["keep"] is False and got[7]["mean_word_len"] == 34.0
        assert got[8]["keep"] is False and got[8]["n_words"] == 0
        assert got[8]["mean_word_len"] is None

    def test_stop_kinds_are_distinct_words_not_occurrences(self, spark):
        got = self._run(spark, [(1, "the the the the cat")])
        assert got[1]["n_stop_kinds"] == 1

    def test_boundary_exactness_at_symbol_gate(self, spark):
        # exactly 10% symbols passes (integer gate: 10*s <= w), one
        # more symbol fails — no float half-case can flip this
        base = "the cats and dogs run " * 10  # 50 words, 3.4 chars avg
        got = self._run(
            spark,
            [(1, base + "# # # # #"), (2, base + "# # # # # #")],
        )
        assert got[1]["n_words"] == 55 and got[1]["keep"] is True
        assert got[2]["keep"] is False

    def test_symbol_gate_is_per_symbol_not_combined(self, spark):
        # Gopher A1.1 applies the 0.1 threshold to '#' and ellipsis
        # SEPARATELY: 6% hash + 6% ellipsis passes (a combined-sum
        # gate would see 12% and wrongly reject)
        base = "the cats and dogs run " * 20  # 100 words
        # symbols mid-text so the LINE-end ellipsis rule stays out of
        # the picture (the line must not end with '...')
        text = base + "# # # # # # ... ... ... ... ... ... and so the story ends"
        got = self._run(spark, [(1, text)])
        assert got[1]["n_words"] == 117
        assert got[1]["hash_ratio"] == got[1]["ellipsis_ratio"]
        assert got[1]["ellipsis_line_ratio"] == 0.0
        assert got[1]["keep"] is True


class TestWinnowing:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return textstats.winnowing(df, **kw).collect()

    def test_identical_token_stream_selects_rightmost_per_window(self, spark):
        # 10 identical tokens -> 8 identical shingles; every window's
        # min ties everywhere and the RIGHTMOST wins (standard
        # winnowing tie rule): window i selects i+3 -> positions 3..7
        rows = self._run(spark, [(1, "a a a a a a a a a a")])
        assert [r["pos"] for r in rows] == list(range(3, 8))
        assert len({r["fp"] for r in rows}) == 1

    def test_coverage_every_window_has_a_fingerprint(self, spark):
        # paper guarantee: the selected set hits every w-window
        text = " ".join(f"w{(i * 7) % 13}" for i in range(40))
        rows = self._run(spark, [(1, text)])
        sel = sorted(r["pos"] for r in rows)
        m, we = 38, 4
        for i in range(m - we + 1):
            assert any(i <= p <= i + we - 1 for p in sel)

    def test_shared_run_guarantee(self, spark):
        # two docs sharing >= w + n - 1 = 6 consecutive tokens must
        # share at least one fingerprint VALUE
        shared = "one two three four five six"
        rows = self._run(
            spark, [(1, "xx yy " + shared), (2, shared + " zz qq")]
        )
        fp1 = {r["fp"] for r in rows if r["doc_id"] == 1}
        fp2 = {r["fp"] for r in rows if r["doc_id"] == 2}
        assert fp1 & fp2

    def test_short_and_null_docs(self, spark):
        rows = self._run(spark, [(1, "a b c d"), (2, "a b"), (3, None)])
        by = {}
        for r in rows:
            by.setdefault(r["doc_id"], []).append(r)
        # doc1: 2 shingles < w -> ONE window over both -> exactly 1 fp
        assert len(by[1]) == 1
        # doc2/doc3: no shingle at all -> no rows
        assert 2 not in by and 3 not in by

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError):
            textstats.winnowing(df, w=0)
        with pytest.raises(ValueError):
            textstats.winnowing(df, n=0)


class TestCcnetBuckets:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        return {r["doc_id"]: r for r in webpipe.ccnet_buckets(df).collect()}

    def test_tercile_membership_tracks_lm_score(self, spark):
        # 9 docs, one source, 3 sharply separated nll levels: the
        # corpus-dominant bigram stream scores lowest (head), a rarer
        # repeated stream mid, per-doc singleton bigrams highest (tail)
        low = "a b " * 20
        mid = "c d e " * 13
        rows = [(i, low, "s1") for i in range(3)]
        rows += [(10 + i, mid, "s1") for i in range(3)]
        rows += [
            (20 + i, " ".join(f"u{i}x{j}" for j in range(20)), "s1")
            for i in range(3)
        ]
        got = self._run(spark, rows)
        assert {got[i]["bucket"] for i in range(3)} == {"head"}
        assert {got[10 + i]["bucket"] for i in range(3)} == {"middle"}
        assert {got[20 + i]["bucket"] for i in range(3)} == {"tail"}
        assert got[0]["avg_nll"] < got[10]["avg_nll"] < got[20]["avg_nll"]

    def test_single_bin_source_is_all_head(self, spark):
        # every doc identical -> one bin -> t1 = t2 = bin -> all head
        got = self._run(spark, [(i, "p q r p q r", "s1") for i in range(5)])
        assert {r["bucket"] for r in got.values()} == {"head"}

    def test_null_source_and_bigramless_docs_excluded(self, spark):
        got = self._run(
            spark,
            [
                (1, "a b c d e f", "s1"),
                (2, "a", "s1"),  # no bigram: no LM evidence
                (3, "a b c d e f", None),  # no stratum
            ],
        )
        assert set(got) == {1}

    def test_buckets_partition_each_source_in_thirds(self, spark):
        # doc i mixes 2i+1 corpus-common bigrams with exactly one
        # per-doc singleton bigram: avg_nll is strictly decreasing in
        # i (common weight grows), giving 6 distinct bins -> 2/2/2
        rows = [
            (i, "x y " * (i + 1) + f"u{i}", "s1") for i in range(6)
        ]
        got = self._run(spark, rows)
        from collections import Counter

        nlls = [got[i]["avg_nll"] for i in range(6)]
        assert nlls == sorted(nlls, reverse=True)
        c = Counter(r["bucket"] for r in got.values())
        assert c == {"head": 2, "middle": 2, "tail": 2}
        # ascending nll maps head -> tail: the LOW-nll docs are head
        assert got[5]["bucket"] == "head" and got[0]["bucket"] == "tail"

    def test_bins_per_nat_validated(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "s1")], "doc_id long, text string, source string"
        )
        with pytest.raises(ValueError):
            webpipe.ccnet_buckets(df, bins_per_nat=0)


class TestSamplingWeights:
    def test_alpha_scaling_boosts_small_sources(self, spark):
        # s1: 8 one-word docs x 8 tokens? no: 2 docs of 8 tokens = 16;
        # s2: 2 docs of 2 tokens = 4 -> p_raw 0.8/0.2; alpha=0.5 over
        # token counts 16 and 4: weights 4/(4+2)=0.666667, 2/6=0.333333
        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h", "s1"),
                (2, "a b c d e f g h", "s1"),
                (3, "a b", "s2"),
                (4, "a b", "s2"),
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r["source"]: r
            for r in webpipe.sampling_weights(df, alpha=0.5).collect()
        }
        assert got["s1"]["n_tokens"] == 16 and got["s2"]["n_tokens"] == 4
        assert got["s1"]["p_raw"] == 0.8 and got["s2"]["p_raw"] == 0.2
        assert got["s1"]["weight"] == 0.666667
        assert got["s2"]["weight"] == 0.333333

    def test_alpha_one_is_raw_share_and_null_handling(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c", "s1"),
                (2, None, "s1"),  # NULL text: 0 tokens, still counted
                (3, "a", "s2"),
                (4, "x y", None),  # no stratum: excluded
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r["source"]: r for r in webpipe.sampling_weights(df, alpha=1.0).collect()
        }
        assert set(got) == {"s1", "s2"}
        assert got["s1"]["n_docs"] == 2 and got["s1"]["n_tokens"] == 3
        assert got["s1"]["p_raw"] == got["s1"]["weight"] == 0.75

    def test_alpha_validated(self, spark):
        df = spark.createDataFrame([(1, "a", "s")], "doc_id long, text string, source string")
        with pytest.raises(ValueError):
            webpipe.sampling_weights(df, alpha=0.0)

    def test_vertical_tab_is_whitespace_on_both_engines(self, spark):
        # Java \s includes \x0B, RE2's does not: the explicit class
        # must make BOTH engines count 'a<VT>b' as 2 tokens
        import duckdb

        from alix_spark.util import NONSPACE_RE

        df = spark.createDataFrame(
            [(1, "a\x0bb", "s1")], "doc_id long, text string, source string"
        )
        got = webpipe.sampling_weights(df).collect()[0]
        assert got["n_tokens"] == 2
        duck = duckdb.sql(
            "select len(regexp_extract_all('a' || chr(11) || 'b', "
            f"'{NONSPACE_RE}'))"
        ).fetchone()[0]
        assert duck == 2


class TestUnimaxSampling:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def test_hand_computed_boundary(self, spark):
        """Literal UniMax walk (Chung et al. 2023), N=2, B=20 over
        token counts a=1, b=5, c=10 (ascending): step 1 — a's full
        2-epoch supply 2 fits the uniform share 20/3, capped at 2;
        step 2 — b's supply 10 > (20−2)/2 = 9, so b and c split the
        remaining 18 evenly at tau=9. Weights 2/20, 9/20, 9/20."""
        docs = self._docs(spark, [
            (0, "a", "t"),
            (1, "b", "t t t t t"),
            (2, "c", "t t t t t"),
            (3, "c", "t t t t t"),
        ])
        rows = {r.lang: r for r in webpipe.unimax_sampling(
            docs, epochs=2, budget_tokens=20
        ).collect()}
        assert (rows["a"].capped, rows["b"].capped, rows["c"].capped) == (
            True, False, False
        )
        assert rows["a"].alloc == 2.0 and rows["a"].weight == 0.1
        assert rows["b"].alloc == 9.0 and rows["b"].weight == 0.45
        assert rows["c"].alloc == 9.0 and rows["c"].weight == 0.45
        assert rows["c"].n_tokens == 10 and rows["c"].n_docs == 2

    def test_all_capped_when_budget_exceeds_supply(self, spark):
        """B >= total N-epoch supply: every language is capped at its
        own supply, the total allocation is the supply sum (budget
        deliberately underused — the epoch cap is the whole point)."""
        docs = self._docs(spark, [
            (0, "a", "t"), (1, "b", "t t"), (2, "c", "t t t"),
        ])
        rows = {r.lang: r for r in webpipe.unimax_sampling(
            docs, epochs=1, budget_tokens=6
        ).collect()}
        assert all(r.capped for r in rows.values())
        # weights proportional to supply over the all-caps total 6
        # (round6 = floor(x*1e6 + 0.5): 1/6 -> 0.166667, 2/6 -> 0.333333)
        assert rows["a"].weight == 0.166667
        assert rows["b"].weight == 0.333333
        assert rows["c"].weight == 0.5

    def test_null_lang_and_null_text(self, spark):
        docs = self._docs(spark, [
            (0, "a", "t t"), (1, None, "t t t"), (2, "a", None),
        ])
        rows = webpipe.unimax_sampling(
            docs, epochs=1, budget_tokens=10
        ).collect()
        assert len(rows) == 1
        assert rows[0].lang == "a" and rows[0].n_tokens == 2
        assert rows[0].n_docs == 2  # the NULL-text doc counts, at 0 tokens

    def test_partitioning_invariance(self, spark):
        docs = self._docs(spark, [
            (i, f"l{i % 5}", "w " * (i % 17)) for i in range(60)
        ])
        a = webpipe.unimax_sampling(docs, epochs=2, budget_frac=0.7).collect()
        b = webpipe.unimax_sampling(
            docs.repartition(11), epochs=2, budget_frac=0.7
        ).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_validation(self, spark):
        docs = self._docs(spark, [(0, "a", "t")])
        with pytest.raises(ValueError, match="exactly one"):
            webpipe.unimax_sampling(docs)
        with pytest.raises(ValueError, match="exactly one"):
            webpipe.unimax_sampling(docs, budget_tokens=5, budget_frac=0.5)
        with pytest.raises(ValueError, match="epochs"):
            webpipe.unimax_sampling(docs, epochs=0, budget_tokens=5)
        with pytest.raises(ValueError, match="budget_tokens"):
            webpipe.unimax_sampling(docs, budget_tokens=0)
        with pytest.raises(ValueError, match="budget_frac"):
            webpipe.unimax_sampling(docs, budget_frac=0.0)


class TestC4Clean:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in webpipe.c4_clean(df, **kw).collect()}

    GOOD = (
        "This is a good long sentence here.\n"
        "Another quite fine long sentence.\n"
        "And one more to pass the gate."
    )

    def test_line_rules_and_page_gates(self, spark):
        got = self._run(
            spark,
            [
                (1, self.GOOD),
                (2, "Enable javascript to view this page.\n" + self.GOOD),
                (3, "Lorem ipsum dolor sit amet friend.\n" + self.GOOD),
                (4, "Then code follows { right here } now.\n" + self.GOOD),
                (5, "no terminal punctuation on this line\n" + self.GOOD),
                (6, "Too short.\nNo.\nStill no.\n" + self.GOOD),
                (7, None),
            ],
        )
        assert got[1]["keep"] is True and got[1]["kept_lines"] == 3
        assert got[1]["kept_words"] == 19
        # javascript line dropped LINE-level; the page itself survives
        assert got[2]["keep"] is True and got[2]["kept_lines"] == 3
        assert got[2]["n_lines"] == 4
        # lorem/brace are PAGE-level gates even when their line is kept
        assert got[3]["keep"] is False and got[3]["has_lorem"] is True
        assert got[3]["kept_lines"] == 4
        assert got[4]["keep"] is False and got[4]["has_brace"] is True
        # unpunctuated / short lines silently dropped, page survives
        assert got[5]["keep"] is True and got[5]["kept_lines"] == 3
        assert got[6]["keep"] is True and got[6]["kept_lines"] == 3
        # NULL text = empty page: row present, everything zero/false
        assert got[7]["keep"] is False and got[7]["n_lines"] == 0
        assert got[7]["kept_words"] == 0

    def test_clean_md5_is_trimmed_kept_lines_rejoined(self, spark):
        got = self._run(spark, [(1, "  " + self.GOOD.replace("\n", "  \n  "))])
        assert got[1]["clean_md5"] == hashlib.md5(self.GOOD.encode()).hexdigest()

    def test_min_kept_lines_threshold(self, spark):
        got = self._run(spark, [(1, self.GOOD)], min_kept_lines=4)
        assert got[1]["keep"] is False

    def test_crlf_and_exotic_terminators_normalized(self, spark):
        # CRLF pages must clean to the SAME bytes as LF pages (Java's
        # $ tolerates a trailing \r; normalization makes the anchor
        # moot and the md5 line-ending-independent)
        crlf = self.GOOD.replace("\n", "\r\n") + "\r"
        ls = self.GOOD.replace("\n", "\u2028")
        got = self._run(spark, [(1, crlf), (2, ls)])
        want = hashlib.md5(self.GOOD.encode()).hexdigest()
        assert got[1]["keep"] is True and got[1]["kept_lines"] == 3
        assert got[1]["clean_md5"] == want
        assert got[2]["clean_md5"] == want


class TestDsirWeights:
    def test_target_features_score_positive(self, spark):
        """Docs sharing the target domain's vocabulary get higher
        weights than off-domain docs; empty docs carry NULL."""
        rows = [
            (0, "alpha beta alpha beta gamma", "tgt"),
            (1, "alpha beta gamma alpha", "tgt"),
            (2, "alpha beta gamma beta", "other"),   # target-like
            (3, "delta epsilon zeta eta theta", "other"),
            (4, "", "other"),
            (5, None, "tgt"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {
            r["doc_id"]: r
            for r in webpipe.dsir_weights(
                df, F.col("source") == "tgt", n_buckets=64
            ).collect()
        }
        assert len(out) == 6
        assert out[0]["is_target"] and not out[2]["is_target"]
        # the target-like off-domain doc outranks the off-domain one
        assert out[2]["log_weight"] > out[3]["log_weight"]
        # no evidence -> NULL weight, zero features
        assert out[4]["n_feats"] == 0 and out[4]["log_weight"] is None
        assert out[5]["n_feats"] == 0 and out[5]["log_weight"] is None

    def test_weight_is_partitioning_invariant(self, spark):
        rows = [(i, f"w{i % 3} w{(i + 1) % 5} common tail", "tgt" if i % 4 == 0 else "o")
                for i in range(24)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = webpipe.dsir_weights(df.repartition(1), F.col("source") == "tgt").collect()
        b = webpipe.dsir_weights(df.repartition(7), F.col("source") == "tgt").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestTopNgrams:
    def test_integer_ranking_and_tiebreaks(self, spark):
        rows = [
            (0, "a b c a b c a b c", "s1"),   # 'a b c' x3 in one doc
            (1, "a b c x y z", "s1"),          # +1 occurrence, 2nd doc
            (2, "x y z x y z", "s1"),          # 'x y z' x2 here +1 doc1
            (3, "p q r s t", "s2"),
            (4, None, "s1"),
            (5, "only two", None),             # NULL source excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = textstats.top_ngrams(df, n=3, k=3)
        got = [(r["source"], r["rank"], r["gram"], r["n_occ"], r["n_docs"])
               for r in out.collect()]
        s1 = [g for g in got if g[0] == "s1"]
        # 'a b c': 4 occurrences across 2 docs; 'x y z': 3 across 2
        assert s1[0] == ("s1", 1, "a b c", 4, 2)
        assert s1[1] == ("s1", 2, "x y z", 3, 2)
        # rank 3 resolves the (n_occ 2, n_docs 1) tie by gram asc:
        # 'b c a' beats 'c a b'
        assert s1[2] == ("s1", 3, "b c a", 2, 1)
        s2 = [g for g in got if g[0] == "s2"]
        assert all(g[3] == 1 and g[4] == 1 for g in s2)
        assert not [g for g in got if g[0] is None]


class TestBadwordsFilter:
    def test_list_gate_counts_and_verdicts(self, spark):
        rows = [
            (0, "clean text about tables and joins"),
            (1, "one naughty word here"),
            (2, "naughty naughty and also rude stuff"),
            (3, None),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in webpipe.badwords_filter(df, ["naughty", "rude"]).collect()
        }
        assert len(out) == 5
        assert out[0]["keep"] and out[0]["n_bad"] == 0
        assert (out[1]["n_bad"], out[1]["n_bad_types"]) == (1, 1)
        assert (out[2]["n_bad"], out[2]["n_bad_types"]) == (3, 2)
        assert not out[2]["keep"]
        # zero evidence -> keep (the C4 rule fires only on a hit)
        assert out[3]["keep"] and out[3]["n_tokens"] == 0
        assert out[4]["keep"] and out[4]["n_tokens"] == 0

    def test_dataframe_list_and_case_fold(self, spark):
        df = spark.createDataFrame(
            [(0, "Shouted NAUGHTY word")], "doc_id long, text string"
        )
        bl = spark.createDataFrame([("NaUgHtY",)], "w string")
        out = webpipe.badwords_filter(df, bl).collect()[0]
        assert out["n_bad"] == 1 and not out["keep"]

    def test_blocklist_join_is_never_nested_loop(self, spark):
        df = spark.createDataFrame(
            [(0, "some text")], "doc_id long, text string"
        )
        plan = (
            webpipe.badwords_filter(df, ["x", "y"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan


class TestEncodingAnomalies:
    def test_channel_counts_and_verdicts(self, spark):
        pad = "clean words " * 40  # 480 chars: dilutes the 2-moji class
        # under the 1-per-200 density gate (2 anomalies need >= 400)
        rows = [
            (0, pad),
            (1, pad + " caf\u00c3\u00a9 na\u00c3\u00afve"),  # 2 moji, keep
            (2, pad + " it\u00e2\u20ac\u2122s \u00e2\u20ac\u009d"),
            (3, pad + " x\ufffd"),  # replacement char: unconditional drop
            (4, "\u00c3\u00a9\u00c3\u00a9 \u00c3\u00a9"),  # dense: ratio drop
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in textstats.encoding_anomalies(df).collect()
        }
        assert out[0]["keep"] and out[0]["n_moji"] == 0
        assert out[1]["n_moji"] == 2 and out[1]["keep"]
        # curly apostrophe counts once (a-circ + punct continuation);
        # the bare "a-circ euro" prefix plus the raw C1 closer: 1 ctrl
        assert out[2]["n_moji"] == 2 and out[2]["n_ctrl"] == 1
        assert out[3]["n_repl"] == 1 and not out[3]["keep"]
        assert out[4]["n_moji"] == 3 and not out[4]["keep"]
        # NULL text: zero evidence, keep
        assert out[5]["n_chars"] == 0 and out[5]["keep"]

    def test_c0_controls_counted_tab_lf_cr_exempt(self, spark):
        df = spark.createDataFrame(
            [(0, "a\tb\nc\rd\x07e\x0bf")], "doc_id long, text string"
        )
        out = textstats.encoding_anomalies(df).collect()[0]
        assert out["n_ctrl"] == 2  # BEL and VT only


class TestReadability:
    def test_ari_formula_and_null_evidence(self, spark):
        rows = [
            (0, "The cat sat on the mat. It was flat!"),
            (1, "no terminator at all"),
            (2, ""),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in textstats.readability(df).collect()}
        r0 = out[0]
        assert (r0["n_chars"], r0["n_words"], r0["n_sents"]) == (26, 9, 2)
        ari = 4.71 * (26 / 9) + 0.5 * (9 / 2) - 21.43
        import math

        assert r0["ari"] == math.floor(ari * 1e6 + 0.5) / 1e6
        # words but no sentence runs: per-word metric present, ARI NULL
        assert out[1]["chars_per_word"] is not None
        assert out[1]["words_per_sent"] is None and out[1]["ari"] is None
        # no words at all: everything NULL
        assert out[2]["n_words"] == 0 and out[2]["chars_per_word"] is None
        assert out[3]["n_chars"] == 0 and out[3]["ari"] is None

    def test_terminator_runs_not_chars(self, spark):
        df = spark.createDataFrame(
            [(0, "Wait... what?! Yes.")], "doc_id long, text string"
        )
        out = textstats.readability(df).collect()[0]
        assert out["n_sents"] == 3  # runs: dots, interrobang, final dot

    def test_contract_fixture_is_null_text_proof(self, spark, tmp_path):
        # review batch 24: a bare `text || CASE...` fixture NULL-
        # propagates in the ORACLE's census (len(NULL) stays NULL)
        # while the engine coalesces to 0s — the fixture must
        # coalesce so a NULL-text corpus row can never split the
        # engines
        import duckdb
        import pandas as pd

        from alix_spark import entry_queries as EQ

        pdf = pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": ["plain words here", None, "more. Text!", None],
            }
        )
        p = str(tmp_path / "documents.parquet")
        pdf.to_parquet(p)
        got = EQ.q_readability(spark, str(tmp_path)).collect()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
        want = con.execute(EQ.oracle_sql()["readability"]).fetchall()
        assert len(got) == len(want) == 4
        for sr, dr in zip(got, want):
            assert tuple(sr) == dr


class TestCollocations:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_known_ranking_and_margins(self, spark):
        df = self._df(
            spark,
            [
                "the quick brown fox jumps over the lazy dog the quick brown fox",
                "the quick brown cat naps",
                None,
                "quick brown quick brown quick brown fox",
            ],
        )
        out = textstats.collocations(df, min_count=2, top=10).collect()
        assert out[0].w1 == "quick" and out[0].w2 == "brown"
        by_pair = {(r.w1, r.w2): r for r in out}
        r = by_pair[("quick", "brown")]
        # 6 quick->brown pairs; quick is left of 6 pairs, brown right of 6
        assert (r.c12, r.c1, r.c2) == (6, 6, 6)
        # margins/total come from the FULL bigram table, not the
        # min_count-filtered probe
        n = sum(rr.c12 for rr in
                textstats.collocations(df, min_count=1, top=10000).collect())
        assert n == 22  # 12 + 4 + 0 + 6 pair slots (per-doc len-1)

    def test_matches_reference_formula(self, spark):
        import math

        df = self._df(
            spark,
            ["a b a b a b c d", "b a c d c d", "a b c d a b"],
        )
        out = textstats.collocations(df, min_count=1, top=1000).collect()
        pairs = {}
        for t in ["a b a b a b c d", "b a c d c d", "a b c d a b"]:
            toks = t.split()
            for x, y in zip(toks, toks[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
        n = sum(pairs.values())
        c1 = {}
        c2 = {}
        for (x, y), c in pairs.items():
            c1[x] = c1.get(x, 0) + c
            c2[y] = c2.get(y, 0) + c
        for r in out:
            k11, r1, rr2, nn = (
                float(pairs[(r.w1, r.w2)]),
                float(c1[r.w1]),
                float(c2[r.w2]),
                float(n),
            )
            cells = [
                (k11, r1 * rr2 / nn),
                (r1 - k11, r1 * (nn - rr2) / nn),
                (rr2 - k11, (nn - r1) * rr2 / nn),
                (nn - r1 - rr2 + k11, (nn - r1) * (nn - rr2) / nn),
            ]
            g2 = sum(2.0 * k * math.log(k / e) for k, e in cells if k > 0)
            want = g2 if k11 / r1 >= rr2 / nn else -g2
            want = math.floor(want * 1e6 + 0.5) / 1e6
            assert r.score == pytest.approx(want, abs=0), (r, want)
        # repulsed pairs sink below zero (e.g. 'b a' happens less than
        # chance given how often b leads and a follows)
        assert any(r.score < 0 for r in out)

    def test_partitioning_invariance(self, spark):
        texts = [f"w{i % 7} w{(i + 1) % 5} w{i % 3} common pair" for i in range(30)]
        df = self._df(spark, texts)
        a = textstats.collocations(df, min_count=2, top=50).collect()
        b = textstats.collocations(df.repartition(11), min_count=2, top=50).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_hand_computed_literal_anchor(self, spark):
        """Independent VALUE anchor for the G2 formula (VERDICT r04
        ask #3): the contract oracle interpolates the engine's own G2
        expression and test_matches_reference_formula re-derives it in
        python, so a wrong shared FORMULA would pass all three. These
        expected scores were computed BY HAND from Dunning (1993) —
        2·Σ k·ln(k/E) over the 2×2 adjacency contingency, 6-dp
        floor-rounded — and pinned as literals; any mutation of the
        cell terms, expectations, or sign rule fails them.

        Corpus 'a b a b c b': pairs (a,b)×2 (b,a) (b,c) (c,b), n=5.
        (a,b): k=(2,0,1,2), E=(1.2,0.8,1.8,1.2)
             → G2 = 4·ln(5/3) + 2·ln(5/9) + 4·ln(5/3) = 2.9110316…
        (round6 is floor(x·1e6 + 0.5), i.e. half-up at 6 dp)."""
        out = textstats.collocations(
            self._df(spark, ["a b a b c b"]), min_count=1, top=10
        ).collect()
        got = {(r.w1, r.w2): r for r in out}
        r = got[("a", "b")]
        assert (r.c12, r.c1, r.c2) == (2, 2, 3)
        assert r.score == 2.911032
        assert got[("b", "a")].score == 2.231436
        assert got[("b", "c")].score == 2.231436
        assert got[("c", "b")].score == 1.184939
        # ordering: score desc, then (w1, w2) asc on the tie
        assert [(r.w1, r.w2) for r in out] == [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")
        ]
        # sign rule anchor: (u,v) occurs ONCE while u leads 4 of 13
        # pairs and v closes 4 of 13 — k11/c1 = 1/4 < c2/n = 4/13, so
        # the pair is repulsed: hand value −0.0923498… → −0.092350
        out2 = textstats.collocations(
            self._df(spark, ["x v y v z v u w u w u w u v"]),
            min_count=1, top=100,
        ).collect()
        r_uv = {(r.w1, r.w2): r for r in out2}[("u", "v")]
        assert (r_uv.c12, r_uv.c1, r_uv.c2) == (1, 4, 4)
        assert r_uv.score == -0.09235


class TestFinewebClean:
    def test_each_gate_fires_in_isolation(self, spark):
        docs = spark.createDataFrame([
            (0, "A fine long punctuated sentence right here.\n"
                "Another fine long sentence follows on!\n"
                "And one more closes the page nicely."),
            (1, "Repeated navigation boilerplate line here.\n"
                "Repeated navigation boilerplate line here.\n"
                "Repeated navigation boilerplate line here.\n"
                "One genuine content sentence sits here."),
            (2, "Short line one.\nShort line two.\nShort line three.\n"
                "A single longer sentence to balance it all."),
            (3, "a long unpunctuated heading line without any mark\n"
                "another long unpunctuated heading line without mark"),
            (4, None),
        ], "doc_id long, text string")
        rows = {r.doc_id: r for r in webpipe.fineweb_clean(docs).collect()}
        assert rows[0].keep is True
        # dup gate: 3 x 42 chars duplicated of 165 total
        assert rows[1].keep is False and rows[1].dup_chars == 126
        assert rows[1].punct_lines == 4  # punct gate does NOT fire
        # short gate: 3 of 4 lines under 30 chars (punctuated)
        assert rows[2].keep is False and rows[2].short_lines == 3
        # punct gate: long lines, zero terminal punctuation
        assert rows[3].keep is False and rows[3].punct_lines == 0
        assert rows[3].short_lines == 0 and rows[3].dup_chars == 0
        # NULL text = zero-line page: all-zero channels, keep false
        assert tuple(rows[4]) == (4, 0, 0, 0, 0, 0, False)

    def test_boundary_is_integer_exact(self, spark):
        # exactly 12% punctuated lines (3 of 25) must DROP (<=), and
        # 13% (one more) must pass the punct gate
        def page(n_punct, n_total):
            lines = [
                f"a long unpunctuated filler line number {i} without mark"
                for i in range(n_total - n_punct)
            ] + [
                f"A long properly punctuated sentence number {i} is here."
                for i in range(n_punct)
            ]
            return "\n".join(lines)

        docs = spark.createDataFrame(
            [(0, page(3, 25)), (1, page(4, 25))], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in webpipe.fineweb_clean(docs).collect()}
        assert rows[0].keep is False  # 100*3 <= 12*25 exactly
        assert rows[1].keep is True


class TestRefinedwebLines:
    def test_line_rules_and_doc_gate(self, spark):
        docs = spark.createDataFrame([
            (0, "A clean first sentence of prose.\n"
                "Another tidy sentence follows.\nAnd a third one closes it."),
            (1, "this is a fairly long line of ordinary prose content here one\n"
                "this is a fairly long line of ordinary prose content here two\n"
                "this is a fairly long line of ordinary prose content here three\n"
                "this is a fairly long line of ordinary prose content here four\n"
                "2 likes\n12345"),
            (2, "3 likes\nMenu\na tiny line here"),
            (3, "ALL CAPS HEADING LINE\na modest line of prose here"),
            (4, None),
        ], "doc_id long, text string")
        rows = {r.doc_id: r for r in webpipe.refinedweb_lines(docs).collect()}
        # clean page: nothing removed
        assert rows[0].removed_lines == 0 and rows[0].keep is True
        # counter + digits-only lines removed, page survives the 5% gate
        assert rows[1].removed_lines == 2
        assert rows[1].removed_chars == 12 and rows[1].keep is True
        # counters/one-word dominate: drop
        assert rows[2].removed_lines == 2 and rows[2].keep is False
        # shouting headline (upper > lower): drop
        assert rows[3].removed_lines == 1
        assert rows[3].removed_chars == 21 and rows[3].keep is False
        # zero-line page: nothing removed -> keep true (emptiness is
        # c4/Gopher territory), md5 of the empty page
        import hashlib
        assert tuple(rows[4])[:6] == (4, 0, 0, 0, 0, True)
        assert rows[4].clean_md5 == hashlib.md5(b"").hexdigest()

    def test_kept_text_preserves_line_order(self, spark):
        import hashlib
        docs = spark.createDataFrame(
            [(0, "keep me first today\n12345\nkeep me second today\nSHOUT LINE HERE\nkeep me third today")],
            "doc_id long, text string",
        )
        r = webpipe.refinedweb_lines(docs).collect()[0]
        want = "keep me first today\nkeep me second today\nkeep me third today"
        assert r.clean_md5 == hashlib.md5(want.encode()).hexdigest()

    def test_mixed_case_prose_survives_uppercase_rule(self, spark):
        # acronyms inside prose do not trip the rule while a headline does
        docs = spark.createDataFrame(
            [(0, "The NASA and ESA teams met for a long while today.\nNASA ESA GO")],
            "doc_id long, text string",
        )
        r = webpipe.refinedweb_lines(docs).collect()[0]
        assert r.removed_lines == 1  # only the all-caps headline

    def test_hand_computed_literal_anchor(self, spark):
        """Independent VALUE anchor for the letter-class formula
        (VERDICT r04 ask #3): the contract oracle interpolates the
        SAME RW_UPPER_CLASS/RW_LOWER_CLASS constants the engine uses,
        so a wrong shared CLASS (e.g. Latin-1 ranges including the
        \\u00d7 multiplication / \\u00f7 division signs) would pass
        both sides. Every expected number below was counted BY HAND
        from the RefinedWeb §4.2 rules and pinned as a literal.

        Lines and hand counts (upper/lower letters):
          'HELLO World'        6/4  → mainly-upper, REMOVED (11 ch)
          'hello there world'  0/15 → kept          (17 ch)
          '1234 !!'            0/0  → no letters, REMOVED (7 ch)
          '3 likes'            counter,  REMOVED (7 ch)
          'singleword'         no space, REMOVED (10 ch)
          'A \\u00f7x'         1/1  → 1 > 1 false, KEPT (4 ch)
                               (if \\u00f7 wrongly counted as an
                               uppercase letter: 2 > 1 → removed,
                               so this line discriminates the class)
        n_lines=6 removed=4 removed_chars=35 total_chars=56;
        100·35 > 5·56 → page dropped; clean_md5 = md5 of the two
        kept lines joined by newline."""
        import hashlib

        text = (
            "HELLO World\nhello there world\n1234 !!\n3 likes\n"
            "singleword\nA \u00f7x"
        )
        r = webpipe.refinedweb_lines(
            spark.createDataFrame([(0, text)], "doc_id long, text string")
        ).collect()[0]
        assert (
            r.n_lines, r.removed_lines, r.removed_chars,
            r.total_chars, r.keep,
        ) == (6, 4, 35, 56, False)
        kept = "hello there world\nA \u00f7x"
        assert r.clean_md5 == hashlib.md5(kept.encode("utf-8")).hexdigest()


class TestSourceDivergence:
    def _jsd(self, p: dict, q: dict) -> float:
        # straight probability-space formula, independent of the
        # engine's ln-on-integers decomposition
        import math

        terms = set(p) | set(q)
        m = {t: (p.get(t, 0.0) + q.get(t, 0.0)) / 2.0 for t in terms}

        def h(d):
            return -sum(v * math.log(v) for v in d.values() if v > 0)

        return h(m) - (h(p) + h(q)) / 2.0

    def test_known_values(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a a b", "s1"), (2, "a c", "s2")],
            "doc_id long, text string, source string",
        )
        r = textstats.source_divergence(df).collect()
        assert len(r) == 1
        row = r[0]
        assert (row.source_a, row.source_b, row.n_terms) == ("s1", "s2", 3)
        p = {"a": 2 / 3, "b": 1 / 3}
        q = {"a": 1 / 2, "c": 1 / 2}
        assert row.entropy_a == pytest.approx(
            -sum(v * math.log(v) for v in p.values()), abs=1e-6
        )
        assert row.jsd == pytest.approx(self._jsd(p, q), abs=1e-6)

    def test_identical_distributions_give_zero(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c", "s1"), (2, "a b c", "s2")],
            "doc_id long, text string, source string",
        )
        assert textstats.source_divergence(df).collect()[0].jsd == 0.0

    def test_disjoint_vocab_is_ln2(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "c d", "s2")],
            "doc_id long, text string, source string",
        )
        row = textstats.source_divergence(df).collect()[0]
        assert row.jsd == pytest.approx(math.log(2), abs=1e-6)
        assert row.n_terms == 4

    def test_null_and_tokenless_sources_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "b c", "s2"), (3, "x", None), (4, "", "s3")],
            "doc_id long, text string, source string",
        )
        rows = textstats.source_divergence(df).collect()
        # s3 has no tokens, NULL source has no identity: one pair only
        assert [(r.source_a, r.source_b) for r in rows] == [("s1", "s2")]

    def test_int_group_column(self, spark):
        # the pair skeleton derives its schema from the group column
        # type — int labels must work, not just strings (batch 26)
        df = spark.createDataFrame(
            [(1, "a b", 7), (2, "c d", 9)],
            "doc_id long, text string, source int",
        )
        row = textstats.source_divergence(df).collect()[0]
        assert (row.source_a, row.source_b) == (7, 9)

    def test_max_groups_guard(self, spark):
        df = spark.createDataFrame(
            [(i, "a", f"s{i}") for i in range(3)],
            "doc_id long, text string, source string",
        )
        with pytest.raises(ValueError):
            textstats.source_divergence(df, max_groups=2)

    def test_shares_entropy_machinery_with_token_entropy(self, spark):
        # the per-source entropy channel must equal token_entropy's
        # value on a doc holding the same token multiset — both run
        # the ONE _entropy_agg/_entropy_expr decomposition
        df = spark.createDataFrame(
            [(1, "a a b c", "s1"), (2, "z z", "s2")],
            "doc_id long, text string, source string",
        )
        div = textstats.source_divergence(df).collect()[0]
        ent = {
            r.doc_id: r.entropy for r in textstats.token_entropy(df).collect()
        }
        assert div.entropy_a == ent[1]
        assert div.entropy_b == ent[2]  # single-type source: exact 0.0
        assert div.entropy_b == 0.0


class TestTokenizerFertility:
    def test_known_values(self, spark):
        df = spark.createDataFrame(
            [(1, "ab cd", "en"), (2, "a-b", "en"), (3, "xy", "fr")],
            "doc_id long, text string, lang string",
        )
        rows = {r.lang: r for r in textstats.tokenizer_fertility(df).collect()}
        en = rows["en"]
        # "ab cd": 2 words / 2 pieces; "a-b": 1 word / 3 pieces (a, -, b)
        assert (en.n_docs, en.n_words, en.n_pieces, en.n_chars) == (2, 3, 5, 8)
        assert en.vocab == 4  # {ab, cd, a, b}
        assert en.fertility == pytest.approx(5 / 3, abs=1e-6)
        assert en.chars_per_piece == pytest.approx(8 / 5, abs=1e-6)
        assert rows["fr"].fertility == 1.0

    def test_null_lang_excluded_null_text_counted(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "en"), (2, None, "en"), (3, "x", None)],
            "doc_id long, text string, lang string",
        )
        rows = {r.lang: r for r in textstats.tokenizer_fertility(df).collect()}
        assert list(rows) == ["en"]
        # the NULL-text doc is a census member with zero evidence
        assert rows["en"].n_docs == 2
        assert rows["en"].n_words == 2

    def test_zero_denominators_give_null(self, spark):
        df = spark.createDataFrame(
            [(1, "", "de")], "doc_id long, text string, lang string"
        )
        r = textstats.tokenizer_fertility(df).collect()[0]
        assert r.fertility is None and r.chars_per_piece is None
        assert (r.n_docs, r.vocab) == (1, 0)

    def test_no_python_stage(self, spark):
        df = spark.createDataFrame(
            [(1, "a b", "en")], "doc_id long, text string, lang string"
        )
        plan = (
            textstats.tokenizer_fertility(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


class TestDocFreqSpectrum:
    def test_known_spectrum(self, spark):
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a c"), (3, "a")], "doc_id long, text string"
        )
        rows = {r.df: r for r in textstats.doc_freq_spectrum(df).collect()}
        # b and c each live in one doc; a lives in all three
        assert (rows[1].n_terms, rows[1].n_tokens) == (2, 2)
        assert (rows[3].n_terms, rows[3].n_tokens) == (1, 3)

    def test_within_doc_repeats_count_once_for_df(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a"), (3, None)], "doc_id long, text string"
        )
        rows = {r.df: r for r in textstats.doc_freq_spectrum(df).collect()}
        assert (rows[2].n_terms, rows[2].n_tokens) == (1, 3)
        assert (rows[1].n_terms, rows[1].n_tokens) == (1, 1)

    def test_no_python_stage(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = (
            textstats.doc_freq_spectrum(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


class TestCensusInvariance:
    """Partitioning/totals invariants for the census ops — the result
    must not depend on the input split (the pack_shards precedent)."""

    def test_source_divergence_partitioning_invariance(self, spark):
        rows = [
            (i, f"w{i % 7} w{i % 3} common text", f"s{i % 4}")
            for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        a = [tuple(r) for r in textstats.source_divergence(df).collect()]
        b = [
            tuple(r)
            for r in textstats.source_divergence(df.repartition(13)).collect()
        ]
        assert a == b and len(a) == 6  # C(4,2) pairs

    def test_doc_freq_spectrum_totals(self, spark):
        rows = [(i, f"w{i % 7} w{i % 3} common") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        spec = textstats.doc_freq_spectrum(df).collect()
        toks = [t for _, txt in rows for t in txt.split()]
        # token mass and vocabulary must reconcile exactly
        assert sum(r.n_tokens for r in spec) == len(toks)
        assert sum(r.n_terms for r in spec) == len(set(toks))
        b = [
            tuple(r)
            for r in textstats.doc_freq_spectrum(df.repartition(11)).collect()
        ]
        assert [tuple(r) for r in spec] == b

    def test_tokenizer_fertility_partitioning_invariance(self, spark):
        rows = [
            (i, f"word{i} and-some pieces {i}", ["en", "fr"][i % 2])
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        a = [tuple(r) for r in textstats.tokenizer_fertility(df).collect()]
        b = [
            tuple(r)
            for r in textstats.tokenizer_fertility(df.repartition(7)).collect()
        ]
        assert a == b and len(a) == 2


def test_gram_multiplicities_column_collision_raises(spark):
    """Review batch 35: a carried column named 'm' (or the out_col)
    silently lost its values to the multiplicity column via dict-key
    collision — explicit error now."""
    from alix_spark.index.simple import gram_multiplicities

    base = spark.createDataFrame(
        [(1, 2, ["a", "b"])], "doc_id long, m long, toks array<string>"
    )
    with pytest.raises(ValueError, match="collide"):
        gram_multiplicities(base, (1,), "gram")
