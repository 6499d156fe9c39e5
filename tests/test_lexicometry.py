"""Lexicometry-layer tests: theme weights, partitioned keyness vs a
pure-python reference implementation, cooc profile/matrix invariants,
CA map properties, folded suggest, KWIC."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from alix_spark.index import simple
from alix_spark.lexicometry import cooc, partition, suggest, svd, theme
from alix_spark.query import kwic

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def data(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tok = simple.tokens(docs).cache()
    tok.count()
    return docs, tok


def _bm25_inputs(tok):
    return (
        simple.postings(tok),
        simple.doc_stats(tok).select("doc_id", "dl"),
        simple.term_stats(tok),
        simple.corpus_stats(tok).select("corpus_docs", "avgdl"),
    )


# ---------------------------------------------------------------- theme


def test_theme_weights_formula(spark, data):
    """Spot-check one term against a hand-computed IdfTermScorer.BM25."""
    docs, tok = data
    post, dstats, tstats, cstats = _bm25_inputs(tok)
    got = {r["term"]: r["score"]
           for r in theme.theme_weights(post, dstats, tstats, cstats, top=1000).collect()}
    rows = post.join(dstats, "doc_id").crossJoin(cstats).collect()
    n = rows[0]["corpus_docs"]
    avgdl = rows[0]["avgdl"]
    accs: dict[str, float] = {}
    dfs: dict[str, set] = {}
    for r in rows:
        local = (r["tf"] * 2.2) / (r["tf"] + 1.2 * (0.25 + 0.75 * r["dl"] / avgdl))
        accs[r["term"]] = accs.get(r["term"], 0.0) + local
        dfs.setdefault(r["term"], set()).add(r["doc_id"])
    for term in list(accs)[:20]:
        df = len(dfs[term])
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) ** 0.9
        want = idf * accs[term]
        assert got[term] == pytest.approx(want, abs=2e-6)


def test_doc_term_weights_positive(spark, data):
    _, tok = data
    w = theme.doc_term_weights(*_bm25_inputs(tok))
    assert w.filter(F.col("weight") <= 0).count() == 0


# ------------------------------------------------ partitioned keyness


def _py_part_keyness(rows, part_tokens, focus, scorer, ftd, focus_docs,
                     min_ftd=3, disp=0.3, tail=0.2):
    """Pure-python PartScorer.LogLikelihood[Tail] reference."""
    def signed_g2(a, fa, b, fb):
        if fa <= 0 or fb <= 0:
            return None
        na, nb = fa - a, fb - b
        t, nt = a + b, na + nb
        if t <= 0 or nt <= 0:
            return 0.0
        n = fa + fb
        def cell(o, e):
            return 2.0 * o * math.log(o / e) if o > 0 and e > 0 else 0.0
        g2 = (cell(a, t * fa / n) + cell(b, t * fb / n)
              + cell(na, nt * fa / n) + cell(nb, nt * fb / n))
        return g2 if a / fa >= b / fb else -g2

    fa = part_tokens[focus]
    out = {}
    terms = {t for (t, p) in rows if p == focus}
    for term in terms:
        if ftd.get(term, 0) < min_ftd:
            continue
        a = rows.get((term, focus), 0)
        scores = []
        for p, fb in part_tokens.items():
            if p == focus:
                continue
            g2 = signed_g2(a, fa, rows.get((term, p), 0), fb)
            if g2 is not None:
                scores.append(g2)
        if not scores:
            continue
        if scorer == "min":
            raw = min(scores)
        else:
            scores.sort()
            k = max(1, math.ceil(len(scores) * tail))
            raw = sum(scores[:k]) / k
        out[term] = raw * (ftd[term] / focus_docs) ** disp
    return out


@pytest.mark.parametrize("scorer", ["min", "tail"])
def test_partition_keyness_vs_python(spark, data, scorer):
    docs, tok = data
    parts = docs.select("doc_id", F.col("lang").alias("part"))
    got = {r["term"]: r["score"]
           for r in partition.partition_keyness(tok, parts, "fr", scorer=scorer, top=1000).collect()}
    t = tok.join(parts, "doc_id")
    rows = {(r["term"], r["part"]): r["cnt"]
            for r in t.groupBy("term", "part").agg(F.count("*").alias("cnt")).collect()}
    part_tokens = {r["part"]: r["cnt"]
                   for r in t.groupBy("part").agg(F.count("*").alias("cnt")).collect()}
    ftd = {r["term"]: r["d"]
           for r in t.filter(F.col("part") == "fr").groupBy("term")
           .agg(F.countDistinct("doc_id").alias("d")).collect()}
    focus_docs = parts.filter(F.col("part") == "fr").count()
    want = _py_part_keyness(rows, part_tokens, "fr", scorer, ftd, focus_docs)
    want_top = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:1000])
    assert set(got) == set(want_top)
    for term, score in got.items():
        assert score == pytest.approx(want_top[term], abs=2e-6)


def _py_corpus_family(rows, part_tokens, focus, scorer, min_freq=5,
                      min_part_tokens=0, alpha=0.3):
    """Pure-python PartScorer.{LogLikelihoodResidual,Pearson,RateRatio,
    Specificity} reference (PartScorer.java:622-1224)."""
    fa = part_tokens[focus]
    N = sum(part_tokens.values())
    terms = {t for (t, p) in rows if p == focus}
    out = {}

    def dev(o, e):
        if o <= 0:
            return 2.0 * e
        return 2.0 * (o * math.log(o / e) - o + e)

    for term in terms:
        a = rows.get((term, focus), 0)
        if a < min_freq:
            continue
        K = sum(c for (t, p), c in rows.items() if t == term)
        E = float(fa) * float(K) / float(N)
        if scorer == "rateratio":
            other = [
                (rows.get((term, p), 0) + alpha) / (fb + alpha)
                for p, fb in part_tokens.items()
                if p != focus and fb >= min_part_tokens
            ]
            if not other:
                continue
            fr = (a + alpha) / (fa + alpha)
            out[term] = math.log(fr / max(other)) / math.log(2.0)
        elif scorer == "residual":
            if E <= 0 or E >= fa:
                continue
            g2 = dev(float(a), E) + dev(float(fa - a), fa - E)
            out[term] = (
                0.0 if g2 <= 0
                else (1.0 if a - E >= 0 else -1.0) * math.sqrt(g2)
            )
        elif scorer == "pearson":
            if E <= 0:
                continue
            var = E * (1.0 - float(fa) / N) * (1.0 - float(K) / N)
            out[term] = 0.0 if var <= 0 else (a - E) / math.sqrt(var)
        else:
            s = partition.specificity_score(a, fa, K, N)
            if s is not None:
                out[term] = s
    return out


@pytest.mark.parametrize("scorer", ["residual", "pearson", "rateratio", "specificity"])
def test_partition_corpus_family_vs_python(spark, data, scorer):
    docs, tok = data
    parts = docs.select("doc_id", F.col("lang").alias("part"))
    got = {r["term"]: r["score"]
           for r in partition.partition_keyness(
               tok, parts, "fr", scorer=scorer, min_focus_term_freq=2,
               top=1000).collect()}
    t = tok.join(parts, "doc_id")
    rows = {(r["term"], r["part"]): r["cnt"]
            for r in t.groupBy("term", "part").agg(F.count("*").alias("cnt")).collect()}
    part_tokens = {r["part"]: r["cnt"]
                   for r in t.groupBy("part").agg(F.count("*").alias("cnt")).collect()}
    want = _py_corpus_family(rows, part_tokens, "fr", scorer, min_freq=2)
    assert set(got) == set(want)
    assert got, f"{scorer}: vacuous test (no terms cleared the floor)"
    for term, score in got.items():
        assert score == pytest.approx(want[term], abs=2e-6)


def test_specificity_kernel_edges():
    # k at the top of the support: upper tail is the single point mass
    s = partition.specificity_score(5, 5, 5, 100)
    assert s is not None and s > 0
    # under-represented: negative sign (k < E = 30, k within support)
    s_neg = partition.specificity_score(12, 50, 60, 100)
    assert s_neg is not None and s_neg < 0
    # below the support floor lo = n-(N-K) = 10: impossible counts -> None
    assert partition.specificity_score(1, 50, 60, 100) is None
    # out of support: k > min(n, K) is invalid input -> None
    assert partition.specificity_score(6, 5, 10, 100) is None
    # K > N invalid
    assert partition.specificity_score(1, 5, 200, 100) is None
    # balanced urn: P[X >= k] near 1 when k well below E -> negative
    lo_tail = partition.specificity_score(10, 100, 50, 200)
    hi_tail = partition.specificity_score(40, 100, 50, 200)
    assert lo_tail < 0 < hi_tail
    # symmetry sanity via exhaustive pmf sum (tiny urn): tail prob from
    # the kernel must match a direct binomial-coefficient computation
    from math import comb, log10
    N, K, n = 30, 12, 10
    for k in range(0, min(n, K) + 1):
        E = n * K / N
        tail = (
            sum(comb(K, x) * comb(N - K, n - x) for x in range(k, min(n, K) + 1))
            if k >= E else
            sum(comb(K, x) * comb(N - K, n - x) for x in range(max(0, n - (N - K)), k + 1))
        ) / comb(N, n)
        got = partition.specificity_score(k, n, K, N)
        want = -log10(tail) if k >= E else log10(tail)
        assert got == pytest.approx(want, abs=1e-9), k


def test_cut_and_repair_uniform_rich_histogram():
    """Rich uniform data: cut width = ceil(nonFocus/target), focus kept
    indivisible at index len(left), every period well-formed."""
    # 120 values, focus [40, 59] -> 100 non-focus offsets, target 10
    # -> width 10; plenty of docs/tokens so no repair fires
    hist = {o: (50, 40_000) for o in range(120)}
    periods, focus_part = partition._cut_and_repair(
        hist, 0, 119, 40, 59, target_non_focus=10
    )
    assert [p[:2] for p in periods] == [
        [0, 9], [10, 19], [20, 29], [30, 39],          # left, width 10
        [40, 59],                                       # focus
        [60, 69], [70, 79], [80, 89], [90, 99], [100, 109], [110, 119],
    ]
    assert focus_part == 4
    assert periods[focus_part][2] == 20 * 50
    # left periods cut backward from the focus boundary (adjacent-to-
    # focus keeps full width, the earliest is truncated) and the
    # truncated extremity then merges inward: nonFocus = 45+60 = 105,
    # width = ceil(105/10) = 11, raw left earliest = [0,0] -> merged
    periods2, fp2 = partition._cut_and_repair(
        hist, 0, 119, 45, 59, target_non_focus=10
    )
    assert periods2[0][:2] == [0, 11]
    assert periods2[1][:2] == [12, 22]
    assert periods2[fp2][:2] == [45, 59]


def test_cut_and_repair_weak_extremity_merges_inward():
    # sparse first period (few tokens) merges into its neighbor until
    # the boundary bucket passes the 25k-token extremity floor
    hist = {o: (50, 40_000) for o in range(60)}
    for o in range(10):
        hist[o] = (50, 100)  # poor early decade
    periods, fp = partition._cut_and_repair(
        hist, 0, 59, 40, 49, target_non_focus=4
    )
    # width = ceil(50/4) = 13; raw left = [0,0],[1,13],[14,26],[27,39]
    # first period [0,0] is narrow AND poor -> merged inward
    assert periods[0][0] == 0
    assert periods[0][1] >= 13
    assert all(p[3] >= 25_000 for p in periods[:fp])


def test_cut_and_repair_weak_internal_merges_smaller_neighbor():
    # range 100, focus [80,89]: nonFocus = 90, width = ceil(90/4) = 23;
    # left cut backward from 79 -> [0,10],[11,33],[34,56],[57,79]
    hist = {o: (50, 40_000) for o in range(100)}
    for o in range(11, 34):  # the whole [11,33] period goes thin
        hist[o] = (1, 30)    # 23 docs but 690 tokens < 1000 floor
    periods, fp = partition._cut_and_repair(
        hist, 0, 99, 80, 89, target_non_focus=4
    )
    spans = [tuple(p[:2]) for p in periods[:fp]]
    assert (11, 33) not in spans  # merged away
    # Huffman direction: [0,10] (440k tokens) <= [34,56] (920k), so the
    # weak period merged into its LEFT neighbor
    assert spans[0] == (0, 33)
    assert periods[fp][:2] == [80, 89]
    # internal periods all pass both floors after repair
    assert all(
        p[2] >= partition.MIN_INTERNAL_DOCS
        and p[3] >= partition.MIN_INTERNAL_TOKENS
        for p in periods[1:fp]
    )
    # an all-empty period is dropped pre-repair and the remaining spans
    # still never cross the focus
    hist2 = {o: (50, 40_000) for o in range(100)}
    for o in range(11, 34):
        hist2[o] = (0, 0)
    periods2, fp2 = partition._cut_and_repair(
        hist2, 0, 99, 80, 89, target_non_focus=4
    )
    spans2 = [tuple(p[:2]) for p in periods2[:fp2]]
    assert (11, 33) not in spans2
    assert all(p[1] < 80 for p in periods2[:fp2])
    assert periods2[fp2][:2] == [80, 89]


def test_cut_and_repair_errors():
    hist = {o: (10, 5_000) for o in range(10)}
    with pytest.raises(ValueError):
        partition._cut_and_repair({}, 0, 9, 2, 4, 4)  # empty focus
    with pytest.raises(ValueError):
        # focus covering everything leaves no non-focus side
        partition._cut_and_repair(hist, 0, 9, 0, 9, 4)


def test_build_chrono_parts_spark(spark, data):
    docs, tok = data
    doc_values = docs.select("doc_id", F.col("n_chars").alias("value"))
    doc_tokens = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    parts, focus_part, periods = partition.build_chrono_parts(
        doc_values, doc_tokens, 200, 300
    )
    rows = parts.collect()
    assert rows, "no docs assigned"
    by_part = {}
    for r in rows:
        by_part.setdefault(r["part"], 0)
        by_part[r["part"]] += 1
    # periods table consistent with assignments
    for part, (first, last, d, t) in enumerate(periods):
        assert by_part.get(part, 0) == d, (part, periods)
    # focus period covers exactly [200, 300] clipped to the field range
    f = periods[focus_part]
    assert f[0] >= 200 - 1 and f[1] <= 300
    # every doc labeled once
    assert len({r["doc_id"] for r in rows}) == len(rows)
    # end-to-end keyness over the built partition
    out = partition.partition_keyness(
        tok, parts, focus_part, scorer="tail", min_part_tokens=0, top=10
    ).collect()
    assert out


def test_build_chrono_parts_errors(spark, data):
    docs, tok = data
    doc_values = docs.select("doc_id", F.col("n_chars").alias("value"))
    doc_tokens = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    with pytest.raises(ValueError):
        partition.build_chrono_parts(doc_values, doc_tokens, 300, 200)
    with pytest.raises(ValueError):
        partition.build_chrono_parts(doc_values, doc_tokens, 10_000, 20_000)
    with pytest.raises(ValueError):  # focus swallows the whole range
        partition.build_chrono_parts(doc_values, doc_tokens, 0, 10_000)


def test_partition_corpus_family_single_part_empty(spark):
    tok = spark.createDataFrame(
        [("d1", "a"), ("d1", "b"), ("d2", "a")], "doc_id string, term string"
    )
    parts = spark.createDataFrame(
        [("d1", "p0"), ("d2", "p0")], "doc_id string, part string"
    )
    for scorer in ("residual", "pearson", "specificity"):
        out = partition.partition_keyness(
            tok, parts, "p0", scorer=scorer, min_focus_term_freq=1
        )
        assert out.count() == 0, scorer
    # rateratio: no valid other part -> NaN for every term -> empty
    out = partition.partition_keyness(
        tok, parts, "p0", scorer="rateratio", min_focus_term_freq=1
    )
    assert out.count() == 0


# ----------------------------------------------------------------- cooc


def test_cooc_profile_scored_vs_python(spark, data):
    """Full CoocProfile select/score semantics vs a scalar port:
    nearest-band credit (pivot positions feed denominators), per-tick
    cumulative G² vs the field, per-tick top-K union, entry tick/rank."""
    docs, tok = data
    TICKS, K, PIVOT = [1, 2, 5], 5, "spark"
    out = cooc.cooc_profile_scored(tok, PIVOT, ticks=TICKS, top_k=K).collect()
    got = {(r["term"], r["radius"]):
           (r["freq"], r["score"], r["entry_radius"], r["entry_rank"])
           for r in out}

    rows = [(r["doc_id"], r["pos"], r["term"]) for r in tok.collect()]
    bydoc = {}
    for d, p, t in rows:
        bydoc.setdefault(d, []).append((p, t))
    maxr = TICKS[-1]
    band_counts = {}
    for d, v in bydoc.items():
        hp = [p for p, t in v if t == PIVOT]
        if not hp:
            continue
        for p, t in v:
            dmin = min(abs(p - h) for h in hp)
            if dmin > maxr:
                continue
            b = next(i for i, r in enumerate(TICKS) if dmin <= r)
            band_counts[(t, b)] = band_counts.get((t, b), 0) + 1
    field = {}
    for d, p, t in rows:
        field[t] = field.get(t, 0) + 1
    FT = len(rows)

    def g2(a, fa, b, fb):
        na, nb = fa - a, fb - b
        n = fa + fb
        t_, nt = a + b, na + nb

        def cell(o, e):
            return 2.0 * o * math.log(o / e) if o > 0 and e > 0 else 0.0

        g = (cell(a, fa * t_ / n) + cell(b, fb * t_ / n)
             + cell(na, fa * nt / n) + cell(nb, fb * nt / n))
        return g if (fb <= 0 or a / fa >= b / fb) else -g

    toks_cum = {i: sum(n for (t, b), n in band_counts.items() if b <= i)
                for i in range(len(TICKS))}

    def cumf(t, i):
        return sum(n for (tt, b), n in band_counts.items()
                   if tt == t and b <= i)

    terms = {t for (t, b) in band_counts}
    entry, union = {}, set()
    for i in range(len(TICKS)):
        cand = [(t, g2(cumf(t, i), toks_cum[i], field[t] - cumf(t, i),
                       FT - toks_cum[i]))
                for t in terms if t != PIVOT and cumf(t, i) > 0]
        cand.sort(key=lambda kv: (-kv[1], kv[0]))
        for rank, (t, s) in enumerate(cand[:K], start=1):
            union.add(t)
            if t not in entry:
                entry[t] = (TICKS[i], rank)
    want = {}
    for t in union:
        for i, r in enumerate(TICKS):
            s = g2(cumf(t, i), toks_cum[i], field[t] - cumf(t, i),
                   FT - toks_cum[i])
            want[(t, r)] = (cumf(t, i), s, entry[t][0], entry[t][1])
    assert set(got) == set(want)
    assert got, "vacuous: pivot absent from the fixture"
    for k, (freq, score, er, rk) in got.items():
        wf, ws, wer, wrk = want[k]
        assert (freq, er, rk) == (wf, wer, wrk), k
        assert score == pytest.approx(ws, abs=2e-6), k


def test_cooc_profile_scored_rejects_bad_ticks(spark, data):
    docs, tok = data
    for bad in ([], [0, 2], [3, 2], [2, 2]):
        with pytest.raises(ValueError):
            cooc.cooc_profile_scored(tok, "spark", ticks=bad)


def test_cooc_profile_cumulative(spark, data):
    _, tok = data
    rows = cooc.cooc_profile(tok, "select", max_dist=4, top=5).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, rs in by_term.items():
        rs.sort(key=lambda r: r["dist"])
        cum = 0
        for r in rs:
            cum += r["freq"]
            assert r["cum_freq"] == cum


def test_cooc_matrix_symmetric_bounds(spark):
    # seeded rows so the pair set is guaranteed non-empty (the old
    # corpus-term variant collected zero pairs and asserted nothing)
    tok = spark.createDataFrame(
        [(1, 0, "alpha"), (1, 2, "beta"), (1, 7, "alpha"), (1, 9, "gamma"),
         (2, 0, "beta"), (2, 3, "gamma")]
        + [(3, i, "pad") for i in range(40)],
        "doc_id long, pos int, term string",
    )
    rows = cooc.cooc_matrix(tok, ["alpha", "beta", "gamma"], window=4).collect()
    assert rows, "pair set must be non-empty"
    for r in rows:
        assert r["a"] < r["b"]
        assert 0 < r["dice"] <= 1.0  # no multiplicity excess in this data
        assert -1.0 <= r["npmi"] <= 1.0
        assert r["n_ab"] <= r["n_a"] * r["n_b"]  # r*c multiplicity bound


# ------------------------------------------------------------------- CA


def test_ca_map_invariants(spark, data):
    docs, tok = data
    parts = docs.select("doc_id", F.col("lang").alias("part"))
    pdf = svd.ca_map(tok, parts, top_terms=20, axes=2)
    assert list(pdf.columns) == ["term", "axis1", "axis2", "cos2"]
    assert ((pdf["cos2"] >= 0) & (pdf["cos2"] <= 1.0 + 1e-9)).all()
    inertia = pdf.attrs["axis_inertia"]
    assert 0 < sum(inertia) <= 1.0 + 1e-9
    # determinism incl. sign convention
    pdf2 = svd.ca_map(tok, parts, top_terms=20, axes=2)
    assert (pdf["axis1"] == pdf2["axis1"]).all()


def test_ca_map_null_parts_and_schema_stability(spark, data):
    """Review batch 33: NULL-part docs are excluded (a None label
    crashed the sorted() part axis and occupied a phantom column);
    fewer parts than axes must NOT shrink the schema — absent axes
    zero-pad; the Spark wrapper carries an explicit schema so the
    guarded empty-input frame still builds."""
    docs, tok = data
    parts = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, None).otherwise(
            F.col("lang")
        ).alias("part"),
    )
    pdf = svd.ca_map(tok, parts, top_terms=10, axes=2)
    assert list(pdf.columns) == ["term", "axis1", "axis2", "cos2"]
    assert None not in pdf.attrs["parts"]
    # one part only, two axes requested: axis2 present and zero
    one = docs.select("doc_id", F.lit("all").alias("part"))
    pdf1 = svd.ca_map(tok, one, top_terms=10, axes=2)
    assert list(pdf1.columns) == ["term", "axis1", "axis2", "cos2"]
    assert (pdf1["axis2"] == 0.0).all()
    emb = svd.embedding_export(tok, one, top_terms=10, dim=4)
    assert list(emb.columns) == ["term", "v0", "v1", "v2", "v3"]
    # all-NULL parts -> the guarded empty frame, and the Spark wrapper
    # must still produce a typed (empty) DataFrame
    none_parts = docs.select("doc_id", F.lit(None).cast("string").alias("part"))
    sdf = svd.ca_map_df(spark, tok, none_parts, top_terms=5, axes=2)
    assert sdf.columns == ["term", "axis1", "axis2", "cos2"]
    assert sdf.count() == 0


def test_ipf_margins():
    rng = np.random.default_rng(5)
    obs = rng.integers(0, 50, size=(8, 4)).astype(float)
    e = svd.ipf_expectation(obs)
    assert np.allclose(e.sum(axis=1), obs.sum(axis=1), atol=1e-6)
    assert np.allclose(e.sum(axis=0), obs.sum(axis=0), atol=1e-6)


def test_residual_formulas():
    obs = np.array([[4.0]])
    exp = np.array([[2.0]])
    assert svd.residuals(obs, exp, "PEARSON")[0, 0] == pytest.approx((4 - 2) / math.sqrt(2))
    g2 = 2 * (4 * math.log(2) - 4 + 2)
    assert svd.residuals(obs, exp, "G2")[0, 0] == pytest.approx(math.sqrt(g2))
    ft = 2.0 + math.sqrt(5) - 3.0
    assert svd.residuals(obs, exp, "FT")[0, 0] == pytest.approx(ft)


# --------------------------------------------------------------- suggest


def test_suggest_plain_is_case_insensitive(spark):
    """Review batch 33: lowercasing only the query was neither case-
    sensitive nor insensitive — capitalized vocabulary was unreachable
    while its lowercase twin matched. Both sides lower now."""
    tstats = spark.createDataFrame(
        [("Paris", 5, 9), ("paris", 4, 7), ("parole", 2, 3), ("lyon", 1, 1)],
        "term string, df long, cf long",
    )
    got = [r["term"] for r in suggest.suggest(tstats, "Pa", top=10).collect()]
    assert got == ["Paris", "paris", "parole"]  # cf desc, term asc


def test_suggest_folded_matches_accented(spark):
    sdf = spark.createDataFrame(
        [("résumé", 1, 10), ("resume", 1, 5), ("été", 1, 7), ("autre", 1, 3)],
        "term string, df long, cf long",
    )
    got = [r["term"] for r in suggest.suggest_folded(sdf, "resu", top=10).collect()]
    assert got == ["résumé", "resume"]
    got2 = [r["term"] for r in suggest.suggest_folded(sdf, "éte", top=10).collect()]
    assert got2 == ["été"]


# ------------------------------------------------------------------ kwic


def test_kwic_contexts(spark):
    sdf = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate("a b pivot c d e pivot f".split())],
        "doc_id long, pos int, term string",
    )
    rows = kwic.kwic(sdf, "pivot", width=2, limit=10).collect()
    assert [(r["doc_id"], r["pos"], r["left_ctx"], r["right_ctx"]) for r in rows] == [
        (1, 2, "a b", "c d"),
        (1, 6, "d e", "f"),
    ]


def test_parts_from_numeric(spark):
    docs = spark.createDataFrame(
        [(1, 1850), (2, 1901), (3, 1950), (4, 2000), (5, None)],
        "doc_id long, year int",
    )
    parts = {r["doc_id"]: r["part"]
             for r in partition.parts_from_numeric(docs, "year", [1900, 1950]).collect()}
    # doc 5 (NULL year) excluded, like the reference's NO_PART — never
    # silently classified into the top range part (ADVICE r1)
    assert parts == {1: "<1900", 2: "[1900,1950)", 3: ">=1950", 4: ">=1950"}


def test_partition_keyness_over_numeric_parts(spark, data):
    docs, tok = data
    parts = partition.parts_from_numeric(docs, "n_chars", [1000, 3000])
    focus = parts.filter(F.col("part") == "<1000").limit(1).collect()
    if focus:
        out = partition.partition_keyness(tok, parts, "<1000", scorer="tail", top=5)
        assert out.count() <= 5


# ------------------------------------------------------ randomized SVD


def test_randomized_svd_matches_exact_on_decaying_spectrum():
    """Halko randomized SVD (reference RandomizedSvd.java defaults:
    oversamples 20, 4 power iterations) must recover the leading
    singular values and subspace of a decaying-spectrum matrix."""
    rng = np.random.RandomState(7)
    m, n, k = 500, 80, 8
    u0, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s0 = np.power(0.7, np.arange(n)) * 100.0
    a = (u0 * s0[None, :]) @ v0.T
    ue, se, _ = np.linalg.svd(a, full_matrices=False)
    ur, sr, _ = svd.randomized_svd(a, k)
    assert np.allclose(sr, se[:k], rtol=1e-8)
    # subspace agreement: projections coincide up to sign
    for j in range(k):
        assert abs(abs(ur[:, j] @ ue[:, j]) - 1.0) < 1e-8


def test_randomized_svd_deterministic():
    rng = np.random.RandomState(3)
    a = rng.standard_normal((300, 50))
    u1, s1, v1 = svd.randomized_svd(a, 5)
    u2, s2, v2 = svd.randomized_svd(a, 5)
    assert (u1 == u2).all() and (s1 == s2).all() and (v1 == v2).all()


def test_residual_svd_switches_paths():
    rng = np.random.RandomState(5)
    small = rng.standard_normal((40, 10))
    us, ss = svd._residual_svd(small, 4)
    ue, se, _ = np.linalg.svd(small, full_matrices=False)
    assert np.allclose(ss, se)
    # decaying spectrum (the CA-residual shape): the randomized path
    # must agree with exact on the leading axes
    m = svd.RANDOMIZED_SVD_MIN_ROWS + 10
    u0, _ = np.linalg.qr(rng.standard_normal((m, 30)))
    v0, _ = np.linalg.qr(rng.standard_normal((2001, 30)))
    s0 = np.power(0.5, np.arange(30)) * 50.0
    big = (u0 * s0[None, :]) @ v0.T
    ub, sb = svd._residual_svd(big, 4)
    _, se2, _ = np.linalg.svd(big, full_matrices=False)
    assert np.allclose(sb[:4], se2[:4], rtol=1e-6)


def test_kwic_lone_occurrence_kept(spark):
    """An occurrence with NO tokens in its ±width window still appears,
    with empty contexts (review fix: the band join alone dropped it)."""
    sdf = spark.createDataFrame(
        [(1, 0, "pivot"), (2, 0, "pivot"), (2, 1, "next")],
        "doc_id long, pos long, term string",
    )
    rows = {(r["doc_id"], r["pos"]): (r["left_ctx"], r["right_ctx"])
            for r in kwic.kwic(sdf, "pivot", width=2, limit=10).collect()}
    assert rows[(1, 0)] == ("", "")
    assert rows[(2, 0)] == ("", "next")


def test_suggest_population_is_folded(spark):
    """Population-scoped suggest folds its matching like suggest_folded:
    accented/capitalized terms must not silently vanish from the
    population path (review regression)."""
    from alix_spark.lexicometry import suggest as sg

    tok = spark.createDataFrame(
        [(1, "école"), (1, "école"), (1, "Écologie"), (2, "autre")],
        "doc_id long, term string",
    )
    pop = spark.createDataFrame([(1,)], "doc_id long")
    got = [tuple(r) for r in sg.suggest_population(tok, pop, "eco").collect()]
    assert got == [("école", 2), ("Écologie", 1)]


def test_fold_orders_agree_including_uppercase_y(spark):
    """lower∘translate (Spark column) and translate∘lower (DuckDB
    oracle) must agree on every char — including Ÿ (U+0178), which the
    table previously missed."""
    from alix_spark.lexicometry.suggest import (
        FOLD_DST, FOLD_SRC, _FOLD_MAP, fold_query,
    )

    probe = "Ÿàâ ÉÈ Œuf Haÿ" + FOLD_SRC
    spark_order = probe.translate(_FOLD_MAP).lower()  # translate∘lower? no:
    # fold_query = translate then lower; oracle = lower then translate
    lower_first = probe.lower().translate(_FOLD_MAP)
    assert spark_order == lower_first
    assert fold_query("Ÿves") == "yves"


def test_chrono_channels_counts_zero_token_docs(spark):
    """A doc with no tokens still lands in its bin's docs channel
    (reference HistoNum fills every population doc)."""
    from alix_spark.lexicometry.histogram import chrono_channels

    tok = spark.createDataFrame(
        [(1, 0, "guerre"), (1, 1, "paix")], "doc_id long, pos int, term string"
    )
    bins = spark.createDataFrame(
        [(1, 0), (2, 1)], "doc_id long, bin long"  # doc 2: zero tokens
    )
    rows = {r["bin"]: r.asDict() for r in chrono_channels(tok, bins, "guerre").collect()}
    assert rows[1]["docs"] == 1 and rows[1]["tokens"] == 0
    assert rows[0]["docs"] == 1 and rows[0]["hits"] == 1


def test_cooc_matrix_npmi_bounds(spark):
    """npmi replaces the multiplicity-broken jaccard: bounded (-1, 1]
    even when cross-multiplicity pushes dice above 1."""
    from alix_spark.lexicometry.cooc import cooc_matrix

    tok = spark.createDataFrame(
        [(1, p, t) for p, t in enumerate(["a", "b", "a", "b", "a", "b", "x", "y"])],
        "doc_id long, pos int, term string",
    )
    rows = {(r["a"], r["b"]): r.asDict() for r in cooc_matrix(tok, ["a", "b"], window=5).collect()}
    ab = rows[("a", "b")]
    assert ab["n_ab"] == 9 and ab["dice"] > 1  # reference multiplicity semantics
    assert ab["npmi"] == 1.0  # n_ab >= N → the reference's pCooc≥1 clamp
    # a normal-density pair stays in the probability regime
    tok2 = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b")]
        + [(1, 10 + i, "z") for i in range(50)],
        "doc_id long, pos int, term string",
    )
    rows2 = {
        (r["a"], r["b"]): r.asDict()
        for r in cooc_matrix(tok2, ["a", "b"], window=5).collect()
    }
    assert -1 <= rows2[("a", "b")]["npmi"] <= 1


def test_parts_from_numeric_rejects_nan_and_bad_bounds(spark):
    from alix_spark.lexicometry.partition import parts_from_numeric

    df = spark.createDataFrame(
        [(1, 10.0), (2, float("nan")), (3, None), (4, 2000.0)],
        "doc_id long, v double",
    )
    got = {r["doc_id"]: r["part"] for r in parts_from_numeric(df, "v", [100]).collect()}
    assert got == {1: "<100", 4: ">=100"}  # NaN and NULL both excluded
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ascending"):
        parts_from_numeric(df, "v", [200, 100])
    with _pytest.raises(ValueError, match="at least one"):
        parts_from_numeric(df, "v", [])


def test_keyness_count_scorer_and_empty_rest(spark):
    """The reference's Count scorer exists, and simplemaths handles an
    all-corpus focus (fb=0) like g2/chi2 instead of returning NULLs."""
    from alix_spark.lexicometry.keyness import keyness

    tok = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (2, 0, "a")],
        "doc_id long, pos int, term string",
    )
    all_docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    counted = {r["term"]: r["score"] for r in keyness(tok, all_docs, "count").collect()}
    assert counted == {"a": 2.0, "b": 1.0}
    sm = [r["score"] for r in keyness(tok, all_docs, "simplemaths").collect()]
    assert all(s is not None for s in sm)


def test_lang_id_no_evidence_is_null(spark):
    from alix_spark.textops.textstats import lang_scores

    df = spark.createDataFrame(
        [(1, "ciao mondo come stai"), (2, "the cat and the dog")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_scores(df).collect()}
    assert got[1] is None and got[2] == "en"


def test_ca_map_empty_parts_returns_empty(spark):
    from alix_spark.lexicometry.svd import ca_map

    tok = spark.createDataFrame(
        [(1, 0, "a")], "doc_id long, pos int, term string"
    )
    no_parts = spark.createDataFrame([], "doc_id long, part string")
    out = ca_map(tok, no_parts, top_terms=10)
    assert len(out) == 0 and "term" in out.columns


def test_embedding_export_empty_input(spark):
    # same empty-input contract as ca_map (review batch 27): no
    # matched parts -> empty export, not an argmax-of-empty crash
    tok = spark.createDataFrame(
        [(1, 0, "a")], "doc_id long, pos int, term string"
    )
    no_parts = spark.createDataFrame([], "doc_id long, part string")
    out = svd.embedding_export(tok, no_parts, top_terms=10, dim=4)
    assert len(out) == 0 and "term" in out.columns


def test_theme_factor_validates_required_stats(spark, data):
    _docs, tok = data
    post = simple.postings(tok)
    dstats = simple.doc_stats(tok).select("doc_id", "dl")
    tstats = simple.term_stats(tok)
    cstats = simple.corpus_stats(tok)
    focus = dstats.select("doc_id").limit(1)
    with pytest.raises(ValueError, match="cf"):
        theme.theme_weights_focus(
            post, dstats, tstats.drop("cf"), cstats, focus, mode="factor"
        )
    with pytest.raises(ValueError, match="corpus_tokens"):
        theme.theme_weights_focus(
            post, dstats, tstats, cstats.drop("corpus_tokens"), focus,
            mode="factor",
        )


def test_suggest_population_duplicate_ids_do_not_double_count(spark):
    tok = spark.createDataFrame(
        [(1, "alpha"), (1, "alpha"), (2, "alto"), (2, "alpha")],
        "doc_id long, term string",
    )
    pop_once = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pop_dup = spark.createDataFrame([(1,), (1,), (2,)], "doc_id long")
    a = [tuple(r) for r in suggest.suggest_population(tok, pop_once, "al").collect()]
    b = [tuple(r) for r in suggest.suggest_population(tok, pop_dup, "al").collect()]
    assert a == b
    assert dict(a)["alpha"] == 3
