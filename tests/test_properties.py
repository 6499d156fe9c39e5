"""Property-based tests (hypothesis) for the codec, tokenizer, chain
invariants, and WAND rank-identity on random posting sets — randomized
coverage the reference's test suite lacks (SURVEY §5: "no
property-based randomized testing")."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from alix_spark.analysis.chain import analyze, extract_text
from alix_spark.analysis.tokenizer import tokenize
from alix_spark.corpus.webtext import text_to_html
from alix_spark.index.segments import (
    ENC_SCHEMA,
    _encode_term_group,
    decode_block,
    decode_block_positions,
    varint_decode,
    varint_encode,
)
from alix_spark.query.wand import _Cursor, wand_shard_topk

ENC_COLS = [c.split(" ")[0] for c in ENC_SCHEMA.split(", ")]


# ------------------------------------------------------------- varint


@given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_random(values):
    a = np.array(values, dtype=np.int64)
    assert varint_decode(varint_encode(a), a.size).tolist() == values


# ---------------------------------------------------------- block codec


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000_000),   # doc
            st.integers(min_value=1, max_value=500),          # tf
            st.integers(min_value=1, max_value=5000),         # dl
        ),
        min_size=1,
        max_size=400,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_block_roundtrip_random(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    # positions: tf ascending ints per doc
    pos = np.concatenate([np.arange(t, dtype=np.int64) * 2 + 1 for t in tfs])
    rows = _encode_term_group(0, "t", docs, tfs, dls, avgdl=100.0, positions=pos)
    got_d, got_t, got_l, got_p = [], [], [], []
    for row in rows:
        s = pd.Series(dict(zip(ENC_COLS, row)))
        d, t, dl = decode_block(s)
        got_d.append(d)
        got_t.append(t)
        got_l.append(dl)
        got_p.extend(decode_block_positions(s, t))
    assert np.concatenate(got_d).tolist() == docs.tolist()
    assert np.concatenate(got_t).tolist() == tfs.tolist()
    assert np.concatenate(got_l).tolist() == dls.tolist()
    assert np.concatenate(got_p).tolist() == pos.tolist()


# -------------------------------------------------------------- chain


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_chain_total_on_arbitrary_text(src):
    out = analyze(src)
    positions = [t[1] for t in out]
    assert positions == sorted(positions)
    assert all(t[0] for t in out)
    extract_text(src)  # never throws
    for t in tokenize(src):
        assert 0 <= t.start <= t.end <= len(src)


_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzéèàçœ", min_size=1, max_size=12
)


@given(st.lists(_word, min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_extract_roundtrip_random_text(words):
    text = " ".join(words)
    lines = [text[i : i + 40].strip() for i in range(0, len(text), 40)]
    doc = "\n".join(ln for ln in lines if ln) or "mot"
    assert extract_text(text_to_html(doc)) == doc


# ------------------------------------------------------ WAND vs brute


@st.composite
def _posting_world(draw):
    n_docs = draw(st.integers(min_value=5, max_value=300))
    dls = draw(
        st.lists(
            st.integers(min_value=5, max_value=500),
            min_size=n_docs, max_size=n_docs,
        )
    )
    n_terms = draw(st.integers(min_value=1, max_value=4))
    terms = {}
    for i in range(n_terms):
        df = draw(st.integers(min_value=1, max_value=n_docs))
        docs = draw(
            st.lists(
                st.integers(min_value=0, max_value=n_docs - 1),
                min_size=df, max_size=df, unique=True,
            )
        )
        docs = sorted(docs)
        tfs = draw(
            st.lists(
                st.integers(min_value=1, max_value=30),
                min_size=len(docs), max_size=len(docs),
            )
        )
        terms[f"t{i}"] = (docs, tfs)
    mode = draw(st.sampled_from(["and", "or"]))
    k = draw(st.integers(min_value=1, max_value=15))
    return n_docs, dls, terms, mode, k


@given(_posting_world())
@settings(max_examples=60, deadline=None)
def test_wand_rank_identical_random(world):
    n_docs, dls, terms, mode, k = world
    dls = np.array(dls)
    avgdl = float(dls.mean())
    K1, B = 1.2, 0.75

    # brute force
    scores = np.zeros(n_docs)
    match = np.zeros((len(terms), n_docs), bool)
    cursors = []
    for qi, (t, (docs, tfs)) in enumerate(sorted(terms.items())):
        docs_a = np.array(docs, dtype=np.int64)
        tfs_a = np.array(tfs, dtype=np.int64)
        df = docs_a.size
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        norm = K1 * (1 - B + B * dls[docs_a] / avgdl)
        scores[docs_a] += idf * (tfs_a * (K1 + 1)) / (tfs_a + norm)
        match[qi, docs_a] = True
        rows = _encode_term_group(
            0, t, docs_a, tfs_a, dls[docs_a].astype(np.int64), avgdl
        )
        cursors.append(_Cursor(idf, pd.DataFrame(rows, columns=ENC_COLS)))

    ok = match.all(axis=0) if mode == "and" else match.any(axis=0)
    cand = np.flatnonzero(ok)
    # the kernel prunes and tie-breaks in the contract's round6 domain
    # (floor(x*1e6+0.5)/1e6), so the oracle must rank there too
    r6 = {int(d): math.floor(scores[d] * 1e6 + 0.5) / 1e6 for d in cand}
    want = sorted(r6, key=lambda d: (-r6[d], d))[:k]
    got = wand_shard_topk(cursors, k, avgdl, mode=mode)
    assert got == [(d, r6[d]) for d in want]


# ------------------------------------------- JSD integer decomposition


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
    st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
    st.integers(min_value=0, max_value=20),
)
@settings(max_examples=200, deadline=None)
def test_jsd_integer_decomposition_matches_probability_form(ca, cb, overlap):
    """source_divergence's ln-on-integers decomposition (H = ln T −
    Σ c·ln c / T; H(m) = ln 2AB − Σ(aB + bA)·ln(aB + bA) / 2AB) must
    equal the textbook probability-space JSD on arbitrary count
    vectors, and stay inside [0, ln 2]."""
    # vocabularies with a controlled shared prefix
    a = {f"s{i}": c for i, c in enumerate(ca[: overlap])}
    a.update({f"a{i}": c for i, c in enumerate(ca[overlap:])})
    b = {f"s{i}": c for i, c in enumerate(cb[: overlap])}
    b.update({f"b{i}": c for i, c in enumerate(cb[overlap:])})
    ta, tb = sum(a.values()), sum(b.values())

    # engine decomposition (every ln on an integer-valued input)
    def h_dec(counts, t):
        if len(counts) == 1:
            return 0.0
        return math.log(t) - sum(c * math.log(c) for c in counts.values()) / t

    d = 2.0 * ta * tb
    xs = 0.0
    for w in set(a) | set(b):
        n = a.get(w, 0) * tb + b.get(w, 0) * ta
        xs += n * math.log(n)
    h_mix = math.log(d) - xs / d
    jsd_dec = h_mix - (h_dec(a, ta) + h_dec(b, tb)) / 2.0

    # textbook probability-space form
    p = {w: c / ta for w, c in a.items()}
    q = {w: c / tb for w, c in b.items()}
    m = {w: (p.get(w, 0.0) + q.get(w, 0.0)) / 2.0 for w in set(p) | set(q)}

    def h(dist):
        return -sum(v * math.log(v) for v in dist.values() if v > 0)

    jsd_ref = h(m) - (h(p) + h(q)) / 2.0
    assert abs(jsd_dec - jsd_ref) < 1e-9
    assert -1e-9 <= jsd_dec <= math.log(2) + 1e-9
