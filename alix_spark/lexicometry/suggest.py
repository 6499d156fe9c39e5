"""Term completion: prefix for short inputs, infix otherwise, ranked by
corpus frequency.

Reference: TermSuggest.java:1-28,141 — ASCII-folded dictionary scan,
prefix match for <3 chars, infix for >=3; ranked by population freq.
Spark shape: the vocabulary is small relative to the corpus, so this is
a filter + top-k over term_stats (broadcast-scale at query time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.util import maybe_broadcast


def suggest(tstats: DataFrame, q: str, top: int = 20) -> DataFrame:
    """(term, cf) completions for q over a (term, df, cf) stats table.

    Case-INSENSITIVE on both sides: lowercasing only the query (the
    old behavior) was neither case-sensitive nor insensitive — an
    exact-case query could never match capitalized vocabulary while
    matching the lowercase twin (review batch 33). Diacritic folding
    is :func:`suggest_folded`'s job."""
    q = q.lower()
    t = F.lower(F.col("term"))
    if len(q) < 3:
        pred = t.startswith(q)
    else:
        pred = t.contains(q)
    return (
        tstats.filter(pred)
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )


def suggest_spell(
    tstats: DataFrame, q: str, max_dist: int = 2, top: int = 10
) -> DataFrame:
    """(term, dist, cf) spelling corrections for a word the dictionary
    does not know — the reference's SpellSugg workflow
    (cli/SpellSugg.java:1-49: Lucene-Hunspell ``suggest`` over the
    fr.aff/fr.dic pair; e.g. 'Struétures' → 'Structures').

    Re-expressed over the index's own term dictionary: candidates
    within Levenshtein distance ``max_dist`` of the (lowercased) query,
    ranked (distance asc, cf desc, term asc) — corpus-frequency ranking
    replaces Lucene's affix-aware n-gram scoring (divergence noted; the
    corpus dictionary IS the set of correctly spellable forms here).
    One filter + top-k over term_stats: a length pre-filter
    (| |term|−|q| | ≤ max_dist) prunes the scan before the O(len²)
    distance, and both the pre-filter and the distance push into the
    columnar scan — no Python."""
    ql = q.lower()
    lo, hi = len(ql) - max_dist, len(ql) + max_dist
    cand = tstats.filter(
        (F.length("term") >= lo) & (F.length("term") <= hi)
    ).select(
        "term",
        "cf",
        # long: Spark levenshtein yields INT, DuckDB BIGINT — the
        # contract hasher is typed (CLAUDE.md cast rule)
        F.levenshtein(F.lower(F.col("term")), F.lit(ql)).cast("long").alias("dist"),
    )
    return (
        cand.filter(F.col("dist") <= max_dist)
        .select("term", "dist", "cf")
        .orderBy(F.asc("dist"), F.desc("cf"), F.asc("term"))
        .limit(top)
    )


def _lev_banded(a: str, b: str, k: int) -> int | None:
    """Plain Levenshtein distance if ≤ k else None — banded DP (cells
    outside the ±k diagonal band are +∞), the same metric as Spark's
    levenshtein() / DuckDB's levenshtein()."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return None
    inf = k + 1
    prev = [j if j <= k else inf for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [inf] * (lb + 1)
        if i <= k:
            cur[0] = i
        best = cur[0]
        for j in range(max(1, i - k), min(lb, i + k) + 1):
            c = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            cur[j] = c if c < inf else inf
            if cur[j] < best:
                best = cur[j]
        if best >= inf:
            return None
        prev = cur
    return prev[lb] if prev[lb] <= k else None


def suggest_spell_local(
    index_dir: str, q: str, max_dist: int = 2, top: int = 10
) -> list[tuple]:
    """(term, dist, cf) spelling corrections via the cached vocabulary
    — the serving-node twin of :func:`suggest_spell` (no Spark job):
    length band pre-filter, banded Levenshtein, (dist asc, cf desc,
    term asc) ranking. Ranking asserted identical to the Spark path in
    tests. The Spark path remains the cluster fan-out for web-scale
    vocabularies."""
    if top <= 0:
        return []
    ql = (q or "").lower()
    # (term, fold, cf, len) pre-sorted cf desc, term asc; len cached
    # per publish token so the band mask is the only per-call scan
    pdf = folded_vocab(index_dir)
    lens = pdf["len"]
    band = pdf[(lens >= len(ql) - max_dist) & (lens <= len(ql) + max_dist)]
    out = []
    for term, cf in zip(band["term"], band["cf"]):
        d = _lev_banded(term.lower(), ql, max_dist)
        if d is not None:
            out.append((term, int(d), int(cf)))
    out.sort(key=lambda t: (t[1], -t[2], t[0]))
    return out[:top]


def suggest_population(
    tok: DataFrame, pop_docs: DataFrame, q: str, top: int = 20
) -> DataFrame:
    """Population-scoped completion (reference TermSuggest.java:141:
    completions are ranked by the term's frequency inside the CURRENT
    doc population — a filtered sub-corpus — not the global corpus).

    ``tok``: (doc_id, term) token table; ``pop_docs``: (doc_id) of the
    population. The population is a filter result (usually ≪ corpus),
    broadcast onto the token scan; ranking freq is computed on the
    surviving tokens only. Matching is diacritic/case-folded exactly
    like :func:`suggest_folded` — the reference folds the suggest
    dictionary once, so the population-scoped path must not silently
    lose accented or capitalized terms the global path returns."""
    qf = fold_query(q)
    folded = _fold_expr(F.col("term"))
    if len(qf) < 3:
        pred = folded.startswith(qf)
    else:
        pred = folded.contains(qf)
    return (
        # .distinct(): the population is a filter result, and a
        # repeated doc_id (e.g. from a fanning join upstream) would
        # double-count that doc's tokens into cf — the same dedup
        # discipline as keyness/theme/partition (review batch 27)
        # count-guarded, NOT unconditional: the population is an
        # arbitrary filter result (population=F.lit(True) is the whole
        # corpus) — the batch-27 broadcast rule (review batch 33)
        tok.join(maybe_broadcast(pop_docs.select("doc_id").distinct()), "doc_id")
        .filter(pred)
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )


# explicit diacritic fold map — identical char-for-char `translate` on
# Spark and DuckDB (the reference ASCII-folds with Lucene's
# ASCIIFoldingFilter; this 1:1 table covers the French repertoire, with
# the ligatures œ/æ folded to their first letter on both sides)
FOLD_SRC = "àâäáãéèêëíìîïñóòôöõúùûüçýÿœæÀÂÄÁÃÉÈÊËÍÌÎÏÑÓÒÔÖÕÚÙÛÜÇÝŸŒÆ"
FOLD_DST = "aaaaaeeeeiiiinooooouuuucyyoaAAAAAEEEEIIIINOOOOOUUUUCYYOA"
# the uppercase table must cover every lowercase entry's uppercase (Ÿ
# included): only then do translate∘lower (the DuckDB oracle's order)
# and lower∘translate (the Spark column order) agree on every input
assert len(FOLD_SRC) == len(FOLD_DST)
_FOLD_MAP = {ord(s): d for s, d in zip(FOLD_SRC, FOLD_DST)}


def _fold_expr(col):
    return F.lower(F.translate(col, FOLD_SRC, FOLD_DST))


def fold_query(q: str) -> str:
    return q.translate(_FOLD_MAP).lower()


# ---------------------------------------------------- serving path
# The no-Spark fold+rank table shared by EVERY suggest surface
# (engine.suggest, SQL alix_suggest, HTTP) — one fold of the vocabulary
# per publish, keyed by publish token, LRU-bounded so per-version
# directories don't accumulate across republishes in a long-lived
# server. Keeping the <3-prefix/≥3-infix rule and the (cf desc, term
# asc) ranking in ONE place stops the surfaces diverging.

import collections as _collections
import threading as _threading

_VOCAB_CACHE: _collections.OrderedDict = _collections.OrderedDict()
_VOCAB_CACHE_MAX = 8
# served from ThreadingHTTPServer request threads (web/server.py):
# unguarded move_to_end/popitem/insert can corrupt the OrderedDict
# under concurrent load (ADVICE r3). _VOCAB_LOCK guards only the dict
# ops (never the multi-second cold load); per-(index, publish-token)
# load locks dedup concurrent cold loads of the SAME index without
# stalling cache hits for other indexes
_VOCAB_LOCK = _threading.Lock()
_VOCAB_LOAD_LOCKS: dict = {}


def folded_vocab(index_dir: str):
    """pandas (term, fold, cf) for the whole dictionary, pre-sorted by
    (cf desc, term asc) so a masked scan in order IS the ranking."""
    import pandas as pd

    from alix_spark.index.segments import publish_marker
    from alix_spark.query.wand import term_stats_dataset

    key = publish_marker(index_dir)
    with _VOCAB_LOCK:
        hit = _VOCAB_CACHE.get(index_dir)
        if hit is not None and hit[0] == key:
            _VOCAB_CACHE.move_to_end(index_dir)
            return hit[1]
        load_lock = _VOCAB_LOAD_LOCKS.setdefault(
            (index_dir, key), _threading.Lock()
        )
    # cold load OUTSIDE the global lock (a multi-second vocabulary
    # scan must not stall cache hits for OTHER indexes), but UNDER the
    # per-(index, token) load lock so a republish's thundering herd
    # runs the scan once — followers find the cache filled
    with load_lock:
        with _VOCAB_LOCK:
            hit = _VOCAB_CACHE.get(index_dir)
            if hit is not None and hit[0] == key:
                _VOCAB_CACHE.move_to_end(index_dir)
                return hit[1]
        tbl = term_stats_dataset(index_dir).to_table(columns=["term", "cf"])
        pdf = pd.DataFrame(
            {"term": tbl["term"].to_pylist(), "cf": tbl["cf"].to_pylist()}
        )
        pdf["fold"] = pdf["term"].str.translate(_FOLD_MAP).str.lower()
        # cached once per publish token: suggest_spell_local's length
        # band must not rescan the vocabulary per keystroke
        pdf["len"] = pdf["term"].str.len()
        pdf = pdf.sort_values(
            ["cf", "term"], ascending=[False, True], ignore_index=True
        )
        with _VOCAB_LOCK:
            _VOCAB_CACHE[index_dir] = (key, pdf)
            _VOCAB_CACHE.move_to_end(index_dir)
            while len(_VOCAB_CACHE) > _VOCAB_CACHE_MAX:
                _VOCAB_CACHE.popitem(last=False)
            # retire load locks for evicted/superseded tokens
            live = {(d, v[0]) for d, v in _VOCAB_CACHE.items()}
            for k in [k for k in _VOCAB_LOAD_LOCKS if k not in live]:
                del _VOCAB_LOAD_LOCKS[k]
        return pdf


def suggest_local(index_dir: str, q: str, top: int = 20) -> list[tuple]:
    """(term, cf) completions via the cached folded vocabulary — the
    per-keystroke serving op (no Spark job; reference TermSuggest
    semantics: prefix <3 folded chars, infix ≥3, cf desc / term asc)."""
    if top <= 0:
        return []
    pdf = folded_vocab(index_dir)
    qf = fold_query(q or "")
    mask = (
        pdf["fold"].str.startswith(qf) if len(qf) < 3
        else pdf["fold"].str.contains(qf, regex=False)
    )
    hit = pdf[mask].head(top)
    return [(t, int(c)) for t, c in zip(hit["term"], hit["cf"])]


def suggest_folded(tstats: DataFrame, q: str, top: int = 20) -> DataFrame:
    """Diacritic-insensitive completion (reference TermSuggest.java:1-28:
    terms ASCII-folded at index time; query folded; prefix match for <3
    folded chars, infix for ≥3; ranked by corpus freq)."""
    qf = fold_query(q)
    folded = tstats.withColumn("folded", _fold_expr(F.col("term")))
    if len(qf) < 3:
        pred = F.col("folded").startswith(qf)
    else:
        pred = F.col("folded").contains(qf)
    return (
        folded.filter(pred)
        .select("term", "cf")
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top)
    )
