"""Query-string parser → logical query plan.

Re-expresses the reference's ``SpanQueryParser`` semantics
(common/.../snippets/SpanQueryParser.java:50-653):

- bare terms            → conjunctive bag (scored doc match; the
                          reference builds an unordered SpanNear with
                          large slop — doc-level AND is the ranking
                          equivalent it feeds to BM25)
- ``"quoted words"``    → exact phrase, in order, slop 0 (:24-48)
- ``(a b c)``           → OR group (SpanOrQuery, :151-201)
- ``wild*`` / ``wi?d``  → wildcard expanded against the term dictionary,
                          capped at 256 expansions (:52-53, :327-398).
                          Top-level tokens only — a wildcard inside a
                          quoted phrase or OR group is analyzed as a
                          literal (known divergence from the
                          reference's composed SpanOrQuery rewrite)
- stopwords dropped (:477-479); terms absent from the index dropped
  (:510-513) — both decided against the index's term dictionary
- query text runs through the SAME analysis chain as the index
  (tokenize + clitic split + lemma projection), the reference's
  FrenchCliticTokenizer + term resolution (:463-519)

The plan is a list of clauses; each clause must match (AND across
clauses, OR inside a group).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from alix_spark.analysis.filters import run_chain
from alix_spark.analysis.tokenizer import tokenize

MAX_EXPANSIONS = 256  # reference SpanQueryParser.java:52-53


@dataclass
class TermClause:
    term: str


@dataclass
class OrClause:
    terms: list[str] = field(default_factory=list)


@dataclass
class PhraseClause:
    # a slot is one term, or (after resolve) a tuple of indexed
    # alternatives — Hunspell multi-root slots become a positional OR,
    # the reference's per-slot SpanOr (SpanQueryParser.java:482-518)
    terms: list[str | tuple[str, ...]] = field(default_factory=list)
    slop: int = 0
    ordered: bool = True


@dataclass
class WildcardClause:
    pattern: str = ""  # glob with * and ?


Clause = TermClause | OrClause | PhraseClause | WildcardClause

_TOKEN_RE = re.compile(r'"[^"]*"|\([^)]*\)|\S+')


def _analyze_words(text: str) -> list[str]:
    """Run the index analysis chain over query text; returns final
    indexable terms (lemma-projected, stopwords removed)."""
    return [t[0] for t in run_chain(tokenize(text))]


def parse(q: str) -> list[Clause]:
    clauses: list[Clause] = []
    for m in _TOKEN_RE.finditer(q):
        tok = m.group(0)
        if tok.startswith('"') and tok.endswith('"'):
            toks = run_chain(tokenize(tok[1:-1]))
            terms = [t[0] for t in toks]
            if len(terms) == 1:
                clauses.append(TermClause(terms[0]))
            elif terms:
                # stopwords dropped from the phrase leave position gaps
                # in BOTH the query and the index ('chat et chien' →
                # chat@0, chien@2): budget those holes as slop, or the
                # exact phrase could never match its own source text.
                # (Approximation vs the reference's exact-hole
                # PhraseQuery: the matcher may spend the budget at any
                # gap, slightly wider.)
                holes = (toks[-1][1] - toks[0][1] + 1) - len(terms)
                clauses.append(PhraseClause(terms, slop=holes))
        elif tok.startswith("(") and tok.endswith(")"):
            terms = _analyze_words(tok[1:-1])
            if terms:
                clauses.append(OrClause(terms))
        elif "*" in tok or "?" in tok:
            # pattern AS TYPED (engine._expand tries it plus the
            # leading-case flip — lowercasing here made interior
            # capitals like 'Jean-P*' unreachable); trailing
            # punctuation would be stripped by the analyzer on a bare
            # term, so strip it from the pattern too — but NOT '?',
            # which is a wildcard metacharacter: stripping it rewrote
            # 'livre?' to a bare exact term (ADVICE r3). A token of
            # ONLY metacharacters (a lone '?' — standard French
            # spacing before punctuation — or '*') is punctuation the
            # analyzer would drop, NOT a wildcard: expanding it would
            # narrow the whole AND query to docs holding some
            # 1-char/any term (review batch 29)
            # the strip set mirrors what the analyzer would shed from
            # a bare term's tail — including ellipsis, guillemets,
            # quotes and closing brackets (review batch 35: a pattern
            # like 'pari*\u2026' kept the trailing char, expanded to
            # [], and the empty clause DROP silently widened the
            # query) — but never '?', the wildcard metacharacter
            pat = tok.rstrip(".,;:!\u2026\u00ab\u00bb\u201c\u201d\u2019'\")()[]{}")
            if pat.strip("*?"):
                clauses.append(WildcardClause(pat))
        else:
            terms = _analyze_words(tok)
            for t in terms:
                clauses.append(TermClause(t))
    return clauses


def glob_to_regex(pattern: str) -> re.Pattern:
    """``*``/``?`` glob → anchored regex (shared by the in-memory and
    pushdown wildcard expanders)."""
    return re.compile(
        "^" + "".join(
            ".*" if c == "*" else "." if c == "?" else re.escape(c)
            for c in pattern
        ) + "$"
    )


def flip_leading_case(text: str) -> str | None:
    """The token with its first code point's case inverted, or None
    when there is no distinct opposite case
    (SpanQueryParser.java:327-346 flipLeadingCase)."""
    if not text:
        return None
    head = text[0]
    other = head.lower() if head.isupper() else head.upper()
    if other == head:
        return None
    return other + text[1:]


def expand_wildcard(pattern: str, vocabulary: list[str]) -> list[str]:
    """Glob → matching index terms, capped, PLUS the leading-case-flip
    alternative (reference :579-591 + flipLeadingCase :327-346): the
    chain indexes PROPN surface forms titlecase, so ``pari*`` must also
    match ``Paris`` — each spelling expands under its own cap, union
    dedups (same contract as engine._expand, the pushdown twin)."""

    def one(pat: str) -> list[str]:
        rx = glob_to_regex(pat)
        out = []
        for t in vocabulary:
            if rx.match(t):
                out.append(t)
                if len(out) >= MAX_EXPANSIONS:
                    break
        return out

    out = one(pattern)
    flipped = flip_leading_case(pattern)
    if flipped is not None:
        seen = set(out)
        out = out + [t for t in one(flipped) if t not in seen]
    return out


def resolve_with(clauses: list[Clause], member, expand, roots=None) -> list[Clause]:
    """Drop terms not in the index (reference :510-513); expand
    wildcards; drop empty clauses.

    ``member(term) -> bool`` and ``expand(pattern) -> list[str]`` decide
    against the dictionary — a set for small indexes, a pushdown lookup
    (engine._IndexDict) at web-scale vocabularies.

    ``roots(term) -> list[str]`` (optional): Hunspell root lookup —
    indexed roots are PREFERRED over the surface form, becoming a
    disjunction; the surface form is tried only when no indexed root
    exists (reference SpanQueryParser.spanTerm, :482-518)."""

    def term_alts(t: str) -> list[str]:
        if roots is not None:
            kept = [r for r in roots(t) if member(r)]
            if kept:
                return kept
        return [t] if member(t) else []

    out: list[Clause] = []
    for c in clauses:
        if isinstance(c, TermClause):
            alts = term_alts(c.term)
            if len(alts) == 1:
                out.append(TermClause(alts[0]))
            elif alts:
                out.append(OrClause(alts))
        elif isinstance(c, OrClause):
            kept: list[str] = []
            for t in c.terms:
                for a in term_alts(t):
                    if a not in kept:
                        kept.append(a)
            if len(kept) == 1:
                out.append(TermClause(kept[0]))  # single-clause collapse
            elif kept:
                out.append(OrClause(kept))
        elif isinstance(c, PhraseClause):
            # per-slot resolution like the reference's spanTerm
            # (:482-518): each phrase term resolves roots-first; a term
            # with no indexed form is DROPPED (reference :510-513) and
            # its hole becomes slop — narrowing the phrase instead of
            # discarding the whole clause (which silently WIDENED the
            # query: 'chien "chat zzz"' returned chat-less docs).
            # Only INTERIOR holes earn slop (ADVICE r3): a dropped
            # leading/trailing term leaves no gap between the kept
            # terms, so crediting it widened matches. Multi-root slots
            # keep ALL indexed alternatives as a per-slot disjunction
            # (tuple) instead of silently taking the first.
            kept: list[str | tuple[str, ...]] = []
            slop = c.slop
            pending_holes = 0
            for t in c.terms:
                alts = term_alts(t)
                if alts:
                    if kept:
                        slop += pending_holes
                    pending_holes = 0
                    kept.append(alts[0] if len(alts) == 1 else tuple(alts))
                elif kept:
                    pending_holes += 1
            if len(kept) == 1:
                only = kept[0]
                if isinstance(only, str):
                    out.append(TermClause(only))
                else:
                    out.append(OrClause(list(only)))
            elif kept:
                out.append(PhraseClause(kept, slop=slop, ordered=c.ordered))
        elif isinstance(c, WildcardClause):
            hits = expand(c.pattern)
            if len(hits) == 1:
                out.append(TermClause(hits[0]))
            elif hits:
                out.append(OrClause(hits))
    return out


def resolve(
    clauses: list[Clause], vocabulary: set[str] | list[str]
) -> list[Clause]:
    """resolve_with over an in-memory vocabulary set."""
    vset = set(vocabulary)
    vlist = sorted(vset)
    return resolve_with(
        clauses, vset.__contains__, lambda p: expand_wildcard(p, vlist)
    )
