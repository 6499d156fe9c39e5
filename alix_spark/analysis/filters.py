"""Token-stream filters, applied in the reference's canonical order
(reference: analysis/.../fr/FrenchAnalyzer.java:288-305 ``canonicChain``):

    tokenize → boundary → clitic split → replace → uppercase → pos →
    lemma → mwe → stop → cleanup

Each filter is a pure function ``list[Tok] → list[Tok]`` over an
annotated token record, so the whole chain is trivially testable and runs
batched inside ``mapInPandas``.

Position semantics (reference CleanupFilter.java:174-201 + Lucene
posInc): a *gap drop* consumes a position (stopwords, punctuation —
their holes survive in the position channel, the TermStats invariant
``docTokens ≤ docWidths``, TermStats.java:44-49); a *collapse drop*
consumes none (XML tags, 1-char noise — ``skip()``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from alix_spark.analysis import lexicons as lx
from alix_spark.analysis.tokenizer import C, N, S, Token, W, X

# boundary pseudo-terms (reference MarkupBoundaryFilter.java:96-358)
PARA = "¶"
SECTION = "§"

_BLOCK_PARA = frozenset(
    {"p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "tr",
     "blockquote", "br", "hr"}
)
_BLOCK_SECTION = frozenset({"section", "article", "body", "html"})

_TAG_NAME_RE = re.compile(r"^<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9]*)")


@dataclass
class Tok:
    """Annotated token flowing through the chain."""

    term: str
    start: int
    end: int
    ttype: str                 # W N X S C  (+ "B" boundary)
    pos_tag: str = ""          # UD tag or PUNCT* code
    lemma: str = ""            # sparse lemma channel
    flags: set = field(default_factory=set)


B = "B"  # boundary token type


def annotate(tokens: list[Token]) -> list[Tok]:
    return [Tok(t.term, t.start, t.end, t.ttype) for t in tokens]


# ------------------------------------------------------------- boundary


def boundary_filter(toks: list[Tok]) -> list[Tok]:
    """Drop tag tokens; closing block tags emit coalesced ¶/§ boundary
    tokens, section wins (reference MarkupBoundaryFilter.java:96-358)."""
    out: list[Tok] = []
    for t in toks:
        if t.ttype != X:
            out.append(t)
            continue
        m = _TAG_NAME_RE.match(t.term)
        if not m:
            continue  # comment / doctype / CDATA: dropped silently
        closing, name = m.group(1) == "/", m.group(2).lower()
        self_closing = t.term.rstrip(">").rstrip().endswith("/")
        fire = (closing or self_closing or name in ("br", "hr")) and (
            name in _BLOCK_PARA or name in _BLOCK_SECTION
        )
        if not fire:
            continue
        mark = SECTION if name in _BLOCK_SECTION else PARA
        if out and out[-1].ttype == B:
            if mark == SECTION:
                out[-1].term = SECTION
                out[-1].pos_tag = lx.PUNCT_SECTION
            continue  # coalesce
        out.append(
            Tok(mark, t.start, t.end, B,
                lx.PUNCT_SECTION if mark == SECTION else lx.PUNCT_PARA)
        )
    return out


# ---------------------------------------------------------- clitic split

_PREFIXES = sorted(lx.CLITIC_PREFIX, key=len, reverse=True)
_SUFFIXES = sorted(lx.CLITIC_SUFFIX, key=len, reverse=True)


def _split_clitics_one(t: Tok) -> list[Tok]:
    low = t.term.lower()
    if low in lx.CLITIC_KEEP:
        return [t]
    out: list[Tok] = []
    term, start = t.term, t.start
    splits = 0
    # apostrophe prefixes, possibly chained (jusqu'à l' → rare but legal)
    changed = True
    while changed and splits < lx.MAX_SPLITS:
        changed = False
        low = term.lower()
        if low in lx.CLITIC_KEEP:
            break
        for p in _PREFIXES:
            if low.startswith(p) and len(term) > len(p):
                out.append(Tok(lx.CLITIC_PREFIX[p], start, start + len(p), W))
                term = term[len(p):]
                start += len(p)
                splits += 1
                changed = True
                break
    # '"s" genitive dropped (reference :152-155)
    if term.lower().endswith("'s") and len(term) > 2:
        term = term[:-2]
    # hyphen-suffix enclitics, cascading from the right (reference :158-185)
    tail: list[Tok] = []
    changed = True
    while changed and splits < lx.MAX_SPLITS:
        changed = False
        low = term.lower()
        for sfx in _SUFFIXES:
            if low.endswith(sfx) and len(term) > len(sfx):
                rep = lx.CLITIC_SUFFIX[sfx]
                cut = len(term) - len(sfx)
                if rep is not None:
                    tail.insert(
                        0, Tok(rep, start + cut, start + len(term), W)
                    )
                term = term[:cut]
                splits += 1
                changed = True
                break
    # strip one trailing apostrophe (reference :214-221)
    if term.endswith("'") and len(term) > 1 and term.lower() not in lx.CLITIC_PREFIX:
        term = term[:-1]
    if term:
        out.append(Tok(term, start, start + len(term), W))
    out.extend(tail)
    return out if out else [t]


def clitic_filter(toks: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    for t in toks:
        # "kw" marks dictionary-resolved tokens (merged person names);
        # the reference's KeywordAttribute stops re-analysis of those
        if t.ttype == W and "kw" not in t.flags and (
            "'" in t.term or "-" in t.term
        ):
            out.extend(_split_clitics_one(t))
        else:
            out.append(t)
    return out


# -------------------------------------------------------------- replace


def replace_filter(toks: list[Tok]) -> list[Tok]:
    """Whole-token normalization; miss retries lowercase when the first
    char is uppercase (reference ReplaceFilter.java:110-130)."""
    for t in toks:
        if t.ttype != W:
            continue
        hit = lx.NORM.get(t.term)
        if hit is None and t.term[:1].isupper():
            hit = lx.NORM.get(t.term.lower())
        if hit is not None:
            t.term = hit
    return toks


# ------------------------------------------------------------ uppercase

_DOT_ACRO_RE = re.compile(r"^(?:[^\W\d_]{1,3}\.)+$")


def _decap(term: str) -> str:
    """Lowercase all but the first letter, restarting capitalization
    after each hyphen (reference UppercaseFilter.java:19-99)."""
    parts = term.split("-")
    return "-".join(p[:1] + p[1:].lower() if p else p for p in parts)


def uppercase_filter(toks: list[Tok]) -> list[Tok]:
    out: list[Tok] = []
    for t in toks:
        if (
            t.ttype != W
            or "kw" in t.flags  # resolved (merged person name): keep as-is
            or any(c.islower() for c in t.term)
        ):
            out.append(t)
            continue
        letters = sum(1 for c in t.term if c.isalpha())
        if (
            t.term in lx.UCWORDS
            or letters <= 1
            or _DOT_ACRO_RE.match(t.term)
        ):
            out.append(t)
            continue
        if letters < 4:
            # unprotected short all-caps word: deleted, position gap
            t.term = ""
            t.flags.add("gap")
            out.append(t)
            continue
        t.term = _decap(t.term)
        out.append(t)
    return out


# ------------------------------------------------------------ pos tagger

_VERB_FORMS = frozenset(
    f for f, l in lx.LEMMA.items()
    if l.endswith(("er", "ir", "re", "oir")) and f not in lx.POS
)


def pos_filter(toks: list[Tok]) -> list[Tok]:
    """Deterministic lexicon POS tagger (substitute for the reference's
    OpenNLP maxent model, SURVEY §7 option (iii); goldens pinned here).
    Sentence-initial titlecase words are not PROPN-forced."""
    sent_start = True
    for t in toks:
        if t.ttype == B:
            sent_start = True
            continue
        if t.ttype == S:
            t.pos_tag = lx.PUNCT_SENT
            sent_start = True
            continue
        if t.ttype == C:
            t.pos_tag = lx.PUNCT_CLAUSE
            continue
        if t.ttype == N:
            t.pos_tag = "DIGIT"
            sent_start = False
            continue
        if not t.term:
            continue
        low = t.term.lower()
        if low in lx.POS:
            t.pos_tag = lx.POS[low]
        elif low in _VERB_FORMS:
            t.pos_tag = "VERB"
        elif t.term in lx.PROPN or (t.term[:1].isupper() and not sent_start):
            t.pos_tag = "PROPN"
        else:
            t.pos_tag = "NOUN"
        sent_start = False
    return toks


def pos_filter_maxent(toks: list[Tok], tagger) -> list[Tok]:
    """Maxent POS tagging with the reference's sentence-buffered
    semantics (PosTaggingFilter.java:66-354): words buffered to a
    sentence boundary (≤300 tokens, :69-70); boundaries fed to the
    tagger as "."; hyphens stripped from tagger input (HYPHEN_REWRITER,
    :97-102); the UD tag written back with ``+``→``_`` (:343) to word
    tokens only — punctuation/number tags are never overwritten
    (:318-321). The tagger is an
    :class:`alix_spark.analysis.maxent.MaxentTagger` over the same
    OpenNLP model the reference loads (FrenchAnalyzer.java:74-79)."""
    MAX_SENT = 300

    # structural tags first (same as the lexicon tagger)
    for t in toks:
        if t.ttype == S:
            t.pos_tag = lx.PUNCT_SENT
        elif t.ttype == C:
            t.pos_tag = lx.PUNCT_CLAUSE
        elif t.ttype == N:
            t.pos_tag = "DIGIT"

    buf: list[tuple[int, str]] = []  # (index in toks, tagger input)

    def flush() -> None:
        if not buf:
            return
        words = [w for _, w in buf]
        tags = tagger.tag(words)
        for (idx, _), tag in zip(buf, tags):
            if toks[idx].ttype == W:
                toks[idx].pos_tag = tag.replace("+", "_")
        buf.clear()

    for i, t in enumerate(toks):
        if t.ttype == X:
            continue  # skipped entirely (1→0)
        if t.ttype in (S, B):
            buf.append((i, "."))
            flush()
            continue
        if t.ttype == C:
            buf.append((i, t.term))
            continue
        if not t.term:
            continue
        word = t.term.replace("-", "") if t.ttype == W else t.term
        buf.append((i, word if word else t.term))
        if len(buf) >= MAX_SENT:
            flush()
    flush()
    return toks


# ---------------------------------------------------------------- lemma


def lemma_filter(toks: list[Tok]) -> list[Tok]:
    """Sparse lemma channel (reference LemmaFilter.java:130-224):
    surface lookup; unknown first-upper words are protected if PROPN or
    inner-uppercase, else retried lowercase with surface rewritten to
    lowercase on hit; POS-specific entry wins over POS-agnostic."""
    for t in toks:
        if t.ttype != W or not t.term:
            continue
        lem = lx.LEMMA_POS.get((t.term, t.pos_tag)) or lx.LEMMA.get(t.term)
        if lem is None and t.term[:1].isupper():
            if t.term in lx.PROPN or any(c.isupper() for c in t.term[1:]):
                continue  # protected
            low = t.term.lower()
            lem = lx.LEMMA_POS.get((low, t.pos_tag)) or lx.LEMMA.get(low)
            if lem is not None:
                t.term = low  # surface rewritten (reference :190-203)
        if lem is not None and lem != t.term:
            t.lemma = lem
    return toks


# ------------------------------------------------------------------ mwe


# first-token index over the MWE table: the common case (a token that
# starts no known expression) costs one dict lookup instead of probing
# every window length (the reference's token-ordinal automaton plays
# the same role, MweFilter.java:82-130)
_MWE_BY_FIRST: dict[str, list[tuple[int, tuple, tuple]]] = {}
for _key, _val in lx.MWE.items():
    _MWE_BY_FIRST.setdefault(_key[0], []).append((len(_key), _key, _val))
for _cands in _MWE_BY_FIRST.values():
    _cands.sort(key=lambda c: -c[0])  # longest first (maximal munch)


def mwe_filter(toks: list[Tok]) -> list[Tok]:
    """Maximal-munch multi-word-expression compounding over two parallel
    paths — surface forms and lemmas (lemma falls back to form); longest
    match wins, form beats lemma on tie (reference MweFilter.java:82-325).
    The merged token carries the canonical form, spans the offsets, and
    has an empty lemma (:246-275)."""
    out: list[Tok] = []
    i, n = 0, len(toks)
    while i < n:
        t = toks[i]
        if t.ttype != W or not t.term:
            out.append(t)
            i += 1
            continue
        low = t.term.lower()
        lem = (t.lemma or t.term).lower()
        cands = _MWE_BY_FIRST.get(low)
        if lem != low:
            lc = _MWE_BY_FIRST.get(lem)
            if lc:
                # no re-sort: only the deduplicated LENGTH set below is
                # consumed, and ties prefer form over lemma via list
                # order (form candidates first)
                cands = (cands or []) + lc
        best = None  # (length, canonical, tag)
        if cands:
            for length in sorted({c[0] for c in cands}, reverse=True):
                if i + length > n:
                    continue
                window = toks[i : i + length]
                if any(w.ttype != W or not w.term for w in window):
                    continue
                form_key = tuple(w.term.lower() for w in window)
                hit = lx.MWE.get(form_key)
                if hit is None:
                    lemma_key = tuple((w.lemma or w.term).lower() for w in window)
                    hit = lx.MWE.get(lemma_key)
                if hit is not None:
                    best = (length, hit[0], hit[1])
                    break
        if best is None:
            out.append(t)
            i += 1
            continue
        length, canon, tag = best
        out.append(
            Tok(canon, t.start, toks[i + length - 1].end, W, tag, "",
                {"mwe"})
        )
        i += length
    return out


# ----------------------------------------------------------------- stop


def stop_filter(toks: list[Tok]) -> list[Tok]:
    """Stopword drop by surface form, *before* lemma projection
    (reference FrenchAnalyzer.java:302); the position gap is kept."""
    for t in toks:
        if t.ttype == W and t.term and "mwe" not in t.flags:
            if t.term.lower() in lx.STOPWORDS:
                t.term = ""
                t.flags.add("gap")
    return toks


# -------------------------------------------------------------- cleanup

_KEEP_1CHAR_POS = frozenset({"ADP", "AUX", "PRON", "VERB"})
_BAD_EDGE = ("-", "'", ".", "+", "=", "<", ">", "&", "_", "°")


def cleanup_filter(
    toks: list[Tok], with_offsets: bool = False
) -> list[tuple]:
    """Final hygiene + position assignment
    (reference CleanupFilter.java:101-363).

    Returns emitted tokens ``(term, position, pos_tag, lemma)`` —
    plus ``(start, end)`` source offsets when ``with_offsets`` (the
    reference keeps OffsetAttribute through the chain; consumers like
    the sqlite token sink and highlighters need them):
    - punctuation / boundaries / numbers / stop-gaps → dropped, position
      consumed (gap)
    - XML / collapse-flagged 1-char noise → dropped, no position
    - lemma projected into the term when present (:346-349)
    - never emits empty terms
    """
    out: list[tuple] = []
    pos = 0
    for t in toks:
        if t.ttype == X:
            continue  # collapse: no position
        if t.ttype in (S, C, B, N):
            pos += 1  # gap
            continue
        if not t.term:  # deleted upstream (stop / short all-caps)
            if "gap" in t.flags:
                pos += 1
            continue
        # skip()/accept() both test the SURFACE form; the lemma is
        # copied into the term only at emit (reference skip() runs
        # before accept()'s lemma copy, CleanupFilter.java:251-349) —
        # a lemma whose shape differs from its surface (1-char, dotted,
        # digit-final) must not change what collapses or gaps
        surf = t.term
        if len(surf) == 1 and t.pos_tag not in _KEEP_1CHAR_POS and "mwe" not in t.flags:
            continue  # collapse (reference :251-291 skip())
        if (
            len(surf) == 2
            and surf[-1] in ("'", "’", ".")
            and "mwe" not in t.flags
        ):
            continue  # collapse: a' / C. variables (reference skip() :278-283)
        if (
            len(surf) >= 2
            and surf[-1].isdigit()
            and not surf[-2].isdigit()
            and "mwe" not in t.flags
        ):
            continue  # collapse: abc4-style labels (reference skip() :285-287)
        if "mwe" not in t.flags and (
            surf[0].isdigit()
            or surf[-1].isdigit()
            or surf[0] in _BAD_EDGE
            or surf[-1] in _BAD_EDGE
        ):
            pos += 1  # accept()-style drop with gap (reference :313-358)
            continue
        term = t.lemma if t.lemma else t.term  # lemma copy (:346-349)
        if with_offsets:
            # the SURFACE rides along: offset consumers (sqlite orth
            # dictionary, hilite) need the form the analyzer consumed,
            # which the lemma copy just overwrote in `term`
            out.append((term, pos, t.pos_tag, t.lemma, t.start, t.end, surf))
        else:
            out.append((term, pos, t.pos_tag, t.lemma))
        pos += 1
    return out


# ------------------------------------- optional filters (not in chain)
# The reference ships four more token filters that are NOT part of
# canonicChain (FrenchAnalyzer.java:288-305) — they serve OCR'd and
# line-oriented corpora (RewriteFilterBenchmark.java:59, demos). They
# are opt-in here too, via run_chain keywords.

_OCR_ALLOWED_PUNCT = frozenset({"-", "'", "’", " ", "."})
_OCR_VOWELS = frozenset("aàâäæeéèêëiîïoôöœuùûüyÿ")  # kept for parity; the
# reference's hasVowel test is commented out (OCRGarbageFilter.java:100)
_LATIN_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿŒœŸ]")


def _ocr_accept(term: str) -> bool:
    """The reference's word-likeness test
    (OCRGarbageFilter.java:50-100 accept())."""
    if not term:
        return False
    if term[-1] in (".", "-"):
        return False
    letters = 0
    prev = ""
    repeats = 0
    for c in term:
        if c.isalpha():
            if not _LATIN_RE.match(c):
                return False
            letters += 1
            folded = c.lower()
            if folded == prev:
                repeats += 1
                if repeats >= 3:
                    return False
            else:
                prev = folded
                repeats = 1
            continue
        if c not in _OCR_ALLOWED_PUNCT:
            return False
        prev = ""
        repeats = 0
    return letters >= 2


def ocr_garbage_filter(toks: list[Tok]) -> list[Tok]:
    """Drop unresolved tokens structurally unlikely to be words
    (reference OCRGarbageFilter.java). Dictionary-resolved tokens
    (keyword analogue: ``mwe``/``kw`` flags) always pass; rejected
    tokens become position gaps (FilteringTokenFilter preserves
    position increments). Applied to word/number tokens only — tag and
    punctuation handling belongs to the main chain (the reference runs
    this on OCR word streams)."""
    for t in toks:
        # W only: the reference runs this on OCR word streams, and N
        # tokens are unconditional position gaps in cleanup_filter
        if t.ttype != W:
            continue
        if not t.term or "mwe" in t.flags or "kw" in t.flags:
            continue
        if not _ocr_accept(t.term):
            t.term = ""
            t.flags.add("gap")
    return toks


def sentence_start_lower_filter(toks: list[Tok]) -> list[Tok]:
    """Lowercase the first lexical token after a sentence boundary when
    its lowercase form is a lexicon word
    (reference SentenceStartLowerCaseFilter.java:104-160):

    - start of stream = sentence start;
    - PUNCTsent / PUNCTpara / PUNCTsection set the pending state;
    - XML and PUNCTclause pass through without consuming it;
    - any other token consumes it; keyword tokens are not rewritten
      but still consume the state.

    Needs POS tags, so runs after the tagger (the reference reads
    PosAttribute)."""
    pending = True
    for t in toks:
        tag = t.pos_tag
        if tag in (lx.PUNCT_SENT, lx.PUNCT_PARA, lx.PUNCT_SECTION) or (
            not tag and t.ttype in (S, B)
        ):
            pending = True
            continue
        if t.ttype == X or tag == lx.PUNCT_CLAUSE or (
            not tag and t.ttype == C
        ):
            continue
        if not t.term:
            # upstream-deleted gap token: in the reference a
            # FilteringTokenFilter deletion only bumps posInc and never
            # reaches this filter, so it must not consume the state
            continue
        if not pending:
            continue
        pending = False
        if "mwe" in t.flags or "kw" in t.flags:
            continue
        low = t.term.lower()
        if low != t.term and (low in lx.POS or low in lx.LEMMA):
            t.term = low  # the lexicon's canonical form
    return toks


def _is_pers_initial(term: str) -> bool:
    """``E`` or ``E.`` (uppercase, É folds to E, never ``M`` — Monsieur)
    (reference PersInitialFilter.java:184-196 isInitial())."""
    if not 1 <= len(term) <= 2:
        return False
    c0 = term[0]
    if not (c0.isupper() and c0.isalpha()):
        return False
    if len(term) == 2 and term[1] != ".":
        return False
    return c0 != "M"


def _is_family_name(term: str) -> bool:
    """Uppercase-initial token of letters / apostrophes / hyphens
    (reference PersInitialFilter.java:158-176 isFamilyName())."""
    if len(term) < 2 or not (term[0].isupper() and term[0].isalpha()):
        return False
    return all(c.isalpha() or c in ("-", "'", "’") for c in term[1:])


def pers_initial_filter(toks: list[Tok]) -> list[Tok]:
    """Merge a person initial with the following family name into one
    token ``E. Meyerson`` (reference PersInitialFilter.java:83-140).
    The initial is ASCII-folded (É→E) whether or not a merge happens
    (java:194 folds before the merge decision). XML tag tokens carry no
    position, so they are skipped when probing for the family name —
    ``E. <span>Meyerson</span>`` still merges (java:111: "offset gap is
    not relevant"); a punctuation or word token between them blocks
    the merge. Runs immediately after the tokenizer
    (PersInitialFilter.java:32-34)."""
    import unicodedata

    out: list[Tok] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t.ttype != W or not _is_pers_initial(t.term):
            out.append(t)
            i += 1
            continue
        # fold the initial only (É→E), case preserved — the reference
        # folds exactly one char (PersInitialFilter.java:194); NFD base
        # char = ASCII fold for single uppercase Latin letters
        initial = unicodedata.normalize("NFD", t.term[0])[0].upper()
        j = i + 1
        while j < len(toks) and toks[j].ttype == X:
            j += 1  # tags are position-less (ADVICE r3)
        nxt = toks[j] if j < len(toks) else None
        if nxt is None or nxt.ttype != W or not _is_family_name(nxt.term):
            if initial != t.term[0]:
                t = Tok(initial + t.term[1:], t.start, t.end, t.ttype,
                        t.pos_tag, t.lemma, set(t.flags))
            out.append(t)
            i += 1
            continue
        merged = Tok(
            term=f"{initial}. {nxt.term}",
            start=t.start,
            end=nxt.end,
            ttype=W,
            flags={"kw"},  # resolved: protect from downstream rewrite
        )
        out.append(merged)
        out.extend(toks[i + 1 : j])  # skipped tag tokens stay in stream
        i = j + 1
    return out


def line_tokenizer(text: str) -> list[Token]:
    """One token per non-empty line, offsets as the reference computes
    them (LineTokenizer.java:30-56: empty lines consume their newline;
    a line token spans [start, start+len), next offset = end + 1).
    CRLF line ends are handled like the reference's readLine — the
    ``\\r`` is neither part of the token nor a token of its own."""
    out: list[Token] = []
    offset = 0
    for line in text.split("\n"):
        core = line[:-1] if line.endswith("\r") else line
        if core:
            out.append(Token(core, offset, offset + len(core), W))
        offset += len(line) + 1
    return out


def run_chain(
    tokens: list[Token],
    tagger=None,
    with_offsets: bool = False,
    pers_initials: bool = False,
    sentence_decap: bool = False,
    ocr_garbage: bool = False,
) -> list[tuple]:
    """tokenize() output → final indexable tokens.

    ``tagger=None`` uses the deterministic lexicon tagger (goldens are
    pinned to it, SURVEY §7 option iii); passing a
    ``maxent.MaxentTagger`` switches to the reference's OpenNLP model
    path (option i). The three boolean switches enable the reference's
    optional OCR/names filters (off in canonicChain and off here — the
    goldens pin the default chain)."""
    toks = annotate(tokens)
    if pers_initials:
        toks = pers_initial_filter(toks)  # right after the tokenizer
    toks = boundary_filter(toks)
    toks = clitic_filter(toks)
    toks = replace_filter(toks)
    toks = uppercase_filter(toks)
    if tagger is None:
        toks = pos_filter(toks)
    else:
        toks = pos_filter_maxent(toks, tagger)
    if sentence_decap:
        toks = sentence_start_lower_filter(toks)  # needs POS tags
    toks = lemma_filter(toks)
    toks = mwe_filter(toks)
    if ocr_garbage:
        toks = ocr_garbage_filter(toks)  # after the dictionary filters
    toks = stop_filter(toks)
    return cleanup_filter(toks, with_offsets=with_offsets)
