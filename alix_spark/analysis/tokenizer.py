"""Markup-aware French tokenizer.

Re-expresses the reference's ``MarkupTokenizer`` state machine
(reference: analysis/.../MarkupTokenizer.java:94-957) as a compiled-regex
scan plus the reference's trailing-dot lookahead resolution. Per-document
scans run inside ``mapInPandas`` batches, so the hot loop is C-level
regex over each document; there is no per-row Python UDF (the
``input_hint`` contract).

Behavioral contract (each point mirrors a reference behavior):

- words, numbers, clause-punct (single char), sentence-punct runs, and
  whole XML tags are emitted as typed tokens (MarkupTokenizer.java:442-684)
- the 5 XML entities are decoded *inside* words (:239-258, :756-791)
- curly apostrophes normalized to ``'`` and soft hyphens removed inside
  tokens (:576-581)
- numbers: optional ``-`` sign, digits with internal ``.``/``,``
  separators between digit runs (:613-641, :803-805); a dangling
  separator stays attached before ``<`` or end of input (:628-637,
  the "historical quirk kept for output stability")
- a dot after a letter stays inside the word token (:794-799); internal
  dotted forms (``U.S.A.``, ``arrive.Encore``) continue through letters,
  and a brevidot may continue through any token char (``J.-J.``,
  ``c.-à-d.``) (:748-754)
- trailing-dot resolution by LOOKAHEAD EVIDENCE (:260-288, :877-929):
  a word-final dot on a non-brevidot token starts a buffered sequence;
  inline tags and non-``,;:`` clause punctuation are transparent;
  ``, ; :`` keep all pending dots attached; a block tag, end of input,
  sentence punctuation, or a token starting with uppercase/titlecase/
  digit detaches — the rightmost candidate always detaches, then
  detachment cascades right-to-left while the just-bared candidate
  itself starts with uppercase/titlecase/digit; a detached dot
  adjacent to resolving sentence punctuation merges into it
  (``Phrase.?!`` → ``Phrase`` + ``.?!``)
- brevidots (dot kept): configured list (case-insensitive,
  lexicons.BREVIDOTS = reference brevidots.csv), single-letter
  initials, dotted short-segment abbreviations (``U.S.A.``, ``Ph.D.``),
  hyphenated initial chains (``J.-J.``); an ``l'``-style elision prefix
  is skipped before the test (:414-434, :493-546)
- ``<script>``/``<style>``/``<head>`` element content is excluded, the
  webtext analogue of the reference's ``MarkupZoneFilter`` EXCLUDE zones
  (MarkupZoneFilter.java:30-80)
- max token length 256 (:96-97)
"""

from __future__ import annotations

import re
from typing import NamedTuple

from alix_spark.analysis.lexicons import BREVIDOTS

# token types
W = "W"   # word
N = "N"   # number
X = "X"   # xml tag
S = "S"   # sentence punctuation run
C = "C"   # clause punctuation


class Token(NamedTuple):
    term: str
    start: int
    end: int
    ttype: str


_ENT = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}
_ENT_RE = re.compile("&(?:amp|lt|gt|quot|apos);")

# excluded zones: whole element content dropped (case-insensitive)
_ZONE_RE = re.compile(
    r"<(script|style|head)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)

_WCHAR = r"(?:&(?:amp|lt|gt|quot|apos);|[^\W\d_]|[\d&'’_°­-])"
_L = r"[^\W\d_]"  # one letter (for dot-attachment lookaround)

# the word branch mirrors readWord: a dot joins the token only after a
# letter, continues it only before a letter (internal dotted forms), or
# ends it as an attached trailing dot
_MAIN_RE = re.compile(
    rf"""
      (?P<xml><!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>)
    | (?P<num>-?\d+(?:[.,]\d+)*)
    | (?P<word>{_WCHAR}+(?:(?<={_L})\.(?={_L}){_WCHAR}+)*(?:(?<={_L})\.)?)
    | (?P<punsent>[.…?!]+)
    | (?P<punclause>[,;:()\[\]{{}}«»—–"'])
    """,
    re.VERBOSE | re.DOTALL,
)

MAX_TOKEN_LEN = 256

# block-level element local-names: any pending dot decision resolves at
# such a tag (MarkupTokenizer.BLOCK_TAGS, case-insensitive)
BLOCK_TAGS = frozenset(
    {
        "aside", "blockquote", "div", "figcaption", "h1", "h2", "h3",
        "h4", "h5", "h6", "li", "p", "section", "td", "th",
    }
)

_KEEP_CLAUSE = frozenset({",", ";", ":"})  # resolvers that keep all dots


def _norm_word(raw: str) -> str:
    t = raw
    if "&" in t:
        t = _ENT_RE.sub(lambda m: _ENT[m.group(0)], t)
    if "’" in t:
        t = t.replace("’", "'")
    if "­" in t:
        t = t.replace("­", "")
    return t if len(t) <= MAX_TOKEN_LEN else t[:MAX_TOKEN_LEN]


def _scan(src: str) -> list[Token]:
    """Raw typed-token scan, excluded zones blanked out first (offsets
    into the original string are preserved by same-length blanking)."""

    def blank(m: re.Match) -> str:
        return " " * (m.end() - m.start())

    visible = _ZONE_RE.sub(blank, src)
    out: list[Token] = []
    for m in _MAIN_RE.finditer(visible):
        kind = m.lastgroup
        raw = m.group(0)
        if kind == "xml":
            out.append(Token(raw, m.start(), m.end(), X))
        elif kind == "num":
            out.append(Token(raw, m.start(), m.end(), N))
        elif kind == "word":
            t = _norm_word(raw)
            if t:
                out.append(Token(t, m.start(), m.end(), W))
        elif kind == "punsent":
            out.append(Token(raw, m.start(), m.end(), S))
        else:
            out.append(Token(raw, m.start(), m.end(), C))
    return out, visible


# ------------------------------------------------- brevidot detection


def _is_letter(ch: str) -> bool:
    return ch.isalpha()


def _looks_dotted_abbrev(t: str, frm: int) -> bool:
    """U.S.A. / e.g. / Ph.D. — letter segments of 1-3 chars, dotted
    (MarkupTokenizer.looksLikeDottedAbbrev, :493-521)."""
    if len(t) - frm < 4 or t[-1] != ".":
        return False
    seg = 0
    internal = False
    for i in range(frm, len(t) - 1):
        c = t[i]
        if c == ".":
            if seg == 0 or seg > 3:
                return False
            internal = True
            seg = 0
            continue
        if not _is_letter(c):
            return False
        seg += 1
        if seg > 3:
            return False
    return internal and 0 < seg <= 3


def _looks_hyphenated_initials(t: str, frm: int) -> bool:
    """J.-J. / J.-C. chains (looksLikeHyphenatedInitials, :523-546)."""
    groups = 0
    i = frm
    n = len(t)
    while i < n:
        if i + 1 >= n or not _is_letter(t[i]) or t[i + 1] != ".":
            return False
        groups += 1
        i += 2
        if i == n:
            return groups >= 2
        if t[i] != "-":
            return False
        i += 1
    return False


def _is_brevidot(t: str, brevidots: frozenset[str] = BREVIDOTS) -> bool:
    """Final dot must stay attached (MarkupTokenizer.isBrevidot,
    :414-434): configured entries (case-insensitive), single-letter
    initials, dotted short-segment abbreviations, hyphenated initial
    chains; an elision prefix like ``l'`` is skipped."""
    if len(t) < 2 or t[-1] != ".":
        return False
    letter = len(t) - 2
    if _is_letter(t[letter]) and (letter == 0 or t[letter - 1] == "'"):
        return True
    frm = 0
    for i in range(len(t) - 2, 0, -1):
        if t[i - 1] == "'":
            frm = i
            break
    if _looks_dotted_abbrev(t, frm):
        return True
    if _looks_hyphenated_initials(t, frm):
        return True
    return t[frm:].lower() in brevidots


def _is_unknown_dotted(tok: Token, brevidots: frozenset[str] = BREVIDOTS) -> bool:
    """Word with an attached final dot needing contextual lookahead
    (isUnknownDotted, :477-486)."""
    t = tok.term
    return (
        tok.ttype == W
        and len(t) > 1
        and t[-1] == "."
        and _is_letter(t[-2])
        and not _is_brevidot(t, brevidots)
    )


def _starts_sentence(t: str) -> bool:
    """Sentence-start evidence: digit, -digit, uppercase or titlecase
    first char (startsSentence, :946-957)."""
    if not t:
        return False
    c = t[0]
    if c.isdigit():
        return True
    if c == "-" and len(t) > 1 and t[1].isdigit():
        return True
    return c.isupper() or c.istitle()


def _block_local_name(tag: str) -> str:
    """Element local-name after '<' and optional '/', namespace prefix
    stripped (isBlockTag, :390-402)."""
    i = 1
    n = len(tag)
    if i < n and tag[i] == "/":
        i += 1
    while i < n and tag[i].isspace():
        i += 1
    j = i
    while j < n and tag[j] not in ">/" and not tag[j].isspace():
        if tag[j] == ":":
            i = j + 1
        j += 1
    return tag[i:j]


def _is_block_tag(tag: str) -> bool:
    return _block_local_name(tag).lower() in BLOCK_TAGS


# --------------------------------------------- scan-level merge passes


def _merge_num_quirk(toks: list[Token], visible: str) -> list[Token]:
    """Dangling number separator stays attached before ``<`` or end of
    input (readNumber quirk, :628-637)."""
    out: list[Token] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if (
            t.ttype == N
            and i + 1 < n
            and toks[i + 1].term in (".", ",")
            and toks[i + 1].start == t.end
            and (
                toks[i + 1].end >= len(visible)
                or visible[toks[i + 1].end] == "<"
            )
        ):
            nxt = toks[i + 1]
            out.append(Token(t.term + nxt.term, t.start, nxt.end, N))
            i += 2
            continue
        out.append(t)
        i += 1
    return out


# non-letter chars that CONTINUE a recognized brevidot (reference
# Char.isToken, Char.java:106-140: letters+digits plus these; letters
# already continue inline in the regex scan, dot+letter never splits)
_BREVIDOT_CONTINUERS = frozenset("-'’_&°­")


def _merge_brevidot_chains(
    toks: list[Token], brevidots: frozenset[str] = BREVIDOTS
) -> list[Token]:
    """readWord continues a recognized brevidot with ANY token char
    (:748-754, Char.isToken): re-join ``J.`` + ``-J.`` into ``J.-J.``,
    ``c.`` + ``-à-d.`` into ``c.-à-d.``, ``etc.`` + ``'s`` into
    ``etc.'s``, and ``A.`` + ``4`` into ``A.4`` (the regex scan stops
    a word at dot+non-letter, so adjacent W/N tokens opening with a
    token char re-attach here)."""
    out: list[Token] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if t.ttype == W and t.term.endswith(".") and _is_brevidot(t.term, brevidots):
            while (
                i + 1 < n
                and toks[i + 1].ttype in (W, N)
                and toks[i + 1].start == t.end
                and (
                    toks[i + 1].term[0] in _BREVIDOT_CONTINUERS
                    or toks[i + 1].term[0].isdigit()
                )
            ):
                nxt = toks[i + 1]
                t = Token(t.term + nxt.term, t.start, nxt.end, W)
                i += 1
                if not (t.term.endswith(".") and _is_brevidot(t.term, brevidots)):
                    break
        out.append(t)
        i += 1
    return out


# ------------------------------------------- trailing-dot resolution


def _detach(seq: list[Token], cands: list[int], punct_idx: int | None) -> list[Token]:
    """detachDots (:260-288): rightmost candidate always detaches, then
    cascade right-to-left while the bared candidate starts a sentence;
    the rightmost dot merges into adjacent resolving punctuation."""
    last = len(cands) - 1
    first = last

    def strip(k: int) -> None:
        w = seq[k]
        seq[k] = Token(w.term[:-1], w.start, w.end - 1, W)

    strip(cands[first])
    while first > 0 and _starts_sentence(seq[cands[first]].term):
        first -= 1
        strip(cands[first])

    merge_last = False
    if punct_idx is not None:
        p = seq[punct_idx]
        if p.start == seq[cands[last]].end + 1:  # dot end == punct start
            seq[punct_idx] = Token("." + p.term, seq[cands[last]].end, p.end, S)
            merge_last = True

    detached = set(cands[first:])
    out: list[Token] = []
    for k, tok in enumerate(seq):
        out.append(tok)
        if k in detached and not (merge_last and k == cands[last]):
            out.append(Token(".", tok.end, tok.end + 1, S))
    return out


def _resolve_dots(
    toks: list[Token], brevidots: frozenset[str] = BREVIDOTS
) -> list[Token]:
    """resolveDottedSequence (:877-929) over the scanned token list."""
    out: list[Token] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if not _is_unknown_dotted(t, brevidots):
            out.append(t)
            i += 1
            continue
        seq = [t]
        cands = [0]
        j = i + 1
        action: tuple[str, int | None] | None = None
        while j < n:
            nt = toks[j]
            seq.append(nt)
            j += 1
            if nt.ttype == X:
                if _is_block_tag(nt.term):
                    action = ("detach", None)  # sentence can't cross a block
                    break
                continue  # inline tags are transparent
            if nt.ttype == C:
                if nt.term in _KEEP_CLAUSE:
                    action = ("keep", None)  # , ; : keep all pending dots
                    break
                continue  # quotes, parentheses, dashes: transparent
            if _is_unknown_dotted(nt, brevidots):
                cands.append(len(seq) - 1)
                continue
            if nt.ttype == S:
                action = ("detach", len(seq) - 1)
                break
            if _starts_sentence(nt.term):
                action = ("detach", None)
            else:
                action = ("keep", None)
            break
        if action is None:
            action = ("detach", None)  # end of input
        if action[0] == "detach":
            seq = _detach(seq, cands, action[1])
        out.extend(seq)
        i = j
    return out


def tokenize(
    src: str,
    include_zone: tuple[str, str, str] | None = None,
    brevidots: frozenset[str] | None = None,
) -> list[Token]:
    """Full tokenizer: scan + trailing-dot lookahead resolution.

    ``brevidots``: configured dotted-abbreviation set (lowercase;
    matching is case-insensitive like the reference's default chain);
    ``None`` = lexicons.BREVIDOTS — the ctor-argument analogue of
    ``MarkupTokenizer(CharArraySet brevidots)``.

    ``include_zone=(tag, attr, value)`` restricts word emission to the
    content of elements matching ``<tag … attr="value">`` — the
    reference's INCLUDE zone mode (MarkupZoneFilter.java:30-80; the
    observation-field analyzers use ``@data-tei-type="observation"``
    INCLUDE, FrenchAnalyzer.java:413-421). Outside-zone content is
    blanked with offsets preserved, like the EXCLUDE zones."""
    brevi = BREVIDOTS if brevidots is None else brevidots
    if include_zone is not None:
        src = _mask_outside_zones(src, *include_zone)
    toks, visible = _scan(src)
    toks = _merge_num_quirk(toks, visible)
    toks = _merge_brevidot_chains(toks, brevi)
    return _resolve_dots(toks, brevi)


def _mask_outside_zones(src: str, tag: str, attr: str, value: str) -> str:
    """Blank everything outside elements matching the attribute test
    (same-length masking keeps offsets valid). Non-nested elements."""
    rx = re.compile(
        rf"<{tag}\b[^>]*\b{re.escape(attr)}\s*=\s*\"{re.escape(value)}\"[^>]*>"
        rf".*?</{tag}\s*>",
        re.IGNORECASE | re.DOTALL,
    )
    out = [" "] * len(src)
    for m in rx.finditer(src):
        out[m.start() : m.end()] = src[m.start() : m.end()]
    return "".join(out)
