"""Markup-aware French tokenizer.

Re-expresses the reference's ``MarkupTokenizer`` state machine
(reference: analysis/.../MarkupTokenizer.java:94-957) as a compiled-regex
scan plus a dotted-abbreviation merge pass. Per-document scans run inside
``mapInPandas`` batches, so the hot loop is C-level regex over each
document; there is no per-row Python UDF (the ``input_hint`` contract).

Behavioral contract (each point mirrors a reference behavior):

- words, numbers, clause-punct (single char), sentence-punct runs, and
  whole XML tags are emitted as typed tokens (MarkupTokenizer.java:442-684)
- the 5 XML entities are decoded *inside* words (:239-258, :756-791)
- curly apostrophes normalized to ``'`` and soft hyphens removed inside
  tokens (:576-581)
- numbers: optional ``-`` sign, digits with internal ``.``/``,``
  separators between digit runs (:613-641, :803-805)
- trailing-dot resolution (:260-288, :414-546, :883-929): configured
  brevidots, single initials (``J.``), dotted abbreviations with short
  segments (``U.S.A.``) and hyphenated initials (``J.-J.``) keep their
  dots as one token; any other word-final dot stays a detached
  sentence-punct token.  (The reference resolves by lookahead evidence;
  this engine resolves by the same abbreviation classes — goldens are
  pinned to this chain, SURVEY §5.)
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

_MAIN_RE = re.compile(
    r"""
      (?P<xml><!--.*?-->|<!\[CDATA\[.*?\]\]>|<[^>]*>)
    | (?P<num>-?\d+(?:[.,]\d+)*)
    | (?P<word>(?:&(?:amp|lt|gt|quot|apos);|[^\W\d_]|[\d&'’_°­-])+)
    | (?P<punsent>[.…?!]+)
    | (?P<punclause>[,;:()\[\]{}«»—–"'])
    """,
    re.VERBOSE | re.DOTALL,
)

MAX_TOKEN_LEN = 256

_UPPER_SEG_RE = re.compile(r"^-?[^\W\d_]{1,3}$")


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
    return out


def _is_initialism_seg(term: str) -> bool:
    """Segment usable in a dotted abbreviation: ≤3 letters, uppercase
    first letter, optional leading hyphen (``-J`` in ``J.-J.``)."""
    if not _UPPER_SEG_RE.match(term):
        return False
    first = term[1] if term.startswith("-") else term[0]
    return first.isupper()


def _merge_dots(toks: list[Token]) -> list[Token]:
    """Dotted-abbreviation merge (brevidots / initials / acronyms)."""
    out: list[Token] = []
    i = 0
    n = len(toks)
    while i < n:
        t = toks[i]
        if t.ttype == W and i + 1 < n:
            nxt = toks[i + 1]
            dot_adj = nxt.ttype == S and nxt.term == "." and nxt.start == t.end
            # configured brevidot: always keep the dot attached
            if dot_adj and (t.term + ".") in BREVIDOTS:
                out.append(Token(t.term + ".", t.start, nxt.end, W))
                i += 2
                continue
            # initials / dotted acronym: U.S.A., J., J.-J., Ph.D.
            if dot_adj and _is_initialism_seg(t.term):
                parts = [t.term]
                end = nxt.end
                j = i + 2
                while (
                    j + 1 < n
                    and toks[j].ttype == W
                    and toks[j].start == end
                    and _is_initialism_seg(toks[j].term)
                    and toks[j + 1].ttype == S
                    and toks[j + 1].term == "."
                    and toks[j + 1].start == toks[j].end
                ):
                    parts.append(toks[j].term)
                    end = toks[j + 1].end
                    j += 2
                # accept: single uppercase initial (J.) or ≥2 dotted
                # segments (U.S.A., Ph.D.); a lone 2-3 letter titlecase
                # word before a sentence dot is NOT an abbreviation
                if len(parts) >= 2 or len(parts[0].lstrip("-")) == 1:
                    out.append(Token(".".join(parts) + ".", t.start, end, W))
                    i = j
                    continue
        out.append(t)
        i += 1
    return out


def tokenize(src: str, include_zone: tuple[str, str, str] | None = None) -> list[Token]:
    """Full tokenizer: scan + dotted-abbreviation resolution.

    ``include_zone=(tag, attr, value)`` restricts word emission to the
    content of elements matching ``<tag … attr="value">`` — the
    reference's INCLUDE zone mode (MarkupZoneFilter.java:30-80; the
    observation-field analyzers use ``@data-tei-type="observation"``
    INCLUDE, FrenchAnalyzer.java:413-421). Outside-zone content is
    blanked with offsets preserved, like the EXCLUDE zones."""
    if include_zone is not None:
        src = _mask_outside_zones(src, *include_zone)
    return _merge_dots(_scan(src))


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
