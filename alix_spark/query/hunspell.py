"""Minimal Hunspell engine: root lookup for query-time term expansion.

Re-expresses the reference's query-side Hunspell use: ``SpanQueryParser``
resolves each query word by PREFERRING its Hunspell roots over the
surface form — roots present in the index become a disjunction, the
surface form is only tried when no indexed root exists
(common/.../snippets/SpanQueryParser.java:482-518, consuming the
field-restricted sidecar produced by
common/.../terms/HunspellCompiler.java). The reference delegates the
stemming itself to Lucene's Hunspell; here the relevant subset of the
public Hunspell format is implemented directly:

- ``.aff``: ``SFX``/``PFX`` rule classes — ``SFX flag cross n`` header
  then ``SFX flag strip add condition`` lines (affix-flag continuation
  and compounding features are out of scope for root lookup);
- ``.dic``: count header then ``headword/FLAGS`` lines, optional
  morphological fields after whitespace;
- ``roots(word)``: the word itself when it is a headword, plus every
  headword that derives the word by one suffix/prefix rule of a class
  the headword carries. Curly apostrophes fold to ``'`` on both sides
  (the compiler writes the index's apostrophe form for the same
  reason, HunspellCompiler.java docblock).

The build-time analogue of ``HunspellCompiler.compile`` is
:func:`compile_sidecar`: filter source ``.dic`` entries to the index
vocabulary, annotate each kept line with the term's corpus frequency in
an ``fr:`` morphological field, and write the ``<field>.dic/.aff`` pair
next to the index (atomic with the index publish).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass


def _fold(s: str) -> str:
    return s.replace("’", "'").replace("ʼ", "'")


@dataclass
class _Rule:
    strip: str      # removed from the root before the affix is added
    add: str        # affix text
    cond: re.Pattern  # applies to the ROOT (pre-strip)


class Hunspell:
    """Loaded dictionary: headword flags + suffix/prefix rule classes."""

    def __init__(self) -> None:
        self.words: dict[str, set[str]] = {}   # headword → flags
        self.sfx: dict[str, list[_Rule]] = {}  # flag → rules
        self.pfx: dict[str, list[_Rule]] = {}
        self.flag_mode = "char"  # FLAG directive: char | long | num

    # ------------------------------------------------------- loading

    @classmethod
    def load(cls, aff_path: str, dic_path: str) -> "Hunspell":
        h = cls()
        with open(aff_path, encoding="utf-8") as f:
            h._parse_aff(f.read())
        with open(dic_path, encoding="utf-8") as f:
            h._parse_dic(f.read())
        return h

    @classmethod
    def loads(cls, aff_text: str, dic_text: str) -> "Hunspell":
        h = cls()
        h._parse_aff(aff_text)
        h._parse_dic(dic_text)
        return h

    def _parse_aff(self, text: str) -> None:
        for line in text.splitlines():
            parts = line.split()
            if len(parts) >= 2 and parts[0] == "FLAG":
                # flag systems (hunspell(5)): default 1-char, 'long'
                # 2-char pairs, 'num' comma-separated integers — the
                # standard French dictionaries (Dicollecte) use 'long',
                # where per-character flag reads silently derive zero
                # roots
                self.flag_mode = parts[1].strip().lower()
                continue
            if len(parts) >= 4 and parts[0] in ("SFX", "PFX"):
                if parts[2] in ("Y", "N") and parts[3].isdigit():
                    continue  # class header "SFX flag cross count"
                if len(parts) < 5:
                    continue
                kind, flag, strip, add, cond = parts[:5]
                # strip/condition text folds like headwords and adds —
                # an unfolded curly apostrophe in a rule could never
                # match the folded words dict
                strip = "" if strip == "0" else _fold(strip)
                add = "" if add == "0" else _fold(add.split("/")[0])
                cond = _fold(cond)
                rx = ".*" if cond == "." else (
                    cond + "$" if kind == "SFX" else "^" + cond
                )
                rule = _Rule(strip, add, re.compile(rx))
                (self.sfx if kind == "SFX" else self.pfx).setdefault(
                    flag, []
                ).append(rule)

    def _split_flags(self, flags: str) -> list[str]:
        """One flag token → flag list per the declared FLAG mode."""
        mode = getattr(self, "flag_mode", "char")
        if mode == "long":
            return [flags[i : i + 2] for i in range(0, len(flags) - 1, 2)]
        if mode == "num":
            return [f for f in flags.split(",") if f]
        return list(flags)

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        start = 1 if lines and lines[0].strip().isdigit() else 0
        for line in lines[start:]:
            line = line.strip()
            if not line:
                continue
            # headword runs to '/' flags or a morphological field
            head, _, rest = line.partition("/")
            flags = ""
            if rest:
                flags = rest.split()[0]
            else:
                m = re.search(r"\s+[a-z]{2}:", head)
                if m:
                    head = head[: m.start()]
            self.words.setdefault(_fold(head.strip()), set()).update(
                self._split_flags(flags)
            )

    # -------------------------------------------------------- lookup

    def roots(self, word: str) -> list[str]:
        """Headwords that produce ``word`` (the word itself first when
        it is a headword), insertion-ordered and de-duplicated —
        Lucene Hunspell.getRoots semantics for the affix subset."""
        word = _fold(word)
        out: list[str] = []
        seen: set[str] = set()

        def push(r: str) -> None:
            if r not in seen:
                seen.add(r)
                out.append(r)

        if word in self.words:
            push(word)
        for flag, rules in self.sfx.items():
            for rule in rules:
                if rule.add and not word.endswith(rule.add):
                    continue
                base = word[: len(word) - len(rule.add)] if rule.add else word
                root = base + rule.strip
                if (
                    root in self.words
                    and flag in self.words[root]
                    and rule.cond.search(root)
                ):
                    push(root)
        for flag, rules in self.pfx.items():
            for rule in rules:
                if rule.add and not word.startswith(rule.add):
                    continue
                base = word[len(rule.add):]
                root = rule.strip + base
                if (
                    root in self.words
                    and flag in self.words[root]
                    and rule.cond.search(root)
                ):
                    push(root)
        return out


# ------------------------------------------------------ build sidecar


def compile_sidecar(
    index_dir: str,
    dic_text: str,
    aff_text: str,
    field: str = "text",
) -> tuple[str, str]:
    """HunspellCompiler.compile analogue: keep only source ``.dic``
    lines whose headword is an indexed term, annotate with the term's
    corpus frequency as ``fr:``, recompute the count header, copy the
    ``.aff`` verbatim; writes ``<index_dir>/hunspell/<field>.dic/.aff``
    and returns their paths. Uses a pyarrow scan of term_stats — no
    Spark job."""
    import pyarrow.dataset as ds

    tbl = ds.dataset(os.path.join(index_dir, "term_stats")).to_table(
        columns=["term", "cf"]
    )
    freq = dict(zip(
        (_fold(t) for t in tbl["term"].to_pylist()), tbl["cf"].to_pylist()
    ))

    kept: list[str] = []
    lines = dic_text.splitlines()
    start = 1 if lines and lines[0].strip().isdigit() else 0
    for line in lines[start:]:
        line = line.strip()
        if not line:
            continue
        head, sep, rest = line.partition("/")
        if not sep:
            # flagless entry: the headword runs to the first
            # morphological field ("chat po:noun" → "chat"), same cut
            # as _parse_dic / the reference compiler
            m = re.search(r"\s+[a-z]{2}:", head)
            if m:
                head = head[: m.start()]
        head_f = _fold(head.strip())
        if head_f not in freq:
            continue
        # strip any source fr: field, re-annotate with this corpus's count
        rest = re.sub(r"\s*fr:\S+", "", rest)
        entry = head_f + (sep + rest if sep else "")
        kept.append(f"{entry} fr:{freq[head_f]}")

    hdir = os.path.join(index_dir, "hunspell")
    os.makedirs(hdir, exist_ok=True)
    dic_path = os.path.join(hdir, f"{field}.dic")
    aff_path = os.path.join(hdir, f"{field}.aff")
    with open(dic_path, "w", encoding="utf-8") as f:
        f.write(str(len(kept)) + "\n" + "\n".join(kept) + "\n")
    with open(aff_path, "w", encoding="utf-8") as f:
        f.write(aff_text)
    return aff_path, dic_path
