"""Tokenization pipeline: the contract we match bit-for-bit with the oracle.

Reference semantics (engine/src/term_map.rs:28-67):
  1. UAX#29 word segmentation with *byte* offsets (`unicode_word_indices`),
     keeping only "words" (runs containing alphanumerics).
  2. Unicode lowercase per word (term_map.rs:41).
  3. Snowball English stem (term_map.rs:71) — see joie_spark.stemmer.
  4. Intern to u32; ids start at 1, 0 is reserved for OOV
     (term_map.rs:69-73, 94-99).

Sentence split (`doc.lines()`, term_map.rs:23) is free in our data model:
one transcript turn == one joie "sentence" (newline-joining a
conversation's turns reproduces the reference's doc→sentence split).

This module provides the *pure* tokenizer used by both the single-node
oracle and the Spark pandas UDFs (joie_spark.operators.build).  UAX#29 is
approximated with the `regex` module: base runs of word characters, with
MidLetter/MidNumLet characters allowed between letters and
MidNum/MidNumLet between digits (the dominant WB6/WB7/WB11/WB12 rules).
The approximation is pinned by golden tests; the oracle shares it, so
rank-identity is internal consistency (SURVEY.md §7 risk table).
"""

from __future__ import annotations

import re
from typing import NamedTuple

import regex

from .stemmer import stem

# UAX#29-approximate word pattern.
#  - base runs: \w (unicode letters, digits, marks, underscore/ExtendNumLet)
#  - between letters: MidLetter (: ·) ∪ MidNumLet (. ’) ∪ Single_Quote (')
#  - between digits:  MidNum (, ;) ∪ MidNumLet (. ’) ∪ Single_Quote (')
_WORD_RE = regex.compile(
    r"\w+"
    r"(?:"
    r"(?:(?<=\p{L})[:·.'’](?=\p{L})"
    r"|(?<=\p{N})[,;.'’](?=\p{N}))"
    r"\w+"
    r")*",
    regex.UNICODE,
)

_HAS_ALNUM = regex.compile(r"[\p{L}\p{N}]")

# ASCII fast path: on pure-ASCII text (the overwhelming majority of
# transcript turns) the unicode pattern above degenerates exactly to the
# stdlib-`re` pattern below — regex.UNICODE \w on ASCII is [A-Za-z0-9_],
# \p{L} is [A-Za-z], \p{N} is [0-9], and the non-ASCII mid characters
# (’ ·) can never occur.  stdlib `re` executes this ~1.8x faster than
# the `regex` module (measured, BENCH notes), and byte offsets equal
# char offsets, so the whole offset-conversion pass drops out.  Pinned
# equal to the unicode path by a hypothesis test over ASCII strings
# (tests/test_tokenizer.py).
_ASCII_WORD_RE = re.compile(
    r"\w+"
    r"(?:"
    r"(?:(?<=[A-Za-z])[:.'](?=[A-Za-z])"
    r"|(?<=[0-9])[,;.'](?=[0-9]))"
    r"\w+"
    r")*",
    re.ASCII,
)

_ASCII_HAS_ALNUM = re.compile(r"[A-Za-z0-9]")


class Token(NamedTuple):
    """Byte range of a word within the turn text + its stemmed term."""

    start: int  # UTF-8 byte offset (parity with the reference's byte offsets)
    end: int
    term: str  # lowercased + stemmed


def segment(text: str) -> list[tuple[int, int, str]]:
    """UAX#29-approximate word segmentation with UTF-8 byte offsets.

    Returns [(byte_start, byte_end, raw_word)].
    """
    if text.isascii():
        has_alnum = _ASCII_HAS_ALNUM.search
        return [
            (m.start(), m.end(), w)
            for m in _ASCII_WORD_RE.finditer(text)
            if has_alnum(w := m.group())
        ]
    return _segment_unicode(text)


def _segment_unicode(text: str) -> list[tuple[int, int, str]]:
    """The full-unicode segmentation path (also the pinning reference the
    ASCII fast path is hypothesis-tested against)."""
    out: list[tuple[int, int, str]] = []
    is_ascii = text.isascii()
    # running conversion of char offsets -> byte offsets (single forward pass)
    last_char = 0
    last_byte = 0
    for m in _WORD_RE.finditer(text):
        w = m.group()
        if not _HAS_ALNUM.search(w):
            continue  # pure-underscore runs are not UAX#29 words
        cs, ce = m.start(), m.end()
        if is_ascii:
            bs, be = cs, ce
        else:
            bs = last_byte + len(text[last_char:cs].encode("utf-8"))
            be = bs + len(w.encode("utf-8"))
            last_char, last_byte = ce, be
        out.append((bs, be, w))
    return out


def tokenize(text: str, _stem=stem) -> list[Token]:
    """Full pipeline for one turn: segment → lowercase → stem."""
    return [Token(s, e, _stem(w.lower())) for s, e, w in segment(text)]


def tokenize_terms(text: str) -> list[str]:
    """Terms only (query-side helper, mirrors tokenize_phrase
    term_map.rs:94-99 minus the id lookup)."""
    return [stem(w.lower()) for _, _, w in segment(text)]
