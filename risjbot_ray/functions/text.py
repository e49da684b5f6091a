"""Scalar text kernels matching the reference's field-normalizer semantics.

Reference: RISJbot/loaders.py:32-131 (input/output processors) and the w3lib
helpers it uses (``replace_escape_chars`` / ``replace_entities``).  All
reimplemented on stdlib only; these define the byte-identical text invariant
(BASELINE.json input_hint).
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterable, Iterator

# w3lib.html.replace_escape_chars defaults: which_ones=('\n', '\t', '\r').
_ESCAPE_CHARS = ("\n", "\t", "\r")


def replace_escape_chars(text: str, replace_by: str = " ") -> str:
    """Replace \\n \\t \\r with ``replace_by`` (w3lib semantics as used at
    loaders.py:85,100)."""
    for ch in _ESCAPE_CHARS:
        text = text.replace(ch, replace_by)
    return text


def replace_entities(text: str) -> str:
    """Decode HTML entities (w3lib.html.replace_entities semantics:
    named + numeric character references; loaders.py:86,101)."""
    return _html.unescape(text)


def clean_headline(values: Iterable[str]) -> list[str]:
    """NewsLoader.clean_fn: per-value strip -> escape-chars->' ' -> entity
    decode (loaders.py:84-89). Used for headline and summary."""
    return [replace_entities(replace_escape_chars(v.strip(), " ")) for v in values]


def bodytext_candidate(fragments: Iterable[str]) -> str:
    """One bodytext candidate from one extraction attempt: Join(' ') over the
    text nodes, then escape-chars->' ', then entity decode
    (loaders.py:97-102)."""
    return replace_entities(replace_escape_chars(" ".join(fragments), " "))


def _strip_strl(values: Iterable[str]) -> Iterator[str]:
    for v in values:
        yield v.strip()


def _remove_fluff(values: Iterable[str]) -> Iterator[str]:
    """Drop http(s) 'bylines', strip any leading '... By ' prefix
    (loaders.py:32-38)."""
    for v in values:
        if v.startswith("http"):
            continue
        v = re.sub(r".*[Bb]y ", r"", v).strip()
        if v:
            yield v


def _split_and(values: Iterable[str]) -> Iterator[str]:
    for v in values:
        yield from v.split(" and ")


def keywords_in(values: Iterable[str]) -> str:
    """keywords input processor: strip each then comma-join
    (loaders.py:118)."""
    return ",".join(_strip_strl(values))


def bylines_in(values: Iterable[str]) -> str:
    """bylines input processor: strip -> de-fluff -> split ' and ' ->
    comma-join (loaders.py:119-122)."""
    return ",".join(_split_and(_remove_fluff(_strip_strl(values))))


def list_out(joined: str) -> list[str]:
    """keywords/bylines output: split the first (best) comma-joined string
    back to a list (loaders.py:123-126)."""
    return joined.split(",")


def split_multiple_byline_string(s: str) -> Iterator[str]:
    """Split 'A and B, Chief Reporter' bylines, dropping tokens containing
    correspondent/reporter (reference utils.py:43-49)."""
    for part in s.split(" and "):
        for tok in part.split(","):
            if re.search(r"(correspondent|reporter)", tok, flags=re.IGNORECASE):
                continue
            yield tok


def take_first(values: Iterable) -> object | None:
    """TakeFirst(): first value that is neither None nor '' (itemloaders
    semantics; loaders.py:73)."""
    for v in values:
        if v is not None and v != "":
            return v
    return None


def wordcount(text: str) -> int:
    """len(text.split()) — reference pipelines/wordcount.py:13-18."""
    return len(text.split())
