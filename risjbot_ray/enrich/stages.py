"""Enrichment stages: the reference's item pipelines as actor-pool
``map_batches`` classes (SURVEY.md 2.4 T1-T3, 2.6 A3).

Each class does its setup (lexicon load, regex compile) once in
``__init__`` — once per actor — and scores a whole Arrow batch per
``__call__``. Use as::

    ds.map_batches(Enrich, batch_format="pyarrow",
                   concurrency=N, batch_size=B)

Stage order matches ITEM_PIPELINES (settings.py:216-224): Sentiment(100) ->
WordCount(200) -> [NamedPeople(300), ReadingAge(400) — present but disabled
in the reference, enabled here via flags] -> StripRawPage(900).
"""

from __future__ import annotations

import re
import string
import unicodedata

import numpy as np
import pyarrow as pa

from .lexicon import SENTIMENT_LEXICON

_WORD_RE = re.compile(r"[A-Za-z']+")
# sentence split: terminator run, then whitespace (nltk sent_tokenize role)
_SENT_RE = re.compile(r"[.!?]+(?:\s+|$)")
# token split for reading age (nltk word_tokenize role): words, numbers,
# or single punctuation marks
_TOK_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+(?:\.\d+)?|[^\w\s]")

_PUNCT_CATS = frozenset(["Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po"])
_PUNCT_ASCII = frozenset(string.punctuation)

_VOWELS = "aeiouy"

HONORIFICS = frozenset(
    "mr mrs ms dr sir dame lord lady president minister senator professor "
    "chancellor secretary governor mayor judge captain general".split())

# words that start sentences so often they are unreliable name evidence
_STOP_CAPS = frozenset(
    "the a an in on at by for with from and but or if when while this that "
    "these those it he she they we you i his her their our its monday "
    "tuesday wednesday thursday friday saturday sunday january february "
    "march april may june july august september october november december "
    "new north south east west later earlier meanwhile however yesterday "
    "today tomorrow last next some many both after before during".split())


def count_syllables(word: str) -> int:
    """Heuristic vowel-group syllable counter (CMU-dict replacement for
    pipelines/readingage.py:78-91): vowel runs, silent final 'e', minimum
    one."""
    w = word.lower()
    if not w:
        return 0
    groups = 0
    prev_vowel = False
    for ch in w:
        is_vowel = ch in _VOWELS
        if is_vowel and not prev_vowel:
            groups += 1
        prev_vowel = is_vowel
    if w.endswith("e") and not w.endswith(("le", "ee")) and groups > 1:
        groups -= 1
    return max(1, groups)


class Sentiment:
    """Polarity/subjectivity averaging over lexicon hits (TextBlob
    contract; reference pipelines/sentiment.py:16-23)."""

    def __init__(self) -> None:
        self.lexicon = SENTIMENT_LEXICON
        self.word_re = _WORD_RE

    def score(self, text: str) -> tuple[float, float]:
        hits = [self.lexicon[w] for w in
                (m.group().lower() for m in self.word_re.finditer(text))
                if w in self.lexicon]
        if not hits:
            return 0.0, 0.0
        pol = sum(h[0] for h in hits) / len(hits)
        sub = sum(h[1] for h in hits) / len(hits)
        return pol, sub

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("bodytext").to_pylist()
        pols, subs = [], []
        for t in texts:
            if t is None:
                pols.append(None)
                subs.append(None)
            else:
                p, s = self.score(t)
                pols.append(p)
                subs.append(s)
        batch = _set_col(batch, "sentiment", pa.array(pols, pa.float64()))
        return _set_col(batch, "subjectivity", pa.array(subs, pa.float64()))


class WordCount:
    """wordcount = len(bodytext.split()) (pipelines/wordcount.py:13-18)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("bodytext").to_pylist()
        counts = [len(t.split()) if t is not None else None for t in texts]
        return _set_col(batch, "wordcount", pa.array(counts, pa.int32()))


class ReadingAge:
    """Flesch reading ease / Flesch-Kincaid grade level with the exact
    reference formulas (pipelines/readingage.py:69-74); tokenization and
    punctuation-stripping mirror readingage.py:93-108, with a heuristic
    syllable counter standing in for the CMU dictionary."""

    def __init__(self) -> None:
        self.sent_re = _SENT_RE
        self.tok_re = _TOK_RE
        # per-actor memos: natural-language token streams are zipfian,
        # so per-TYPE work (punct strip, syllable count) is a tiny
        # fraction of per-TOKEN work; caches are per-actor state built
        # once and shared across every batch the actor scores. Results
        # are byte-identical to the uncached path (pure functions).
        self._strip_memo: dict[str, str] = {}
        self._syll_memo: dict[str, tuple[int, int]] = {}

    def _strip_one(self, tok: str) -> str:
        ntok = self._strip_memo.get(tok)
        if ntok is None:
            ntok = "".join(
                ch for ch in tok
                if unicodedata.category(ch) not in _PUNCT_CATS
                and ch not in _PUNCT_ASCII)
            if len(self._strip_memo) > 1_000_000:
                self._strip_memo.clear()
            self._strip_memo[tok] = ntok
        return ntok

    def strip_punct_toks(self, toks):
        for tok in toks:
            ntok = self._strip_one(tok)
            if ntok:
                yield ntok

    def _syllables_of(self, word: str) -> tuple[int, int]:
        """(total syllables, syllable-word count) over the word's
        hyphen splits — memoized per word type."""
        r = self._syll_memo.get(word)
        if r is None:
            parts = [count_syllables(s) for s in word.split("-") if s]
            r = (sum(parts), len(parts))
            if len(self._syll_memo) > 1_000_000:
                self._syll_memo.clear()
            self._syll_memo[word] = r
        return r

    def score(self, text: str) -> tuple[float, float] | None:
        nsent = len([s for s in self.sent_re.split(text) if s.strip()])
        toks = self.tok_re.findall(text)
        words = list(self.strip_punct_toks(toks))
        nwords = len(words)
        nsylls = 0
        nsyllwords = 0
        for w in words:
            t, c = self._syllables_of(w)
            nsylls += t
            nsyllwords += c
        if nsyllwords == 0 or nsent == 0:
            return None
        flesch = (206.835 - 1.015 * (nwords / nsent)
                  - 84.6 * (nsylls / nsyllwords))
        kincaid = (0.39 * (nwords / nsent)
                   + 11.8 * (nsylls / nsyllwords) - 15.59)
        return flesch, kincaid

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("bodytext").to_pylist()
        fl, ki = [], []
        for t in texts:
            r = self.score(t) if t else None
            fl.append(r[0] if r else None)
            ki.append(r[1] if r else None)
        batch = _set_col(batch, "fleschreadingease",
                         pa.array(fl, pa.float64()))
        return _set_col(batch, "kincaidgradelevel",
                        pa.array(ki, pa.float64()))


class NamedPeople:
    """PERSON extraction (pipelines/namedpeople.py:44-56 role) without
    NLTK: runs of capitalized tokens count as a person when (a) length >= 2
    and no token is a stop-cap, or (b) the run follows an honorific
    (stop-caps still end the run). A token's trailing period ends the
    sentence AND the run — 'Mary Shelley. Victor Hugo' is two people,
    not one — except single-letter initials ('J. K. Rowling' stays one
    run). Repeat mentions repeat in the output, like the reference
    (namedpeople.py:58-60)."""

    def __init__(self) -> None:
        self.tok_re = re.compile(r"[A-Za-z][A-Za-z'.-]*|[.!?]")
        self.honorifics = HONORIFICS
        self.stop_caps = _STOP_CAPS

    @staticmethod
    def _core(tok: str) -> tuple[str, bool]:
        """(token without trailing periods, ends_sentence). A trailing
        '.' terminates the run unless the token is an initial."""
        if tok.endswith(".") and len(tok.rstrip(".")) > 1:
            return tok.rstrip("."), True
        return tok, False

    def _take_run(self, toks: list[str], j: int) -> tuple[list[str], int]:
        run: list[str] = []
        while j < len(toks):
            t = toks[j]
            if t in ".!?" or not t[:1].isupper():
                break
            core, ends = self._core(t)
            if core.lower() in self.stop_caps:
                break
            run.append(core)
            j += 1
            if ends:
                break
        return run, j

    def people(self, text: str) -> list[str]:
        toks = self.tok_re.findall(text)
        out: list[str] = []
        i = 0
        while i < len(toks):
            tok = toks[i]
            if tok in ".!?":
                i += 1
                continue
            low = tok.lower().rstrip(".")
            if low in self.honorifics and i + 1 < len(toks) \
                    and toks[i + 1][:1].isupper():
                run, j = self._take_run(toks, i + 1)
                if run:
                    out.append(" ".join(run))
                i = max(j, i + 1)
                continue
            if tok[:1].isupper() and low not in self.stop_caps:
                run, j = self._take_run(toks, i)
                if len(run) >= 2:
                    out.append(" ".join(run))
                    i = j
                    continue
            i += 1
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("bodytext").to_pylist()
        vals = [self.people(t) if t else None for t in texts]
        return _set_col(batch, "namedpeople",
                        pa.array(vals, pa.list_(pa.string())))


class Enrich:
    """All enabled enrichment pipelines in reference order, one actor."""

    def __init__(self, sentiment: bool = True, wordcount: bool = True,
                 namedpeople: bool = False, readingage: bool = False):
        self.stages = []
        if sentiment:
            self.stages.append(Sentiment())
        if wordcount:
            self.stages.append(WordCount())
        if namedpeople:
            self.stages.append(NamedPeople())
        if readingage:
            self.stages.append(ReadingAge())

    def __call__(self, batch: pa.Table) -> pa.Table:
        for stage in self.stages:
            batch = stage(batch)
        return batch


def _set_col(batch: pa.Table, name: str, arr: pa.Array) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, arr)
