"""Extractor → breaker → stemmer trio, mirroring the reference ingestion
pipeline (``ts_type_filter/inverted_index.py:13-33,61``) exactly, shared
verbatim by the single-process oracle and the distributed engine.

All three stages are injectable, preserving the reference's extension
surface (``Index(extractor=None, breaker=None, stemmer=None)``,
``inverted_index.py:36-39``).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Callable, Iterable

from .porter2 import stem

Extractor = Callable[[object], list[str]]
Breaker = Callable[[str], list[str]]


def nop_extractor(document: object) -> list[str]:
    """Default extractor: the document *is* its text.

    Mirrors ``nop_extractor`` (``inverted_index.py:13-24``): a document may
    have multiple text streams, so the return type is ``list[str]``.
    """
    return [document]  # type: ignore[list-item]


def break_on_whitespace(text: str) -> list[str]:
    """Whitespace word-breaker; punctuation is kept attached to tokens
    (``inverted_index.py:26-33`` — terms like ``by;`` are real terms)."""
    return text.strip().split()


def words_of(document: object, extractor: Extractor = nop_extractor,
             breaker: Breaker = break_on_whitespace) -> list[str]:
    """All words of a document across its text streams, in order."""
    words: list[str] = []
    for text in extractor(document):
        words.extend(breaker(text))
    return words


def stem_set(words: Iterable[str], stemmer: Callable[[str], str] = stem) -> set[str]:
    """Distinct stems of *words* — the reference's per-document set
    semantics (``stemmed = {stem(w) for w in words}``, ``inverted_index.py:61``)."""
    return {stemmer(w) for w in words}


def term_frequencies(words: Iterable[str],
                     stemmer: Callable[[str], str] = stem) -> Counter[str]:
    """tf per stemmed term, counted **pre-dedup** (the reference discards tf;
    the north-star BM25 needs it, so the engine carries it)."""
    return Counter(stemmer(w) for w in words)
