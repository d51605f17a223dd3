"""Single-process oracle: a faithful reimplementation of the reference's
in-memory inverted index (``ts_type_filter/inverted_index.py:35-153``) plus
the BM25 top-k extension the north star specifies.

The oracle shares the tokenizer/stemmer modules with the distributed
engine (``ts_type_filter_ray.text``), so "rank-identical" is well-defined.

Reference semantics preserved (each verified by execution against the
reference module, see SURVEY.md §1.1):

- documents are opaque hashable objects; default extractor treats the
  document as its own text (``inverted_index.py:13-24``);
- duplicate ``add`` raises ``ValueError`` (``inverted_index.py:48-50``);
- per-document **set semantics**: a document appears at most once per
  posting list; tf is discarded for matching (``inverted_index.py:61``);
- ``match`` is disjunctive, returns documents in insertion order, and
  always includes pinned documents — including for the empty query
  (``inverted_index.py:71-101``, ``:67-68,94``);
- ``statistics`` reports #docs, #unique terms, #postings and the df table
  sorted by frequency descending (``inverted_index.py:131-153``); the
  tie-break here is made explicit: (df desc, term asc).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable

from ..text.porter2 import Porter2Stemmer
from ..text.tokenize import break_on_whitespace, nop_extractor

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_idf(df: int, n_docs: int) -> float:
    """Robertson/Sparck-Jones idf with the +1 floor (non-negative)."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_tf_factor(tf: int, doc_len: int, avgdl: float,
                   k1: float = BM25_K1, b: float = BM25_B) -> float:
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doc_len / avgdl))


class Index:
    """Reference-semantics in-memory index with BM25 scoring on top."""

    def __init__(self, extractor=None, breaker=None, stemmer=None):
        self._extractor = extractor or nop_extractor
        self._breaker = breaker or break_on_whitespace
        self._stemmer = stemmer or Porter2Stemmer()

        self._documents_in_order: list = []
        self._documents: set = set()
        self._postings: dict[str, list] = {}
        self._pinned: set = set()
        # BM25 extensions (absent in the reference; north-star additions)
        self._tf: dict[str, dict[int, int]] = {}  # term -> {doc position -> tf}
        self._doc_len: list[int] = []

    # -- build ---------------------------------------------------------

    def add(self, document) -> None:
        if document in self._documents:
            raise ValueError("Attempting to add duplicate document.")
        pos = len(self._documents_in_order)
        self._documents_in_order.append(document)
        self._documents.add(document)

        words: list[str] = []
        for text in self._extractor(document):
            words.extend(self._breaker(text))
        self._doc_len.append(len(words))
        stemmed_counts: dict[str, int] = {}
        for w in words:
            s = self._stemmer.stem(w)
            stemmed_counts[s] = stemmed_counts.get(s, 0) + 1
        for term, tf in stemmed_counts.items():
            self._postings.setdefault(term, []).append(document)
            self._tf.setdefault(term, {})[pos] = tf

    def pin(self, document) -> None:
        self._pinned.add(document)

    # -- query ---------------------------------------------------------

    def _query_stems(self, query) -> set[str]:
        if isinstance(query, str):
            query = [query]
        words: list[str] = []
        for part in query:
            words.extend(self._breaker(part))
        return {self._stemmer.stem(w) for w in words}

    def match(self, query) -> list:
        """Disjunctive boolean match; results in insertion order;
        pinned documents always included (``inverted_index.py:71-101``)."""
        stemmed = self._query_stems(query)
        matches = set(self._pinned)
        for word in stemmed:
            if word in self._postings:
                matches.update(self._postings[word])
        return [doc for doc in self._documents_in_order if doc in matches]

    def bm25(self, query, k: int = 10,
             k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[int, float]]:
        """BM25 top-k over the disjunctive match set.

        Returns ``[(doc_position, score)]`` sorted by (score desc, position
        asc). Per-document contributions are summed **in ascending term
        order** — the engine sums in the same order, so scores are
        bit-identical float64 results.
        """
        n = len(self._documents_in_order)
        if n == 0:
            return []
        avgdl = sum(self._doc_len) / n
        scores: dict[int, float] = {}
        for term in sorted(self._query_stems(query)):
            tfs = self._tf.get(term)
            if not tfs:
                continue
            idf = bm25_idf(len(tfs), n)
            for pos, tf in tfs.items():
                scores[pos] = scores.get(pos, 0.0) + idf * bm25_tf_factor(
                    tf, self._doc_len[pos], avgdl, k1, b)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def highlight(self, query, document) -> str:
        """Wrap tokens whose stem matches a query stem in rich markup
        (``inverted_index.py:103-129``)."""
        words = self._breaker(query)
        stemmed = {self._stemmer.stem(w) for w in words}
        parts: list[str] = []
        for text in self._extractor(document):
            parts.extend(re.split(r"(\s+)", text))
        out = []
        for part in parts:
            if part and not part.isspace() and self._stemmer.stem(part) in stemmed:
                out.append(f"[bold green]{part}[/bold green]")
            else:
                out.append(part)
        return "".join(out)

    # -- stats ---------------------------------------------------------

    def statistics(self) -> dict:
        """Index statistics as data (the reference prints them,
        ``inverted_index.py:131-153``); df table tie-break (df desc, term asc)."""
        num_documents = len(self._documents)
        num_unique_words = len(self._postings)
        num_postings = sum(len(p) for p in self._postings.values())
        df_table = sorted(
            ((term, len(p)) for term, p in self._postings.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return {
            "num_documents": num_documents,
            "num_unique_words": num_unique_words,
            "num_postings": num_postings,
            "df_table": df_table,
        }


def build_oracle(doc_ids: list[int], contents: list[str],
                 pinned: set[int] | None = None,
                 breaker: Callable[[str], list[str]] | None = None) -> "CorpusOracle":
    """Build a :class:`CorpusOracle` over an id-keyed corpus."""
    o = CorpusOracle(breaker=breaker)
    for d, c in zip(doc_ids, contents):
        o.add(d, c)
    for d in pinned or ():
        o.pin(d)
    return o


class CorpusOracle:
    """Oracle over an ``(doc_id, content)`` corpus — same semantics as
    :class:`Index` but keyed by integer doc_id (the engine's data model,
    SURVEY.md §1.4), so duplicate *contents* are legal (dup detection is a
    separate audit on sha256)."""

    def __init__(self, breaker=None, stemmer=None):
        self._breaker = breaker or break_on_whitespace
        self._stemmer = stemmer or Porter2Stemmer()
        self._doc_ids: list[int] = []
        self._seen: set[int] = set()
        self._postings: dict[str, list[int]] = {}
        self._tf: dict[str, dict[int, int]] = {}
        self._doc_len: dict[int, int] = {}
        self._pinned: set[int] = set()

    def add(self, doc_id: int, content: str) -> None:
        if doc_id in self._seen:
            raise ValueError("Attempting to add duplicate document.")
        self._seen.add(doc_id)
        self._doc_ids.append(doc_id)
        words = self._breaker(content)
        self._doc_len[doc_id] = len(words)
        counts: dict[str, int] = {}
        for w in words:
            s = self._stemmer.stem(w)
            counts[s] = counts.get(s, 0) + 1
        for term, tf in counts.items():
            self._postings.setdefault(term, []).append(doc_id)
            self._tf.setdefault(term, {})[doc_id] = tf

    def pin(self, doc_id: int) -> None:
        self._pinned.add(doc_id)

    def _query_stems(self, query) -> set[str]:
        if isinstance(query, str):
            query = [query]
        words: list[str] = []
        for part in query:
            words.extend(self._breaker(part))
        return {self._stemmer.stem(w) for w in words}

    def match(self, query) -> list[int]:
        stemmed = self._query_stems(query)
        matches = set(self._pinned)
        for term in stemmed:
            if term in self._postings:
                matches.update(self._postings[term])
        return [d for d in self._doc_ids if d in matches]

    def bm25(self, query, k: int = 10,
             k1: float = BM25_K1, b: float = BM25_B) -> list[tuple[int, float]]:
        n = len(self._doc_ids)
        if n == 0:
            return []
        avgdl = sum(self._doc_len.values()) / n
        scores: dict[int, float] = {}
        for term in sorted(self._query_stems(query)):
            tfs = self._tf.get(term)
            if not tfs:
                continue
            idf = bm25_idf(len(tfs), n)
            for doc_id, tf in tfs.items():
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * bm25_tf_factor(
                    tf, self._doc_len[doc_id], avgdl, k1, b)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def statistics(self) -> dict:
        num_postings = sum(len(p) for p in self._postings.values())
        df_table = sorted(
            ((t, len(p)) for t, p in self._postings.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        return {
            "num_documents": len(self._doc_ids),
            "num_unique_words": len(self._postings),
            "num_postings": num_postings,
            "df_table": df_table,
        }
