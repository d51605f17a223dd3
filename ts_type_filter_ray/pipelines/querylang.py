"""Boolean query-expression language over a built index.

A Lucene-ish grammar compiled onto the searcher algebra — the user-facing
surface a fulltext engine needs once it has more than one primitive:

    expr   := or
    or     := and (OR and)*
    and    := unary (AND unary)*
    unary  := NOT unary | atom
    atom   := '(' expr ')' | '"phrase words"' | '"a b"~d'
            | FIELD | RANGE | TERM
    TERM   := word | word'*' | '*'word | '*'word'*' | word'~'d
    FIELD  := name':'value | name':'value'*'
    RANGE  := name':[' bound ' TO ' bound ']'     (numeric, inclusive)
            | name':{' bound ' TO ' bound '}'     (exclusive; * = open)

``name:value`` is a METADATA filter (Lucene field syntax): it matches
docs whose metadata field *name* has *value* — answered by a metadata
term index (the facet-as-term layout: each doc's metadata is indexed as
``name:value`` tokens), passed to :func:`evaluate` as ``fields=``. A
trailing ``*`` prefix-matches the value (``source:src1*``). Colon
tokens are therefore field syntax, not searchable corpus terms — the
same trade Lucene makes.

``"a b"~d`` is the sloppy-phrase (proximity) form: the two terms within
``|Δpos| ≤ d`` of each other (answered by the positional index; slop on
phrases of ≠ 2 terms is rejected — general sloppy phrase matching needs
an ordered multi-term alignment the positional searcher doesn't expose).

Operators are UPPERCASE keywords so lowercase corpus terms named "and"/
"or"/"not" stay queryable. Adjacent atoms without an operator are a
syntax error (no silent default). Pure negation (`NOT x` outside an AND
with at least one positive conjunct) is rejected like Lucene rejects
pure-negative queries — complementing needs a corpus universe, which the
searcher deliberately does not hold.

Evaluation maps each leaf to RAW postings (no pinning at leaf level —
pinning a leaf inside an AND would corrupt conjunctive semantics), folds
set ops over ascending unique int64 doc-id arrays, then applies the
reference's pinned contract (pinned docs always included) and tombstone
visibility ONCE at the top: ``evaluate() = drop_deleted(pinned ∪ eval)``.

Phrases need a positional index (``pipelines/positional.py``); passing
``positional=None`` makes phrase atoms a contract error rather than a
silent wrong answer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

__all__ = ["parse_query", "evaluate", "QuerySyntaxError"]


class QuerySyntaxError(ValueError):
    """Malformed query expression."""


# -- AST -----------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    text: str


@dataclass(frozen=True)
class Prefix:
    text: str


@dataclass(frozen=True)
class Suffix:
    text: str


@dataclass(frozen=True)
class Contains:
    text: str


@dataclass(frozen=True)
class Fuzzy:
    text: str
    max_dist: int


@dataclass(frozen=True)
class Phrase:
    text: str


@dataclass(frozen=True)
class Proximity:
    text: str
    slop: int


@dataclass(frozen=True)
class Field:
    name: str
    value: str


@dataclass(frozen=True)
class FieldPrefix:
    name: str
    value: str


@dataclass(frozen=True)
class Range:
    """Lucene numeric range: ``name:[lo TO hi]`` (inclusive) /
    ``name:{lo TO hi}`` (exclusive), ``*`` = open bound. Answered by a
    numeric field index (``pipelines/numeric.py``), never a scan."""
    name: str
    lo: float | None
    hi: float | None
    lo_inc: bool
    hi_inc: bool


@dataclass(frozen=True)
class Not:
    child: object


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


# -- Lexer / parser -------------------------------------------------------

_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()"]+')


def _lex(s: str) -> list[str]:
    toks = _TOKEN_RE.findall(s)
    rest = _TOKEN_RE.sub("", s)
    if rest.strip():
        raise QuerySyntaxError(f"unparseable characters: {rest.strip()!r}")
    return toks


_FUZZY_RE = re.compile(r"^(?P<body>[^~*]+)~(?P<d>\d+)$")
_FIELD_RE = re.compile(r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*):(?P<val>\S+)$")
# 'name:[10' / 'name:{3.5' — the opening token of a 3-token range atom
# ('name:[lo TO hi]'); whitespace around TO is required, like Lucene
_RANGE_OPEN_RE = re.compile(
    r"^(?P<name>[A-Za-z_][A-Za-z0-9_]*):(?P<br>[\[{])(?P<lo>\S+)$")
_RANGE_CLOSE_RE = re.compile(r"^(?P<hi>\S+?)(?P<br>[\]}])$")
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _range_bound(raw: str, what: str) -> float | None:
    if raw == "*":
        return None
    if not _NUM_RE.match(raw):
        raise QuerySyntaxError(f"range {what} bound must be a number or "
                               f"'*': {raw!r}")
    return float(raw)


def _atom_from_word(w: str):
    fm = _FIELD_RE.match(w)
    if fm:
        name, val = fm.group("name"), fm.group("val")
        trail = val.endswith("*") and len(val) > 1
        body = val[:-1] if trail else val
        if "*" in body or "~" in body:
            raise QuerySyntaxError(
                f"field values support only a trailing '*': {w!r}")
        return FieldPrefix(name, body) if trail else Field(name, body)
    m = _FUZZY_RE.match(w)
    if m:
        return Fuzzy(m.group("body"), int(m.group("d")))
    lead, trail = w.startswith("*"), w.endswith("*") and len(w) > 1
    body = w.strip("*")
    if not body:
        raise QuerySyntaxError(f"bare wildcard: {w!r}")
    if "*" in body:
        raise QuerySyntaxError(f"interior '*' not supported: {w!r}")
    if "~" in body:
        raise QuerySyntaxError(f"malformed fuzzy term: {w!r}")
    if lead and trail:
        return Contains(body)
    if lead:
        return Suffix(body)
    if trail:
        return Prefix(body)
    return Term(w)


class _Parser:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise QuerySyntaxError("unexpected end of query")
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.peek() is not None:
            raise QuerySyntaxError(
                f"unexpected token {self.peek()!r} — atoms must be joined "
                "with AND/OR")
        return node

    def or_expr(self):
        parts = [self.and_expr()]
        while self.peek() == "OR":
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def and_expr(self):
        parts = [self.unary()]
        while self.peek() == "AND":
            self.next()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def unary(self):
        if self.peek() == "NOT":
            self.next()
            inner = self.unary()
            # double negation cancels at parse time, so Not(Not(x))
            # never reaches the evaluator
            return inner.child if isinstance(inner, Not) else Not(inner)
        return self.atom()

    def _range_atom(self, rm) -> Range:
        # 'name:[lo' already consumed; expect 'TO' then 'hi]' / 'hi}'
        lo_inc = rm.group("br") == "["
        lo = _range_bound(rm.group("lo"), "lower")
        if self.next() != "TO":
            raise QuerySyntaxError(
                "range atoms are 'name:[lo TO hi]' — missing TO")
        cm = _RANGE_CLOSE_RE.match(self.next())
        if not cm:
            raise QuerySyntaxError(
                "range atoms must close with ']' or '}'")
        hi_inc = cm.group("br") == "]"
        hi = _range_bound(cm.group("hi"), "upper")
        return Range(rm.group("name"), lo, hi, lo_inc, hi_inc)

    def atom(self):
        t = self.next()
        if t == "(":
            node = self.or_expr()
            if self.next() != ")":
                raise QuerySyntaxError("missing ')'")
            return node
        if t == ")":
            raise QuerySyntaxError("unexpected ')'")
        if t in ("AND", "OR"):
            raise QuerySyntaxError(f"operator {t} where an atom was expected")
        rm = _RANGE_OPEN_RE.match(t)
        if rm:
            return self._range_atom(rm)
        if t.startswith('"'):
            body = t[1:-1].strip()
            if not body:
                raise QuerySyntaxError("empty phrase")
            nxt = self.peek()
            if nxt is not None and re.fullmatch(r"~\d+", nxt):
                self.next()
                slop = int(nxt[1:])
                if slop == 0:
                    # Lucene semantics: slop 0 IS the exact phrase —
                    # Proximity(0) would demand two distinct terms at
                    # one position and silently match nothing
                    return Phrase(body)
                if len(body.split()) != 2:
                    raise QuerySyntaxError(
                        "slop (~d) is only supported on 2-term phrases")
                return Proximity(body, slop)
            return Phrase(body)
        return _atom_from_word(t)


def parse_query(s: str):
    """Parse *s* into an expression AST (raises :class:`QuerySyntaxError`)."""
    toks = _lex(s)
    if not toks:
        raise QuerySyntaxError("empty query")
    return _Parser(toks).parse()


# -- Evaluation -----------------------------------------------------------


def _eval(node, searcher, positional, fields, synonyms,
          numeric) -> np.ndarray:
    if isinstance(node, Term):
        # single whitespace-free token → exactly one stem; with a
        # synonym map the leaf becomes the union over the expansion set
        # (query-time synonym filter — the map is tiny and broadcast,
        # the index stays synonym-free, so the map can change per query)
        words = [node.text]
        if synonyms:
            alts = synonyms.get(node.text.lower(), ())
            if isinstance(alts, str):
                # list('quick') would silently union five single-letter
                # terms' postings — a natural caller mistake, make it loud
                raise TypeError(
                    "synonym expansions must be a sequence of terms, "
                    f"not a string: {alts!r}")
            words += list(alts)
        arrays = [searcher._term_docs(searcher._stem_token(w))
                  for w in words]
        arrays = [a for a in arrays if a.size]
        if not arrays:
            return np.empty(0, dtype=np.int64)
        return arrays[0] if len(arrays) == 1 else np.unique(
            np.concatenate(arrays))
    if isinstance(node, Range):
        if numeric is None:
            raise ValueError(
                "range atoms (name:[lo TO hi]) need a numeric field "
                "index — pass numeric=")
        return numeric.range_docs(node.name, node.lo, node.hi,
                                  include_lo=node.lo_inc,
                                  include_hi=node.hi_inc)
    if isinstance(node, (Field, FieldPrefix)):
        if fields is None:
            raise ValueError(
                "field atoms (name:value) need a metadata index — pass "
                "fields=")
        key = f"{node.name}:{node.value}".lower()
        if isinstance(node, Field):
            # the fields searcher's OWN stemmer mirrors whatever
            # normalization its index was built with (identity for the
            # facet-as-term layout; a stemmed metadata index stays
            # consistent because build and query stem the same token)
            return fields._term_docs(fields._stem_token(key))
        # value prefixes scan the (possibly stemmed) metadata
        # vocabulary — same caller-owned contract as match_prefix
        return fields._vocab_match_docs("prefix", key)
    if isinstance(node, Prefix):
        return searcher._vocab_match_docs("prefix", node.text)
    if isinstance(node, Suffix):
        return searcher._vocab_match_docs("suffix", node.text)
    if isinstance(node, Contains):
        return searcher._vocab_match_docs("contains", node.text)
    if isinstance(node, Fuzzy):
        return searcher._vocab_match_docs("fuzzy", node.text,
                                          max_dist=node.max_dist)
    if isinstance(node, Phrase):
        if positional is None:
            raise ValueError(
                "phrase atoms need a positional index — pass positional=")
        return positional.phrase(node.text)
    if isinstance(node, Proximity):
        if positional is None:
            raise ValueError(
                "proximity atoms need a positional index — pass positional=")
        a, b = node.text.lower().split()
        return positional.proximity(a, b, node.slop)
    if isinstance(node, Or):
        arrays = [_eval(c, searcher, positional, fields, synonyms, numeric) for c in node.children]
        arrays = [a for a in arrays if a.size]
        if not arrays:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrays))
    if isinstance(node, And):
        pos = [c for c in node.children if not isinstance(c, Not)]
        neg = [c.child for c in node.children if isinstance(c, Not)]
        if not pos:
            raise ValueError(
                "pure negation has no universe — AND needs at least one "
                "positive conjunct")
        arrays = sorted((_eval(c, searcher, positional, fields, synonyms, numeric) for c in pos),
                        key=lambda a: a.size)
        cur = arrays[0]
        for a in arrays[1:]:
            if cur.size == 0:
                break
            cur = np.intersect1d(cur, a, assume_unique=True)
        if neg and cur.size:
            drop = np.unique(np.concatenate(
                [_eval(c, searcher, positional, fields, synonyms, numeric) for c in neg] or
                [np.empty(0, dtype=np.int64)]))
            cur = np.setdiff1d(cur, drop, assume_unique=True)
        return cur
    if isinstance(node, Not):
        raise ValueError(
            "pure negation has no universe — NOT is only valid inside an "
            "AND with at least one positive conjunct")
    raise TypeError(f"unknown node {node!r}")


def evaluate(query: str, searcher, positional=None,
             fields=None, synonyms=None, numeric=None) -> np.ndarray:
    """Evaluate *query* over *searcher* (a ``LocalSearcher``) → ascending
    unique doc_ids. Phrases and proximity are answered by *positional*
    (a ``PositionalSearcher`` over the same corpus); ``name:value``
    metadata filters by *fields* (a ``LocalSearcher`` over the metadata
    term index — the facet-as-term layout). *synonyms* (an optional
    small ``term → [alternatives]`` map, matched on the lowercased raw
    token before stemming) expands every Term leaf into the union over
    its expansion set — the query-time synonym filter: the index stays
    synonym-free and the map can change per query. Pinned docs are
    always included and tombstoned docs never returned — both applied
    once at the top, so leaf set ops stay pure. Numeric range atoms
    (``name:[lo TO hi]``) are answered by *numeric* (a
    :class:`~.numeric.NumericIndex` over the same corpus)."""
    out = _eval(parse_query(query), searcher, positional, fields,
                synonyms, numeric)
    if searcher._pinned.size:
        out = np.union1d(out, searcher._pinned)
    return searcher._drop_deleted(out)
