"""Type-graph pruning pipeline: index literals, match a query, propagate
``never``, collect the reachable pruned defines.

Reference parity: ``TypeIndex`` (``filter.py:19-34``), builders
(``filter.py:520-590``), ``collect_string_literals`` (``filter.py:593-616``),
``serialize_menu`` (``samples/menu/menu.py:314-316``).

Ray-side shape: menus/type graphs are KBs (SURVEY.md §1.4 — small
driver-side objects); the distributed surface is :class:`PruneTypesStage`,
an actor-pool ``map_batches`` stage that prunes a *corpus of type
sources* against per-row queries (parser + index built once per actor —
the reference's lazy-singleton pattern, ``parser.py:71-88``, per worker).
"""

from __future__ import annotations

from collections import OrderedDict

from ..oracle.index import Index
from .ast import (Any, Boolean, Define, FalseValue, Never, Number,
                  PruneContext, String, SymbolTable, TrueValue)


def _literal_extractor(node) -> list[str]:
    """Literal → its text plus aliases (reference ``filter.py:10-16``)."""
    from .ast import Literal
    if isinstance(node, Literal):
        out = [node.text]
        if node.aliases:
            out.extend(node.aliases)
        return out
    return []


class TypeIndex:
    """Inverted index over the graph's string literals; pinned literals
    are pinned in the index (reference ``filter.py:19-34``)."""

    def __init__(self):
        self._index = Index(extractor=_literal_extractor)

    def add(self, node) -> None:
        self._index.add(node)
        if node.pinned:
            self._index.pin(node)

    def nodes(self, terms):
        return self._index.match(terms)


def build_symbol_table(defs: list) -> SymbolTable:
    """Symbols for all defines + the 7 builtins (``filter.py:520-535``)."""
    symbols = SymbolTable()
    for node in defs:
        if isinstance(node, Define):
            symbols.add(node.name, node)
    symbols.add("any", Any)
    symbols.add("false", FalseValue)
    symbols.add("true", TrueValue)
    symbols.add("string", String)
    symbols.add("number", Number)
    symbols.add("boolean", Boolean)
    symbols.add("never", Never())
    return symbols


def build_type_index(defs: list) -> tuple[SymbolTable, TypeIndex]:
    """(symbols, literal index) for a parsed graph (``filter.py:538-557``).
    Comment strings in *defs* are skipped."""
    symbols = build_symbol_table(defs)
    indexer = TypeIndex()
    literals: list = []
    for node in defs:
        if not isinstance(node, str):
            node.collect_literals(literals)
    for lit in literals:
        indexer.add(lit)
    return symbols, indexer


def build_filtered_types(defs: list, symbols: SymbolTable,
                         indexer: TypeIndex, query) -> "OrderedDict":
    """Prune the graph against *query* and return the defines reachable
    from the root (first define), in traversal order
    (``filter.py:560-590``)."""
    kept = indexer.nodes(query)
    ctx = PruneContext(symbols, kept)

    filtered = []
    for node in defs:
        if not isinstance(node, str):
            filtered.append(node.filter(ctx))

    reachable: OrderedDict = OrderedDict()

    def visitor(node):
        if isinstance(node, Define):
            reachable[node] = None

    filtered[0].visit(ctx, visitor)
    return reachable


def serialize_defs(defs, compress: bool = False) -> str:
    """Pruned defines → TypeScript text (``menu.py:314-316``):
    newline-joined, or space-collapsed when *compress* is set."""
    parts = [d if isinstance(d, str) else d.format() for d in defs]
    text = "\n".join(parts)
    if compress:
        text = " ".join(text.split())
    return text


def prune_source(source: str, query) -> str:
    """End-to-end convenience: TS source + query → pruned TS text."""
    from .parser import parse
    defs = parse(source)
    symbols, indexer = build_type_index(defs)
    reachable = build_filtered_types(defs, symbols, indexer, query)
    return serialize_defs(list(reachable))


def collect_string_literals(data) -> list[str]:
    """All string leaves of a JSON tree, de-duplicated
    (``filter.py:593-616``) — the cart → query extraction."""
    literals: set[str] = set()
    stack = [data]
    while stack:
        cur = stack.pop()
        if isinstance(cur, dict):
            stack.extend(cur.values())
        elif isinstance(cur, list):
            stack.extend(cur)
        elif isinstance(cur, str):
            literals.add(cur)
    return list(literals)


class PruneTypesStage:
    """Actor-pool stage for corpus-scale pruning: rows of
    ``(source:string, query:string)`` → pruned TS text. Parse results are
    memoized per actor keyed by source sha (A2/A3 analog: parser state
    and the built index live once per actor, not once per batch)."""

    def __init__(self, compress: bool = False):
        self._cache: dict[str, tuple] = {}
        self._compress = compress

    def _graph(self, source: str):
        import hashlib
        key = hashlib.sha256(source.encode()).hexdigest()
        hit = self._cache.get(key)
        if hit is None:
            from .parser import parse
            defs = parse(source)
            symbols, indexer = build_type_index(defs)
            hit = self._cache[key] = (defs, symbols, indexer)
        return hit

    def __call__(self, batch):
        import pyarrow as pa
        out = []
        for source, query in zip(batch["source"].to_pylist(),
                                 batch["query"].to_pylist()):
            defs, symbols, indexer = self._graph(source)
            reachable = build_filtered_types(defs, symbols, indexer, query)
            out.append(serialize_defs(list(reachable), self._compress))
        cols = {name: batch[name] for name in batch.column_names}
        cols["pruned"] = pa.array(out, type=pa.string())
        return pa.table(cols)
