"""AST node forest for the TypeScript-subset type graph (SURVEY.md §1.2)
and the never-propagation filter dataflow (§2.9).

Semantics preserved from the reference (``ts_type_filter/filter.py``,
cited per rule below); the structure here is our own (a ``PruneContext``
object instead of the reference's ``Subgraph``, explicit singletons,
no global node-id counter).

Filter rules (reference ``filter.py`` file:line):
  P1 Literal: keep iff in the matched node set, else Never  (:360-361)
  P2 Union: drop Never members; empty→Never; singleton→unwrap (:501-509)
  P3 Struct: required-field Never collapses the struct; optional ("?")
     Never fields are dropped                                  (:420-430)
  P4 Array: element Never → Never                              (:263-265)
  P5 Define: any param `extends Never` collapses the define; zero-param
     alias chains are path-compressed                          (:320-337)
  P6 Type: local generic params skipped; generic args filtered, any
     Never arg → Never; memoized recursion                     (:453-479)
  P9 pinned literals survive every query                       (:24-30)

Deviation (documented): P5 path compression follows alias chains only
while the target resolves to a filtered ``Define`` — the reference
dereferences ``.type`` unconditionally and would raise AttributeError on
``type A = string;`` (builtin singletons have no ``.type``).
"""

from __future__ import annotations

import json


class PruneContext:
    """Filter-pass state: the kept-literal set, the filtered-define memo
    and the stack of in-scope generic parameter names (reference
    ``Subgraph``, ``filter.py:57-97``)."""

    def __init__(self, symbols: "SymbolTable", kept_nodes):
        self.symbols = symbols
        self._kept = set(kept_nodes)
        self.filtered: dict[str, "TNode"] = {}
        self._scopes: list[list[str]] = []

    def keep(self, node) -> bool:
        return node in self._kept

    def is_local(self, name: str) -> bool:
        return any(name in scope for scope in self._scopes)

    def push_scope(self, names: list[str]) -> None:
        self._scopes.append(names)

    def pop_scope(self) -> None:
        self._scopes.pop()

    def process(self, name: str) -> "TNode":
        """Filter the named definition once; memoized (``filter.py:91-97``)."""
        out = self.filtered.get(name)
        if not out:
            out = self.symbols.get(name).filter(self)
            if name in self.filtered:
                raise ValueError(f"Key {name} already exists in the graph.")
            self.filtered[name] = out
        return out


class SymbolTable:
    """name → node; duplicate add raises (``filter.py:37-54``)."""

    def __init__(self):
        self.nodes: dict[str, TNode] = {}

    def add(self, key: str, node: "TNode") -> None:
        if key in self.nodes:
            raise ValueError(f"Key {key} already exists in the graph.")
        self.nodes[key] = node

    def get(self, key: str) -> "TNode":
        node = self.nodes.get(key)
        if node is None:
            raise KeyError(f"Key {key} not found in the graph.")
        return node


class TNode:
    """Base node: format / index-literals / filter / visit."""

    def format(self) -> str:
        raise NotImplementedError

    def collect_literals(self, out: list) -> None:
        """Append indexable Literal nodes (reference ``index()`` walk)."""

    def filter(self, ctx: PruneContext) -> "TNode":
        return self

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)


class _Primitive(TNode):
    """Builtin singleton (any/true/false/string/number/boolean)."""

    def __init__(self, text: str):
        self._text = text

    def format(self) -> str:
        return self._text


Any = _Primitive("any")
TrueValue = _Primitive("true")
FalseValue = _Primitive("false")
String = _Primitive("string")
Number = _Primitive("number")
Boolean = _Primitive("boolean")


class Never(TNode):
    def format(self) -> str:
        return "never"


class Literal(TNode):
    """Indexed leaf: text is str | int | float | bool; only string
    literals are indexed (``filter.py:355-358``); aliases extend the
    searchable text; pinned literals survive every query."""

    def __init__(self, text, aliases=None, pinned=False):
        self.text = text
        self.aliases = aliases
        self.pinned = pinned

    def format(self) -> str:
        # ensure_ascii=False: unicode literals ("Jalapeños") round-trip as
        # real characters, matching the reference's to_json_string output.
        return json.dumps(self.text, ensure_ascii=False)

    def collect_literals(self, out: list) -> None:
        if isinstance(self.text, str):
            out.append(self)

    def filter(self, ctx: PruneContext) -> TNode:
        return self if ctx.keep(self) else Never()


class Array(TNode):
    def __init__(self, type: TNode):
        self.type = type

    def format(self) -> str:
        inner = self.type.format()
        if isinstance(self.type, Union):
            return f"({inner})[]"
        return inner + "[]"

    def collect_literals(self, out: list) -> None:
        self.type.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        t = self.type.filter(ctx)
        return Never() if isinstance(t, Never) else Array(t)

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        self.type.visit(ctx, fn)


class Union(TNode):
    def __init__(self, *types: TNode):
        self.types = types

    def format(self) -> str:
        return "|".join(t.format() for t in self.types)

    def collect_literals(self, out: list) -> None:
        for t in self.types:
            t.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        kept = [t for t in (m.filter(ctx) for m in self.types)
                if not isinstance(t, Never)]
        if not kept:
            return Never()
        if len(kept) == 1:
            return kept[0]
        return Union(*kept)

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        for t in self.types:
            t.visit(ctx, fn)


class Struct(TNode):
    """Object type; keys ending in ``?`` are optional fields."""

    def __init__(self, obj: dict[str, TNode]):
        self.obj = obj

    def format(self) -> str:
        return "{" + ",".join(f"{k}:{v.format()}" for k, v in self.obj.items()) + "}"

    def collect_literals(self, out: list) -> None:
        for v in self.obj.values():
            v.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        kept: dict[str, TNode] = {}
        for k, v in self.obj.items():
            fv = v.filter(ctx)
            if isinstance(fv, Never):
                if not k.endswith("?"):
                    return Never()  # a required field vanished
            else:
                kept[k] = fv
        return Struct(kept)

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        for v in self.obj.values():
            v.visit(ctx, fn)


class ParamDef(TNode):
    """Generic parameter definition ``T extends Bound``."""

    def __init__(self, name: str, extends: TNode | None = None):
        self.name = name
        self.extends = extends

    def format(self) -> str:
        if self.extends:
            return f"{self.name} extends {self.extends.format()}"
        return self.name

    def collect_literals(self, out: list) -> None:
        if self.extends:
            self.extends.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        if self.extends:
            t = self.extends.filter(ctx)
            return ParamDef(self.name, Never() if isinstance(t, Never) else t)
        return self

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        if self.extends:
            self.extends.visit(ctx, fn)


class ParamRef(TNode):
    """Generic argument wrapper (``filter.py:385-406``)."""

    def __init__(self, type: TNode):
        self.type = type

    def format(self) -> str:
        return self.type.format()

    def collect_literals(self, out: list) -> None:
        self.type.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        t = self.type.filter(ctx)
        return Never() if isinstance(t, Never) else self

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        if not isinstance(self.type, Never):
            self.type.visit(ctx, fn)


class Type(TNode):
    """Named type reference, optionally with generic args."""

    def __init__(self, name: str, params: list[TNode] | None = None):
        self.name = name
        self.params = params

    def format(self) -> str:
        if self.params:
            return f"{self.name}<{','.join(p.format() for p in self.params)}>"
        return self.name

    def collect_literals(self, out: list) -> None:
        for p in self.params or ():
            p.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        # Local generic parameters are not graph names (filter.py:453-455;
        # the reference's own BUGBUG caveats noted in SURVEY.md §2.9 apply).
        if not ctx.is_local(self.name):
            if self.params:
                args = [p.filter(ctx) for p in self.params]
                if any(isinstance(a, Never)
                       or (isinstance(a, Define) and isinstance(a.type, Never))
                       for a in args):
                    return Never()
            target = ctx.process(self.name)
            if isinstance(target, Define) and isinstance(target.type, Never):
                return Never()
        return self

    def visit(self, ctx: PruneContext, fn) -> None:
        target = ctx.filtered.get(self.name)
        if target:
            target.visit(ctx, fn)
        for p in self.params or ():
            p.visit(ctx, fn)


class Define(TNode):
    """Top-level ``type Name<params> = body;`` with optional hint comment."""

    def __init__(self, name: str, params: list[ParamDef], type: TNode,
                 hint: str | None = None):
        self.name = name
        self.params = params
        self.type = type
        self.hint = hint

    def format(self) -> str:
        hint = f"// {self.hint}\n" if self.hint else ""
        params = ""
        if self.params:
            params = "<" + ",".join(p.format() for p in self.params) + ">"
        return f"{hint}type {self.name}{params}={self.type.format()};"

    def collect_literals(self, out: list) -> None:
        for p in self.params:
            p.collect_literals(out)
        self.type.collect_literals(out)

    def filter(self, ctx: PruneContext) -> TNode:
        fparams = [p.filter(ctx) for p in self.params]
        if any(isinstance(p, ParamDef) and isinstance(p.extends, Never)
               for p in fparams):
            return Define(self.name, fparams, Never(), self.hint)

        scope = [p.name for p in self.params]
        if scope:
            ctx.push_scope(scope)
        t = self.type.filter(ctx)
        if not self.params:
            # Path compression: inline zero-param alias chains
            # (type A=B; type B=C → A=C's body; filter.py:329-334).
            while isinstance(t, Type) and not (t.params and len(t.params) > 0):
                target = ctx.filtered.get(t.name)
                if not isinstance(target, Define):
                    break  # builtin / unresolved — reference would crash here
                t = target.type
        if scope:
            ctx.pop_scope()
        return Define(self.name, fparams, t, self.hint)

    def visit(self, ctx: PruneContext, fn) -> None:
        fn(self)
        for p in self.params:
            p.visit(ctx, fn)
        self.type.visit(ctx, fn)
