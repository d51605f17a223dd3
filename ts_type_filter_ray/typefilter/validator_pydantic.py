"""Dynamic-Pydantic-model validator — V1 in SURVEY.md §2.10 (reference
parity: ``ts_type_filter/validator.py:50-260``), implemented fresh against
this engine's AST. The reference's own authors call this path flaky
(``TODO.md:5-8``); the compiled-closure validator
(:mod:`.validator`, V2) remains the supported surface. The reference's
hard-coded debug special case (``validator.py:94-103``) is intentionally
not reproduced.

Semantics preserved from the reference:
- ``Symbols`` chain with ``rewind`` so a type ref resolves under the
  symbol table visible where its ``Define`` was created
  (``validator.py:20-47,193-204``);
- strict literals via ``BeforeValidator`` (exact type AND value,
  ``validator.py:157-178``);
- ``number`` → ``float`` (pydantic strict mode still admits ints per its
  conversion table, and rejects bools — matching V2's number rule);
- structs → ``create_model(..., strict=True, extra="forbid")`` with
  ``?``-suffixed fields optional (``validator.py:223-260``), recursion
  detected and rejected;
- generics bind positionally through the symbol chain
  (``validator.py:116-154``).
"""

from __future__ import annotations

from typing import Annotated, Any as PyAny, List, Literal as PyLiteral
from typing import Optional, Union as PyUnion

from pydantic import BeforeValidator, ConfigDict, Field, create_model

from .ast import (Array, Define, Literal, Never, ParamRef, Struct, Type,
                  Union, _Primitive)


class Symbols:
    """Chained bindings with ``rewind`` (reference ``validator.py:20-47``)."""

    def __init__(self, bindings: dict, parent: "Symbols | None" = None):
        self._bindings = bindings
        self._parent = parent

    def get(self, name: str):
        if name in self._bindings:
            return self._bindings[name]
        if self._parent:
            return self._parent.get(name)
        return None

    def rewind(self, name: str) -> "Symbols":
        """The deepest ancestor table in which *name* is directly bound —
        i.e. the scope at the time that definition was made."""
        if self._parent is not None:
            if name in self._bindings:
                return self._parent
            return self._parent.rewind(name)
        if name in self._bindings:
            return self
        raise ValueError(f"Symbol '{name}' not found")


def _strict_literal(value):
    expected_type = type(value)

    def check(v):
        if type(v) is not expected_type or v != value:
            raise ValueError(
                f"Expected exactly {expected_type.__name__}({value}), "
                f"got {type(v).__name__}({v})")
        return v

    return Annotated[PyLiteral[value], BeforeValidator(check)]


def _never_type():
    def check(v):
        raise ValueError("Never type should never have a value")
    return Annotated[PyAny, BeforeValidator(check)]


def _strict_number():
    # pydantic's strict float admits bool (bool ⊂ int → float); the
    # engine's number rule (V3) excludes it explicitly
    def check(v):
        if type(v) not in (int, float):
            raise ValueError(f"Expected number, got {type(v).__name__}")
        return v
    return Annotated[float, BeforeValidator(check)]


class _Converter:
    def __init__(self):
        self._cache: dict[str, PyAny] = {}
        self._in_progress: set[int] = set()  # Struct node ids being built
        self._model_seq = 0  # unique model name per struct instantiation

    def convert(self, symbols: Symbols, node, required: bool):
        if isinstance(node, ParamRef):
            node = node.type
        if isinstance(node, Type):
            return self._type_ref(symbols, node, required)
        if isinstance(node, Literal):
            return _strict_literal(node.text)
        if isinstance(node, Struct):
            return self._struct(symbols, node, required)
        if isinstance(node, Array):
            elem = self.convert(symbols, node.type, required)
            return List[elem]
        if isinstance(node, Union):
            members = tuple(self.convert(symbols, t, required)
                            for t in node.types)
            if len(members) == 1:
                return members[0]
            return PyUnion[members]
        if isinstance(node, Never):
            return _never_type()
        if isinstance(node, _Primitive):
            return self._primitive(node.format())
        raise ValueError(f"Unsupported type: {node!r}")

    def _primitive(self, name: str):
        if name == "any":
            return PyAny
        if name == "string":
            return Annotated[str, Field(strict=True)]
        if name == "number":
            return _strict_number()
        if name == "boolean":
            return Annotated[bool, Field(strict=True)]
        if name == "never":
            return _never_type()
        if name in ("true", "false"):
            return _strict_literal(name == "true")
        raise ValueError(f"Unknown type: {name}")

    def _type_ref(self, symbols: Symbols, node: Type, required: bool):
        bound = symbols.get(node.name)
        if bound is not None:
            rewound = symbols.rewind(node.name)
            if isinstance(bound, Define):
                return self._define(rewound, bound, node.params, required)
            # generic parameter bound to an AST node
            return self.convert(rewound, bound, required)
        return self._primitive(node.name)

    def _define(self, symbols: Symbols, d: Define, params, required: bool):
        if d.params:
            params = params or []
            if len(params) != len(d.params):
                raise ValueError(
                    f"Expected {len(d.params)} arguments for {d.name}, "
                    f"got {len(params)}")
            bindings = {str(p.name): arg
                        for p, arg in zip(d.params, params)}
            return self.convert(Symbols(bindings, symbols), d.type, required)
        if d.name not in self._cache:
            self._cache[d.name] = self.convert(symbols, d.type, required)
        return self._cache[d.name]

    def _struct(self, symbols: Symbols, node: Struct, required: bool):
        # Only an IN-PROGRESS revisit is recursion. A completed struct may
        # legitimately be instantiated again — e.g. a generic used twice,
        # Box<"x"> and Box<"y"> — with different bindings, so each
        # instantiation builds a fresh, uniquely named model (ADVICE r2;
        # the reference's V1 path raised spuriously here, TODO.md:5-8).
        if id(node) in self._in_progress:
            raise ValueError(f"Recursive type detected: Struct_{id(node)}")
        self._in_progress.add(id(node))
        try:
            self._model_seq += 1
            model_name = f"DynamicModel_{id(node)}_{self._model_seq}"
            fields = {}
            for raw_name, ftype in node.obj.items():
                optional = raw_name.endswith("?")
                name = raw_name.rstrip("?")
                ptype = self.convert(symbols, ftype, required=not optional)
                if not required or optional:
                    ptype = Optional[ptype]
                fields[name] = (ptype, Field(...)
                                if required and not optional else None)
            return create_model(
                model_name, **fields,
                __config__=ConfigDict(strict=True, extra="forbid"))
        finally:
            self._in_progress.discard(id(node))


def create_validator_model(defs: list, root_name: str):
    """AST defs → dynamic Pydantic model with a single ``value`` field
    (reference ``create_validator``, ``validator.py:50-73``). Validate
    with ``Model(value=cart)`` — raises ``pydantic.ValidationError``."""
    bindings = {d.name: d for d in defs if isinstance(d, Define)}
    symbols = Symbols(bindings)
    root = symbols.get(root_name)
    if root is None:
        raise ValueError(
            f"Root type '{root_name}' not found in type definitions")
    if root.params:
        raise ValueError("Root type must not have type parameters")
    converter = _Converter()
    root_type = converter.convert(symbols, root.type, True)
    return create_model(
        "Validator", value=(root_type, ...),
        __config__=ConfigDict(strict=True, extra="forbid"))


def create_validator_v1(defs: list, root_name: str):
    """V1 as a bool-returning closure, matching the V2
    ``create_validator`` call surface."""
    from pydantic import ValidationError
    model = create_validator_model(defs, root_name)

    def validate(value) -> bool:
        try:
            model(value=value)
            return True
        except ValidationError:
            return False

    return validate
