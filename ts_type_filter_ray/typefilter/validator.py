"""Compiled-closure validator (reference parity:
``ts_type_filter/validator2.py`` — V2/V3 in SURVEY.md §2.10; the
reference's Pydantic-based V1 path is noted flaky by its own authors,
``TODO.md:5-8``, so the closure compiler is the supported surface).

``create_validator(defs, root)`` compiles the type graph rooted at
*root* into a ``(value) -> bool`` closure. Generics compile to templates
taking positional argument validators. Strictness rules (V3,
``validator2.py:179-209,245-246``): literals require exact type+value,
``number`` excludes bool, ``boolean`` is exactly bool.

Ray-side shape: :class:`ValidateCartsStage` — validator compiled once
per actor, applied per batch.
"""

from __future__ import annotations

from collections.abc import Callable

from .ast import Array, Define, Literal, Never, Struct, Type, Union, _Primitive

Validator = Callable[[object], bool]
Template = Callable[[list[Validator]], Validator]


def _strict_equals(a, b) -> bool:
    return a == b and type(a) is type(b)


def _const(result: bool) -> Template:
    def template(args):
        return lambda value: result
    return template


def _primitive(expected: type) -> Template:
    def template(args):
        return lambda value: type(value) is expected
    return template


def _number_template(args):
    return lambda value: type(value) in (int, float)


class _Compiler:
    def __init__(self, defs_by_name: dict[str, Define]):
        self._defs = defs_by_name
        self._memo: dict[str, Template] = {}

    def node(self, node, locals_: dict[str, int]) -> Template:
        if isinstance(node, Array):
            return self._array(node, locals_)
        if isinstance(node, Define):
            return self.define(node)
        if isinstance(node, Literal):
            text = node.text

            def template(args):
                return lambda value: _strict_equals(value, text)
            return template
        if isinstance(node, Struct):
            return self._struct(node, locals_)
        if isinstance(node, Type):
            return self._type_ref(node, locals_)
        if isinstance(node, Union):
            return self._union(node, locals_)
        if isinstance(node, Never):
            return _const(False)
        if isinstance(node, _Primitive):
            # parser singletons: any; (string/number/boolean arrive as
            # Type refs and are handled in _type_ref)
            name = node.format()
            builtin = {"any": _const(True), "string": _primitive(str),
                       "boolean": _primitive(bool),
                       "number": _number_template,
                       "true": None, "false": None}.get(name, "missing")
            if builtin == "missing":
                raise ValueError(f"Unknown primitive: {name}")
            if builtin is None:
                expected = name == "true"

                def template(args):
                    return lambda value: _strict_equals(value, expected)
                return template
            return builtin
        raise ValueError(f"Unsupported TS type: {node}")

    def _array(self, node: Array, locals_) -> Template:
        element = self.node(node.type, locals_)

        def template(args):
            ev = element(args)

            def validator(value):
                return isinstance(value, list) and all(ev(x) for x in value)
            return validator
        return template

    def define(self, d: Define) -> Template:
        memo = self._memo.get(d.name)
        if memo is not None:
            return memo

        def template(args):
            if len(args) != len(d.params):
                raise ValueError(
                    f"Expected {len(d.params)} arguments, got {len(args)}")
            locals_ = {str(p.name): i for i, p in enumerate(d.params)}
            return self.node(d.type, locals_)(args)

        self._memo[d.name] = template
        return template

    def _struct(self, node: Struct, locals_) -> Template:
        fields = {}
        for raw_name, ftype in node.obj.items():
            optional = raw_name.endswith("?")
            fields[raw_name.rstrip("?")] = (optional, self.node(ftype, locals_))

        def template(args):
            compiled = {name: (opt, tmpl(args))
                        for name, (opt, tmpl) in fields.items()}

            def validator(value):
                if not isinstance(value, dict):
                    return False
                for name, (optional, fv) in compiled.items():
                    if name not in value:
                        if not optional:
                            return False
                    elif not fv(value[name]):
                        return False
                return all(k in compiled for k in value)
            return validator
        return template

    def _type_ref(self, node: Type, locals_) -> Template:
        target = self._defs.get(node.name)
        if target is not None:
            args_nodes = node.params or []
            if len(args_nodes) != len(target.params):
                raise ValueError(
                    f"Expected {len(target.params)} arguments, "
                    f"got {len(args_nodes)}")
            inner = self.define(target)
            arg_templates = [self.node(a, locals_) for a in args_nodes]

            def template(args):
                return inner([t(args) for t in arg_templates])
            return template

        index = locals_.get(node.name)
        if index is not None:
            def template(args):
                if index >= len(args):
                    raise ValueError(f"Type parameter index {index} out of range")
                return args[index]
            return template

        builtin = {
            "string": _primitive(str),
            "boolean": _primitive(bool),
            "number": _number_template,
            "any": _const(True),
            "never": _const(False),
        }.get(node.name)
        if builtin is None:
            raise ValueError(f"Unknown type: {node.name}")
        return builtin

    def _union(self, node: Union, locals_) -> Template:
        members = [self.node(t, locals_) for t in node.types]

        def template(args):
            validators = [m(args) for m in members]

            def validator(value):
                return any(v(value) for v in validators)
            return validator
        return template


def create_validator(defs: list, root_name: str) -> Validator:
    """Compile the graph rooted at *root_name* into a bool-returning
    closure (reference ``create_validator2``, ``validator2.py:249-266``)."""
    defs_by_name = {d.name: d for d in defs if isinstance(d, Define)}
    root = defs_by_name.get(root_name)
    if root is None:
        raise ValueError(f"Root type '{root_name}' not found in type definitions")
    if root.params:
        raise ValueError("Root type must not have type parameters")
    compiler = _Compiler(defs_by_name)
    return compiler.node(root, {})([])


# reference name parity: the reference exports this compiled-closure
# validator as ``create_validator2`` (its ``create_validator`` is the
# Pydantic V1 path — see ``.validator_pydantic``)
create_validator2 = create_validator


class ValidateCartsStage:
    """Actor-pool stage: validate a column of JSON cart strings against a
    type graph; validator compiled once per actor (V2 as a batch
    transform). ``mode="pydantic"`` swaps in the V1 dynamic-model
    validator (:mod:`.validator_pydantic`) behind the same surface."""

    def __init__(self, source: str, root_name: str, mode: str = "closure"):
        from .parser import parse
        if mode == "pydantic":
            from .validator_pydantic import create_validator_v1
            self._validate = create_validator_v1(parse(source), root_name)
        else:
            self._validate = create_validator(parse(source), root_name)

    def __call__(self, batch):
        import json

        import pyarrow as pa
        ok = []
        for s in batch["cart"].to_pylist():
            try:
                ok.append(self._validate(json.loads(s)))
            except ValueError:
                ok.append(False)
        cols = {name: batch[name] for name in batch.column_names}
        cols["valid"] = pa.array(ok, type=pa.bool_())
        return pa.table(cols)
