"""Normalizer-spec builders and JSON-tree normalizers (reference parity:
``ts_type_filter/normalize.py`` — N1-N4 and M8-M10 in SURVEY.md §2).

A normalizer spec is ``{"types": name→type, "defaults": type→{field:
default}, "duplicates": name→[types]}`` derived from the struct defines
of a type graph; the normalizers add (``normalize1``) or strip
(``normalize2``) default fields on every dict carrying a ``name`` key.

Ray-side shape: carts are small JSON strings in a column;
:class:`NormalizeCartsStage` applies a broadcast spec per batch.
"""

from __future__ import annotations

import copy

from .ast import Define, Literal, Struct, Type, Union


def _name_literals(node, defs_by_name: dict, seen: set[str] | None = None) -> set:
    """String/other literal texts reachable through unions and type-ref
    chains, cycle-guarded (reference ``normalize.py:95-143``)."""
    seen = seen if seen is not None else set()
    out: set = set()
    if isinstance(node, Literal):
        out.add(node.text)
    elif isinstance(node, Union):
        for t in node.types:
            out |= _name_literals(t, defs_by_name, seen)
    elif isinstance(node, Type):
        if node.name not in seen:
            seen.add(node.name)
            target = defs_by_name.get(node.name)
            if target is not None:
                out |= _name_literals(target.type, defs_by_name, seen)
            seen.discard(node.name)
    return out


def substitute_type_parameters(node, mapping: dict):
    """Replace generic parameter references with concrete argument nodes
    (reference ``normalize.py:206-244``)."""
    if isinstance(node, Type):
        if node.name in mapping:
            return mapping[node.name]
        args = None
        if node.params:
            args = [substitute_type_parameters(p, mapping) for p in node.params]
        return Type(node.name, args)
    if isinstance(node, Struct):
        return Struct({k: substitute_type_parameters(v, mapping)
                       for k, v in node.obj.items()})
    if isinstance(node, Union):
        return Union(*[substitute_type_parameters(t, mapping)
                       for t in node.types])
    return node


def expand_generic_type(node, defs: list, seen: set[str] | None = None):
    """Monomorphize ``GROUP = OPTION<"a"|"b">`` into a concrete struct
    (reference ``normalize.py:146-203``); None when not expandable."""
    seen = seen if seen is not None else set()
    if not isinstance(node, Type) or node.name in seen:
        return None
    seen.add(node.name)
    try:
        generic = next((d for d in defs
                        if isinstance(d, Define) and d.name == node.name), None)
        if generic is None or not generic.params \
                or not isinstance(generic.type, Struct):
            return None
        args = node.params or []
        if len(args) != len(generic.params):
            return None
        mapping = {p if isinstance(p, str) else p.name: args[i]
                   for i, p in enumerate(generic.params)}
        return substitute_type_parameters(generic.type, mapping)
    finally:
        seen.discard(node.name)


def create_normalizer_spec(defs: list) -> dict:
    """Scan struct defines for ``name`` fields: map each name literal to
    its type, collect optional-field defaults, detect duplicate names
    (reference ``normalize.py:15-92``)."""
    defs_by_name = {d.name: d for d in defs if isinstance(d, Define)}
    name_to_type: dict = {}
    type_to_defaults: dict = {}
    claims: dict = {}

    for d in defs:
        if not isinstance(d, Define):
            continue
        struct = d.type if isinstance(d.type, Struct) else None
        if struct is None:
            expanded = expand_generic_type(d.type, defs)
            if isinstance(expanded, Struct):
                struct = expanded
        if struct is None:
            continue

        name_field = None
        optional_defaults: dict = {}
        for field, ftype in struct.obj.items():
            if field == "name":
                name_field = ftype
            elif field.endswith("?"):
                optional_defaults[field[:-1]] = None
        if name_field is None:
            continue

        literals = _name_literals(name_field, defs_by_name)
        if literals and optional_defaults:
            type_to_defaults[d.name] = optional_defaults
        for lit in literals:
            claims.setdefault(lit, []).append(d.name)
            name_to_type[lit] = d.name

    duplicates = {n: ts for n, ts in claims.items() if len(ts) > 1}
    return {"types": name_to_type, "defaults": type_to_defaults,
            "duplicates": duplicates}


def _name_based_defaults(spec: dict) -> dict:
    name_to_type = spec.get("types", {})
    type_to_defaults = spec.get("defaults", {})
    return {name: type_to_defaults[tname]
            for name, tname in name_to_type.items()
            if tname in type_to_defaults}


def normalize1(tree, defaults: dict):
    """Deep-copy *tree*; any dict with a ``name`` in *defaults* gets the
    default template merged underneath it (tree wins —
    ``normalize.py:287-328``)."""
    def walk(node):
        if isinstance(node, dict):
            name = node.get("name")
            if name in defaults:
                merged = copy.deepcopy(defaults[name])
                merged.update(node)
                node = merged
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(copy.deepcopy(tree))


def normalize2(tree, defaults: dict):
    """Deep-copy *tree*; remove fields whose values equal the default
    template for the dict's ``name`` (``normalize.py:331-370``)."""
    def walk(node):
        if isinstance(node, dict):
            spec = defaults.get(node.get("name"), {})
            node = {k: v for k, v in node.items()
                    if not (k in spec and v == spec[k])}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(x) for x in node]
        return node

    return walk(copy.deepcopy(tree))


def create_normalizer(spec: dict, remove_defaults: bool = True):
    """Curry a spec into a one-argument normalizer
    (``normalize.py:247-284``)."""
    defaults = _name_based_defaults(spec)

    def normalizer(tree):
        return normalize2(tree, defaults) if remove_defaults \
            else normalize1(tree, defaults)

    return normalizer


def merge_normalizer_specs(new_spec: dict, original_spec: dict,
                           renamed_types: dict) -> tuple[dict, list[str]]:
    """Merge two specs with type renames and stale-entry warnings
    (``normalize.py:373-455``)."""
    warnings: list[str] = []

    targets: dict = {}
    for old, new in renamed_types.items():
        if new in targets:
            warnings.append(
                f"Name collision in renamedTypes: both '{targets[new]}' and "
                f"'{old}' map to '{new}'")
        else:
            targets[new] = old

    original_defaults = original_spec.get("defaults", {})
    for old in renamed_types:
        if old not in original_defaults:
            warnings.append(
                f"Type '{old}' in renamedTypes not found in original spec defaults")

    merged = {"types": copy.deepcopy(new_spec.get("types", {})),
              "duplicates": copy.deepcopy(new_spec.get("duplicates", {})),
              "defaults": {}}

    renamed_defaults = {renamed_types.get(t, t): copy.deepcopy(v)
                        for t, v in original_defaults.items()}
    merged_defaults = renamed_defaults
    new_defaults = new_spec.get("defaults", {})
    for t, v in new_defaults.items():
        if t in merged_defaults:
            entry = copy.deepcopy(merged_defaults[t])
            entry.update(v)
            merged_defaults[t] = entry
        else:
            merged_defaults[t] = copy.deepcopy(v)

    stale = []
    for t in renamed_defaults:
        if t not in new_defaults:
            warnings.append(f"Type '{t}' from original spec not found in new spec")
            if renamed_defaults[t] in (None, {}):
                stale.append(t)
    for t in stale:
        merged_defaults.pop(t, None)

    merged["defaults"] = merged_defaults
    return merged, warnings


class NormalizeCartsStage:
    """Actor-pool stage: normalize a column of JSON cart strings with a
    spec compiled once per actor (M8-M10 as a batch transform; the spec
    is the broadcast small side — SURVEY.md §2.4 J4)."""

    def __init__(self, spec: dict, remove_defaults: bool = True):
        self._normalize = create_normalizer(spec, remove_defaults)

    def __call__(self, batch):
        import json

        import pyarrow as pa
        out = [json.dumps(self._normalize(json.loads(s)), sort_keys=True)
               for s in batch["cart"].to_pylist()]
        cols = {name: batch[name] for name in batch.column_names}
        cols["normalized"] = pa.array(out, type=pa.string())
        return pa.table(cols)
