"""TypeScript type-graph filtering: parser, AST, never-propagation prune.

Re-expression of the reference's secondary capability family
(``ts_type_filter/parser.py``, ``ts_type_filter/filter.py``) — the AST
data model (SURVEY.md §1.2), the filter dataflow (§2.9) and the
hand-written recursive-descent parser replacing the reference's Lark
grammar (Lark is unavailable in this environment; the grammar semantics
at ``parser.py:16-69`` are preserved).
"""

from .ast import (Any, Array, Boolean, Define, FalseValue, Literal, Never,
                  Number, ParamDef, ParamRef, String, Struct, TrueValue, Type,
                  Union)
from .parser import parse, strip_ts_comments
from .pipeline import (PruneTypesStage, TypeIndex, build_filtered_types,
                       build_symbol_table, build_type_index,
                       collect_string_literals, prune_source, serialize_defs)

__all__ = [
    "Any", "Array", "Boolean", "Define", "FalseValue", "Literal", "Never",
    "Number", "ParamDef", "ParamRef", "String", "Struct", "TrueValue",
    "Type", "Union", "parse", "strip_ts_comments", "TypeIndex", "PruneTypesStage", "prune_source",
    "build_filtered_types", "build_symbol_table", "build_type_index",
    "collect_string_literals", "serialize_defs",
]
