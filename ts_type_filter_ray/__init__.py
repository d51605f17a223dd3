"""Public surface of the Ray-Data-native engine.

Mirrors the reference package's exports (``ts_type_filter/__init__.py``:
``parse``, ``Index``-equivalent search, ``build_type_index`` etc.,
normalizers, ``create_validator``/``create_validator2``) so a user of
the reference can switch with minimal renames, and adds the engine's own
distributed surface (``build_index``, ``LocalSearcher``,
``SearchService``, checkpointed builds, corpus readers).

Exports resolve lazily (PEP 562) so ``import ts_type_filter_ray`` stays
light — Ray is only imported when a distributed entry point is touched.
"""

from __future__ import annotations

import importlib

_EXPORTS = {
    # type-graph family (reference parity)
    "parse": ".typefilter",
    "strip_ts_comments": ".typefilter",
    "build_symbol_table": ".typefilter",
    "build_type_index": ".typefilter",
    "build_filtered_types": ".typefilter",
    "collect_string_literals": ".typefilter",
    "serialize_defs": ".typefilter",
    "TypeIndex": ".typefilter",
    "PruneTypesStage": ".typefilter",
    # normalizers (reference parity)
    "create_normalizer": ".typefilter.normalize",
    "create_normalizer_spec": ".typefilter.normalize",
    "merge_normalizer_specs": ".typefilter.normalize",
    "NormalizeCartsStage": ".typefilter.normalize",
    # validators: V2 is the supported surface (reference
    # create_validator2); V1 is the Pydantic port
    "create_validator": ".typefilter.validator",
    "create_validator2": ".typefilter.validator",
    "ValidateCartsStage": ".typefilter.validator",
    "create_validator_v1": ".typefilter.validator_pydantic",
    "create_validator_model": ".typefilter.validator_pydantic",
    # oracle (reference Index semantics, single-process)
    "Index": ".oracle.index",
    "build_oracle": ".oracle.index",
    "CorpusOracle": ".oracle.index",
    # distributed engine
    "read_corpus": ".sources.corpus",
    "corpus_from_documents": ".sources.corpus",
    "build_index": ".pipelines.build",
    "BuiltIndex": ".pipelines.build",
    "extend_index": ".pipelines.build",
    "compact_index": ".pipelines.build",
    "maybe_compact": ".pipelines.build",
    "delete_docs": ".pipelines.build",
    "upsert_docs": ".pipelines.build",
    "merge_index_roots": ".pipelines.build",
    "build_index_checkpointed": ".state.manifest",
    "LocalSearcher": ".pipelines.query",
    "match_dataset": ".pipelines.query",
    "highlight": ".pipelines.query",
    "SearchService": ".pipelines.serve",
    "PipelineSpec": ".pipelines.spec",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(importlib.import_module(mod, __name__), name)


def __dir__():
    return __all__
