"""Named-stage pipeline specs — the engine's analog of the reference's
gotaglio ``PipelineSpec`` plugin surface (``samples/menu/menu.py:63-95,
296-311,434-463``; SURVEY.md §2.13): a pipeline is an ordered dict of
named stages, each a ``Dataset -> Dataset`` callable, with per-stage
config overrides."""

from __future__ import annotations

from collections.abc import Callable

from ray.data import Dataset

Stage = Callable[..., Dataset]


class PipelineSpec:
    """Ordered named stages with overridable per-stage config.

    >>> spec = PipelineSpec({"tokenize": tok_stage, "score": score_stage},
    ...                     config={"score": {"k": 10}})
    >>> out = spec.run(ds, overrides={"score.k": 20})
    """

    def __init__(self, stages: dict[str, Stage],
                 config: dict[str, dict] | None = None):
        self.stages = dict(stages)
        self.config = {name: dict(cfg) for name, cfg in (config or {}).items()}

    def with_overrides(self, overrides: dict[str, object]) -> dict[str, dict]:
        """``{"stage.key": value}`` dotted overrides, like the reference's
        CLI config overrides."""
        cfg = {name: dict(c) for name, c in self.config.items()}
        for dotted, value in (overrides or {}).items():
            stage, _, key = dotted.partition(".")
            if stage not in self.stages:
                raise KeyError(f"unknown stage {stage!r}")
            cfg.setdefault(stage, {})[key] = value
        return cfg

    def run(self, ds: Dataset, overrides: dict[str, object] | None = None,
            trace: list | None = None) -> Dataset:
        cfg = self.with_overrides(overrides or {})
        for name, stage in self.stages.items():
            ds = stage(ds, **cfg.get(name, {}))
            if trace is not None:
                trace.append(name)
        return ds
