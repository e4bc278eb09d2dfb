"""Explicit string-keyed registries.

The reference resolves every pluggable component (network, dataset, trainer,
evaluator, visualizer) with `imp.load_source` on paths derived from
`(cfg.task, dataset_id)` at runtime (reference lib/networks/make_network.py:31-34,
lib/datasets/make_dataset.py:16-20, lib/evaluators/make_evaluator.py:6-13).
Here each layer owns a Registry and components self-register at import time.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str) -> Callable:
        def deco(fn: Callable) -> Callable:
            if name in self._entries:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._entries[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._entries:
            raise KeyError(
                f"unknown {self.kind} {name!r}; have {sorted(self._entries)}"
            )
        return self._entries[name]

    def build(self, name: str, *args: Any, **kwargs: Any) -> Any:
        return self.get(name)(*args, **kwargs)

    def names(self) -> Iterable[str]:
        return sorted(self._entries)

    def __contains__(self, name: str) -> bool:
        return name in self._entries


NETWORKS = Registry("network")      # ref make_network.py
DATASETS = Registry("dataset")      # ref make_dataset.py + dataset_catalog.py
TRAINERS = Registry("trainer")      # ref make_trainer.py (per-task loss wrapper)
EVALUATORS = Registry("evaluator")  # ref make_evaluator.py
VISUALIZERS = Registry("visualizer")  # ref make_visualizer.py
