"""Factory registries.

The reference hard-codes its factories as if/elif chains in ``main.py``
(/root/reference/main.py:31-102). Here every component self-registers
into a named :class:`Registry`, so the CLI, tests, and user code build
objects from config dicts with one code path and new components need no
CLI edits.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._fns: Dict[str, Callable[..., Any]] = {}

    def register(self, name: str, fn: Callable[..., Any] | None = None):
        """Register ``fn`` under ``name``; usable as a decorator."""

        def _do(f):
            if name in self._fns:
                raise KeyError(f"{self.name}: duplicate registration {name!r}")
            self._fns[name] = f
            return f

        if fn is not None:
            return _do(fn)
        return _do

    def build(self, name: str, **kwargs):
        if name not in self._fns:
            raise ValueError(
                f"Unknown {self.name} {name!r}. Available: {sorted(self._fns)}"
            )
        return self._fns[name](**kwargs)

    def get(self, name: str):
        if name not in self._fns:
            raise ValueError(
                f"Unknown {self.name} {name!r}. Available: {sorted(self._fns)}"
            )
        return self._fns[name]

    def __contains__(self, name: str) -> bool:
        return name in self._fns

    def names(self):
        return sorted(self._fns)


MODELS = Registry("model")
LOSSES = Registry("loss")
DATASETS = Registry("dataset")
OPTIMIZERS = Registry("optimizer")
SCHEDULERS = Registry("scheduler")
