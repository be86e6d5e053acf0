"""Ordered transformation pipeline — the engine's signature abstraction.

Generalizes the reference's core dataflow (SURVEY.md §1.2, §2.A R13/R14:
`Batch Processor.py:306-310, 334-349` — an ordered, user-reorderable,
enable/disable-able list of scripts applied to every element of a
deduplicated collection). Here each stage is a pure
``DataFrame -> DataFrame`` function; composing stages builds ONE lazy
Catalyst plan, so ordering is plan-time metadata (free) and the
optimizer fuses the whole chain — the Spark-first replacement for the
reference's serial per-file loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Iterable

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]


@dataclass(frozen=True)
class Stage:
    """One pipeline step: (name, transform, enabled) — the Spark analog
    of the reference's ``{"path": str, "var": BooleanVar}`` entries
    (`Batch Processor.py:68-69, 104`)."""

    name: str
    fn: StageFn
    enabled: bool = True


@dataclass
class Pipeline:
    """An ordered, mutable chain of stages with dedup-on-add, reorder,
    and enable/disable — mirroring the reference's pipeline-list UI
    semantics (`Batch Processor.py:209-219, 260-274, 304`), minus the UI."""

    stages: list[Stage] = field(default_factory=list)

    def add(self, name: str, fn: StageFn, enabled: bool = True) -> "Pipeline":
        # Dedup on stage name, as the reference dedups on absolute
        # script path (`Batch Processor.py:263-266`).
        if any(s.name == name for s in self.stages):
            return self
        self.stages.append(Stage(name, fn, enabled))
        return self

    def remove_disabled(self) -> "Pipeline":
        # "remove unchecked" (`Batch Processor.py:270-274`).
        self.stages = [s for s in self.stages if s.enabled]
        return self

    def set_enabled(self, name: str, enabled: bool) -> "Pipeline":
        self.stages = [replace(s, enabled=enabled) if s.name == name else s
                       for s in self.stages]
        return self

    def move_up(self, name: str) -> "Pipeline":
        # Swap-based reorder (`Batch Processor.py:209-213`).
        i = self._index(name)
        if i > 0:
            self.stages[i - 1], self.stages[i] = self.stages[i], self.stages[i - 1]
        return self

    def move_down(self, name: str) -> "Pipeline":
        i = self._index(name)
        if i < len(self.stages) - 1:
            self.stages[i + 1], self.stages[i] = self.stages[i], self.stages[i + 1]
        return self

    def _index(self, name: str) -> int:
        for i, s in enumerate(self.stages):
            if s.name == name:
                return i
        raise KeyError(name)

    def enabled_stages(self) -> Iterable[Stage]:
        # Execution-time enabled filter (`Batch Processor.py:304`).
        return (s for s in self.stages if s.enabled)

    def apply(self, df: DataFrame) -> DataFrame:
        """Compose enabled stages in order into one lazy plan."""
        for stage in self.enabled_stages():
            df = stage.fn(df)
        return df

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)
