"""User plugin chains: request/response middlewares and item pipelines.

Reimplements the reference's two extension interfaces as DataFrame
transform chains:

- ``MiddlewaresInterface`` (/root/reference/middlewares.go:27-42):
  ``GetPriority/ProcessRequest/ProcessResponse`` — request middlewares
  run in ascending priority before the fetch, response middlewares run
  in *descending* priority after it (the onion model).
- ``PipelinesInterface`` (/root/reference/pipelines.go:28-33):
  ``ProcessItem`` — item pipelines run in ascending priority before the
  items commit to the store.

A plugin is any ``DataFrame -> DataFrame`` callable, so column-level
plugins stay JVM-side (Catalyst sees through them) and a plugin that
genuinely needs Python brings its own pandas UDF.  Returning a filtered
DataFrame drops requests/items (the reference's middleware error /
item-drop path, engine.go:300-318).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame

Transform = Callable[[DataFrame], DataFrame]


@dataclass(order=True)
class _Entry:
    priority: int
    seq: int  # registration order breaks priority ties (stable)
    fn: Transform = field(compare=False)


class TransformChain:
    """Ordered DataFrame-transform plugins (middlewares.go GetPriority)."""

    def __init__(self, reverse: bool = False):
        self._entries: list[_Entry] = []
        self._reverse = reverse

    def add(self, fn: Transform, priority: int = 100) -> "TransformChain":
        self._entries.append(_Entry(priority, len(self._entries), fn))
        return self

    def __len__(self) -> int:
        return len(self._entries)

    def apply(self, df: DataFrame) -> DataFrame:
        entries = sorted(self._entries, reverse=self._reverse)
        for e in entries:
            df = e.fn(df)
        return df


@dataclass
class PluginSet:
    """The engine's three plugin hook points."""

    request_middlewares: TransformChain = field(default_factory=TransformChain)
    # response chain runs in descending priority (onion unwinding)
    response_middlewares: TransformChain = field(
        default_factory=lambda: TransformChain(reverse=True)
    )
    item_pipelines: TransformChain = field(default_factory=TransformChain)
