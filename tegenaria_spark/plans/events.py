"""Engine event hooks — the user extension point.

Reimplements the semantics of the reference's event watcher
(/root/reference/events.go:30-148): the engine emits lifecycle events
(START, HEARTBEAT, PAUSE, STOP, ERROR — events.go:30-36) and user
handlers subscribe to them; handler errors are contained (logged, never
crash the crawl loop — events.go:112-127 logs and continues).

The Spark rendering adds the two batch-native events a round loop has
(ROUND_START / ROUND_END with the round's metrics) — the HEARTBEAT
analog of the reference's ticker (engine.go:217-247 emits a heartbeat
per loop tick; here one tick == one round).
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Any, Callable

logger = logging.getLogger(__name__)

# event names (events.go:30-36 START/HEARTBEAT/PAUSE/STOP/ERROR + the
# batch-round pair)
START = "start"
ROUND_START = "round_start"
ROUND_END = "round_end"
HEARTBEAT = "heartbeat"
PAUSE = "pause"
STOP = "stop"
ERROR = "error"

ALL_EVENTS = (START, ROUND_START, ROUND_END, HEARTBEAT, PAUSE, STOP, ERROR)

Handler = Callable[..., None]


class EventBus:
    """Register/emit with contained handler failures.

    ``register(event, fn)`` appends a handler; ``emit(event, **payload)``
    calls each in registration order.  A raising handler is logged and
    skipped — user hooks must never take down the crawl (the reference
    logs and continues, events.go:112-127).
    """

    def __init__(self) -> None:
        self._handlers: dict[str, list[Handler]] = defaultdict(list)
        self.emitted: list[tuple[str, dict]] = []  # bounded debug trace

    def register(self, event: str, fn: Handler) -> None:
        if event not in ALL_EVENTS:
            raise ValueError(f"unknown event {event!r}; expected one of {ALL_EVENTS}")
        self._handlers[event].append(fn)

    def emit(self, event: str, **payload: Any) -> None:
        if len(self.emitted) < 10_000:
            self.emitted.append((event, payload))
        for fn in self._handlers.get(event, ()):
            try:
                fn(**payload)
            except Exception:  # noqa: BLE001 — user hook must not kill the loop
                logger.exception("event handler for %r failed (contained)", event)
