"""Retry + TTL-cache utilities — the ``load_data.py`` resilience layer
re-expressed for the engine's readers.

- :func:`with_retries` ≙ ``fetch_json_with_retry`` (load_data.py:94-119):
  bounded attempts, fixed delay between them, returns None after
  exhaustion instead of raising — callers degrade (the failed-page
  accounting path).
- :class:`TTLCache` ≙ ``load_or_update_cache`` / ``_is_cache_valid``
  (load_data.py:18-23,31-64): reference side-tables are reloaded only when
  their cache entry is older than the timeout.

Both take an injectable ``clock``/``sleep`` so tests run instantly and the
batch determinism discipline (no hidden wall clock in kernels) holds —
these wrap I/O boundaries only, never data kernels.
"""
from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any


def with_retries(fn: Callable[[], Any], *, max_retries: int = 5,
                 delay: float = 30.0, sleep=time.sleep,
                 on_error: Callable[[Exception], None] | None = None):
    """Call ``fn`` up to ``max_retries`` times with ``delay`` between
    attempts; return its value, or None when every attempt failed."""
    attempt = 0
    while attempt < max_retries:
        try:
            return fn()
        except Exception as exc:   # noqa: BLE001 — boundary wrapper
            if on_error is not None:
                on_error(exc)
            sleep(delay)
            attempt += 1
    return None


class TTLCache:
    """Timeout-validated side-table cache (reference semantics: an entry
    is valid while ``now - stored_at < timeout``)."""

    def __init__(self, timeout: float = 24 * 3600.0, clock=time.time):
        self.timeout = timeout
        self.clock = clock
        self._data: dict[str, Any] = {}
        self._stamps: dict[str, float] = {}

    def is_valid(self, key: str) -> bool:
        if key not in self._stamps:
            return False
        return (self.clock() - self._stamps[key]) < self.timeout

    def load_or_update(self, key: str, loader: Callable[[], Any]):
        if not self.is_valid(key):
            self._data[key] = loader()
            self._stamps[key] = self.clock()
        return self._data[key]
