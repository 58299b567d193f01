"""Lightweight observability (SURVEY.md section 5: the reference has none —
only tqdm bars; per-generation wall-clock IS the north-star metric, so we
log it).

- :class:`StepTimer` — named wall-clock sections, JSONL-appendable.
- :func:`trace` — context manager wrapping ``jax.profiler.trace`` for
  on-demand TPU profiles (view with TensorBoard / xprof).
- :func:`log_event` — structured JSONL event log next to the CSVs.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class StepTimer:
    """Accumulates named wall-clock sections.

    >>> t = StepTimer()
    >>> with t.section("train"):
    ...     ...
    >>> t.summary()  # {'train': {'total_s': ..., 'count': ...}}
    """

    def __init__(self):
        self._acc: dict = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            entry = self._acc.setdefault(name, {"total_s": 0.0, "count": 0})
            entry["total_s"] += dt
            entry["count"] += 1

    def summary(self) -> dict:
        return {k: dict(v) for k, v in self._acc.items()}

    def dump(self, path: str, extra: Optional[dict] = None) -> None:
        log_event(path, {"timer": self.summary(), **(extra or {})})


def log_event(path: str, event: dict) -> None:
    """Append one JSON line with a wall-clock timestamp."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a", encoding="utf-8") as f:
        f.write(json.dumps({"t": time.time(), **event}) + "\n")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed block (TPU timeline)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
