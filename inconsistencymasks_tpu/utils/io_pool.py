"""Async PNG writer: overlaps cv2.imencode/disk IO with the next batch's
device work (the reference writes synchronously per image,
functions.py:2884-2887; at 14k generated images/sec the writes would
otherwise dominate wall-clock)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import List

import cv2


class AsyncWriter:
    """Fire-and-forget cv2.imwrite pool; ``close()`` joins and re-raises
    the first failure.  Usable as a context manager."""

    def __init__(self, workers: int = 8):
        self._pool = ThreadPoolExecutor(max_workers=workers)
        self._futures: List = []

    def imwrite(self, path: str, arr) -> None:
        self._futures.append(self._pool.submit(cv2.imwrite, path, arr))

    def close(self) -> None:
        try:
            for f in self._futures:
                f.result()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


# ---- process-wide pool: fire-and-forget writes from any generation /
# benchmark loop, joined by flush_writes() before the caller returns (the
# next pipeline stage reads these files from disk).
_global_pool: ThreadPoolExecutor | None = None
_global_futures: List = []


def imwrite_async(path: str, arr) -> None:
    """Queue a cv2.imwrite on the shared pool (cv2 releases the GIL during
    PNG encode, so writes overlap the next batch's device work)."""
    global _global_pool
    if _global_pool is None:
        _global_pool = ThreadPoolExecutor(max_workers=8)
    _global_futures.append(_global_pool.submit(cv2.imwrite, path, arr))


def flush_writes() -> None:
    """Join all queued writes; re-raises the first failure.  Every writer
    function calls this before returning so downstream stages see complete
    directories."""
    global _global_futures
    futures, _global_futures = _global_futures, []
    for f in futures:
        f.result()


def flushes_writes(fn):
    """Decorator for writer functions: join queued async writes before
    returning (downstream pipeline stages read the files immediately)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            out = fn(*args, **kwargs)
        finally:
            flush_writes()
        return out

    return wrapper
