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
