"""Background-thread batch prefetching.

The reference hides its CPU-heavy __getitem__ (KDTree patch + FPS) behind
torch DataLoader worker processes (tempo_dataset.py:120-122). Here the
equivalent is a daemon thread filling a bounded queue, so host-side patch
sampling overlaps the device step; numpy and the native C++ kernels release
the GIL for the heavy parts, making a thread (not a process) sufficient.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch_iterator(it: Iterator[T], size: int = 2) -> Iterator[T]:
    """Wrap an iterator with a background producer thread and a bounded
    queue of ``size`` ready batches."""
    q: "queue.Queue" = queue.Queue(maxsize=size)

    def producer():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
