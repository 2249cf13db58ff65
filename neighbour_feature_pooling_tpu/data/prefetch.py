"""Background-thread batch prefetching.

The reference overlaps host augmentation with device compute via 12
DataLoader worker processes (``/root/reference/demo.py:523``); here a single
producer thread (feeding the already-multithreaded native augment kernel)
keeps a small queue ahead of the jitted device step, so decode+augment for
batch i+1 overlaps the TPU step for batch i.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, TypeVar

T = TypeVar("T")

__all__ = ["prefetch"]

_END = object()


def prefetch(it: Iterator[T], depth: int = 2) -> Iterator[T]:
    """Run ``it`` in a daemon thread, buffering up to ``depth`` items."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []

    def producer():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # surface in the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
