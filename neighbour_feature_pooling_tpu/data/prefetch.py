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
    """Run ``it`` in a daemon thread, buffering up to ``depth`` items.

    The producer polls a stop flag while blocked on the bounded queue, so it
    exits promptly when the consumer stops iterating early (break, exception,
    generator close) instead of pinning the iterator and its buffers forever.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    err = []

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in it:
                if not _put(item):
                    return
        except BaseException as e:  # surface in the consumer
            err.append(e)
        finally:
            _put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
