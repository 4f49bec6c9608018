"""Background host prefetching for the extraction feed.

The reference overlaps decode with GPU compute via DataLoader worker
processes (num_workers=4, clip_inference.py:123).  The TPU-native equivalent
is a bounded background-thread pipeline: host threads decode/transform the
next batches while the device runs the current one (jit dispatch is async, so
a depth-2 buffer suffices to hide host latency when decode is faster than
encode)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(
    iterable: Iterable[T],
    depth: int = 2,
    num_threads: int = 1,
) -> Iterator[T]:
    """Iterate ``iterable`` on background thread(s) with a bounded buffer.

    With ``num_threads > 1`` the source must be an indexable-free iterator;
    items are produced in completion order (fine for extraction where every
    batch carries its own metadata).
    """
    if num_threads == 1:
        return _prefetch_ordered(iterable, depth)
    return _prefetch_pool(iterable, depth, num_threads)


def _prefetch_ordered(iterable, depth):
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    error = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            error.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item


def _prefetch_pool(iterable, depth, num_threads):
    src = iter(iterable)
    lock = threading.Lock()
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    error = []
    done = threading.Event()

    def worker():
        while not done.is_set():
            with lock:
                try:
                    item = next(src)
                except StopIteration:
                    break
                except BaseException as e:
                    error.append(e)
                    break
            q.put(item)
        q.put(_SENTINEL)

    threads = [threading.Thread(target=worker, daemon=True) for _ in range(num_threads)]
    for t in threads:
        t.start()
    finished = 0
    while finished < num_threads:
        item = q.get()
        if item is _SENTINEL:
            finished += 1
            continue
        yield item
    if error:
        raise error[0]
