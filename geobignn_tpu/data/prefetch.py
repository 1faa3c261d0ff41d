"""Background input pipeline: overlap host padding + H2D with device compute.

The reference's DataLoader is single-threaded (no num_workers,
code/train_dual.py:142) and the device waits on every sample.  Here a
single worker thread runs `fetch` (pad + table attach + jax.device_put) up
to `depth` items ahead of the consumer; because device_put only *enqueues*
the transfer, the H2D copy of sample i+1 overlaps the device step on
sample i — double-buffered H2D with no explicit buffer management.

One worker preserves order and is enough: padding is numpy (releases the
GIL) and transfers are async; the consumer only blocks when the device is
faster than the host, which is exactly when prefetching cannot help more.
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
R = TypeVar("R")


def prefetch_iter(
    items: Iterable[T], fetch: Callable[[T], R], depth: int = 2
) -> Iterator[R]:
    """Yield fetch(item) for each item, keeping up to `depth` fetches in
    flight on a background thread.  Results arrive in input order; a fetch
    exception surfaces at the corresponding yield."""
    if depth <= 0:
        for x in items:
            yield fetch(x)
        return
    with ThreadPoolExecutor(max_workers=1) as ex:
        q: collections.deque = collections.deque()
        try:
            for x in items:
                q.append(ex.submit(fetch, x))
                if len(q) > depth:
                    yield q.popleft().result()
            while q:
                yield q.popleft().result()
        finally:  # consumer bailed early: drop queued work fast
            for f in q:
                f.cancel()
