"""Asynchronous host input pipeline — double-buffered prefetch.

The reference overlaps data handling with compute via its thread pool
(dl_algo_abst.h dispatches per-row tasks; loaders run on host threads).
The TPU equivalent: a background thread prepares + transfers the next
batch while the device executes the current step, so host batching never
serialises with device compute. Works with any batch iterator factory
(sparse_batches / dense_batches) and re-shuffles every epoch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax


class Prefetcher:
    """Wrap a batch-iterator factory with a background prefetch thread.

    factory(epoch) -> iterator of dict batches (numpy). Batches are
    device_put on the worker thread (optionally with a sharding via
    `placer`), so the main loop only dequeues ready-on-device batches.

        pf = Prefetcher(lambda ep: sparse_batches(ds, 256, rng=rng))
        for epoch in range(E):
            for batch in pf.epoch(epoch):
                state, loss = step(state, batch)
    """

    def __init__(
        self,
        factory: Callable[[int], Iterator[dict]],
        depth: int = 2,
        placer: Callable[[dict], dict] | None = None,
    ):
        self.factory = factory
        self.depth = depth
        self.placer = placer or (lambda b: {k: jax.device_put(v) for k, v in b.items()})

    def epoch(self, epoch: int) -> Iterator[dict]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: list[BaseException] = []

        def worker():
            try:
                for batch in self.factory(epoch):
                    q.put(self.placer(batch))
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if err:
            raise err[0]
