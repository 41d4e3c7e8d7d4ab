"""Host -> HBM double-buffered prefetch (BASELINE.json:5 data-pipeline target).

``jax.device_put`` on TPU is an async DMA enqueue; dispatching the *next*
batch's transfer while the current step computes hides H2D latency.  The
``Prefetcher`` runs batch assembly (numpy gather/collate) on a background
thread with a bounded queue (depth = number of in-flight device buffers),
which is the owned-buffer protocol SURVEY.md §5 prescribes — no sanitizer
needed, the queue is the only shared state.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

_SENTINEL = object()


def device_put_prefetch(
    it: Iterator[Dict[str, np.ndarray]],
    depth: int = 2,
    sharding=None,
) -> Iterator[Dict[str, jax.Array]]:
    """Keep ``depth`` batches resident on device ahead of the consumer."""
    buf = []
    put = (lambda b: jax.device_put(b, sharding)) if sharding is not None else jax.device_put
    for batch in it:
        buf.append(put(batch))
        if len(buf) > depth:
            yield buf.pop(0)
    yield from buf


class Prefetcher:
    """Background-thread batch assembly + async H2D, bounded queue."""

    def __init__(
        self,
        batch_fn: Callable[[], Iterator[Dict[str, np.ndarray]]],
        depth: int = 2,
        sharding=None,
    ):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(batch_fn,), daemon=True
        )
        self._thread.start()

    def _worker(self, batch_fn):
        try:
            for batch in batch_fn():
                dev = (
                    jax.device_put(batch, self._sharding)
                    if self._sharding is not None
                    else jax.device_put(batch)
                )
                self._q.put(dev)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
