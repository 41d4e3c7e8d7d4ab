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


def _put(batch, sharding):
    """``sharding``: None (default device), a Sharding / pytree of
    shardings, or a CALLABLE ``batch -> pytree of shardings`` (the train
    loop passes one so [K, B, ...] chunk leaves land batch-sharded over the
    DP mesh while per-step RNG keys stay replicated — otherwise every chunk
    lands on device 0 and jit re-shards it per dispatch, VERDICT r2 #5)."""
    if sharding is None:
        return jax.device_put(batch)
    if callable(sharding):
        sharding = sharding(batch)
    return jax.device_put(batch, sharding)


def device_put_prefetch(
    it: Iterator[Dict[str, np.ndarray]],
    depth: int = 2,
    sharding=None,
) -> Iterator[Dict[str, jax.Array]]:
    """Keep ``depth`` batches resident on device ahead of the consumer."""
    buf = []
    for batch in it:
        buf.append(_put(batch, sharding))
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
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(batch_fn,), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that aborts when the consumer closed us.

        A plain ``q.put`` would block forever if the consumer abandons
        iteration with the queue full — the producer thread (and every
        device buffer it holds) would leak for the process lifetime."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self, batch_fn):
        try:
            for batch in batch_fn():
                if self._stop.is_set():
                    return
                if not self._put(_put(batch, self._sharding)):
                    return
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._put(_SENTINEL)

    def close(self) -> None:
        """Stop the producer and reap its thread (idempotent).

        Safe to call while the producer is blocked mid-put: the stop event
        breaks its timeout-put loop.  The queue is drained so held device
        buffers are released promptly."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)

    def __del__(self):
        # never-iterated Prefetcher dropped on the floor: just flag the
        # producer down (no join/drain in a finalizer — the event alone is
        # enough to break its timeout-put loop)
        self._stop.set()

    def __iter__(self):
        try:
            while True:
                try:
                    item = self._q.get(timeout=0.1)
                except queue.Empty:
                    # after close() the sentinel may never arrive (the
                    # producer's put loop aborts on the stop event): a
                    # stopped, drained queue terminates iteration
                    if self._stop.is_set() and not self._thread.is_alive():
                        return
                    continue
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()   # consumer abandoned or exhausted: reap producer
