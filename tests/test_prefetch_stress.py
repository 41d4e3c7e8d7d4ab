"""Prefetch pipeline stress (SURVEY.md §5: bounded queue, owned-buffer
protocol — validated by stress, not by a sanitizer)."""

import threading
import time

import numpy as np

from vfr_tpu.data.prefetch import Prefetcher, device_put_prefetch


def test_stress_many_batches_slow_consumer():
    N = 200

    def gen():
        for i in range(N):
            yield {"x": np.full((4,), i, np.float32), "i": np.int32(i)}

    pf = Prefetcher(gen, depth=3)
    seen = []
    for j, b in enumerate(pf):
        if j % 37 == 0:
            time.sleep(0.002)  # stall the consumer; queue must absorb
        seen.append(int(np.asarray(b["i"])))
    assert seen == list(range(N))


def test_stress_slow_producer():
    N = 50

    def gen():
        for i in range(N):
            if i % 11 == 0:
                time.sleep(0.002)
            yield {"x": np.full((2,), i, np.float32)}

    out = list(Prefetcher(gen, depth=2))
    assert len(out) == N
    assert float(np.asarray(out[-1]["x"])[0]) == N - 1


def test_bounded_queue_never_overfills():
    """Producer must block at the queue bound: with a parked consumer the
    producer can stage at most depth batches (+1 in flight)."""
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield {"x": np.zeros(1, np.float32)}

    pf = Prefetcher(gen, depth=2)
    time.sleep(0.3)  # consumer never reads
    assert len(produced) <= 4, produced  # depth 2 + worker-held + epsilon
    # drain to let the thread exit
    assert len(list(pf)) == 100


def test_consumer_abandons_early_producer_exits():
    """An abandoned iteration must not strand the producer thread blocked
    on a full queue (VERDICT r1 weak #5): close() breaks its put loop."""
    def gen():
        for i in range(10_000):
            yield {"x": np.full((2,), i, np.float32)}

    pf = Prefetcher(gen, depth=2)
    for j, b in enumerate(pf):
        if j == 3:
            break                       # abandon mid-stream, queue full
    pf.close()                          # idempotent with __iter__'s finally
    pf._thread.join(timeout=5.0)
    assert not pf._thread.is_alive(), "producer thread leaked after abandon"


def test_close_while_producer_blocked_mid_put():
    """close() with no consumer at all: producer is parked in its
    timeout-put loop and must unwind promptly."""
    def gen():
        for i in range(10_000):
            yield {"x": np.zeros(1, np.float32)}

    pf = Prefetcher(gen, depth=1)
    time.sleep(0.1)                     # let the producer fill + block
    pf.close()
    assert not pf._thread.is_alive(), "producer stuck despite close()"


def test_close_then_iterate_yields_nothing_or_tail():
    """Iteration after close() must terminate, never hang."""
    def gen():
        for i in range(100):
            yield {"x": np.full((1,), i, np.float32)}

    pf = Prefetcher(gen, depth=2)
    pf.close()
    out = list(pf)                      # queue was drained by close
    assert len(out) <= 2


def test_concurrent_prefetchers_do_not_interfere():
    def gen(tag):
        def g():
            for i in range(40):
                yield {"x": np.full((2,), tag * 1000 + i, np.float32)}
        return g

    pfs = [Prefetcher(gen(t), depth=2) for t in range(4)]
    results = {}
    errs = []

    def drain(t, pf):
        try:
            results[t] = [float(np.asarray(b["x"])[0]) for b in pf]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=drain, args=(t, pf))
        for t, pf in enumerate(pfs)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=30)
    assert not errs
    for t in range(4):
        assert results[t] == [float(t * 1000 + i) for i in range(40)]
