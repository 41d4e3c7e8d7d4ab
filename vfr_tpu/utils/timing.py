"""Honest device timing under the axon remote-execution runtime.

Empirically on this stack (TPU v5e behind a loopback relay):
  * ``jax.block_until_ready`` returns WITHOUT forcing execution;
  * repeated dispatch of the same (executable, buffers) pair can be elided;
  * a device->host scalar fetch costs ~100 ms of relay round-trip;
  * XLA hoists loop-invariant algebra, so naive perturbations like
    ``(x + i) @ B`` distribute and the matmul leaves the loop.

The honest recipe, implemented here:

  1. run the measured body inside ONE compiled ``lax.fori_loop`` whose
     *traced* upper bound lets a single executable serve every iteration
     count; the loop index perturbs the data (pass it through a gather or
     other non-distributable op inside ``body``) and the carry consumes the
     full result through ``jnp.max`` so nothing dead-code-eliminates;
  2. force execution with a single scalar fetch;
  3. grow the iteration count geometrically until the wall-clock DIFFERENCE
     between the long and the 2-iteration baseline run dominates the fixed
     relay overhead (>= ``min_signal`` seconds), then report median-of-
     repeats difference / extra iterations.

Validated in tests + against hardware ceilings (HBM stream bandwidth).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_seconds_per_iter(
    body: Callable[..., jnp.ndarray],
    x: jnp.ndarray,
    iters: int = 0,                 # 0 = adaptive (recommended)
    base_iters: int = 2,
    repeats: int = 3,
    min_signal: float = 0.25,       # seconds the measured diff must reach
    max_iters: int = 8192,
    operands: tuple = (),
) -> float:
    """Mean device seconds per execution of ``body(i_f32, x, *operands)``.

    ``body`` receives the float32 loop index; use it to perturb inputs in a
    way XLA cannot hoist out of the loop (index a table with it, shift
    tokens, roll data).  The harness consumes the result with ``jnp.max``.

    ``operands``: large device arrays the body reads (e.g. a moment index)
    MUST ride here — as jit ARGUMENTS — rather than be closed over: a
    closed-over array is serialized into the compile request as a program
    constant, which at 2.1M index rows (~1.07 GB) exceeds this runtime's
    remote-compile payload limit (HTTP 413; same failure DESIGN 12c fixed
    in the retriever factories).
    """

    @jax.jit
    def run(x, salt, n, *ops):
        def step(i, acc):
            out = body(i.astype(jnp.float32) + salt, x, *ops)
            return jnp.maximum(acc, jnp.max(out) * 1e-12)
        return jax.lax.fori_loop(0, n, step, jnp.float32(0))

    def wall(salt, n):
        # The loopback relay occasionally drops the remote_compile response
        # mid-read ("response body closed before all bytes were read") even
        # though the compile server finishes and caches the executable —
        # observed twice in one bench session, each retry advancing past the
        # previous drop point.  Retry the dispatch: a cache hit makes the
        # retry cheap, and a genuine error keeps failing and propagates.
        for attempt in range(4):
            t0 = time.perf_counter()
            try:
                float(run(x, jnp.float32(salt), jnp.int32(n), *operands))
                return time.perf_counter() - t0
            except jax.errors.JaxRuntimeError as e:
                transient = ("response body closed" in str(e)
                             or "remote_compile" in str(e))
                if not transient or attempt == 3:
                    raise
                time.sleep(2.0 * (attempt + 1))

    wall(0.125, base_iters)          # compile + warm
    wall(0.25, base_iters + 1)

    n = iters if iters else 16
    salt = 1.0
    while True:
        t_base = wall(salt, base_iters)
        t_n = wall(salt + 0.5, n)
        diff = t_n - t_base
        salt += 1.0
        if iters or diff >= min_signal or n >= max_iters:
            break
        n = min(n * 4, max_iters)

    diffs = [diff]
    for _ in range(max(repeats - 1, 0)):
        t_base = wall(salt, base_iters)
        t_n = wall(salt + 0.5, n)
        diffs.append(t_n - t_base)
        salt += 1.0
    diffs.sort()
    med = diffs[len(diffs) // 2]
    return max(med / (n - base_iters), 1e-12)
