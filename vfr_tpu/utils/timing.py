"""Honest device timing under the axon remote-execution runtime.

Empirically on this stack (TPU v5e behind a loopback relay):
  * ``jax.block_until_ready`` returns WITHOUT forcing execution;
  * repeated dispatch of the same (executable, buffers) pair can be elided;
  * a device->host scalar fetch costs ~100 ms of relay round-trip.

Naive ``for _ in range(N): f(x); block_until_ready`` therefore reports
dispatch overhead, not compute.  The honest recipe, implemented here:

  1. run the measured body inside ONE compiled ``lax.fori_loop`` whose loop
     index perturbs the data (defeats memoization / loop hoisting) and whose
     carry consumes the full result through an algebraically irreducible
     reduction (``max``) so nothing dead-code-eliminates;
  2. force execution with a single scalar fetch;
  3. measure at two static iteration counts and divide the difference —
     the fixed relay/fetch overhead cancels.

Validated in tests/test_timing_tpu.py against known hardware ceilings
(MXU matmul rate, HBM stream bandwidth).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def device_seconds_per_iter(
    body: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    iters: int = 32,
    base_iters: int = 2,
    repeats: int = 3,
) -> float:
    """Mean device seconds per execution of ``body(i_f32, x) -> array``.

    ``body`` receives the float32 loop index (use it to perturb inputs) and
    must return an array; the harness consumes it with ``jnp.max``.
    """

    def make(n):
        @jax.jit
        def run(x, salt):
            def step(i, acc):
                out = body(i.astype(jnp.float32) + salt, x)
                return jnp.maximum(acc, jnp.max(out) * 1e-12)
            return jax.lax.fori_loop(0, n, step, jnp.float32(0))
        return run

    run_base, run_n = make(base_iters), make(iters)

    def wall(run, salt):
        t0 = time.perf_counter()
        float(run(x, jnp.float32(salt)))   # scalar fetch forces execution
        return time.perf_counter() - t0

    # warmup/compile both variants (distinct salts defeat any caching)
    wall(run_base, 0.125)
    wall(run_n, 0.25)
    best = float("inf")
    for r in range(repeats):
        t_base = wall(run_base, 1.0 + r)
        t_n = wall(run_n, 101.0 + r)
        best = min(best, (t_n - t_base) / (iters - base_iters))
    return max(best, 1e-9)
