#!/usr/bin/env python
"""Probe: why top-g block selection costs 6 ms after a 0.48 ms fused stage.

probe_block_stages.py measured stage1-matmul + per-block max at 0.482 ms,
but appending ``lax.top_k(sb, 16)`` jumped to 6.574 ms.  Hypotheses:

  H1  top_k on [Q=128, G=16384] is itself slow           -> time it alone
  H2  top_k's consumer breaks the matmul+max fusion and
      materializes the [Q, N] score tensor (1.07 GB)     -> barrier test
  H3  both partly

Candidates to fix: optimization_barrier between blockmax and top_k;
iterative argmax (g rounds of max+mask over [Q,G], 8.4 MB each).
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from vfr_tpu.utils.timing import device_seconds_per_iter

Q, D = 128, 256
B = 128
g_sel = 16


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_097_152 if on_tpu else 65_536
    G = N // B
    d_c = 32
    rng = np.random.default_rng(0)

    m_low = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    sb0 = jnp.asarray(rng.standard_normal((Q, G)).astype(np.float32))

    out = {"N": N, "G": G, "g": g_sel}

    def s1(i, q_low, m_low):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        s = jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                    preferred_element_type=jnp.float32)
        return jnp.max(s.reshape(Q, G, B), axis=-1)

    # H1: top_k alone on a precomputed [Q, G]
    def topk_alone(i, sb):
        s = sb + i
        v, _ = jax.lax.top_k(s, g_sel)
        return v

    sec = device_seconds_per_iter(topk_alone, sb0)
    out["H1_topk_alone_ms"] = round(1e3 * sec, 3)
    print("H1", out["H1_topk_alone_ms"], flush=True)

    def argmax_alone(i, sb):
        s = sb + i

        def step(carry, _):
            s = carry
            idx = jnp.argmax(s, axis=-1)
            v = jnp.take_along_axis(s, idx[:, None], axis=-1)[:, 0]
            s = s.at[jnp.arange(Q), idx].set(-jnp.inf)
            return s, (v, idx)

        _, (vals, idxs) = jax.lax.scan(step, s, None, length=g_sel)
        return vals

    sec = device_seconds_per_iter(argmax_alone, sb0)
    out["H1b_iter_argmax_alone_ms"] = round(1e3 * sec, 3)
    print("H1b", out["H1b_iter_argmax_alone_ms"], flush=True)

    # H2: fused stage + barrier + top_k
    def barrier_topk(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        sb = jax.lax.optimization_barrier(sb)
        v, _ = jax.lax.top_k(sb, g_sel)
        return v

    sec = device_seconds_per_iter(barrier_topk, q0, operands=(m_low,))
    out["H2_barrier_topk_ms"] = round(1e3 * sec, 3)
    print("H2", out["H2_barrier_topk_ms"], flush=True)

    # no barrier (reproduce the 6.5 ms)
    def plain_topk(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        v, _ = jax.lax.top_k(sb, g_sel)
        return v

    sec = device_seconds_per_iter(plain_topk, q0, operands=(m_low,))
    out["H2b_plain_topk_ms"] = round(1e3 * sec, 3)
    print("H2b", out["H2b_plain_topk_ms"], flush=True)

    # barrier + iterative argmax
    def barrier_argmax(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        sb = jax.lax.optimization_barrier(sb)

        def step(carry, _):
            s = carry
            idx = jnp.argmax(s, axis=-1)
            v = jnp.take_along_axis(s, idx[:, None], axis=-1)[:, 0]
            s = s.at[jnp.arange(Q), idx].set(-jnp.inf)
            return s, (v, idx)

        _, (vals, idxs) = jax.lax.scan(step, sb, None, length=g_sel)
        return vals

    sec = device_seconds_per_iter(barrier_argmax, q0, operands=(m_low,))
    out["H3_barrier_iter_argmax_ms"] = round(1e3 * sec, 3)
    print("H3", out["H3_barrier_iter_argmax_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
