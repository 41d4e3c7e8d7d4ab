#!/usr/bin/env python
"""Probe 2: materializing [Q,G] blockmax is the 6 ms, not top_k.

probe_topg.py: top_k alone on [Q,G] = 0.22 ms; barrier before top_k does
NOT help (6.6 ms) -> the cost appears whenever the [Q,G] blockmax output
must actually exist.  Variants:

  V1  stage1 + blockmax, output forced to materialize (barrier, no topk)
  V2  same but scanned over row-chunks of m_low (bound the [Q,chunk]
      intermediate; does XLA schedule it better?)
  V3  V2 + top_k (the candidate production pipeline)
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

Q = 128
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

    out = {"N": N, "G": G}

    def s1(i, q_low, m_low):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        s = jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                    preferred_element_type=jnp.float32)
        return jnp.max(s.reshape(Q, G, B), axis=-1)

    def v1(i, q_low, m_low):
        return jax.lax.optimization_barrier(s1(i, q_low, m_low))

    sec = device_seconds_per_iter(v1, q0, operands=(m_low,))
    out["V1_materialized_blockmax_ms"] = round(1e3 * sec, 3)
    print("V1", out["V1_materialized_blockmax_ms"], flush=True)

    # V2: chunked scan; chunk = CH rows
    for CH in (131_072, 262_144):
        GC = CH // B
        m_chunks = m_low.reshape(N // CH, CH, d_c)

        def v2(i, q_low, m_chunks):
            q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
            qb = 2.0 * q.astype(m_low.dtype)

            def step(_, mc):
                s = jnp.dot(qb, mc.T, preferred_element_type=jnp.float32)
                return None, jnp.max(s.reshape(Q, GC, B), axis=-1)

            _, sb = jax.lax.scan(step, None, m_chunks)   # [n, Q, GC]
            return jnp.moveaxis(sb, 0, 1).reshape(Q, G)

        sec = device_seconds_per_iter(v2, q0, operands=(m_chunks,))
        out[f"V2_scan_ch{CH}_ms"] = round(1e3 * sec, 3)
        print(f"V2 ch={CH}", out[f"V2_scan_ch{CH}_ms"], flush=True)

        def v3(i, q_low, m_chunks):
            sb = v2(i, q_low, m_chunks)
            v, blk = jax.lax.top_k(sb, g_sel)
            return v

        sec = device_seconds_per_iter(v3, q0, operands=(m_chunks,))
        out[f"V3_scan_ch{CH}_topk_ms"] = round(1e3 * sec, 3)
        print(f"V3 ch={CH}", out[f"V3_scan_ch{CH}_topk_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
