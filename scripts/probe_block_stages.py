#!/usr/bin/env python
"""Probe: where the composed block pipeline loses its parts' speed.

probe_block_gather.py measured the PIECES fast (stage1+blockmax 0.48 ms,
block gather 0.82 ms for 134 MB) but the COMPOSITION at 7.8-13 ms.  Time
growing prefixes of the same body to find the break."""

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

Q, D, K, B, d_c = 128, 256, 100, 128, 32


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_097_152 if on_tpu else 65_536
    G = N // B
    g_sel = 16
    rng = np.random.default_rng(0)

    blocks = [jnp.asarray(rng.standard_normal((min(500_000, N - s), D))
                          .astype(np.float32), jnp.bfloat16)
              for s in range(0, N, 500_000)]
    m_blk = jnp.concatenate(blocks, axis=0).reshape(G, B * D)
    del blocks
    m_low = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    msq = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    msq_blk = msq.reshape(G, B)
    q0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    qc = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    def s1(i, q_low, m_low):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        s = jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                    preferred_element_type=jnp.float32)
        return jnp.max(s.reshape(Q, G, B), axis=-1)            # [Q, G]

    out = {"N": N, "g": g_sel}

    def p1(i, q_low, m_low):
        return s1(i, q_low, m_low)

    sec = device_seconds_per_iter(p1, q0, operands=(m_low,))
    out["1_s1_blockmax_ms"] = round(1e3 * sec, 3)
    print(1, out["1_s1_blockmax_ms"], flush=True)

    def p2(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        v, blk = jax.lax.top_k(sb, g_sel)
        return v

    sec = device_seconds_per_iter(p2, q0, operands=(m_low,))
    out["2_plus_exact_topg_ms"] = round(1e3 * sec, 3)
    print(2, out["2_plus_exact_topg_ms"], flush=True)

    def p2a(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        v, blk = jax.lax.approx_max_k(sb, g_sel, recall_target=0.95)
        return v

    sec = device_seconds_per_iter(p2a, q0, operands=(m_low,))
    out["2a_plus_approx_topg_ms"] = round(1e3 * sec, 3)
    print("2a", out["2a_plus_approx_topg_ms"], flush=True)

    def p3(i, q_low, m_low, m_blk):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)                      # [Q,g,B*D]
        return jnp.sum(mb.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(p3, q0, operands=(m_low, m_blk))
    out["3_plus_block_gather_ms"] = round(1e3 * sec, 3)
    print(3, out["3_plus_block_gather_ms"], flush=True)

    def p4(i, q_low, m_low, m_blk, qc):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g_sel * B, D)
        s_full = jnp.einsum("qd,qcd->qc", qc, mc.astype(jnp.float32))
        return jnp.max(s_full, axis=1)

    sec = device_seconds_per_iter(p4, q0, operands=(m_low, m_blk, qc))
    out["4_plus_rerank_ms"] = round(1e3 * sec, 3)
    print(4, out["4_plus_rerank_ms"], flush=True)

    def p4b(i, q_low, m_low, m_blk, qc):
        # rerank in bf16 on the MXU instead of f32 VPU
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g_sel * B, D)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.bfloat16), mc,
                            preferred_element_type=jnp.float32)
        return jnp.max(s_full, axis=1)

    sec = device_seconds_per_iter(p4b, q0, operands=(m_low, m_blk, qc))
    out["4b_rerank_bf16_ms"] = round(1e3 * sec, 3)
    print("4b", out["4b_rerank_bf16_ms"], flush=True)

    def p5(i, q_low, m_low, m_blk, msq_blk, qc):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g_sel * B, D)
        msq_c = jnp.take(msq_blk, blk, axis=0).reshape(Q, g_sel * B)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.bfloat16), mc,
                            preferred_element_type=jnp.float32) - msq_c
        vals, pos = jax.lax.top_k(s_full, K)
        return vals

    sec = device_seconds_per_iter(p5, q0,
                                  operands=(m_low, m_blk, msq_blk, qc))
    out["5_full_ms"] = round(1e3 * sec, 3)
    print(5, out["5_full_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
