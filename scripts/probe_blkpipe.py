#!/usr/bin/env python
"""Probe: growing-prefix decomposition of the PALLAS-stage-1 block
pipeline at 2.1M rows (the composed corpus path measured 3.7 ms at
C=1024 where the pieces predicted ~1.2)."""

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

from vfr_tpu.ops.pallas.coarse_kernel import coarse_blockmax
from vfr_tpu.utils.timing import device_seconds_per_iter

Q, D, K, B, d_c = 128, 256, 100, 128, 32


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_097_152 if on_tpu else 65_536
    G = N // B
    g_sel = 8                       # = C 1024 rows
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

    out = {"N": N, "g": g_sel}

    def s1(i, q_low, m_low):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        return coarse_blockmax(q, m_low, msq, block_rows=B, block_n=8192)

    def p1(i, q_low, m_low):
        return s1(i, q_low, m_low)

    sec = device_seconds_per_iter(p1, q0, operands=(m_low,))
    out["1_pallas_blockmax_ms"] = round(1e3 * sec, 3)
    print(1, out["1_pallas_blockmax_ms"], flush=True)

    def p2(i, q_low, m_low):
        sb = s1(i, q_low, m_low)
        v, blk = jax.lax.top_k(sb, g_sel)
        return v

    sec = device_seconds_per_iter(p2, q0, operands=(m_low,))
    out["2_plus_topg_ms"] = round(1e3 * sec, 3)
    print(2, out["2_plus_topg_ms"], flush=True)

    def p3(i, q_low, m_low, m_blk):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        return jnp.sum(mb.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(p3, q0, operands=(m_low, m_blk))
    out["3_plus_block_gather_ms"] = round(1e3 * sec, 3)
    print(3, out["3_plus_block_gather_ms"], flush=True)

    # 4a: rerank via f32-cast einsum (what _coarse_fn does today)
    def p4a(i, q_low, m_low, m_blk, qc):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g_sel * B, D)
        msq_c = jnp.take(msq_blk, blk, axis=0).reshape(Q, g_sel * B)
        s_full = jnp.einsum("qd,qcd->qc", qc,
                            mc.astype(jnp.float32)) - msq_c
        v, pos = jax.lax.top_k(s_full, K)
        return v

    sec = device_seconds_per_iter(p4a, q0, operands=(m_low, m_blk, qc))
    out["4a_full_f32_rerank_ms"] = round(1e3 * sec, 3)
    print("4a", out["4a_full_f32_rerank_ms"], flush=True)

    # 4b: rerank in bf16 on the MXU (no f32 copy of the gathered rows)
    def p4b(i, q_low, m_low, m_blk, qc):
        sb = s1(i, q_low, m_low)
        _, blk = jax.lax.top_k(sb, g_sel)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g_sel * B, D)
        msq_c = jnp.take(msq_blk, blk, axis=0).reshape(Q, g_sel * B)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.bfloat16), mc,
                            preferred_element_type=jnp.float32) - msq_c
        v, pos = jax.lax.top_k(s_full, K)
        return v

    sec = device_seconds_per_iter(p4b, q0, operands=(m_low, m_blk, qc))
    out["4b_full_bf16_rerank_ms"] = round(1e3 * sec, 3)
    print("4b", out["4b_full_bf16_rerank_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
