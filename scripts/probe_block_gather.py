#!/usr/bin/env python
"""Probe: TPU gather granularity + fused block-max for the coarse path.

The row-gather variant of stage 2 measured ~20 GB/s (scripts/
probe_coarse_stages.py: +3.4 ms for 67 MB of 512-byte rows).  This probe
asks whether the block-structured redesign is viable:

  A. row gather        jnp.take of [Q*C] scattered 512 B rows (baseline)
  B. block gather      jnp.take of [Q*g] scattered 128-row blocks
                       (256 KB contiguous each; same total bytes)
  C. stage-1 + block-max  [Q,d_c]x[d_c,N] matmul -> max over B-row blocks
                       (does XLA fuse the reduce, or does [Q,N] hit HBM?)
  D. end-to-end block pipeline at g blocks/query
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

Q, D, K = 128, 256, 100
B = 128                  # rows per block


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_097_152 if on_tpu else 65_536     # multiple of B
    G = N // B
    rng = np.random.default_rng(0)

    blocks = [jnp.asarray(rng.standard_normal((min(500_000, N - s), D))
                          .astype(np.float32), jnp.bfloat16)
              for s in range(0, N, 500_000)]
    m_cat = jnp.concatenate(blocks, axis=0)            # [N, D]
    del blocks
    m_blk = m_cat.reshape(G, B * D)                    # same bytes, blocked

    out = {"N": N, "B": B, "G": G}

    # A. scattered row gather: Q*C rows of 512 B (C rows/query)
    C = 2048
    rows0 = jnp.asarray(rng.integers(0, N, size=(Q, C)), jnp.int32)

    def row_gather(i, rows, m_cat):
        r = (rows + i.astype(jnp.int32)) % N
        mc = jnp.take(m_cat, r, axis=0)                # [Q, C, D]
        return jnp.sum(mc.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(row_gather, rows0, operands=(m_cat,))
    bytes_g = Q * C * D * 2
    out["A_row_gather"] = {"ms": round(1e3 * sec, 3),
                           "gbps": round(bytes_g / sec / 1e9, 1)}
    print("A", out["A_row_gather"], flush=True)

    # B. block gather: same bytes as A at g = C/B blocks per query
    g = C // B
    blks0 = jnp.asarray(rng.integers(0, G, size=(Q, g)), jnp.int32)

    def blk_gather(i, blks, m_blk):
        b = (blks + i.astype(jnp.int32)) % G
        mb = jnp.take(m_blk, b, axis=0)                # [Q, g, B*D]
        return jnp.sum(mb.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(blk_gather, blks0, operands=(m_blk,))
    out["B_block_gather"] = {"ms": round(1e3 * sec, 3),
                             "gbps": round(bytes_g / sec / 1e9, 1)}
    print("B", out["B_block_gather"], flush=True)

    # C. stage-1 matmul + per-block max, d_c in {32, 64}
    for d_c in (32, 64):
        m_low = jnp.asarray(
            rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
        q0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))

        def s1_blockmax(i, q_low, m_low):
            q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
            s = jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                        preferred_element_type=jnp.float32)   # [Q, N]
            return jnp.max(s.reshape(Q, G, B), axis=-1)       # [Q, G]

        sec = device_seconds_per_iter(s1_blockmax, q0, operands=(m_low,))
        sol = N * (d_c * 2) / 819e9
        out[f"C_s1_blockmax_d{d_c}"] = {
            "ms": round(1e3 * sec, 3),
            "sol_ms": round(1e3 * sol, 3),
            "hbm_util_pct": round(100 * sol / sec, 1),
        }
        print(f"C d{d_c}", out[f"C_s1_blockmax_d{d_c}"], flush=True)

    # D. end-to-end block pipeline: d_c=32, g blocks/query
    d_c = 32
    m_low = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    msq = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    q0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    qc = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    for g_sel in (8, 16, 32):
        def full(i, q_low, m_low, m_blk, msq, qc):
            q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
            s = jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                        preferred_element_type=jnp.float32)
            sb = jnp.max(s.reshape(Q, G, B), axis=-1)          # [Q, G]
            _, blk = jax.lax.top_k(sb, g_sel)                  # [Q, g]
            mb = jnp.take(m_blk, blk, axis=0)                  # [Q,g,B*D]
            mc = mb.reshape(Q, g_sel * B, D)
            rowid = blk[:, :, None] * B + jnp.arange(B)[None, None, :]
            msq_c = jnp.take(msq, rowid.reshape(Q, -1), axis=0)
            s_full = jnp.einsum("qd,qcd->qc", qc,
                                mc.astype(jnp.float32)) - msq_c
            vals, pos = jax.lax.top_k(s_full, K)
            return vals

        sec = device_seconds_per_iter(
            full, q0, operands=(m_low, m_blk, msq, qc))
        out[f"D_full_g{g_sel}"] = {"ms": round(1e3 * sec, 3)}
        print(f"D g={g_sel}", out[f"D_full_g{g_sel}"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
