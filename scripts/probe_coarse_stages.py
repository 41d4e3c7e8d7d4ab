#!/usr/bin/env python
"""Probe: which stage of the two-stage retriever is pathological at 2.1M
rows (the first speed measurement came out 4.5-25x SLOWER than full scan).

Times, in the elision-proof harness, with all operands as jit args:
  1. stage-1 matmul alone              [Q, d_c] x [d_c, N]
  2. + approx_max_k top-C              (PartialReduce cost grows with k?)
  3. + row gather                      (jnp.take of C full rows per query)
  4. + exact rescore + final top-k     (the full body)
Variants: gather with SORTED candidate indices; exact hierarchical top-C.
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

Q, d_c, D, K = 128, 64, 256, 100


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_100_000 if on_tpu else 50_000
    C = 1024
    rng = np.random.default_rng(0)

    m_low = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    msq_low = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    blocks = [jnp.asarray(rng.standard_normal((min(500_000, N - s), D))
                          .astype(np.float32), jnp.bfloat16)
              for s in range(0, N, 500_000)]
    m_cat = jnp.concatenate(blocks, axis=0)
    del blocks
    msq_fused = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    q_low0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    qc = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))

    def scores(i, q_low, m_low, msq_low):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        return jnp.dot(2.0 * q.astype(m_low.dtype), m_low.T,
                       preferred_element_type=jnp.float32) - msq_low[None, :]

    out = {"N": N, "C": C}

    sec = device_seconds_per_iter(scores, q_low0, operands=(m_low, msq_low))
    out["1_stage1_matmul_ms"] = round(1e3 * sec, 3)
    print("stage1", out["1_stage1_matmul_ms"], flush=True)

    def s1_topc(i, q_low, m_low, msq_low):
        s = scores(i, q_low, m_low, msq_low)
        v, idx = jax.lax.approx_max_k(s, C, recall_target=0.95)
        return v

    sec = device_seconds_per_iter(s1_topc, q_low0, operands=(m_low, msq_low))
    out["2_plus_approx_topC_ms"] = round(1e3 * sec, 3)
    print("plus approx topC", out["2_plus_approx_topC_ms"], flush=True)

    def s1_topc_gather(i, q_low, m_low, msq_low, m_cat):
        s = scores(i, q_low, m_low, msq_low)
        _, cand = jax.lax.approx_max_k(s, C, recall_target=0.95)
        mc = jnp.take(m_cat, cand, axis=0)
        return jnp.sum(mc.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(s1_topc_gather, q_low0,
                                  operands=(m_low, msq_low, m_cat))
    out["3_plus_gather_ms"] = round(1e3 * sec, 3)
    print("plus gather", out["3_plus_gather_ms"], flush=True)

    def s1_topc_gather_sorted(i, q_low, m_low, msq_low, m_cat):
        s = scores(i, q_low, m_low, msq_low)
        _, cand = jax.lax.approx_max_k(s, C, recall_target=0.95)
        cand = jnp.sort(cand, axis=1)     # coalesce the HBM access pattern
        mc = jnp.take(m_cat, cand, axis=0)
        return jnp.sum(mc.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(s1_topc_gather_sorted, q_low0,
                                  operands=(m_low, msq_low, m_cat))
    out["3b_gather_sorted_ms"] = round(1e3 * sec, 3)
    print("gather sorted", out["3b_gather_sorted_ms"], flush=True)

    def full(i, q_low, m_low, msq_low, m_cat, msq_fused, qc):
        s = scores(i, q_low, m_low, msq_low)
        _, cand = jax.lax.approx_max_k(s, C, recall_target=0.95)
        mc = jnp.take(m_cat, cand, axis=0)
        msq_c = jnp.take(msq_fused, cand, axis=0)
        s_full = jnp.einsum("qd,qcd->qc", qc,
                            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, K)
        return vals

    sec = device_seconds_per_iter(
        full, q_low0, operands=(m_low, msq_low, m_cat, msq_fused, qc))
    out["4_full_body_ms"] = round(1e3 * sec, 3)
    print("full", out["4_full_body_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
