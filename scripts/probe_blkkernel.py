#!/usr/bin/env python
"""Probe: stage-1 blockmax Pallas kernel variants at 2.1M rows.

The committed kernel ([bn, bq] scores, sublane-axis max, bn=8192)
measures 1.155 ms — 116 GB/s, ~7x off the m_low stream roofline.
Variants:

  K0  committed kernel (baseline)
  K1  committed kernel, bn = 16384 / 4096 (step-overhead scaling)
  K2  transposed: scores [bq, bn], blockmax over LANE groups of B,
      output lands [Q, G] directly (no final transpose)
  K3  K2 + dimension_semantics=("parallel", "arbitrary")
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vfr_tpu.ops.pallas.coarse_kernel import coarse_blockmax
from vfr_tpu.utils.timing import device_seconds_per_iter

Q, B, d_c = 128, 128, 32


def _t_kernel(q_ref, m_ref, msq_ref, out_ref, *, block_rows, bn):
    # scores [bq, bn]: queries on sublanes, index rows on lanes
    s = jax.lax.dot_general(
        q_ref[:].astype(m_ref.dtype), m_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [bq, bn]
    s = 2.0 * s - msq_ref[:][None, :]
    bq = s.shape[0]
    blocks = bn // block_rows
    out_ref[:] = jnp.max(s.reshape(bq, blocks, block_rows), axis=2)


def t_blockmax(q_low, m_low, msq_low, bn, parallel):
    N = m_low.shape[0]
    G = N // B
    grid = (N // bn,)
    kw = {}
    if parallel:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    return pl.pallas_call(
        functools.partial(_t_kernel, block_rows=B, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, d_c), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d_c), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, bn // B), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, G), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        **kw,
    )(q_low, m_low, msq_low)


def _tb_kernel(q_ref, m_ref, msqh_ref, out_ref, *, block_rows, bn):
    # bf16 scores end-to-end: products are exact, the accumulate + max
    # run at 2x VPU element throughput; msq is pre-halved and pre-cast so
    # the kernel computes (q.m - msq/2) in bf16 and the caller doubles
    s = jax.lax.dot_general(
        q_ref[:].astype(m_ref.dtype), m_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [bq, bn] f32 acc
    s = (s - msqh_ref[:][None, :].astype(jnp.float32)).astype(jnp.bfloat16)
    bq = s.shape[0]
    blocks = bn // block_rows
    out_ref[:] = jnp.max(s.reshape(bq, blocks, block_rows), axis=2)


def t_blockmax_bf16(q_low, m_low, msq_low, bn, d=d_c):
    N = m_low.shape[0]
    G = N // B
    msq_h = (0.5 * msq_low).astype(jnp.bfloat16)
    grid = (N // bn,)
    return pl.pallas_call(
        functools.partial(_tb_kernel, block_rows=B, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Q, bn // B), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, G), jnp.bfloat16),
        interpret=jax.default_backend() != "tpu",
    )(q_low, m_low, msq_h)


def main():
    on_tpu = jax.default_backend() == "tpu"
    N = 2_097_152 if on_tpu else 65_536
    rng = np.random.default_rng(0)
    m_low = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    msq = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    q0 = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    sol_ms = 1e3 * N * d_c * 2 / 819e9

    out = {"N": N, "sol_ms": round(sol_ms, 3)}

    def run(tag, fn):
        def body(i, q_low, m_low):
            q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
            return fn(q, m_low)

        sec = device_seconds_per_iter(body, q0, operands=(m_low,))
        out[tag] = {"ms": round(1e3 * sec, 3),
                    "hbm_util_pct": round(100 * sol_ms / (1e3 * sec), 1)}
        print(tag, out[tag], flush=True)

    run("K0_committed_bn8192",
        lambda q, m: coarse_blockmax(q, m, msq, block_rows=B, block_n=8192))
    run("K1_committed_bn16384",
        lambda q, m: coarse_blockmax(q, m, msq, block_rows=B, block_n=16384))
    run("K1_committed_bn4096",
        lambda q, m: coarse_blockmax(q, m, msq, block_rows=B, block_n=4096))
    # output block (Q, bn/B): last dim must be a 128 multiple -> bn >= 16384
    run("K2_transposed_bn16384",
        lambda q, m: t_blockmax(q, m, msq, 16384, False))
    run("K3_transposed_parallel_bn16384",
        lambda q, m: t_blockmax(q, m, msq, 16384, True))
    run("K4_transposed_bf16_bn16384",
        lambda q, m: t_blockmax_bf16(q, m, msq, 16384))

    # d_c = 16: halves both the stream and the MXU passes' K
    m16 = jnp.asarray(
        rng.standard_normal((N, 16)).astype(np.float32), jnp.bfloat16)
    q16 = jnp.asarray(rng.standard_normal((Q, 16)).astype(np.float32))

    def body16(i, q_low, m16):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        return t_blockmax_bf16(q, m16, msq, 16384, d=16)

    sec = device_seconds_per_iter(body16, q16, operands=(m16,))
    out["K5_bf16_d16"] = {"ms": round(1e3 * sec, 3)}
    print("K5", out["K5_bf16_d16"], flush=True)

    # K6: matmul only (strided sample instead of reduction) — splits the
    # kernel time into MXU vs VPU-max shares
    def _k6(q_ref, m_ref, msq_ref, out_ref, *, bn):
        s = jax.lax.dot_general(
            q_ref[:].astype(m_ref.dtype), m_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[:] = s[:, : bn // B] - msq_ref[:][None, : bn // B]

    def k6(q_low, m_low):
        bn = 16384
        return pl.pallas_call(
            functools.partial(_k6, bn=bn),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((Q, d_c), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, d_c), lambda j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn,), lambda j: (j,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Q, bn // B), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, N // B), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(q_low, m_low, msq)

    # K6 (matmul-only, strided-sample output) abandoned: Mosaic rejects
    # the sampling slice ("Only 2D gather is supported")

    # K7: m stored TRANSPOSED [d_c, N] so the contraction is over rhs
    # SUBLANES (natural MXU layout, no per-tile VMEM transpose)
    def _k7(q_ref, mt_ref, msq_ref, out_ref, *, bn):
        s = jax.lax.dot_general(
            q_ref[:].astype(mt_ref.dtype), mt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [bq, bn]
        s = 2.0 * s - msq_ref[:][None, :]
        bq = s.shape[0]
        out_ref[:] = jnp.max(s.reshape(bq, bn // B, B), axis=2)

    m_lowT = jnp.asarray(np.asarray(m_low, np.float32).T, jnp.bfloat16)

    def k7(q_low, m_lowT, bn=16384):
        return pl.pallas_call(
            functools.partial(_k7, bn=bn),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((Q, d_c), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d_c, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn,), lambda j: (j,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Q, bn // B), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, N // B), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(q_low, m_lowT, msq)

    def body7(i, q_low, m_lowT):
        q = jnp.roll(q_low, i.astype(jnp.int32), axis=0)
        return k7(q, m_lowT)

    sec = device_seconds_per_iter(body7, q0, operands=(m_lowT,))
    out["K7_transposed_store"] = {
        "ms": round(1e3 * sec, 3),
        "hbm_util_pct": round(100 * sol_ms / (1e3 * sec), 1)}
    print("K7", out["K7_transposed_store"], flush=True)

    ref = coarse_blockmax_reference(q0, m_low, msq, block_rows=B)
    got = k7(q0, m_lowT)
    out["K7_parity_max_abs_err"] = float(jnp.max(jnp.abs(ref - got)))
    print("K7 parity", out["K7_parity_max_abs_err"], flush=True)

    # parity of the transposed variant
    from vfr_tpu.ops.pallas.coarse_kernel import coarse_blockmax_reference
    ref = coarse_blockmax_reference(q0, m_low[:65536], msq[:65536],
                                    block_rows=B)
    got = t_blockmax(q0, m_low[:65536], msq[:65536], 16384, False)
    err = float(jnp.max(jnp.abs(ref - got)))
    out["K2_parity_max_abs_err"] = err
    print("parity", err, flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
