"""Fused coarse-score + per-block max in ONE Pallas pass (stage 1 of the
coarse-to-fine retriever, eval/coarse.py).

Why this kernel exists — measured on the real chip at N = 2.1M rows,
Q = 128, d_c = 32 (scripts/probe_topg*.py, 2026-08-18):

* The obvious XLA formulation (``max(2 q @ m_low.T, per-block)``) runs at
  0.48 ms while its only consumer is a scalar reduction, but the moment
  the [Q, G] block maxima must actually EXIST (feeding ``top_k``), XLA
  materializes the [Q, N] f32 score tensor through HBM and the stage
  jumps to 6.4 ms — 13x.  An ``optimization_barrier`` does not help; a
  chunked ``lax.scan`` caps the damage at 0.8-0.9 ms (17% of the HBM
  roofline), leaving ~5x on the table.
* This kernel computes each [bn, bq] score tile in VMEM, subtracts the
  row norms, reduces every CONTIGUOUS block of ``block_rows`` index rows
  to its max, and writes only the [G, Q] maxima.  HBM traffic is one
  stream of ``m_low`` (+ the tiny outputs) — the stage runs at the
  coarse-stream roofline instead of the score-tensor roofline.

Blocks are CONTIGUOUS (block g = rows [g*B, (g+1)*B)) — the opposite
choice from select_kernel's strided bins — because stage 2 gathers the
surviving blocks' FULL rows, and contiguous 128-row blocks move at
~164 GB/s where scattered 512 B rows crawl at ~41 GB/s (probe_block_
gather.py A vs B).  Clustering of a video's 21 consecutive rows inside
one block is a feature here, not a risk: stage 2 rescores every row of
every surviving block exactly, so co-located true positives cost ONE
block of budget rather than k candidate slots.

jnp twin for parity tests: coarse_blockmax_reference below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, m_ref, msq_ref, out_ref, *, block_rows, bn):
    # scores transposed: index rows on sublanes, queries on lanes
    s = jax.lax.dot_general(
        m_ref[:], q_ref[:].astype(m_ref.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [bn, bq]
    s = 2.0 * s - msq_ref[:][:, None]
    blocks = bn // block_rows
    bq = s.shape[1]
    # contiguous blocks: rows [g*B, (g+1)*B) fold onto the SECOND axis
    out_ref[:] = jnp.max(s.reshape(blocks, block_rows, bq), axis=1)


def coarse_blockmax(
    q_low: jnp.ndarray,       # [Q, d_c] f32
    m_low: jnp.ndarray,       # [N, d_c] (bf16 storage typical)
    msq_low: jnp.ndarray,     # [N] f32 (+1e30 on invalid rows)
    block_rows: int = 128,
    block_q: int = 128,
    block_n: int = 8192,
    interpret: bool = None,
) -> jnp.ndarray:
    """Per-block maxima of the coarse scores ``2 q@m^T - |m|^2``.

    Returns ``sb [Q, G]`` with ``G = ceil(N / block_rows)`` and
    ``sb[q, g] = max_{r in block g} score(q, r)``; padded rows never win
    (their msq is padded to +1e30).  N is padded up to a block_n multiple
    internally; callers should size G from the UNPADDED N via
    ``ceil(N / block_rows)`` — trailing all-pad blocks are sliced off.
    """
    Q, d_c = q_low.shape
    N = m_low.shape[0]
    if interpret is None:
        # Mosaic compiles on TPU only; the CPU harness runs the interpreter
        interpret = jax.default_backend() != "tpu"
    assert block_n % block_rows == 0

    bq = min(block_q, _round_up(Q, 8))
    bn = block_n
    Qp, Np = _round_up(Q, bq), _round_up(N, bn)
    if Qp != Q:
        q_low = jnp.pad(q_low, ((0, Qp - Q), (0, 0)))
    if Np != N:
        m_low = jnp.pad(m_low, ((0, Np - N), (0, 0)))
        msq_low = jnp.pad(msq_low, ((0, Np - N)), constant_values=1e30)

    grid = (Np // bn, Qp // bq)
    out = pl.pallas_call(
        functools.partial(_kernel, block_rows=block_rows, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_c), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d_c), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda j, i: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn // block_rows, bq), lambda j, i: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (Np // block_rows, Qp), jnp.float32),
        interpret=interpret,
    )(q_low, m_low, msq_low)

    G = -(-N // block_rows)
    return out[:G, :Q].T                               # [Q, G]


def coarse_blockmax_reference(
    q_low: jnp.ndarray,
    m_low: jnp.ndarray,
    msq_low: jnp.ndarray,
    block_rows: int = 128,
) -> jnp.ndarray:
    """jnp twin of :func:`coarse_blockmax` (parity tests; also the
    documentation of its semantics)."""
    Q = q_low.shape[0]
    N = m_low.shape[0]
    G = -(-N // block_rows)
    s = 2.0 * jnp.dot(q_low.astype(m_low.dtype), m_low.T,
                      preferred_element_type=jnp.float32) \
        - msq_low[None, :]
    pad = G * block_rows - N
    if pad:
        s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    return jnp.max(s.reshape(Q, G, block_rows), axis=-1)
