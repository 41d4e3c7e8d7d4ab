"""Fused coarse-score + per-block max in ONE Pallas pass (stage 1 of the
coarse-to-fine retriever, eval/coarse.py).

Why this kernel exists — measured on the real chip at N = 2.1M rows,
Q = 128, d_c = 32 (scripts/probe_topg*.py / probe_blkkernel.py,
2026-08-18):

* The obvious XLA formulation (``max(2 q @ m_low.T, per-block)``) runs at
  0.48 ms while its only consumer is a scalar reduction, but the moment
  the [Q, G] block maxima must actually EXIST (feeding ``top_k``), XLA
  materializes the [Q, N] f32 score tensor through HBM and the stage
  jumps to 6.4 ms — 13x.  An ``optimization_barrier`` does not help; a
  chunked ``lax.scan`` caps the damage at 0.8-0.9 ms, and this kernel at
  0.77 ms (bn = 16384).
* Layout matters: scores with queries on SUBLANES and index rows on
  LANES ([bq, bn], blockmax = lane-group reduction, output lands [Q, G]
  directly) measure 0.77 ms; the transposed variant ([bn, bq],
  sublane-axis max + final transpose) measures 1.14 ms.
* The remaining floor is the [bq, bn] f32 score tile itself: Q x N x 4
  bytes of MXU-write + VPU-read VMEM traffic per batch, invariant to
  d_c (d16 == d32 == 0.77 ms), accumulate dtype, and storage transpose
  (probe K2-K7).  An exact per-block max cannot avoid touching every
  score once; the structural escape is the centroid stage-1
  (eval/coarse.py), which shrinks N to G.

Blocks are CONTIGUOUS (block g = rows [g*B, (g+1)*B)) — the opposite
choice from select_kernel's strided bins — because stage 2 gathers the
surviving blocks' FULL rows, and contiguous 128-row blocks move at
~164 GB/s where scattered 512 B rows crawl at ~41 GB/s (probe_block_
gather.py A vs B).  Clustering of a video's 21 consecutive rows inside
one block is a feature here, not a risk: stage 2 rescores every row of
every surviving block exactly, so co-located true positives cost ONE
block of budget rather than k candidate slots.

CALLER CONTRACT: pad ``m_low``/``msq_low`` to a ``block_n`` multiple at
BUILD time (msq = +1e30 on pads).  The kernel pads internally as a
fallback, but that ``jnp.pad`` copies the whole operand in HBM every
call — at 2.1M rows it cost 1.9 ms/batch before build-time alignment.

jnp twin for parity tests: coarse_blockmax_reference below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Default stage-1 tile: [bq=128, bn] f32 scores are the VMEM budget
# (16384 x 128 x 4 B = 8 MB of the 16 MB scoped limit); callers align
# their row padding to this so the fallback pad below never runs.
KERNEL_BLOCK_N = 16384


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, m_ref, msq_ref, out_ref, *, block_rows, bn):
    # scores [bq, bn]: queries on sublanes, index rows on lanes; the
    # per-block max is then a lane-group reduction and the output block
    # lands in the final [Q, G] orientation
    s = jax.lax.dot_general(
        q_ref[:].astype(m_ref.dtype), m_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [bq, bn]
    s = 2.0 * s - msq_ref[:][None, :]
    bq = s.shape[0]
    out_ref[:] = jnp.max(s.reshape(bq, bn // block_rows, block_rows),
                         axis=2)


def coarse_blockmax(
    q_low: jnp.ndarray,       # [Q, d_c] f32
    m_low: jnp.ndarray,       # [N, d_c] (bf16 storage typical)
    msq_low: jnp.ndarray,     # [N] f32 (+1e30 on invalid rows)
    block_rows: int = 128,
    block_q: int = 128,
    block_n: int = KERNEL_BLOCK_N,
    interpret: bool = None,
) -> jnp.ndarray:
    """Per-block maxima of the coarse scores ``2 q@m^T - |m|^2``.

    Returns ``sb [Q, G]`` with ``G = ceil(N / block_rows)`` and
    ``sb[q, g] = max_{r in block g} score(q, r)``; padded rows never win
    (their msq is padded to +1e30).  N is padded up to a block_n multiple
    internally IF the caller did not already align it (see the module
    docstring: align at build time, the fallback pad copies the operand).
    """
    Q, d_c = q_low.shape
    N = m_low.shape[0]
    if interpret is None:
        # Mosaic compiles on TPU only; the CPU harness runs the interpreter
        interpret = jax.default_backend() != "tpu"
    assert block_n % block_rows == 0

    bq = min(block_q, _round_up(Q, 8))
    bn = min(block_n, _round_up(N, block_rows))
    Qp, Np = _round_up(Q, bq), _round_up(N, bn)
    if Qp != Q:
        q_low = jnp.pad(q_low, ((0, Qp - Q), (0, 0)))
    if Np != N:
        m_low = jnp.pad(m_low, ((0, Np - N), (0, 0)))
        msq_low = jnp.pad(msq_low, ((0, Np - N)), constant_values=1e30)

    # Mosaic constraint (compiled mode only): the output block's last dim
    # (bn // block_rows) must be a 128-multiple or the whole G axis
    Gp = Np // block_rows
    assert interpret or bn // block_rows >= 128 or bn == Np, (
        f"block_n={bn} yields out-block width {bn // block_rows} < 128; "
        f"raise block_n or pad N (N={N})")

    grid = (Qp // bq, Np // bn)
    out = pl.pallas_call(
        functools.partial(_kernel, block_rows=block_rows, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bq, d_c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d_c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, bn // block_rows), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, Gp), jnp.float32),
        interpret=interpret,
    )(q_low, m_low, msq_low)

    G = -(-N // block_rows)
    return out[:Q, :G]                                 # [Q, G]


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
