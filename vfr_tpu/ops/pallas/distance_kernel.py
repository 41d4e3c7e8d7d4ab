"""Fused multi-stream distance kernel (BASELINE.json:5 serving hot path).

Computes ``D[q, n] = sum_s w_s * (|q_s|^2 + |m_s|^2 - 2 q_s . m_s)`` for all
streams in ONE pass: each (Q-tile, N-tile) grid step runs S MXU matmuls on
VMEM-resident blocks and accumulates the weighted sum in registers/VMEM —
the two-stream fusion, norm terms, and weighting never materialize per-stream
[Q, N] intermediates in HBM.  HBM traffic is exactly one read of q/m blocks
and one write of D.

Equivalent jnp twin: parallel.sharding.fused_corpus_distances (parity- and
property-tested; the kernel is used on the inference/serving path, the twin
under autodiff).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, m_ref, msq_ref, out_ref, *, weights, compute_dtype):
    S = q_ref.shape[0]
    acc = None
    for s in range(S):                       # S is 1-2: statically unrolled
        qs = q_ref[s]                        # [bq, d]
        ms = m_ref[s]                        # [bn, d]
        qm = jax.lax.dot_general(
            qs.astype(compute_dtype), ms.astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # [bq, bn]
        q_sq = jnp.sum(qs.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        term = q_sq + msq_ref[s][None, :] - 2.0 * qm
        acc = weights[s] * term if acc is None else acc + weights[s] * term
    out_ref[:] = acc


def pallas_fused_distances(
    q: jnp.ndarray,          # [S, Q, d]
    m: jnp.ndarray,          # [S, N, d]
    m_sq: jnp.ndarray,       # [S, N]
    weights: Sequence[float],
    block_q: int = 256,
    block_n: int = 1024,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused distances [Q, N]; pad rows (via m_sq=+big) rank last as usual."""
    S, Q, d = q.shape
    N = m.shape[1]
    weights = tuple(float(w) for w in weights)
    assert len(weights) == S

    bq = min(block_q, _round_up(Q, 8))
    bn = min(block_n, _round_up(N, 128))
    Qp, Np = _round_up(Q, bq), _round_up(N, bn)
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, Qp - Q), (0, 0)))
    if Np != N:
        m = jnp.pad(m, ((0, 0), (0, Np - N), (0, 0)))
        # padded index rows get huge norms so they never win a top-k
        m_sq = jnp.pad(m_sq, ((0, 0), (0, Np - N)), constant_values=1e30)

    grid = (Qp // bq, Np // bn)
    out = pl.pallas_call(
        functools.partial(_kernel, weights=weights, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, bq, d), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, bn, d), lambda i, j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Qp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * Qp * Np * d + 4 * S * Qp * Np,
            bytes_accessed=4 * S * (Qp * d + Np * d + Np) + 4 * Qp * Np,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, m, m_sq)
    return out[:Q, :N]
