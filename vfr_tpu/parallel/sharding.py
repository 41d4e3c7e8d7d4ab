"""ICI-sharded query x corpus scoring + distributed top-k (BASELINE.json:10).

The moment-embedding index rows are sharded over the mesh's "corpus" axis.
Inside ``shard_map`` each device computes its local [Q, N/dev] fused-distance
block as MXU matmuls, takes a LOCAL top-k, and the k candidates (not the full
distance matrix!) ride ICI via ``all_gather``; the final merge is a second
top-k over ndev*k candidates, replicated on every device.  This is the
hierarchical top-k SURVEY.md §5 prescribes as this workload's
sequence-parallel analogue — communication is O(ndev * Q * k), independent
of corpus size.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, axis: str = "corpus") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def fused_corpus_distances(
    q: jnp.ndarray,        # [S, Q, d]  per-stream query embeddings
    m: jnp.ndarray,        # [S, N, d]  per-stream index rows
    m_sq: jnp.ndarray,     # [S, N]     precomputed |m|^2 (inf for pad rows)
    weights: jnp.ndarray,  # [S]
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Fused squared-euclidean distance [Q, N] = sum_s w_s * ||q_s - m_s||^2.

    The [N, d] index rows stream from HBM at their STORAGE dtype — a bf16
    index (EvalConfig.index_dtype) halves the bytes of this bandwidth-bound
    stage.  Queries are cast to match and the MXU accumulates in f32
    (preferred_element_type), so only storage precision changes."""
    S = q.shape[0]
    in_dt = m.dtype if m.dtype == jnp.bfloat16 else compute_dtype
    D = None
    for s in range(S):  # S is 1 or 2 — static unrolled
        qm = jnp.dot(
            q[s].astype(in_dt),
            m[s].T if m.dtype == in_dt else m[s].T.astype(in_dt),
            preferred_element_type=jnp.float32,
        )
        q_sq = jnp.sum(q[s] * q[s], axis=-1)[:, None]
        d_s = q_sq + m_sq[s][None, :] - 2.0 * qm
        D = weights[s] * d_s if D is None else D + weights[s] * d_s
    return D


def _local_block_topk(q, m_loc, msq_loc, weights, k, compute_dtype, axis,
                      method="exact", recall=0.95):
    """shard_map body: local distances -> local top-k -> all-gather -> merge."""
    from vfr_tpu.ops.topk import top_k_select

    D_loc = fused_corpus_distances(q, m_loc, msq_loc, weights, compute_dtype)
    n_loc = D_loc.shape[1]
    k_loc = min(k, n_loc)          # a shard can hold fewer than k rows
    vals, idx = top_k_select(-D_loc, k_loc, method, recall)  # [Q, k_loc]
    shard = jax.lax.axis_index(axis)
    gidx = idx + shard * n_loc                            # global row ids
    # candidates ride ICI: [ndev, Q, k] each
    all_vals = jax.lax.all_gather(vals, axis)             # [ndev, Q, k_loc]
    all_idx = jax.lax.all_gather(gidx, axis)
    ndev = all_vals.shape[0]
    Q = vals.shape[0]
    cand_vals = jnp.moveaxis(all_vals, 0, 1).reshape(Q, ndev * k_loc)
    cand_idx = jnp.moveaxis(all_idx, 0, 1).reshape(Q, ndev * k_loc)
    k_out = min(k, ndev * k_loc)
    best_vals, pos = jax.lax.top_k(cand_vals, k_out)      # [Q, k_out]
    best_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    return -best_vals, best_idx                           # distances, row ids


def sharded_corpus_topk(
    mesh: Mesh,
    q: jnp.ndarray,        # [S, Q, d]
    m: jnp.ndarray,        # [S, N, d]   N divisible by mesh axis size (pad!)
    m_sq: jnp.ndarray,     # [S, N]
    weights: jnp.ndarray,  # [S]
    k: int,
    axis: str = "corpus",
    compute_dtype=jnp.float32,
    method: str = "exact",
    recall: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed top-k: returns (distances [Q, k], global row ids [Q, k]).

    Correctness at shard boundaries (ties, k spanning shards) is guaranteed
    because every device contributes its full local top-k before the merge;
    property-tested against single-device argsort in tests/test_corpus.py.
    """
    ndev = mesh.shape[axis]
    if m.shape[1] % ndev != 0:
        raise ValueError(
            f"index rows ({m.shape[1]}) must be padded to a multiple of the "
            f"corpus axis size ({ndev}); use pad_index()"
        )
    fn = jax.shard_map(
        partial(_local_block_topk, k=k, compute_dtype=compute_dtype, axis=axis,
                method=method, recall=recall),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis), P()),
        out_specs=(P(), P()),
        # After all_gather every device computes the identical merged top-k;
        # JAX's varying-mesh-axes inference can't see that, so the static
        # replication check is disabled (replication is property-tested in
        # tests/test_corpus.py against single-device argsort).
        check_vma=False,
    )
    return fn(q, m, m_sq, weights)


def pad_index(
    m: jnp.ndarray, m_sq: jnp.ndarray, multiple: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad index rows to a multiple; pad rows get |m|^2 = +big so their
    distance can never enter a top-k."""
    S, N, d = m.shape
    rem = (-N) % multiple
    if rem == 0:
        return m, m_sq
    m_pad = jnp.concatenate([m, jnp.zeros((S, rem, d), m.dtype)], axis=1)
    big = jnp.full((S, rem), 1e30, m_sq.dtype)
    msq_pad = jnp.concatenate([m_sq, big], axis=1)
    return m_pad, msq_pad
