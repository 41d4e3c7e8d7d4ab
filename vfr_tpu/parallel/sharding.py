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


def fuse_index_cat(m: jnp.ndarray, m_sq: jnp.ndarray, weights: jnp.ndarray):
    """One-matmul score layout: ``(m_cat [N, S*d], msq_fused [N])``.

    The fused distance sum_s w_s ||q_s - m_s||^2 ranks identically to the
    NEGATED score  2 sum_s w_s q_s.m_s - sum_s w_s |m_s|^2  (the |q_s|^2
    term is query-constant), and the cross term collapses to ONE matmul
    over stream-concatenated rows: concat_s(2 w_s q_s) @ concat_s(m_s)^T.
    Measured on v5e at [2, 210k, 128] bf16 this removes the per-stream f32
    epilogue over [Q, N]: distance+topk 0.308 -> 0.256 ms with bit-identical
    top-k (docs/DESIGN.md entry 12)."""
    S = m.shape[0]
    m_cat = jnp.concatenate([m[s] for s in range(S)], axis=-1)   # [N, S*d]
    msq_fused = jnp.sum(weights[:, None] * m_sq, axis=0)          # [N]
    return m_cat, msq_fused


def query_cat_scaled(q: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """[S, Q, d] -> [Q, S*d]: concat_s(2 w_s q_s) for the one-matmul score."""
    S = q.shape[0]
    return jnp.concatenate([2.0 * weights[s] * q[s] for s in range(S)],
                           axis=-1)


def query_sq_const(q: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """[Q]: sum_s w_s |q_s|^2 — maps scores back to true fused distances
    (distance = q_sq_const - score, applied to the [Q, k] selection only)."""
    return jnp.sum(weights[:, None] * jnp.sum(q * q, axis=-1), axis=0)


def fused_corpus_scores(
    q: jnp.ndarray,          # [S, Q, d]
    m_cat: jnp.ndarray,      # [N, S*d]  (storage dtype streams from HBM)
    msq_fused: jnp.ndarray,  # [N]
    weights: jnp.ndarray,    # [S]
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Scores [Q, N] (HIGHER = closer): 2 sum_s w_s q_s.m_s - msq_fused."""
    in_dt = m_cat.dtype if m_cat.dtype == jnp.bfloat16 else compute_dtype
    qc = query_cat_scaled(q, weights).astype(in_dt)
    qm = jnp.dot(qc, m_cat.T if m_cat.dtype == in_dt
                 else m_cat.T.astype(in_dt),
                 preferred_element_type=jnp.float32)              # [Q, N]
    return qm - msq_fused[None, :]


def _local_block_topk(q, mcat_loc, msq_loc, weights, k, compute_dtype, axis,
                      method="exact", recall=0.95):
    """shard_map body: local scores -> local top-k -> all-gather -> merge."""
    from vfr_tpu.ops.topk import top_k_select

    S_loc = fused_corpus_scores(q, mcat_loc, msq_loc, weights, compute_dtype)
    n_loc = S_loc.shape[1]
    k_loc = min(k, n_loc)          # a shard can hold fewer than k rows
    vals, idx = top_k_select(S_loc, k_loc, method, recall)   # [Q, k_loc]
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
    # map scores back to true fused distances on the selection only
    dists = query_sq_const(q, weights)[:, None] - best_vals
    return dists, best_idx                                # distances, row ids


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
    m_cat, msq_fused = fuse_index_cat(m, m_sq, weights)
    return sharded_corpus_topk_cat(
        mesh, q, m_cat, msq_fused, weights, k, axis=axis,
        compute_dtype=compute_dtype, method=method, recall=recall,
    )


def sharded_corpus_topk_cat(
    mesh: Mesh,
    q: jnp.ndarray,           # [S, Q, d]
    m_cat: jnp.ndarray,       # [N, S*d]  one-matmul layout (fuse_index_cat)
    msq_fused: jnp.ndarray,   # [N]
    weights: jnp.ndarray,     # [S]
    k: int,
    axis: str = "corpus",
    compute_dtype=jnp.float32,
    method: str = "exact",
    recall: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed top-k over the precomputed one-matmul index layout.

    ``make_retriever`` builds (m_cat, msq_fused) ONCE and shards them at
    retriever construction, so the per-call program is just the local score
    matmul + hierarchical top-k (the concat never re-runs per query batch).
    """
    ndev = mesh.shape[axis]
    if m_cat.shape[0] % ndev != 0:
        raise ValueError(
            f"index rows ({m_cat.shape[0]}) must be padded to a multiple of "
            f"the corpus axis size ({ndev}); use pad_index()"
        )
    fn = jax.shard_map(
        partial(_local_block_topk, k=k, compute_dtype=compute_dtype, axis=axis,
                method=method, recall=recall),
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis), P()),
        out_specs=(P(), P()),
        # After all_gather every device computes the identical merged top-k;
        # JAX's varying-mesh-axes inference can't see that, so the static
        # replication check is disabled (replication is property-tested in
        # tests/test_corpus.py against single-device argsort).
        check_vma=False,
    )
    return fn(q, m_cat, msq_fused, weights)


def sharded_gt_ranks(
    mesh: Mesh,
    q: jnp.ndarray,        # [S, Q, d]
    m: jnp.ndarray,        # [S, N, d]  N divisible by the corpus axis size
    m_sq: jnp.ndarray,     # [S, N]
    weights: jnp.ndarray,  # [S]
    gt_rows: jnp.ndarray,  # [Q, A] int32 global row ids
    axis: str = "corpus",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Exact corpus ranks of ``gt_rows`` with the index sharded over ICI.

    rank = #{rows with smaller distance} + #{equal-distance rows with
    smaller row id} — the stable-argsort position, computed by counting
    (eval/corpus.make_gt_ranker's distributed twin; the didemo_official
    corpus protocol runs on this when a mesh is present).  Each shard
    counts its local [Q, N/dev] distance block; the GT row's distance is
    recovered from its owning shard by a psum of a masked pick (exact —
    one owner, zeros elsewhere), and the per-shard counts psum over ICI.
    Communication is O(Q * A) scalars, independent of corpus size.
    """
    N = m.shape[1]
    A = gt_rows.shape[1]

    def body(q, m_loc, msq_loc, w, gt):
        D = fused_corpus_distances(q, m_loc, msq_loc, w, compute_dtype)
        n_loc = D.shape[1]
        shard = jax.lax.axis_index(axis)
        row0 = shard * n_loc
        rows = row0 + jnp.arange(n_loc, dtype=jnp.int32)[None, :]  # [1, n_loc]
        out = []
        for a in range(A):                                # A static (<=4)
            g = jnp.clip(gt[:, a], 0, N - 1)
            owned = (g >= row0) & (g < row0 + n_loc)
            g_loc = jnp.clip(g - row0, 0, n_loc - 1)
            d_here = jnp.take_along_axis(D, g_loc[:, None], axis=1)[:, 0]
            d_g = jax.lax.psum(jnp.where(owned, d_here, 0.0), axis)   # [Q]
            less = jnp.sum((D < d_g[:, None]).astype(jnp.int32), axis=1)
            tie = jnp.sum(
                ((D == d_g[:, None]) & (rows < g[:, None])).astype(jnp.int32),
                axis=1,
            )
            out.append(jax.lax.psum(less + tie, axis))
        return jnp.stack(out, axis=1)                     # [Q, A]

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis), P(), P()),
        out_specs=P(),
        # psum outputs are replicated; see sharded_corpus_topk_cat
        check_vma=False,
    )
    return fn(q, m, m_sq, weights, gt_rows)


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
