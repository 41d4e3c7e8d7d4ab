"""Coarse-to-fine two-stage corpus retrieval for very large corpora.

Capability extension beyond the SURVEY.md §2 inventory (C14 corpus
retrieval / BASELINE.json:11 large-scale serving): the exact one-matmul
retriever (eval/corpus.py) streams the WHOLE ``[N, S*d]`` index from HBM
every query batch — at 100k videos (2.1M rows) that is ~1.07 GB/batch and
the score stage alone costs ~1.3 ms at the HBM roofline (docs/DESIGN.md
entry 12c).  Past that scale, bytes are the wall.

This module trades a small, MEASURED recall loss for an ~8x smaller
stream:

* **PASS 1b** (``build_coarse_index``): PCA-project the stream-concatenated
  rows ``m_tilde = concat_s(sqrt(w_s) m_s)`` (the space in which the fused
  distance IS the plain L2 distance) down to ``d_coarse`` dims, stored
  bf16.  The projection is computed from the index itself: a [D, D]
  second-moment matmul on device + a host ``eigh`` (D = S*d = 256 — tiny).
  No mean subtraction anywhere: distance differences cancel shifts, and
  the covariance is centered only for the eigenbasis estimate.
* **Stage 1** (coarse): ONE [Q, d_c] x [d_c, N] matmul over the projected
  rows — ~N*(2*d_c+4) bytes instead of ~N*(2*D+4) — then
  ``approx_max_k`` keeps ``num_candidates`` rows per query.
* **Stage 2** (rerank): gather the candidates' FULL rows ([Q, C, D] bf16)
  and score them exactly (same fused scores as the exact retriever), then
  exact top-k.  The final distances are exact fused distances; only
  membership of the candidate set is approximate, and stage-1 recall is
  what the probe/tests measure.

TPU-first design notes: both stages are streaming matmuls (MXU/HBM
friendly); the candidate gather is the only random access and its bytes
(Q*C*D*2) are sized to stay well under the full-index stream.  Static
shapes throughout (num_candidates is a compile-time constant).  This is
the classic IVF trade re-shaped for the TPU: clustering+gather of ragged
inverted lists would turn the hot loop into scattered HBM reads, while a
low-rank prefilter keeps it dense.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.eval.corpus import (
    MomentIndex,
    _JIT_CACHE,
    _embed_query_streams,
    _query_model_key,
)
from vfr_tpu.models.mcn import Model
from vfr_tpu.ops.topk import top_k_select
from vfr_tpu.parallel.sharding import query_sq_const

_INVALID = 1e29   # rows with msq above this are padding — never retrievable


@dataclass
class CoarseIndex:
    proj: jnp.ndarray      # [D, d_c] f32 PCA basis (D = S*d)
    m_low: jnp.ndarray     # [N, d_c] projected rows (bf16 by default)
    msq_low: jnp.ndarray   # [N] f32 |m_low|^2, +1e30 on invalid rows
    # stage-2 operands: the UNWEIGHTED stream-concat rows + fused norms
    # (identical scoring math to the exact retriever's one-matmul layout)
    m_cat: jnp.ndarray     # [N, D] storage dtype
    msq_fused: jnp.ndarray  # [N] f32

    @property
    def d_coarse(self) -> int:
        return int(self.proj.shape[1])

    @property
    def num_rows(self) -> int:
        return int(self.m_low.shape[0])


def _tilde_rows(index: MomentIndex) -> jnp.ndarray:
    """[N, D] = concat_s(sqrt(w_s) m_s): fused sqeuclidean == plain L2."""
    w = np.sqrt(np.asarray(index.weights, np.float64)).astype(np.float32)
    S = index.m.shape[0]
    return jnp.concatenate(
        [index.m[s].astype(jnp.float32) * w[s] for s in range(S)], axis=-1
    )


def build_coarse_index(
    index: MomentIndex,
    d_coarse: int = 32,
    store_dtype=jnp.bfloat16,
    chunk: int = 262_144,
) -> CoarseIndex:
    """PCA prefilter over the fused-distance space (device matmuls + one
    host eigh of a [D, D] matrix).  Must run while ``index.m`` is still
    populated (serve paths drop the per-stream rows after building their
    retriever operands)."""
    if index.m is None:
        raise ValueError("index.m was dropped; build_coarse_index needs the "
                         "per-stream rows (build the coarse index first)")
    from vfr_tpu.parallel.sharding import fuse_index_cat

    N = index.num_rows
    D = int(index.m.shape[0] * index.m.shape[2])
    d_c = min(d_coarse, D)
    valid_np = np.asarray(index.m_sq[0]) < _INVALID               # [N]

    mt = _tilde_rows(index)                                       # [N, D] f32

    # centered covariance in chunks (second moment minus mean outer):
    # invalid rows are zeroed out of both sums so padding cannot skew the
    # basis.  All reductions on device; only [D, D] + [D] come to host.
    @jax.jit
    def _moments(rows, valid):
        r = rows * valid[:, None]
        return r.T @ r, jnp.sum(r, axis=0)

    cov = np.zeros((D, D), np.float64)
    mean = np.zeros((D,), np.float64)
    n_valid = float(valid_np.sum())
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        g, m1 = _moments(mt[s:e], jnp.asarray(valid_np[s:e], jnp.float32))
        cov += np.asarray(g, np.float64)
        mean += np.asarray(m1, np.float64)
    mean /= max(n_valid, 1.0)
    cov = cov / max(n_valid, 1.0) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)                            # ascending
    proj = jnp.asarray(evecs[:, ::-1][:, :d_c].copy(), jnp.float32)

    # project + quantize-before-norm (same invariant as build_moment_index's
    # finalize: |m_low|^2 must match the STORED rows exactly, or the -2qm
    # term and the norm disagree at bf16 scale)
    @jax.jit
    def _project(rows, valid):
        low = (rows @ proj).astype(store_dtype).astype(jnp.float32)
        sq = jnp.sum(low * low, axis=-1)
        sq = jnp.where(valid, sq, 1e30)
        return low.astype(store_dtype), sq

    lows, sqs = [], []
    for s in range(0, N, chunk):
        e = min(s + chunk, N)
        lo, sq = _project(mt[s:e], jnp.asarray(valid_np[s:e]))
        lows.append(lo)
        sqs.append(sq)

    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    return CoarseIndex(
        proj=proj,
        m_low=jnp.concatenate(lows, axis=0),
        msq_low=jnp.concatenate(sqs, axis=0),
        m_cat=jax.device_put(m_cat),
        msq_fused=jax.device_put(msq_fused),
    )


def save_coarse(coarse: CoarseIndex, path: str) -> str:
    """Persist the coarse operands (the full-row stage-2 operands are NOT
    duplicated here — reload them from the main index .npz)."""
    if not path.endswith(".npz"):
        path += ".npz"
    m_low = np.asarray(coarse.m_low)
    if coarse.m_low.dtype == jnp.bfloat16:
        m_store, m_dtype = np.asarray(coarse.m_low).view(np.uint16), "bfloat16"
    else:
        m_store, m_dtype = m_low.astype(np.float32), "float32"
    np.savez(path, proj=np.asarray(coarse.proj, np.float32),
             m_low=m_store, m_dtype=np.asarray(m_dtype),
             msq_low=np.asarray(coarse.msq_low, np.float32))
    return path


def load_coarse(path: str, index: MomentIndex) -> CoarseIndex:
    """Inverse of ``save_coarse``; stage-2 operands come from ``index``."""
    from vfr_tpu.parallel.sharding import fuse_index_cat

    with np.load(path) as z:
        m_dtype = str(z["m_dtype"])
        m_low = (jnp.asarray(z["m_low"].view(jnp.bfloat16))
                 if m_dtype == "bfloat16"
                 else jnp.asarray(z["m_low"], jnp.float32))
        proj = jnp.asarray(z["proj"], jnp.float32)
        msq_low = jnp.asarray(z["msq_low"], jnp.float32)
    if int(m_low.shape[0]) != index.num_rows:
        raise ValueError(
            f"coarse index has {int(m_low.shape[0])} rows but the moment "
            f"index has {index.num_rows}: built from a different corpus")
    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    return CoarseIndex(proj=proj, m_low=m_low, msq_low=msq_low,
                       m_cat=jax.device_put(m_cat),
                       msq_fused=jax.device_put(msq_fused))


def make_coarse_retriever(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
):
    """Jitted ``(params, tokens, lengths) -> (dists [Q, k], rows [Q, k])``
    — same contract as ``make_retriever``; distances are EXACT fused
    distances of the returned rows (stage 2 rescoring), only candidate-set
    membership is approximate.

    ``num_candidates``: stage-1 survivors per query.  Recall@k of the
    two-stage result vs the exact retriever rises with it; bytes gathered
    in stage 2 scale linearly with it.  Measured trade-offs live in
    docs/DESIGN.md (coarse entry) / artifacts.
    """
    C = int(min(num_candidates, coarse.num_rows))
    k = int(min(k, C))

    cache_key = ("coarse_retrieve", _query_model_key(model), k, C,
                 approx_recall, rnn_kernel, coarse.d_coarse,
                 tuple(np.asarray(model.cfg.stream_weights).tolist()))
    _retrieve = _JIT_CACHE.get(cache_key)
    if _retrieve is None:
        _retrieve = jax.jit(
            _coarse_fn(model, k, C, approx_recall, rnn_kernel))
        _JIT_CACHE[cache_key] = _retrieve

    def retrieve(params, tokens, lengths):
        return _retrieve(coarse.proj, coarse.m_low, coarse.msq_low,
                         coarse.m_cat, coarse.msq_fused,
                         params, tokens, lengths)

    return retrieve


def make_coarse_score_topk(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
):
    """Un-jitted per-batch body with operands bound (the coarse twin of
    ``make_score_topk``): ``(params, tokens, lengths) -> (dists, rows)``.
    Exposed so probes/bench can time exactly this program in the
    elision-proof in-program loop."""
    C = int(min(num_candidates, coarse.num_rows))
    fn = _coarse_fn(model, int(min(k, C)), C, approx_recall, rnn_kernel)

    def score_topk(params, tokens, lengths):
        return fn(coarse.proj, coarse.m_low, coarse.msq_low,
                  coarse.m_cat, coarse.msq_fused, params, tokens, lengths)

    return score_topk


def make_coarse_stream_retriever(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
):
    """Throughput serving through the two-stage retriever: MANY query
    batches per dispatch via ``lax.scan`` (the coarse twin of
    ``make_stream_retriever`` — same ~8 ms/dispatch amortization
    rationale, DESIGN 12b).  ``(params, tokens [M, Q, T], lengths
    [M, Q]) -> (dists [M, Q, k], rows [M, Q, k])``."""
    C = int(min(num_candidates, coarse.num_rows))
    fn = _coarse_fn(model, int(min(k, C)), C, approx_recall, rnn_kernel)

    cache_key = ("coarse_stream", _query_model_key(model), k, C,
                 approx_recall, rnn_kernel, coarse.d_coarse,
                 tuple(np.asarray(model.cfg.stream_weights).tolist()))
    _retrieve = _JIT_CACHE.get(cache_key)
    if _retrieve is None:

        @jax.jit
        def _retrieve(proj, m_low, msq_low, m_cat, msq_fused,
                      params, tokens, lengths):
            def body(carry, batch):
                toks, lens = batch
                return carry, fn(proj, m_low, msq_low, m_cat, msq_fused,
                                 params, toks, lens)

            _, (dists, rows) = jax.lax.scan(body, 0, (tokens, lengths))
            return dists, rows

        _JIT_CACHE[cache_key] = _retrieve

    def retrieve_stream(params, tokens, lengths):
        return _retrieve(coarse.proj, coarse.m_low, coarse.msq_low,
                         coarse.m_cat, coarse.msq_fused,
                         params, tokens, lengths)

    return retrieve_stream


def pad_coarse_rows(coarse: CoarseIndex, multiple: int) -> CoarseIndex:
    """Pad every row-indexed operand to a multiple (for even ICI sharding);
    pad rows get msq = +big on BOTH stages so they can never be selected."""
    N = coarse.num_rows
    rem = (-N) % multiple
    if rem == 0:
        return coarse
    big = jnp.full((rem,), 1e30, jnp.float32)
    return CoarseIndex(
        proj=coarse.proj,
        m_low=jnp.concatenate(
            [coarse.m_low,
             jnp.zeros((rem, coarse.m_low.shape[1]), coarse.m_low.dtype)]),
        msq_low=jnp.concatenate([coarse.msq_low, big]),
        m_cat=jnp.concatenate(
            [coarse.m_cat,
             jnp.zeros((rem, coarse.m_cat.shape[1]), coarse.m_cat.dtype)]),
        msq_fused=jnp.concatenate([coarse.msq_fused, big]),
    )


def make_sharded_coarse_retriever(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    mesh: jax.sharding.Mesh,
    num_candidates: int = 2048,
    axis: str = "corpus",
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
):
    """Two-stage retrieval with ALL row-indexed operands sharded over the
    corpus ICI axis.  Each device runs stage 1 over its local rows, keeps
    ``num_candidates // ndev`` local survivors, rescores them exactly from
    its LOCAL full rows (the candidate gather never crosses ICI), and
    contributes its local top-k; the merged global top-k rides the
    interconnect as O(ndev * k) candidates — the same communication
    envelope as ``sharded_corpus_topk_cat``.

    Per-shard stage-1 quotas partition the candidate budget by shard
    rather than globally (a forced spread); recall vs the single-device
    retriever at equal total C is equal or better on every measured
    configuration, and the C_loc = n_loc limit is EXACT (property test)."""
    ndev = mesh.shape[axis]
    coarse = pad_coarse_rows(coarse, ndev)
    N = coarse.num_rows
    n_loc = N // ndev
    C_loc = int(min(max(1, num_candidates // ndev), n_loc))
    k_loc = int(min(k, C_loc))
    w = np.asarray(model.cfg.stream_weights, np.float32)
    sqrt_w = np.sqrt(w.astype(np.float64)).astype(np.float32)
    w_jnp = jnp.asarray(w)
    P_ = jax.sharding.PartitionSpec

    sh_rows = jax.sharding.NamedSharding(mesh, P_(axis, None))
    sh_vec = jax.sharding.NamedSharding(mesh, P_(axis))
    m_low = jax.device_put(coarse.m_low, sh_rows)
    msq_low = jax.device_put(coarse.msq_low, sh_vec)
    m_cat = jax.device_put(coarse.m_cat, sh_rows)
    msq_fused = jax.device_put(coarse.msq_fused, sh_vec)
    proj = jax.device_put(coarse.proj)

    def body(qs, proj, m_low_loc, msq_low_loc, mcat_loc, msqf_loc):
        S = qs.shape[0]
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)
        q_low = (q_t @ proj).astype(m_low_loc.dtype)
        s_low = jnp.dot(2.0 * q_low, m_low_loc.T,
                        preferred_element_type=jnp.float32) \
            - msq_low_loc[None, :]
        _, cand = top_k_select(s_low, C_loc, "approx", approx_recall)
        mc = jnp.take(mcat_loc, cand, axis=0)             # local gather
        msq_c = jnp.take(msqf_loc, cand, axis=0)
        qc = jnp.concatenate(
            [2.0 * w_jnp[s] * qs[s] for s in range(S)], axis=-1)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.float32),
                            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, k_loc)
        shard = jax.lax.axis_index(axis)
        rows = jnp.take_along_axis(cand, pos, axis=1) + shard * n_loc
        all_vals = jax.lax.all_gather(vals, axis)         # [ndev, Q, k_loc]
        all_rows = jax.lax.all_gather(rows, axis)
        Q = vals.shape[0]
        cv = jnp.moveaxis(all_vals, 0, 1).reshape(Q, ndev * k_loc)
        cr = jnp.moveaxis(all_rows, 0, 1).reshape(Q, ndev * k_loc)
        best, bpos = jax.lax.top_k(cv, min(k, ndev * k_loc))
        brows = jnp.take_along_axis(cr, bpos, axis=1)
        dists = query_sq_const(qs, w_jnp)[:, None] - best
        return dists, brows

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_(axis, None), P_(axis), P_(axis, None),
                  P_(axis)),
        out_specs=(P_(), P_()),
        # post-all_gather merge is replicated; the static check can't see
        # it (same rationale as sharded_corpus_topk_cat)
        check_vma=False,
    )

    @jax.jit
    def _retrieve(proj, m_low, msq_low, m_cat, msq_fused,
                  params, tokens, lengths):
        qs = _embed_query_streams(params, model, tokens, lengths, rnn_kernel)
        return sharded(qs, proj, m_low, msq_low, m_cat, msq_fused)

    def retrieve(params, tokens, lengths):
        return _retrieve(proj, m_low, msq_low, m_cat, msq_fused,
                         params, tokens, lengths)

    return retrieve


def _coarse_fn(model: Model, k: int, C: int, approx_recall: float,
               rnn_kernel: Optional[str]):
    """The two-stage retrieval math with every index operand an explicit
    argument (jit-argument convention, DESIGN 12c — captured index
    constants ship with the executable)."""
    # sqrt-weight fold for stage 1 (m_tilde space); stage 2 uses the
    # standard one-matmul scaled-query layout
    w = np.asarray(model.cfg.stream_weights, np.float32)
    sqrt_w = np.sqrt(w.astype(np.float64)).astype(np.float32)
    w_jnp = jnp.asarray(w)

    def fn(proj, m_low, msq_low, m_cat, msq_fused, params, tokens, lengths):
        qs = _embed_query_streams(params, model, tokens, lengths,
                                  rnn_kernel)                     # [S, Q, d]
        S = qs.shape[0]
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)       # [Q, D]
        # stage 1: low-rank scores, one [Q, d_c] x [d_c, N] matmul
        q_low = (q_t @ proj).astype(m_low.dtype)
        s_low = jnp.dot(2.0 * q_low, m_low.T,
                        preferred_element_type=jnp.float32) \
            - msq_low[None, :]                                    # [Q, N]
        _, cand = top_k_select(s_low, C, "approx", approx_recall)
        # stage 2: gather full rows, exact fused rescoring
        mc = jnp.take(m_cat, cand, axis=0)                        # [Q, C, D]
        msq_c = jnp.take(msq_fused, cand, axis=0)                 # [Q, C]
        qc = jnp.concatenate(
            [2.0 * w_jnp[s] * qs[s] for s in range(S)], axis=-1)
        s_full = jnp.einsum(
            "qd,qcd->qc", qc.astype(jnp.float32),
            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, k)
        rows = jnp.take_along_axis(cand, pos, axis=1)
        dists = query_sq_const(qs, w_jnp)[:, None] - vals
        return dists, rows

    return fn
