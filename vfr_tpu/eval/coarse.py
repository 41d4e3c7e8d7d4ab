"""Coarse-to-fine two-stage corpus retrieval for very large corpora.

Capability extension beyond the SURVEY.md §2 inventory (C14 corpus
retrieval / BASELINE.json:11 large-scale serving): the exact one-matmul
retriever (eval/corpus.py) streams the WHOLE ``[N, S*d]`` index from HBM
every query batch — at 100k videos (2.1M rows) that is ~1.07 GB/batch and
the score stage alone costs ~1.7 ms at the HBM roofline (docs/DESIGN.md
entry 12c).  Past that scale, bytes are the wall.

This module trades a small, MEASURED recall loss for an ~8x smaller
stream.  The design is BLOCK-structured end to end — the first (row-
level) cut of this module lost 4.5-25x to the full scan at 2.1M rows
because every non-dense piece was pathological on this hardware
(scripts/probe_coarse_stages.py / probe_topg*.py, all numbers 2.1M rows,
Q = 128): scattered 512 B row gathers ran at 41 GB/s vs 164 GB/s for
contiguous 128-row blocks; ``approx_max_k`` over [Q, N] cost +1.4 ms; and
any consumer that forced the [Q, G] block maxima to materialize made XLA
spill the [Q, N] f32 scores through HBM (+6 ms).  Hence:

* **PASS 1b** (``build_coarse_index``): PCA-project the stream-concatenated
  rows ``m_tilde = concat_s(sqrt(w_s) m_s)`` (the space in which the fused
  distance IS the plain L2 distance) down to ``d_coarse`` dims, stored
  bf16.  The projection is computed from the index itself: a [D, D]
  second-moment matmul on device + a host ``eigh`` (D = S*d = 256 — tiny).
  No mean subtraction anywhere: distance differences cancel shifts, and
  the covariance is centered only for the eigenbasis estimate.  Stage-2
  operands are stored pre-blocked: ``m_blk [G, B*D]`` — the full rows
  re-laid-out as G contiguous blocks of B = 128 rows.
* **Stage 1** (coarse): stream the ``[N, d_c]`` projected rows ONCE and
  reduce each contiguous B-row block to its best coarse score — a fused
  Pallas kernel on TPU (ops/pallas/coarse_kernel.py; the XLA formulation
  materializes [Q, N] and costs 6.4 ms vs ~0.2), the jnp twin elsewhere.
  Then EXACT ``top_k`` picks ``g = ceil(num_candidates / B)`` blocks per
  query from the tiny [Q, G] maxima (0.22 ms at G = 16k).
* **Stage 2** (rerank): gather the g surviving blocks' FULL rows
  ([Q, g, B*D] bf16, contiguous 256 KB DMAs) and score every row of every
  surviving block exactly (same fused scores as the exact retriever),
  then exact top-k.  The final distances are exact fused distances; only
  membership of the candidate set is approximate, and stage-1 recall is
  what the probe/tests measure.

Block selection vs row selection and recall: the corpus index is
video-major (21-64 consecutive rows per video), so a query's true top-k
clusters inside few videos — a surviving block carries its whole cluster
for ONE unit of budget, and every row of it is rescored exactly.  The
candidate budget is spent in 128-row units, which only hurts when true
positives are scattered across more than g videos.

TPU-first design notes: both stages are streaming matmuls (MXU/HBM
friendly); the candidate gather is the only random access and it moves
contiguous 256 KB blocks.  Static shapes throughout (``num_candidates``
is a compile-time constant).  This is the classic IVF trade re-shaped for
the TPU: clustering + gather of ragged inverted lists would turn the hot
loop into scattered HBM reads, while a low-rank prefilter + fixed-size
blocks keep it dense.
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
from vfr_tpu.ops.pallas.coarse_kernel import (
    KERNEL_BLOCK_N,
    coarse_blockmax,
    coarse_blockmax_reference,
)
from vfr_tpu.parallel.sharding import query_sq_const

_INVALID = 1e29   # rows with msq above this are padding — never retrievable

BLOCK_ROWS = 128  # rows per stage-2 gather block (256 KB at D=256 bf16)


@dataclass
class CoarseIndex:
    proj: jnp.ndarray      # [D, d_c] f32 PCA basis (D = S*d)
    m_low: jnp.ndarray     # [Npad, d_c] projected rows (bf16 by default)
    msq_low: jnp.ndarray   # [Npad] f32 |m_low|^2, +1e30 on invalid/pad rows
    # stage-2 operands, BLOCKED: full rows as G contiguous blocks of
    # block_rows (identical scoring math to the exact retriever's
    # one-matmul layout; Npad = G * block_rows)
    m_blk: jnp.ndarray     # [G, block_rows * D] storage dtype
    msq_blk: jnp.ndarray   # [G, block_rows] f32, +1e30 on invalid/pad rows
    # per-block centroids in PCA space (stage-1 "centroid" mode: rank
    # blocks by distance to centroid — IVF cells of FIXED size)
    c_low: jnp.ndarray     # [G, d_c] f32
    csq: jnp.ndarray       # [G] f32 |c|^2, +1e30 on all-pad blocks
    # row permutation applied to every blocked operand: operand row i is
    # original index row perm[i] (PCA-bisection packing so each block is
    # spatially coherent; identity when built with reorder=False)
    perm: jnp.ndarray      # [Npad] int32
    n_rows: int            # REAL (unpadded) row count
    block_rows: int = BLOCK_ROWS

    @property
    def d_coarse(self) -> int:
        return int(self.proj.shape[1])

    @property
    def num_rows(self) -> int:
        return self.n_rows

    @property
    def num_blocks(self) -> int:
        return int(self.m_blk.shape[0])

    @property
    def row_dim(self) -> int:
        return int(self.m_blk.shape[1]) // self.block_rows


def _tilde_rows(index: MomentIndex) -> jnp.ndarray:
    """[N, D] = concat_s(sqrt(w_s) m_s): fused sqeuclidean == plain L2."""
    w = np.sqrt(np.asarray(index.weights, np.float64)).astype(np.float32)
    S = index.m.shape[0]
    return jnp.concatenate(
        [index.m[s].astype(jnp.float32) * w[s] for s in range(S)], axis=-1
    )


def _pad_rows(x: jnp.ndarray, n_pad: int, fill: float = 0.0) -> jnp.ndarray:
    if n_pad == 0:
        return x
    widths = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=fill)


def _row_alignment(N: int, block_rows: int) -> int:
    """Row padding granularity: align to the stage-1 kernel tile so the
    kernel never pads internally (its fallback ``jnp.pad`` copies the
    whole 100+ MB operand in HBM EVERY call — measured +1.9 ms/batch at
    2.1M rows before build-time alignment)."""
    return KERNEL_BLOCK_N if N >= KERNEL_BLOCK_N else block_rows


def _bisection_perm(x: np.ndarray, block_rows: int) -> np.ndarray:
    """Recursive PCA-space bisection -> a row permutation that packs
    spatially coherent FIXED-SIZE blocks (host-side, build time).

    At each node, rows are split on their widest-variance coordinate at a
    block-aligned median; leaves are exactly ``block_rows`` rows (the last
    may be short).  This is a kd-tree packing rather than k-means: it
    guarantees balanced cells (so stage 2 stays a dense fixed-shape
    gather) at O(N log(N/B)) build cost, and cell coherence only affects
    RECALL, never correctness (stage 2 rescores exactly).

    Cost notes (2.1M x 32 f32 rows, B=128, this host): a per-node full
    stable argsort + [n, D] materialization ran 10-16 s; splitting with
    ``argpartition`` on just the split column (within-side order is
    irrelevant — children re-partition) and picking the split dim from a
    <=64k-row sample runs 4.4 s with identical within-block variance
    (0.7067 vs 0.7068).  Deterministic for a fixed input (introselect has
    no randomness); tie ORDER differs from the old stable sort, which
    only re-labels equivalent cells.
    """
    N, _ = x.shape
    out = np.empty(N, np.int64)
    pos = 0
    stack = [np.arange(N)]
    while stack:
        ids = stack.pop()
        n = len(ids)
        if n <= block_rows:
            out[pos:pos + n] = ids
            pos += n
            continue
        samp = ids if n <= 65_536 else ids[:: n // 32_768]
        dim = int(np.argmax(x[samp].var(axis=0)))
        h = max(block_rows, (n // (2 * block_rows)) * block_rows)
        part = ids[np.argpartition(x[ids, dim], h)]
        stack.append(part[h:])
        stack.append(part[:h])
    assert pos == N
    return out


def build_coarse_index(
    index: MomentIndex,
    d_coarse: int = 32,
    store_dtype=jnp.bfloat16,
    chunk: int = 262_144,
    block_rows: int = BLOCK_ROWS,
    reorder: bool = True,
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
    del mt

    m_low = jnp.concatenate(lows, axis=0)
    msq_low = jnp.concatenate(sqs, axis=0)

    # row permutation: coherent blocks via PCA bisection of the VALID
    # rows (invalid rows sink to the end, ahead of alignment pads)
    if reorder:
        x = np.asarray(m_low, np.float32)
        valid_ids = np.nonzero(valid_np)[0]
        packed = valid_ids[_bisection_perm(x[valid_ids], block_rows)]
        perm_np = np.concatenate(
            [packed, np.nonzero(~valid_np)[0]]).astype(np.int32)
        del x
    else:
        perm_np = np.arange(N, dtype=np.int32)

    n_pad = (-N) % _row_alignment(N, block_rows)
    perm_dev = jnp.asarray(perm_np)
    m_low = _pad_rows(jnp.take(m_low, perm_dev, axis=0), n_pad)
    msq_low = _pad_rows(jnp.take(msq_low, perm_dev, axis=0), n_pad, 1e30)
    perm = jnp.asarray(
        np.concatenate([perm_np,
                        np.arange(N, N + n_pad, dtype=np.int32)]))

    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    G = (N + n_pad) // block_rows
    m_blk = _pad_rows(
        jnp.take(jax.device_put(m_cat), perm_dev, axis=0), n_pad
    ).reshape(G, block_rows * D)
    msq_blk = _pad_rows(
        jnp.take(jax.device_put(msq_fused), perm_dev, axis=0), n_pad, 1e30
    ).reshape(G, block_rows)
    c_low, csq = _block_centroids(m_low, msq_low, G, block_rows)
    return CoarseIndex(proj=proj, m_low=m_low, msq_low=msq_low,
                       m_blk=m_blk, msq_blk=msq_blk,
                       c_low=c_low, csq=csq, perm=perm, n_rows=N,
                       block_rows=block_rows)


@jax.jit
def _centroid_kernel(m_low, msq_low):
    G, B, _ = m_low.shape
    v = (msq_low < _INVALID).astype(jnp.float32)          # [G, B]
    sums = jnp.sum(m_low.astype(jnp.float32) * v[..., None], axis=1)
    cnt = jnp.sum(v, axis=1)                              # [G]
    c = sums / jnp.maximum(cnt, 1.0)[:, None]
    csq = jnp.sum(c * c, axis=-1) + jnp.where(cnt == 0, 1e30, 0.0)
    return c, csq


def _block_centroids(m_low, msq_low, G: int, block_rows: int):
    """Masked per-block means of the projected rows (+1e30 csq on all-pad
    blocks so centroid-mode stage 1 can never pick them)."""
    d_c = m_low.shape[1]
    return _centroid_kernel(m_low.reshape(G, block_rows, d_c),
                            msq_low.reshape(G, block_rows))


def save_coarse(coarse: CoarseIndex, path: str) -> str:
    """Persist the coarse operands (the full-row stage-2 operands are NOT
    duplicated here — reload them from the main index .npz).  Atomic
    write (tmp + os.replace, utils/io.py)."""
    m_low = np.asarray(coarse.m_low)
    if coarse.m_low.dtype == jnp.bfloat16:
        m_store, m_dtype = np.asarray(coarse.m_low).view(np.uint16), "bfloat16"
    else:
        m_store, m_dtype = m_low.astype(np.float32), "float32"
    from vfr_tpu.utils.io import atomic_savez

    return atomic_savez(path, dict(
        proj=np.asarray(coarse.proj, np.float32),
        m_low=m_store, m_dtype=np.asarray(m_dtype),
        msq_low=np.asarray(coarse.msq_low, np.float32),
        c_low=np.asarray(coarse.c_low, np.float32),
        csq=np.asarray(coarse.csq, np.float32),
        perm=np.asarray(coarse.perm, np.int32),
        n_rows=np.asarray(coarse.n_rows),
        block_rows=np.asarray(coarse.block_rows)))


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
        c_low = jnp.asarray(z["c_low"], jnp.float32)
        csq = jnp.asarray(z["csq"], jnp.float32)
        perm_np = z["perm"].astype(np.int32)
        n_rows = int(z["n_rows"])
        block_rows = int(z["block_rows"])
    if n_rows != index.num_rows:
        raise ValueError(
            f"coarse index has {n_rows} rows but the moment "
            f"index has {index.num_rows}: built from a different corpus")
    D = int(index.m.shape[0] * index.m.shape[2])
    m_cat, msq_fused = fuse_index_cat(index.m, index.m_sq, index.weights)
    n_pad = int(m_low.shape[0]) - n_rows      # alignment chosen at build
    G = (n_rows + n_pad) // block_rows
    perm_dev = jnp.asarray(perm_np[:n_rows])  # stage-2 rows re-permuted
    m_blk = _pad_rows(
        jnp.take(jax.device_put(m_cat), perm_dev, axis=0), n_pad
    ).reshape(G, block_rows * D)
    msq_blk = _pad_rows(
        jnp.take(jax.device_put(msq_fused), perm_dev, axis=0), n_pad, 1e30
    ).reshape(G, block_rows)
    return CoarseIndex(proj=proj, m_low=m_low, msq_low=msq_low,
                       m_blk=m_blk, msq_blk=msq_blk,
                       c_low=c_low, csq=csq, perm=jnp.asarray(perm_np),
                       n_rows=n_rows, block_rows=block_rows)


def _num_blocks(num_candidates: int, block_rows: int, G: int) -> int:
    """Stage-1 survivors in BLOCKS from a row-denominated budget."""
    return int(min(max(1, -(-int(num_candidates) // block_rows)), G))


def _blockmax(q_low, m_low, msq_low, block_rows: int):
    """Dispatch stage 1: Pallas kernel on TPU (the XLA lowering
    materializes the [Q, N] scores once [Q, G] must exist — 6.4 ms vs
    ~0.2 at 2.1M rows), jnp twin elsewhere (CPU harness, interpret-free).
    """
    if jax.default_backend() == "tpu":
        return coarse_blockmax(q_low, m_low, msq_low,
                               block_rows=block_rows)
    return coarse_blockmax_reference(q_low, m_low, msq_low,
                                     block_rows=block_rows)


def make_coarse_retriever(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,   # kept for API parity; stage 1 is exact
    rnn_kernel: Optional[str] = None,
    mode: str = "blockmax",
):
    """Jitted ``(params, tokens, lengths) -> (dists [Q, k], rows [Q, k])``
    — same contract as ``make_retriever``; distances are EXACT fused
    distances of the returned rows (stage 2 rescoring), only candidate-set
    membership is approximate.

    ``num_candidates``: stage-1 survivors per query, in rows; rounded UP
    to whole ``block_rows`` blocks (g = ceil(C / B) blocks, all of whose
    rows are rescored exactly).  Recall@k of the two-stage result vs the
    exact retriever rises with it; bytes gathered in stage 2 scale
    linearly with it.  ``mode``: see ``_coarse_fn``.  Measured trade-offs
    live in docs/DESIGN.md (coarse entry) / artifacts/coarse_scale.json.
    """
    g = _num_blocks(num_candidates, coarse.block_rows, coarse.num_blocks)
    k = int(min(k, coarse.num_rows, g * coarse.block_rows))

    cache_key = ("coarse_retrieve", _query_model_key(model), k, g,
                 rnn_kernel, coarse.d_coarse, coarse.block_rows, mode,
                 tuple(np.asarray(model.cfg.stream_weights).tolist()))
    _retrieve = _JIT_CACHE.get(cache_key)
    if _retrieve is None:
        _retrieve = jax.jit(
            _coarse_fn(model, k, g * coarse.block_rows, approx_recall,
                       rnn_kernel, block_rows=coarse.block_rows,
                       mode=mode))
        _JIT_CACHE[cache_key] = _retrieve

    def retrieve(params, tokens, lengths):
        return _retrieve(coarse.proj, coarse.m_low, coarse.msq_low,
                         coarse.m_blk, coarse.msq_blk,
                         coarse.c_low, coarse.csq, coarse.perm,
                         params, tokens, lengths)

    return retrieve


def make_coarse_score_topk(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
    mode: str = "blockmax",
):
    """Un-jitted per-batch body with operands bound (the coarse twin of
    ``make_score_topk``): ``(params, tokens, lengths) -> (dists, rows)``.
    Exposed so probes/bench can time exactly this program in the
    elision-proof in-program loop."""
    g = _num_blocks(num_candidates, coarse.block_rows, coarse.num_blocks)
    k = int(min(k, coarse.num_rows, g * coarse.block_rows))
    fn = _coarse_fn(model, k, g * coarse.block_rows, approx_recall,
                    rnn_kernel, block_rows=coarse.block_rows, mode=mode)

    def score_topk(params, tokens, lengths):
        return fn(coarse.proj, coarse.m_low, coarse.msq_low,
                  coarse.m_blk, coarse.msq_blk,
                  coarse.c_low, coarse.csq, coarse.perm,
                  params, tokens, lengths)

    return score_topk


def make_coarse_stream_retriever(
    model: Model,
    coarse: CoarseIndex,
    k: int,
    num_candidates: int = 2048,
    approx_recall: float = 0.95,
    rnn_kernel: Optional[str] = None,
    mode: str = "blockmax",
):
    """Throughput serving through the two-stage retriever: MANY query
    batches per dispatch via ``lax.scan`` (the coarse twin of
    ``make_stream_retriever`` — same ~8 ms/dispatch amortization
    rationale, DESIGN 12b).  ``(params, tokens [M, Q, T], lengths
    [M, Q]) -> (dists [M, Q, k], rows [M, Q, k])``."""
    g = _num_blocks(num_candidates, coarse.block_rows, coarse.num_blocks)
    k = int(min(k, coarse.num_rows, g * coarse.block_rows))
    fn = _coarse_fn(model, k, g * coarse.block_rows, approx_recall,
                    rnn_kernel, block_rows=coarse.block_rows, mode=mode)

    cache_key = ("coarse_stream", _query_model_key(model), k, g,
                 rnn_kernel, coarse.d_coarse, coarse.block_rows, mode,
                 tuple(np.asarray(model.cfg.stream_weights).tolist()))
    _retrieve = _JIT_CACHE.get(cache_key)
    if _retrieve is None:

        @jax.jit
        def _retrieve(proj, m_low, msq_low, m_blk, msq_blk, c_low, csq,
                      perm, params, tokens, lengths):
            def body(carry, batch):
                toks, lens = batch
                return carry, fn(proj, m_low, msq_low, m_blk, msq_blk,
                                 c_low, csq, perm, params, toks, lens)

            _, (dists, rows) = jax.lax.scan(body, 0, (tokens, lengths))
            return dists, rows

        _JIT_CACHE[cache_key] = _retrieve

    def retrieve_stream(params, tokens, lengths):
        return _retrieve(coarse.proj, coarse.m_low, coarse.msq_low,
                         coarse.m_blk, coarse.msq_blk,
                         coarse.c_low, coarse.csq, coarse.perm,
                         params, tokens, lengths)

    return retrieve_stream


def pad_coarse_blocks(coarse: CoarseIndex, multiple: int) -> CoarseIndex:
    """Pad the BLOCK axis to a multiple (for even ICI sharding); pad
    blocks get msq = +big on BOTH stages so they can never be selected."""
    G = coarse.num_blocks
    rem = (-G) % multiple
    if rem == 0:
        return coarse
    B = coarse.block_rows
    Npad = int(coarse.m_low.shape[0])
    return CoarseIndex(
        proj=coarse.proj,
        m_low=_pad_rows(coarse.m_low, rem * B),
        msq_low=_pad_rows(coarse.msq_low, rem * B, 1e30),
        m_blk=_pad_rows(coarse.m_blk, rem),
        msq_blk=jnp.concatenate(
            [coarse.msq_blk, jnp.full((rem, B), 1e30, jnp.float32)]),
        c_low=_pad_rows(coarse.c_low, rem),
        csq=_pad_rows(coarse.csq, rem, 1e30),
        perm=jnp.concatenate(
            [coarse.perm,
             jnp.arange(Npad, Npad + rem * B, dtype=jnp.int32)]),
        n_rows=coarse.n_rows,
        block_rows=B,
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
    mode: str = "blockmax",
):
    """Two-stage retrieval with ALL block-indexed operands sharded over
    the corpus ICI axis.  Each device runs stage 1 over its local blocks,
    keeps ``ceil(g / ndev)`` local survivor blocks, rescores them exactly
    from its LOCAL full rows (the candidate gather never crosses ICI),
    and contributes its local top-k; the merged global top-k rides the
    interconnect as O(ndev * k) candidates — the same communication
    envelope as ``sharded_corpus_topk_cat``.

    Per-shard stage-1 quotas partition the candidate budget by shard
    rather than globally (a forced spread); recall vs the single-device
    retriever at equal total budget is equal or better on every measured
    configuration, and the g_loc = G_loc limit is EXACT (property test).
    """
    ndev = mesh.shape[axis]
    coarse = pad_coarse_blocks(coarse, ndev)
    B = coarse.block_rows
    G = coarse.num_blocks
    G_loc = G // ndev
    g_total = _num_blocks(num_candidates, B, G)
    g_loc = int(min(max(1, -(-g_total // ndev)), G_loc))
    k_loc = int(min(k, g_loc * B))
    k = int(min(k, coarse.num_rows))
    D = coarse.row_dim
    w = np.asarray(model.cfg.stream_weights, np.float32)
    sqrt_w = np.sqrt(w.astype(np.float64)).astype(np.float32)
    w_jnp = jnp.asarray(w)
    P_ = jax.sharding.PartitionSpec

    sh_rows = jax.sharding.NamedSharding(mesh, P_(axis, None))
    sh_vec = jax.sharding.NamedSharding(mesh, P_(axis))
    m_low = jax.device_put(coarse.m_low, sh_rows)
    msq_low = jax.device_put(coarse.msq_low, sh_vec)
    m_blk = jax.device_put(coarse.m_blk, sh_rows)
    msq_blk = jax.device_put(coarse.msq_blk, sh_rows)
    c_low = jax.device_put(coarse.c_low, sh_rows)
    csq = jax.device_put(coarse.csq, sh_vec)
    perm = jax.device_put(coarse.perm)     # replicated (row-id map)
    proj = jax.device_put(coarse.proj)

    def body(qs, proj, m_low_loc, msq_low_loc, mblk_loc, msqb_loc,
             c_low_loc, csq_loc):
        S = qs.shape[0]
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)
        q_low = (q_t @ proj).astype(jnp.float32)
        if mode == "centroid":
            sb = (2.0 * q_low) @ c_low_loc.T - csq_loc[None, :]
        else:
            sb = _blockmax(q_low, m_low_loc, msq_low_loc, B)   # [Q, G_loc]
        _, blk = jax.lax.top_k(sb, g_loc)                  # [Q, g_loc]
        Q = q_low.shape[0]
        mb = jnp.take(mblk_loc, blk, axis=0)               # [Q,g,B*D]
        mc = mb.reshape(Q, g_loc * B, D)
        msq_c = jnp.take(msqb_loc, blk, axis=0).reshape(Q, g_loc * B)
        qc = jnp.concatenate(
            [2.0 * w_jnp[s] * qs[s] for s in range(S)], axis=-1)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.float32),
                            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, k_loc)
        shard = jax.lax.axis_index(axis)
        cand_rows = ((shard * G_loc + blk[:, :, None]) * B
                     + jnp.arange(B)[None, None, :]).reshape(Q, g_loc * B)
        rows = jnp.take_along_axis(cand_rows, pos, axis=1)
        all_vals = jax.lax.all_gather(vals, axis)          # [ndev, Q, k_loc]
        all_rows = jax.lax.all_gather(rows, axis)
        cv = jnp.moveaxis(all_vals, 0, 1).reshape(Q, ndev * k_loc)
        cr = jnp.moveaxis(all_rows, 0, 1).reshape(Q, ndev * k_loc)
        best, bpos = jax.lax.top_k(cv, min(k, ndev * k_loc))
        brows = jnp.take_along_axis(cr, bpos, axis=1)
        dists = query_sq_const(qs, w_jnp)[:, None] - best
        return dists, brows

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P_(), P_(), P_(axis, None), P_(axis), P_(axis, None),
                  P_(axis, None), P_(axis, None), P_(axis)),
        out_specs=(P_(), P_()),
        # post-all_gather merge is replicated; the static check can't see
        # it (same rationale as sharded_corpus_topk_cat)
        check_vma=False,
    )

    @jax.jit
    def _retrieve(proj, m_low, msq_low, m_blk, msq_blk, c_low, csq, perm,
                  params, tokens, lengths):
        qs = _embed_query_streams(params, model, tokens, lengths, rnn_kernel)
        dists, rows = sharded(qs, proj, m_low, msq_low, m_blk, msq_blk,
                              c_low, csq)
        return dists, jnp.take(perm, rows)     # back to ORIGINAL rows

    def retrieve(params, tokens, lengths):
        return _retrieve(proj, m_low, msq_low, m_blk, msq_blk,
                         c_low, csq, perm, params, tokens, lengths)

    return retrieve


def _coarse_fn(model: Model, k: int, C: int, approx_recall: float,
               rnn_kernel: Optional[str], block_rows: int = BLOCK_ROWS,
               mode: str = "blockmax"):
    """The two-stage retrieval math with every index operand an explicit
    argument (jit-argument convention, DESIGN 12c — captured index
    constants ship with the executable).  ``C`` is the candidate budget in
    rows and must be a ``block_rows`` multiple (g = C / block_rows blocks).

    ``mode`` selects stage 1:

    * ``"blockmax"`` — exact per-block max of row-level coarse scores
      (Pallas stream over [N, d_c]; highest recall, cost grows with N:
      0.76 ms at 2.1M rows).
    * ``"centroid"`` — rank blocks by distance to their centroid (IVF
      with fixed-size cells; ONE [Q, d_c] x [d_c, G] matmul, ~N/B times
      cheaper; recall relies on the build-time bisection packing).
    """
    assert C % block_rows == 0
    assert mode in ("blockmax", "centroid"), mode
    g = C // block_rows
    # sqrt-weight fold for stage 1 (m_tilde space); stage 2 uses the
    # standard one-matmul scaled-query layout
    w = np.asarray(model.cfg.stream_weights, np.float32)
    sqrt_w = np.sqrt(w.astype(np.float64)).astype(np.float32)
    w_jnp = jnp.asarray(w)

    def fn(proj, m_low, msq_low, m_blk, msq_blk, c_low, csq, perm,
           params, tokens, lengths):
        qs = _embed_query_streams(params, model, tokens, lengths,
                                  rnn_kernel)                     # [S, Q, d]
        S = qs.shape[0]
        Q = qs.shape[1]
        D = m_blk.shape[1] // block_rows
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)       # [Q, D]
        q_low = (q_t @ proj).astype(jnp.float32)
        if mode == "centroid":
            # stage 1: one tiny matmul over G centroids
            sb = (2.0 * q_low) @ c_low.T - csq[None, :]           # [Q, G]
        else:
            # stage 1: stream [N, d_c] once, per-block maxima [Q, G]
            sb = _blockmax(q_low, m_low, msq_low, block_rows)
        _, blk = jax.lax.top_k(sb, min(g, sb.shape[1]))           # [Q, g]
        g_eff = blk.shape[1]
        # stage 2: gather surviving blocks' full rows, exact rescoring
        mb = jnp.take(m_blk, blk, axis=0)                  # [Q, g, B*D]
        mc = mb.reshape(Q, g_eff * block_rows, D)
        msq_c = jnp.take(msq_blk, blk, axis=0).reshape(Q, g_eff * block_rows)
        qc = jnp.concatenate(
            [2.0 * w_jnp[s] * qs[s] for s in range(S)], axis=-1)
        s_full = jnp.einsum(
            "qd,qcd->qc", qc.astype(jnp.float32),
            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, k)
        cand_rows = (blk[:, :, None] * block_rows
                     + jnp.arange(block_rows)[None, None, :]
                     ).reshape(Q, g_eff * block_rows)
        rows = jnp.take_along_axis(cand_rows, pos, axis=1)
        rows = jnp.take(perm, rows)        # back to ORIGINAL index rows
        dists = query_sq_const(qs, w_jnp)[:, None] - vals
        return dists, rows

    return fn
