"""Corpus-level retrieval (SURVEY.md C14; BASELINE.json:10-11).

PASS 1 — ``build_moment_index``: embed ALL moments of ALL corpus videos once
(jitted, batched over videos) into a cached index: per-stream rows
``[S, V*P, d]`` + precomputed ``|m|^2`` (+inf on invalid/padded rows so they
can never be retrieved).

PASS 2 — ``corpus_retrieval``: embed a query batch, score it against the
whole index.  Single-device: one fused-distance MXU matmul + ``lax.top_k``.
With a mesh: the index is sharded over the "corpus" ICI axis and top-k is
hierarchical (parallel.sharding.sharded_corpus_topk).

``corpus_evaluate`` reports moment-level corpus R@k at tIoU thresholds (hit
= a top-k row on the right video with tIoU >= thr) plus video-level R@k.
This is the >100k proposals/query/chip/sec path bench.py measures.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import EvalConfig
from vfr_tpu.models.mcn import Model, embed_moments, embed_queries_multi
from vfr_tpu.ops.tiou import tiou
from vfr_tpu.parallel.sharding import (
    fused_corpus_distances,
    pad_index,
    sharded_corpus_topk,
)


@dataclass
class MomentIndex:
    m: jnp.ndarray           # [S, N, d] per-stream moment embeddings
    m_sq: jnp.ndarray        # [S, N] squared norms (+inf for invalid rows)
    video_row: np.ndarray    # [N] int32 corpus video row per index row
    prop_idx: np.ndarray     # [N] int32 proposal index within the video
    spans_sec: np.ndarray    # [N, 2] float32 second interval of each row
    weights: jnp.ndarray     # [S] stream fusion weights

    @property
    def num_rows(self) -> int:
        return int(self.m.shape[1])

    @property
    def num_videos(self) -> int:
        return int(self.video_row.max()) + 1 if len(self.video_row) else 0


def build_moment_index(
    params, model: Model, dataset, batch_size: int = 128,
    num_videos: int = 0,
) -> MomentIndex:
    V_all = dataset.rgb_feats.shape[0]
    V = min(num_videos, V_all) if num_videos else V_all
    P = dataset.num_proposals
    is_charades = hasattr(dataset, "windows")

    @jax.jit
    def embed_block(params, feats, tef, context_mask):
        m = embed_moments(params, model, feats, tef=tef,
                          context_mask=context_mask)
        stacked = jnp.stack([m[s] for s in model.streams])   # [S, B, P, d]
        return stacked

    blocks = []
    for start in range(0, V, batch_size):
        idx = np.arange(start, min(start + batch_size, V))
        pad = batch_size - len(idx)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, idx.dtype)])
        feats = {"rgb": dataset.rgb_feats[idx]}
        if "flow" in model.streams:
            feats["flow"] = dataset.flow_feats[idx]
        tef = dataset.video_tef[idx] if is_charades else None
        blocks.append(np.asarray(embed_block(params, feats, tef, None)))
    all_m = np.concatenate(blocks, axis=1)[:, :V]            # [S, V, P, d]
    S, _, _, d = all_m.shape
    flat = all_m.reshape(S, V * P, d)

    if model.cfg.distance == "cosine":
        # Store L2-normalized rows: fused squared-euclidean over normalized
        # vectors is sum_s w_s*(2 - 2cos_s), an affine transform of the
        # fused cosine distance — identical ranking, one code path.
        flat = flat / (np.linalg.norm(flat, axis=-1, keepdims=True) + 1e-8)
    m_sq = (flat.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    video_row = np.repeat(np.arange(V, dtype=np.int32), P)
    prop_idx = np.tile(np.arange(P, dtype=np.int32), V)
    if is_charades:
        spans = np.asarray(dataset.windows)                   # [P, 2]
        spans_sec = np.tile(spans, (V, 1))
        valid = dataset.window_mask[:V].reshape(V * P)
        m_sq = np.where(valid, m_sq, 1e30)
    else:
        spans_sec = np.tile(np.asarray(dataset.span_seconds), (V, 1))

    return MomentIndex(
        m=jnp.asarray(flat),
        m_sq=jnp.asarray(m_sq),
        video_row=video_row,
        prop_idx=prop_idx,
        spans_sec=spans_sec.astype(np.float32),
        weights=jnp.asarray(model.cfg.stream_weights, jnp.float32),
    )


def _embed_query_streams(params, model: Model, tokens, lengths) -> jnp.ndarray:
    """[S, Q, d]: shared LSTM trunk; per-stream or shared projection per
    ModelConfig.per_stream_query_proj.  Cosine mode normalizes (the index
    rows are stored normalized — see build_moment_index)."""
    qs = embed_queries_multi(params, model, tokens, lengths, inference=True)
    if model.cfg.distance == "cosine":
        qs = qs / (jnp.linalg.norm(qs, axis=-1, keepdims=True) + 1e-8)
    return qs


def make_retriever(
    model: Model,
    index: MomentIndex,
    k: int,
    mesh: Optional[jax.sharding.Mesh] = None,
    axis: str = "corpus",
    topk_method: str = "exact",
    approx_recall: float = 0.95,
):
    """Jitted ``(params, tokens, lengths) -> (dists [Q,k], rows [Q,k])``.

    ``topk_method="approx"`` selects ``lax.approx_max_k`` (TPU
    PartialReduce): measured 0.12 ms vs 8.97 ms exact at [128 x 210k] k=100,
    i.e. the selection stage stops dominating the serving path.  Exact is
    the eval default; serving presets opt into approx.

    Distance config: sqeuclidean natively; cosine via normalized index rows
    + queries (rank-equivalent — see build_moment_index); euclidean is rank-
    equivalent for a single stream but the multi-stream weighted sum of
    sqrt'd distances orders differently — rejected loudly.
    """
    if model.cfg.distance == "euclidean" and len(model.streams) > 1:
        raise NotImplementedError(
            "corpus retrieval with distance='euclidean' and multiple streams "
            "is not rank-equivalent to the fused sqeuclidean scorer; use "
            "sqeuclidean/cosine or a single stream"
        )
    compute_dtype = model.compute_dtype

    if mesh is None:
        from vfr_tpu.ops.pallas.distance_kernel import pallas_fused_distances
        from vfr_tpu.ops.topk import top_k_select

        # Measured on v5e (210k rows, f32): XLA's fused matmul beats the
        # Pallas distance kernel, so Pallas is opt-in here ("always").
        pallas_on = model.cfg.use_pallas == "always"
        w_tuple = tuple(float(w) for w in model.cfg.stream_weights)

        @jax.jit
        def retrieve(params, tokens, lengths):
            qs = _embed_query_streams(params, model, tokens, lengths)
            if pallas_on:
                D = pallas_fused_distances(qs, index.m, index.m_sq, w_tuple,
                                           compute_dtype=compute_dtype)
            else:
                D = fused_corpus_distances(qs, index.m, index.m_sq,
                                           index.weights, compute_dtype)
            vals, rows = top_k_select(-D, k, topk_method, approx_recall)
            return -vals, rows

        return retrieve

    ndev = mesh.shape[axis]
    m, m_sq = pad_index(index.m, index.m_sq, ndev)
    # index rows live sharded over ICI; queries/params replicated
    m = jax.device_put(m, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, axis, None)))
    m_sq = jax.device_put(m_sq, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, axis)))

    @jax.jit
    def retrieve(params, tokens, lengths):
        qs = _embed_query_streams(params, model, tokens, lengths)
        return sharded_corpus_topk(
            mesh, qs, m, m_sq, index.weights, k, axis=axis,
            compute_dtype=compute_dtype, method=topk_method,
            recall=approx_recall,
        )

    return retrieve


def corpus_retrieval(
    params, model: Model, index: MomentIndex,
    tokens, lengths, k: int,
    mesh: Optional[jax.sharding.Mesh] = None,
    topk_method: str = "exact", approx_recall: float = 0.95,
) -> Tuple[np.ndarray, np.ndarray]:
    retrieve = make_retriever(model, index, k, mesh=mesh,
                              topk_method=topk_method,
                              approx_recall=approx_recall)
    d, rows = retrieve(params, jnp.asarray(tokens), jnp.asarray(lengths))
    return np.asarray(d), np.asarray(rows)


def serve_queries(
    params, model: Model, dataset, vocab, queries, k: int = 10,
    mesh: Optional[jax.sharding.Mesh] = None, batch_size: int = 128,
    max_query_len: int = 24, num_videos: int = 0,
    topk_method: str = "exact", approx_recall: float = 0.95,
):
    """Large-scale serving (BASELINE.json:11): answer free-text queries
    against the cached moment index; returns a list of
    ``{"query", "results": [{"video", "start", "end", "distance"}]}``."""
    from vfr_tpu.data.glove import tokenize

    index = build_moment_index(params, model, dataset, num_videos=num_videos)
    retrieve = make_retriever(model, index, min(k, index.num_rows), mesh=mesh,
                              topk_method=topk_method,
                              approx_recall=approx_recall)
    video_ids = dataset.video_ids
    out = []
    for start in range(0, len(queries), batch_size):
        chunk = queries[start : start + batch_size]
        toks = np.zeros((batch_size, max_query_len), np.int32)
        lens = np.ones(batch_size, np.int32)
        for i, text in enumerate(chunk):
            toks[i], lens[i] = vocab.encode(tokenize(text), max_query_len)
        d, rows = retrieve(params, jnp.asarray(toks), jnp.asarray(lens))
        d, rows = np.asarray(d), np.asarray(rows)
        for i, text in enumerate(chunk):
            results = [
                {
                    "video": video_ids[int(index.video_row[r])],
                    "start": float(index.spans_sec[r, 0]),
                    "end": float(index.spans_sec[r, 1]),
                    "distance": float(d[i, j]),
                }
                for j, r in enumerate(rows[i])
            ]
            out.append({"query": text, "results": results})
    return out


def corpus_evaluate(
    params, model: Model, dataset, ecfg: EvalConfig,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, float]:
    index = build_moment_index(
        params, model, dataset, num_videos=ecfg.corpus_num_videos
    )
    ks = tuple(ecfg.recall_ks)
    taus = tuple(ecfg.tiou_thresholds)
    kmax = min(max(max(ks), 10), index.num_rows)
    retrieve = make_retriever(model, index, kmax, mesh=mesh,
                              topk_method=ecfg.topk_method,
                              approx_recall=ecfg.approx_recall)

    hits = {(k, t): 0.0 for k in ks for t in taus}
    video_hits = {k: 0.0 for k in ks}
    n = 0
    for batch in dataset.eval_batches(ecfg.corpus_query_batch):
        _, rows = retrieve(
            params, jnp.asarray(batch["tokens"]), jnp.asarray(batch["lengths"])
        )
        rows = np.asarray(rows)                               # [Q, kmax]
        valid = batch["valid"]
        vid_ok = index.video_row[rows] == batch["video_idx"][:, None]
        pred_spans = index.spans_sec[rows]                    # [Q, kmax, 2]
        ious = tiou(pred_spans[:, :, None, :], batch["gt_spans"][:, None, :, :])
        ious = np.where(batch["gt_mask"][:, None, :], ious, -1.0).max(axis=2)
        for k in ks:
            for t in taus:
                hit = (vid_ok[:, :k] & (ious[:, :k] >= t)).any(axis=1)
                hits[(k, t)] += float((hit & valid).sum())
            video_hits[k] += float((vid_ok[:, :k].any(axis=1) & valid).sum())
        n += int(valid.sum())

    out: Dict[str, float] = {"corpus_num_rows": float(index.num_rows)}
    for k in ks:
        for t in taus:
            out[f"corpus_R@{k}_tiou{t}"] = hits[(k, t)] / max(n, 1)
        out[f"corpus_video_R@{k}"] = video_hits[k] / max(n, 1)
    out["num_queries"] = float(n)
    return out
