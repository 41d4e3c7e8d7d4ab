"""Two-tower joint-embedding model (SURVEY.md C8/C9/C10, MCN lineage).

Query tower:  GloVe lookup -> LSTM (lax.scan, MXU GEMM per step) -> Linear
              -> joint space R^d.
Moment tower: per stream (rgb / flow): segment pooling expressed as the
              static pooling-matrix matmul ``einsum('pc,bcf->bpf')`` +
              optional global-context mean + optional TEF concat -> Linear
              -> R^{P x d}.
Fusion:       per-stream squared-Euclidean distances combined by fixed
              stream weights (BASELINE.json:8 "fusion").

Everything is a pure function over a params pytree — jit/grad/shard_map
compose freely, and the whole in-batch [B, B, P] cross-distance tensor used
for inter-video negatives is ONE MXU matmul (models.mcn.cross_distances).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import ModelConfig
from vfr_tpu.ops.lstm import (
    gru_forward,
    gru_forward_fused,
    init_gru_params,
    init_lstm_params,
    lstm_forward,
    lstm_forward_fused,
    masked_mean_pool,
)


class Model(NamedTuple):
    """Static model context: config + constant tables, passed alongside params."""
    cfg: ModelConfig
    streams: Sequence[str]            # e.g. ("rgb",) or ("rgb", "flow")
    pool_matrix: jnp.ndarray          # [P, C] mean-pooling matrix
    tef: Optional[jnp.ndarray]        # [P, 2] static TEF (DiDeMo) or None
    freeze_embeddings: bool = True

    @property
    def compute_dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)


def _linear_init(rng, in_dim, out_dim, dtype):
    k = 1.0 / np.sqrt(in_dim)
    w = jax.random.uniform(rng, (in_dim, out_dim), dtype, -k, k)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def _linear(p, x, compute_dtype):
    return (
        jnp.dot(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + p["b"]
    )


def moment_input_dim(cfg: ModelConfig, feature_dim: int) -> int:
    d = feature_dim
    if cfg.use_global_context:
        d += feature_dim
    if cfg.use_tef:
        d += 2
    return d


def init_model_params(
    rng: jax.Array,
    model: Model,
    glove_table: np.ndarray,          # [V, E]
    feature_dim: int,
) -> Dict:
    cfg = model.cfg
    dtype = jnp.dtype(cfg.param_dtype)
    rng, r_lstm, r_qproj = jax.random.split(rng, 3)
    if cfg.rnn_cell == "gru":
        rnn = init_gru_params(
            r_lstm, glove_table.shape[1], cfg.lstm_hidden, cfg.lstm_layers,
            dtype=dtype,
        )
    else:
        rnn = init_lstm_params(
            r_lstm, glove_table.shape[1], cfg.lstm_hidden, cfg.lstm_layers,
            dtype=dtype,
        )
    params: Dict = {
        "embeddings": jnp.asarray(glove_table, dtype),
        "lstm": rnn,
    }
    if cfg.per_stream_query_proj:
        for s in model.streams:
            rng, r = jax.random.split(rng)
            params[f"query_proj_{s}"] = _linear_init(
                r, cfg.lstm_hidden, cfg.joint_dim, dtype
            )
    else:
        params["query_proj"] = _linear_init(
            r_qproj, cfg.lstm_hidden, cfg.joint_dim, dtype
        )
    if cfg.query_pool == "attn":
        # zeros -> uniform softmax -> masked mean at init (see
        # _query_hidden); the pool only sharpens if gradients say so
        params["query_attn"] = jnp.zeros((cfg.lstm_hidden,), dtype)
    in_dim = moment_input_dim(cfg, feature_dim)
    for s in model.streams:
        rng, r = jax.random.split(rng)
        params[f"moment_proj_{s}"] = _linear_init(r, in_dim, cfg.joint_dim, dtype)
    return params


def use_pallas(cfg: ModelConfig) -> bool:
    """Kernel dispatch: Pallas on TPU by default ("auto"), overridable."""
    if cfg.use_pallas == "never":
        return False
    if cfg.use_pallas == "always":
        return True
    return jax.default_backend() == "tpu"


_pallas_rnn_logged = False


def _log_pallas_rnn_once(cell: str) -> None:
    """One-time notice that inference runs the bf16-weight Pallas kernel.

    The precision differs from the f32 training path (ADVICE r1); eval
    protocols default to the scan twin (EvalConfig.rnn_kernel="scan") and
    serving opts into the kernel — this log makes the choice visible."""
    global _pallas_rnn_logged
    if not _pallas_rnn_logged:
        import sys

        print(
            f"[vfr_tpu] query {cell}: Pallas VMEM-resident kernel "
            "(bf16 weights, f32 accumulation) — serving precision",
            file=sys.stderr,
        )
        _pallas_rnn_logged = True


def _query_hidden(
    params: Dict, model: Model, tokens: jnp.ndarray, lengths: jnp.ndarray,
    inference: bool, dropout_rng: Optional[jnp.ndarray] = None,
    rnn_kernel: Optional[str] = None,
) -> jnp.ndarray:
    """Shared GloVe -> LSTM trunk; returns the pooled query representation
    [B, H] (cfg.query_pool: the final hidden state, or the length-masked
    mean over all hidden states).

    ``rnn_kernel``: None = the use_pallas policy (Pallas on TPU inference);
    "scan" forces the f32 lax.scan twin (training precision — metrics eval
    uses this, EvalConfig.rnn_kernel); "pallas" requests the VMEM-resident
    kernel (bf16 weights at large H — serving precision).
    """
    table = params["embeddings"]
    if model.freeze_embeddings:
        table = jax.lax.stop_gradient(table)
    x = jnp.take(table, tokens, axis=0)          # [B, T, E]
    if rnn_kernel is None:
        want_kernel = inference and use_pallas(model.cfg)
    else:
        want_kernel = (
            inference and rnn_kernel == "pallas"
            and model.cfg.use_pallas != "never"
        )
    # With the mean pool the Pallas kernels fuse the pooling INTO the
    # recurrence (live-step sum in VMEM scratch): the [B, T, H] hidden-state
    # tensor never touches HBM and `hs` comes back already pooled [B, H].
    kernel_pool = "mean" if model.cfg.query_pool == "mean" else "none"
    if model.cfg.rnn_cell == "gru":
        if want_kernel:
            from vfr_tpu.ops.pallas.gru_kernel import pallas_gru

            _log_pallas_rnn_once("GRU")
            h_last, hs = pallas_gru(params["lstm"], x, lengths,
                                    model.compute_dtype, pool=kernel_pool)
        elif not inference and model.cfg.train_rnn_impl == "fused":
            h_last, hs = gru_forward_fused(params["lstm"], x, lengths,
                                           model.compute_dtype)
        else:
            h_last, hs = gru_forward(params["lstm"], x, lengths,
                                     model.compute_dtype)
    elif want_kernel:
        from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm

        _log_pallas_rnn_once("LSTM")
        h_last, hs = pallas_lstm(params["lstm"], x, lengths,
                                 model.compute_dtype, pool=kernel_pool)
    elif not inference and model.cfg.train_rnn_impl == "fused":
        # custom-VJP fused layout: hoisted input GEMM + sequence-sized
        # weight-gradient GEMMs (grad-parity-tested vs scan + torch)
        h_last, hs = lstm_forward_fused(params["lstm"], x, lengths,
                                        model.compute_dtype)
    else:
        h_last, hs = lstm_forward(params["lstm"], x, lengths,
                                  model.compute_dtype)
    if model.cfg.query_pool == "mean":
        if want_kernel:
            # fused-pool kernel already returned the masked mean [B, H]
            h = hs
        else:
            # length-masked mean over hidden states.  hs at t >= length
            # holds the FROZEN carry (the trunk keeps h at each sequence's
            # last live value), so the mask is required for correctness,
            # not hygiene.
            h = masked_mean_pool(hs, lengths)
    elif model.cfg.query_pool == "attn":
        # learned attention over hidden states: one scoring vector, masked
        # softmax over live timesteps.  ZERO-initialized, so step 0 is
        # exactly the masked mean (the measured-best fixed pool) and
        # training can only move away from it if the data earns it.
        T = hs.shape[1]
        mask = jnp.arange(T)[None, :] < lengths[:, None]
        scores = jnp.einsum(
            "bth,h->bt", hs, params["query_attn"].astype(hs.dtype))
        w = jax.nn.softmax(jnp.where(mask, scores, -1e30), axis=1)
        h = jnp.einsum("bt,bth->bh", w, hs)
    elif model.cfg.query_pool == "last":
        h = h_last
    else:
        raise ValueError(f"unknown query_pool {model.cfg.query_pool!r}")
    rate = model.cfg.query_dropout
    if dropout_rng is not None and rate > 0.0 and not inference:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - rate, h.shape)
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    return h


def _maybe_normalize(cfg: ModelConfig, v: jnp.ndarray) -> jnp.ndarray:
    if cfg.normalize_embeddings:
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
    return v


def embed_queries(
    params: Dict, model: Model, tokens: jnp.ndarray, lengths: jnp.ndarray,
    inference: bool = False, rnn_kernel: Optional[str] = None,
) -> jnp.ndarray:
    """tokens [B, T] int32, lengths [B] -> [B, d] float32 (shared projection).

    ``inference=True`` engages the Pallas VMEM-resident-weight RNN kernel
    (per use_pallas dispatch, overridable via ``rnn_kernel``); training
    always differentiates through the lax.scan twin — the two are
    parity-tested interchangeable.
    """
    if model.cfg.per_stream_query_proj:
        raise ValueError(
            "per_stream_query_proj=True: use embed_queries_multi()"
        )
    h_last = _query_hidden(params, model, tokens, lengths, inference,
                           rnn_kernel=rnn_kernel)
    q = _linear(params["query_proj"], h_last, model.compute_dtype)
    return _maybe_normalize(model.cfg, q)


def embed_queries_multi(
    params: Dict, model: Model, tokens: jnp.ndarray, lengths: jnp.ndarray,
    inference: bool = False, dropout_rng: Optional[jnp.ndarray] = None,
    rnn_kernel: Optional[str] = None,
) -> jnp.ndarray:
    """Per-stream query embeddings [S, B, d].

    With the shared projection (default) all stream rows are identical; with
    ``per_stream_query_proj`` each stream applies its own FC over the shared
    LSTM trunk (MCN's separately-trained-towers topology)."""
    h_last = _query_hidden(params, model, tokens, lengths, inference,
                           dropout_rng, rnn_kernel=rnn_kernel)
    cfg = model.cfg
    if cfg.per_stream_query_proj:
        qs = [
            _maybe_normalize(
                cfg, _linear(params[f"query_proj_{s}"], h_last, model.compute_dtype)
            )
            for s in model.streams
        ]
        return jnp.stack(qs)
    q = _maybe_normalize(
        cfg, _linear(params["query_proj"], h_last, model.compute_dtype)
    )
    return jnp.stack([q for _ in model.streams])


def _pool_segments(pool_matrix, feats, compute_dtype):
    """[P, C] (or per-video [B, P, C]) x [B, C, F] -> [B, P, F] — segment
    mean pooling as one matmul."""
    eq = "pc,bcf->bpf" if pool_matrix.ndim == 2 else "bpc,bcf->bpf"
    return jnp.einsum(
        eq,
        pool_matrix.astype(compute_dtype),
        feats.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _segment_max(pool_matrix, feats):
    """Segment max pooling (ModelConfig.pooling='max' parity flag).

    The span membership indicator is recovered from the (mean or per-video)
    pooling matrix's nonzero pattern; rows outside a span contribute -inf.
    """
    ind = pool_matrix > 0                                   # [P, C] or [B, P, C]
    if ind.ndim == 2:
        masked = jnp.where(
            ind[None, :, :, None], feats[:, None, :, :], -jnp.inf
        )                                                   # [B, P, C, F]
    else:
        masked = jnp.where(ind[:, :, :, None], feats[:, None, :, :], -jnp.inf)
    out = jnp.max(masked, axis=2)
    # spans with no member rows (padded bank windows) pool to 0, not -inf
    return jnp.where(jnp.isfinite(out), out, 0.0)


def embed_moments(
    params: Dict,
    model: Model,
    feats: Dict[str, jnp.ndarray],    # stream -> [B, C, F]
    tef: Optional[jnp.ndarray] = None,        # [B, P, 2] overrides static TEF
    context_mask: Optional[jnp.ndarray] = None,  # [B, C] valid-row mask
    pool_matrix: Optional[jnp.ndarray] = None,   # [B?, P, C] override
    impl: Optional[str] = None,        # override cfg.moment_impl
) -> Dict[str, jnp.ndarray]:
    """Per-stream moment embeddings: stream -> [B, P, d].

    Two mathematically identical implementations (parity-tested):

    "factored" (default, TPU-first): because segment pooling and the
      projection are both linear, ``concat(local, global, tef) @ W`` =
      ``poolmix(feats @ W_local) + mean(feats @ W_global) + tef @ W_tef``.
      The expensive GEMM becomes ``[B*C, F] @ [F, 2d]`` — independent of the
      proposal count P — and the pool mix runs in joint space (d << F).
      For DiDeMo (P=21, C=6, F=2048, d=128) this is ~3.5x fewer FLOPs than
      the direct order and needs no [B, P, 2F+2] intermediate in HBM.

    "direct": the textbook order (pool in feature space, concat, project).
    """
    cfg = model.cfg
    which = impl or cfg.moment_impl
    if cfg.pooling == "max":
        which = "direct"  # max pooling is nonlinear — cannot factor
    if which == "factored":
        return _embed_moments_factored(params, model, feats, tef, context_mask,
                                       pool_matrix)
    cdt = model.compute_dtype
    pm = pool_matrix if pool_matrix is not None else model.pool_matrix
    out = {}
    for s in model.streams:
        f = feats[s]
        B = f.shape[0]
        if cfg.pooling == "max":
            local = _segment_max(pm, f)                        # [B, P, F]
        else:
            local = _pool_segments(pm, f, cdt)                 # [B, P, F]
        P = local.shape[1]
        parts = [local]
        if cfg.use_global_context:
            parts.append(
                jnp.broadcast_to(
                    _global_context(f, context_mask)[:, None, :], local.shape
                )
            )
        if cfg.use_tef:
            t = _resolve_tef(model, tef, B, P)
            parts.append(t)
        x = jnp.concatenate(parts, axis=-1)                    # [B, P, D_in]
        m_emb = _linear(params[f"moment_proj_{s}"], x, cdt)    # [B, P, d]
        if cfg.normalize_embeddings:
            m_emb = m_emb / (jnp.linalg.norm(m_emb, axis=-1, keepdims=True) + 1e-8)
        out[s] = m_emb
    return out


def _global_context(f, context_mask):
    if context_mask is not None:
        m = context_mask.astype(jnp.float32)
        return (f * m[:, :, None]).sum(1) / (m.sum(1, keepdims=True) + 1e-6)
    return f.mean(axis=1)


def _resolve_tef(model, tef, B, P):
    t = tef if tef is not None else model.tef
    if t is None:
        raise ValueError("use_tef=True but no TEF table provided")
    if t.ndim == 2:
        t = jnp.broadcast_to(t[None], (B, P, 2))
    return t.astype(jnp.float32)


def _split_moment_proj(cfg: ModelConfig, w: jnp.ndarray):
    """Split the [D_in, d] projection into (W_local, W_global, W_tef) rows
    matching the concat order local | global | tef."""
    F = (w.shape[0] - (2 if cfg.use_tef else 0)) // (
        2 if cfg.use_global_context else 1
    )
    w_local = w[:F]
    off = F
    w_global = None
    if cfg.use_global_context:
        w_global = w[off : off + F]
        off += F
    w_tef = w[off:] if cfg.use_tef else None
    return w_local, w_global, w_tef


def _embed_moments_factored(
    params, model: Model, feats, tef, context_mask, pool_matrix
):
    cfg = model.cfg
    cdt = model.compute_dtype
    pm = (pool_matrix if pool_matrix is not None else model.pool_matrix)
    P = pm.shape[-2]
    out = {}
    for s in model.streams:
        f = feats[s]                                           # [B, C, F]
        B, C, F = f.shape
        p = params[f"moment_proj_{s}"]
        w_local, w_global, w_tef = _split_moment_proj(cfg, p["w"])
        if w_global is not None:
            # one GEMM for both branches: [B*C, F] @ [F, 2d]
            w_cat = jnp.concatenate([w_local, w_global], axis=1)
            z = jnp.dot(
                f.reshape(B * C, F).astype(cdt), w_cat.astype(cdt),
                preferred_element_type=jnp.float32,
            ).reshape(B, C, -1)
            d = z.shape[-1] // 2
            z_local, z_global = z[..., :d], z[..., d:]
        else:
            z_local = jnp.dot(
                f.reshape(B * C, F).astype(cdt), w_local.astype(cdt),
                preferred_element_type=jnp.float32,
            ).reshape(B, C, -1)
            z_global = None
        # pool mix in joint space: [P, C] x [B, C, d] -> [B, P, d]
        m_emb = jnp.einsum(
            "...pc,bcd->bpd" if pm.ndim == 2 else "bpc,bcd->bpd",
            pm.astype(jnp.float32), z_local,
        )
        if z_global is not None:
            g = _global_context(z_global, context_mask)        # [B, d]
            m_emb = m_emb + g[:, None, :]
        if cfg.use_tef:
            t = _resolve_tef(model, tef, B, P)                 # [B, P, 2]
            m_emb = m_emb + jnp.einsum("bpt,td->bpd", t, w_tef.astype(jnp.float32))
        m_emb = m_emb + p["b"]
        if cfg.normalize_embeddings:
            m_emb = m_emb / (jnp.linalg.norm(m_emb, axis=-1, keepdims=True) + 1e-8)
        out[s] = m_emb
    return out


def _sq_dist(q, m):
    """q [..., d], m [..., d] -> squared euclidean distance [...]."""
    diff = q - m
    return jnp.sum(diff * diff, axis=-1)


def fused_distances(
    model: Model,
    q: jnp.ndarray,                       # [B, d] or per-stream [S, B, d]
    moments: Dict[str, jnp.ndarray],      # stream -> [B, P, d]
) -> jnp.ndarray:
    """Fused per-proposal distance D [B, P]; smaller = better match."""
    cfg = model.cfg
    D = None
    for i, (w, s) in enumerate(zip(cfg.stream_weights, model.streams)):
        q_s = q[i] if q.ndim == 3 else q
        d_s = _stream_distance(cfg, q_s[:, None, :], moments[s])
        D = w * d_s if D is None else D + w * d_s
    return D


def cross_distances(
    model: Model,
    q: jnp.ndarray,                       # [Q, d] or per-stream [S, Q, d]
    moments: Dict[str, jnp.ndarray],      # stream -> [V, P, d]
) -> jnp.ndarray:
    """Full query x corpus distance tensor [Q, V, P] via ONE MXU matmul per
    stream: ||q - m||^2 = |q|^2 + |m|^2 - 2 q.m  (BASELINE.json:5,10)."""
    cfg = model.cfg
    cdt = model.compute_dtype
    per_stream_q = q.ndim == 3
    Q = q.shape[1] if per_stream_q else q.shape[0]
    out = None
    for i, (w, s) in enumerate(zip(cfg.stream_weights, model.streams)):
        m = moments[s]
        if per_stream_q:
            q_i = q[i]
        else:
            q_i = q
        V, P, d = m.shape
        flat = m.reshape(V * P, d)
        if cfg.distance == "cosine":
            qn = q_i / (jnp.linalg.norm(q_i, axis=-1, keepdims=True) + 1e-8)
            fn = flat / (jnp.linalg.norm(flat, axis=-1, keepdims=True) + 1e-8)
            sim = jnp.dot(qn.astype(cdt), fn.T.astype(cdt),
                          preferred_element_type=jnp.float32)
            d_s = 1.0 - sim
        else:
            qm = jnp.dot(q_i.astype(cdt), flat.T.astype(cdt),
                         preferred_element_type=jnp.float32)     # [Q, V*P]
            q_sq = jnp.sum(q_i * q_i, axis=-1)[:, None]
            m_sq = jnp.sum(flat * flat, axis=-1)[None, :]
            d_s = q_sq + m_sq - 2.0 * qm
            d_s = jnp.maximum(d_s, 0.0)
            if cfg.distance == "euclidean":
                d_s = jnp.sqrt(d_s + 1e-12)
        out_s = d_s.reshape(Q, V, P)
        out = w * out_s if out is None else out + w * out_s
    return out


def _stream_distance(cfg: ModelConfig, q, m):
    if cfg.distance == "sqeuclidean":
        return _sq_dist(q, m)
    if cfg.distance == "euclidean":
        return jnp.sqrt(_sq_dist(q, m) + 1e-12)
    if cfg.distance == "cosine":
        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        mn = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-8)
        return 1.0 - jnp.sum(qn * mn, axis=-1)
    raise ValueError(f"unknown distance {cfg.distance!r}")
