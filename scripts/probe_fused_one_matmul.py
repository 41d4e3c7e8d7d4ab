"""Probe: collapse the per-stream distance epilogue into ONE matmul.

Current fused_corpus_distances runs S=2 separate [Q,d]@[d,N] matmuls and a
per-stream f32 epilogue (q_sq + m_sq - 2qm, weight, accumulate) over the
[Q, N] = [128, 210k] score tensor — ~10 VPU ops/element, which at ~4 Tops/s
VPU explains the 0.31 ms dist+topk stage (matmul FLOPs alone are 0.07 ms).

Algebra: argmax_n ( -sum_s w_s ||q_s - m_n,s||^2 ) =
         argmax_n ( sum_s 2 w_s q_s . m_n,s - msq_fused[n] ),
         msq_fused[n] = sum_s w_s |m_n,s|^2   (query-independent),
and sum_s (2 w_s q_s) . m_n,s = concat_s(2 w_s q_s) @ concat_s(m_n,s)^T.

V1: one [Q, S*d] @ [S*d, N] matmul + ONE broadcast-subtract epilogue.
V2: homogeneous coordinate — append -msq_fused as column S*d of the index
    and 1.0 to the query: scores = matmul, ZERO epilogue (K pads 257->384).
True distances for the returned k rows: sum_s w_s |q_s|^2 - score, applied
to the [Q, k] selection only.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import embed_queries_multi, init_model_params
from vfr_tpu.parallel.sharding import fused_corpus_distances
from vfr_tpu.utils.timing import device_seconds_per_iter

V, P, d, S = 10_000, 21, 128, 2
Q, K = 128, 100
FEAT, VOCAB = 2048, 4096
N = V * P

cfg = get_preset("serving_10k")
model = build_model(cfg)
rng = np.random.default_rng(0)
glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

m32 = rng.standard_normal((S, N, d)).astype(np.float32)
deq = np.asarray(jnp.asarray(m32, jnp.bfloat16).astype(jnp.float32))
m_sq = (deq.astype(np.float64) ** 2).sum(-1).astype(np.float32)   # [S, N]
m16 = jnp.asarray(deq, jnp.bfloat16)                              # [S, N, d]
m_sq_j = jnp.asarray(m_sq)
w = np.asarray(cfg.model.stream_weights, np.float32)
weights = jnp.asarray(w)
cdt = model.compute_dtype

# --- fused index layouts (built once, like the cached moment index) -----
m_cat = jnp.concatenate([m16[s] for s in range(S)], axis=-1)      # [N, S*d]
msq_fused = jnp.asarray((w[:, None] * m_sq).sum(0))               # [N]
# homogeneous: extra column holding -msq_fused (bf16 column!)
m_hom = jnp.concatenate(
    [m_cat, (-msq_fused[:, None]).astype(jnp.bfloat16)], axis=-1) # [N, S*d+1]
# variant: homogeneous with the msq column kept f32 via a SEPARATE matmul
# is pointless; instead V3 keeps column f32 by storing the whole row f32 — skip.

base_tokens = jnp.asarray(
    rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
lengths = jnp.asarray(rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)


def perturb(i, tokens):
    return 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)


def encode(i, tokens):
    return embed_queries_multi(params, model, perturb(i, tokens), lengths,
                               inference=True)


def q_cat_scaled(qs):
    # concat_s(2 w_s q_s): [Q, S*d]
    return jnp.concatenate([2.0 * w[s] * qs[s] for s in range(S)], axis=-1)


def v0_current(i, tokens):
    qs = encode(i, tokens)
    D = fused_corpus_distances(qs, m16, m_sq_j, weights, cdt)
    vals, rows = jax.lax.approx_max_k(-D, K, recall_target=0.95)
    return vals


def v1_one_matmul(i, tokens):
    qs = encode(i, tokens)
    qc = q_cat_scaled(qs).astype(jnp.bfloat16)
    qm = jnp.dot(qc, m_cat.T, preferred_element_type=jnp.float32)  # [Q, N]
    scores = qm - msq_fused[None, :]
    vals, rows = jax.lax.approx_max_k(scores, K, recall_target=0.95)
    return vals


def v2_homogeneous(i, tokens):
    qs = encode(i, tokens)
    qc = q_cat_scaled(qs)
    qh = jnp.concatenate(
        [qc, jnp.ones((qc.shape[0], 1), qc.dtype)], axis=-1
    ).astype(jnp.bfloat16)
    scores = jnp.dot(qh, m_hom.T, preferred_element_type=jnp.float32)
    vals, rows = jax.lax.approx_max_k(scores, K, recall_target=0.95)
    return vals


import sys as _sys
def _p(msg):
    print(msg, file=_sys.stderr, flush=True)
_p("timing encode...")
sec_enc = device_seconds_per_iter(encode, base_tokens)
_p(f"encode {sec_enc*1e3:.4f} ms")
sec_v0 = None
_p("timing v1...")
sec_v1 = device_seconds_per_iter(v1_one_matmul, base_tokens)
_p(f"v1 {sec_v1*1e3:.4f} ms")
_p("timing v2...")
sec_v2 = device_seconds_per_iter(v2_homogeneous, base_tokens)
_p(f"v2 {sec_v2*1e3:.4f} ms")

# ---- ranking agreement vs exact f32-scores on the bf16 index ----------
@jax.jit
def rows_exact(tokens):
    qs = embed_queries_multi(params, model, tokens, lengths, inference=True)
    D = fused_corpus_distances(qs, m16, m_sq_j, weights, cdt)
    return jax.lax.top_k(-D, K)[1]


# build non-perturbed variants for recall (perturb(0) shifts tokens by 1; use
# dedicated closures instead)
@jax.jit
def rows_v1(tokens):
    qs = embed_queries_multi(params, model, tokens, lengths, inference=True)
    qc = q_cat_scaled(qs).astype(jnp.bfloat16)
    qm = jnp.dot(qc, m_cat.T, preferred_element_type=jnp.float32)
    return jax.lax.approx_max_k(qm - msq_fused[None, :], K,
                                recall_target=0.95)[1]


@jax.jit
def rows_v2(tokens):
    qs = embed_queries_multi(params, model, tokens, lengths, inference=True)
    qc = q_cat_scaled(qs)
    qh = jnp.concatenate(
        [qc, jnp.ones((qc.shape[0], 1), qc.dtype)], axis=-1
    ).astype(jnp.bfloat16)
    return jax.lax.approx_max_k(
        jnp.dot(qh, m_hom.T, preferred_element_type=jnp.float32), K,
        recall_target=0.95)[1]


@jax.jit
def rows_v0(tokens):
    qs = embed_queries_multi(params, model, tokens, lengths, inference=True)
    D = fused_corpus_distances(qs, m16, m_sq_j, weights, cdt)
    return jax.lax.approx_max_k(-D, K, recall_target=0.95)[1]


_p("recall: exact...")
re_ = np.asarray(rows_exact(base_tokens))
_p("recall: variants...")
out = {
    "encode_ms": round(1e3 * sec_enc, 4),
    "dist_topk_v0_current_ms": "0.308 (probe 1)",
    "dist_topk_v1_one_matmul_ms": round(1e3 * (sec_v1 - sec_enc), 4),
    "dist_topk_v2_homogeneous_ms": round(1e3 * (sec_v2 - sec_enc), 4),
    "full_v1_ms": round(1e3 * sec_v1, 4),
    "full_v2_ms": round(1e3 * sec_v2, 4),
}
for name, fn in [("v0", rows_v0), ("v1", rows_v1), ("v2", rows_v2)]:
    rr = np.asarray(fn(base_tokens))
    out[f"recall_{name}"] = round(
        float(np.mean([len(set(re_[i]) & set(rr[i])) / K for i in range(Q)])), 4)
    out[f"top1_{name}"] = float(np.mean(rr[:, 0] == re_[:, 0]))
print(json.dumps(out, indent=1))
