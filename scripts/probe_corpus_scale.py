"""Probe: serving scaling with corpus size (10k -> 100k videos).

The serving preset benches a 10k-video corpus (210k moments).  This probe
measures the same production scan body (make_score_topk) at 100k videos
(2.1M moments; bf16 one-matmul operand ~1.08 GB of the 16 GB HBM) to show
the large-scale-serving claim holds an order of magnitude up: the score
stage scales linearly with N at the HBM roofline while encode stays
fixed, so the per-query proposals/sec rate IMPROVES with corpus size.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import get_preset
from vfr_tpu.eval.corpus import MomentIndex, make_score_topk
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.utils.timing import device_seconds_per_iter

P, d, S = 21, 128, 2
Q, K = 128, 100
FEAT, VOCAB = 2048, 4096

cfg = get_preset("serving_10k")
model = build_model(cfg)
rng = np.random.default_rng(0)
glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

base_tokens = jnp.asarray(
    rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
lengths = jnp.asarray(rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)

out = {}
for V in (10_000, 100_000):
    N = V * P
    # build the bf16 index in row blocks to bound host memory
    blocks = []
    step = 500_000
    for s0 in range(0, N, step):
        n = min(step, N - s0)
        blocks.append(np.asarray(
            jnp.asarray(rng.standard_normal((S, n, d)).astype(np.float32),
                        jnp.bfloat16)))
    m16 = jnp.concatenate([jnp.asarray(b) for b in blocks], axis=1)
    del blocks
    m_sq = jnp.sum(m16.astype(jnp.float32) ** 2, axis=-1)
    index = MomentIndex(
        m=m16, m_sq=m_sq,
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1)),
        weights=jnp.asarray(cfg.model.stream_weights, jnp.float32),
    )
    retr = make_score_topk(model, index, K,
                           topk_method=cfg.eval.topk_method,
                           approx_recall=cfg.eval.approx_recall)
    # free the per-stream rows: the retriever holds the one-matmul carrier
    index.m, index.m_sq = None, None
    del m16, m_sq

    def body(i, tokens):
        toks = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
        dists, rows = retr(params, toks, lengths)
        return dists

    print(f"timing V={V}...", file=sys.stderr, flush=True)
    sec = device_seconds_per_iter(body, base_tokens)
    out[f"V{V}"] = {
        "index_rows": N,
        "batch_latency_ms": round(1e3 * sec, 3),
        "per_query_rate": round(N / sec, 1),
        "aggregate_rate": round(Q * N / sec, 1),
    }
print(json.dumps(out, indent=1))
