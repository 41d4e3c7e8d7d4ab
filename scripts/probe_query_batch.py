#!/usr/bin/env python
"""Probe: serving per-query throughput vs query-batch size Q.

The headline metric is index_rows / per-batch device seconds — encode and
top-k scale linearly with Q, but the score stage streams the WHOLE index
once per batch regardless of Q, so larger batches amortize it.  This probe
measures make_score_topk (the stream retriever's scan body, exactly what
bench.py times) at several Q to find the throughput-mode sweet spot and its
asymptote.

Run on the real chip: python scripts/probe_query_batch.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from vfr_tpu.config import get_preset
from vfr_tpu.eval.corpus import MomentIndex, make_score_topk
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.utils.timing import device_seconds_per_iter


def main():
    on_tpu = jax.default_backend() == "tpu"
    V = 10_000 if on_tpu else 100
    P, d, S = 21, 128, 2
    K = 100
    FEAT = 2048
    VOCAB = 4096

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    N = V * P
    m32 = rng.standard_normal((S, N, d)).astype(np.float32)
    flat = np.asarray(jnp.asarray(m32, jnp.bfloat16).astype(jnp.float32))
    m_sq = (flat.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    index = MomentIndex(
        m=jnp.asarray(flat, jnp.bfloat16),
        m_sq=jnp.asarray(m_sq),
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1),
        ),
        weights=jnp.asarray(cfg.model.stream_weights, jnp.float32),
    )

    retr = make_score_topk(model, index, K,
                           topk_method=cfg.eval.topk_method,
                           approx_recall=cfg.eval.approx_recall)

    T = cfg.data.max_query_len
    out = {}
    for Q in (128, 256, 512, 1024):
        tokens = jnp.asarray(rng.integers(1, VOCAB, size=(Q, T)), jnp.int32)
        lengths = jnp.asarray(rng.integers(4, T + 1, Q), jnp.int32)

        def body(i, toks):
            t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
            dists, rows = retr(params, t, lengths)
            return dists

        sec = device_seconds_per_iter(body, tokens)
        out[Q] = {
            "batch_ms": round(1e3 * sec, 3),
            "per_query_us": round(1e6 * sec / Q, 3),
            "per_query_rate": round(N / sec, 1),
        }
        print(Q, out[Q], flush=True)

    print(json.dumps({"query_batch_sweep": out}))


if __name__ == "__main__":
    main()
