#!/usr/bin/env python
"""Probe: does the EXACT one-matmul scan hold the HBM roofline as the
corpus grows toward single-chip HBM capacity?

The coarse-to-fine experiments (artifacts/coarse_scale.json, DESIGN 21)
concluded the exact scan is the right default at achievable recall; this
probe underwrites the scaling claim: batch time should grow linearly at
~N x (2 x D + eps) bytes / 819 GB/s with recall 1.0 by construction,
up to ~31M rows (16 GB of bf16 index) per chip — corpora beyond that
shard over ICI (sharded_corpus_topk_cat).
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

P, d, S = 21, 128, 2
Q, K = 128, 100
FEAT, VOCAB = 2048, 4096


def main():
    from vfr_tpu.config import get_preset
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.utils.timing import device_seconds_per_iter

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    on_tpu = jax.default_backend() == "tpu"
    out = {"backend": jax.default_backend(), "grid": {}}
    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
    lengths = jnp.asarray(
        rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)

    from vfr_tpu.eval.corpus import _embed_query_streams
    from vfr_tpu.ops.topk import top_k_select
    from vfr_tpu.parallel.sharding import (
        fused_corpus_scores,
        query_sq_const,
    )

    weights = jnp.asarray(cfg.model.stream_weights, jnp.float32)

    def score_fn(m_cat, msq_fused, params, toks, lens):
        # the one-matmul score+topk body (same math as
        # _score_topk_with_operands; rebuilt here so the 4.3 GB operand
        # is constructed DIRECTLY, no [S, N, d] index staging copy)
        qs = _embed_query_streams(params, model, toks, lens, None)
        scores = fused_corpus_scores(qs, m_cat, msq_fused, weights,
                                     model.compute_dtype)
        vals, rows = top_k_select(scores, K, "approx",
                                  cfg.eval.approx_recall)
        return query_sq_const(qs, weights)[:, None] - vals, rows

    @jax.jit
    def _chunk(x):                      # [n, S*d] f32 -> bf16 + fused norm
        c = x.astype(jnp.bfloat16)
        sq = jnp.sum(
            (c.astype(jnp.float32).reshape(x.shape[0], S, d) ** 2)
            * weights[None, :, None], axis=(1, 2))
        return c, sq

    videos = (100_000, 200_000, 400_000) if on_tpu else (200,)
    for V in videos:
        N = V * P
        cats, sqs = [], []
        for s0 in range(0, N, 250_000):
            n = min(250_000, N - s0)
            c, sq = _chunk(jnp.asarray(
                rng.standard_normal((n, S * d)).astype(np.float32)))
            cats.append(c)
            sqs.append(sq)
        m_cat = jnp.concatenate(cats, axis=0)       # [N, S*d] bf16
        msq_fused = jnp.concatenate(sqs, axis=0)    # [N] f32
        del cats, sqs

        def body(i, toks, m_cat, msq_fused):
            t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
            dists, rows = score_fn(m_cat, msq_fused, params, t, lengths)
            return dists

        sec = device_seconds_per_iter(body, tokens,
                                      operands=(m_cat, msq_fused))
        hbm_gb = N * (2 * 2 * d + 4) / 1e9
        sol = hbm_gb / 819.0
        out["grid"][f"rows_{N}"] = {
            "index_gb": round(hbm_gb, 2),
            "batch_ms": round(1e3 * sec, 3),
            "sol_ms": round(1e3 * sol, 3),
            "hbm_util_pct": round(100 * sol / sec, 1),
            "per_query_rate": round(N / sec, 1),
            "us_per_query": round(1e6 * sec / Q, 2),
        }
        print(N, out["grid"][f"rows_{N}"], file=sys.stderr, flush=True)
        del m_cat, msq_fused

    path = os.path.join(ROOT, "artifacts", "exact_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
