#!/usr/bin/env python
"""Serving-path throughput benchmark (BASELINE.json:5 target: >100k moment
proposals scored per query per chip per second).

Measures the full corpus-retrieval serving path against the cached
moment-embedding index of a 10k-video corpus (210k moments, two streams,
joint dim 128): query-batch GloVe->LSTM encode + fused two-stream distance
matmuls over all index rows + hierarchical top-100.

Timing methodology (vfr_tpu/utils/timing.py): on this runtime
``block_until_ready`` does not force execution and same-buffer dispatches
can be elided, so the loop runs INSIDE one compiled program with the loop
index perturbing the query tokens (every iteration encodes a different
batch), the result consumed by an irreducible reduction, execution forced
by a scalar fetch, and a small-iteration baseline subtracted to cancel the
fixed relay overhead.  This reports honest per-batch device time.

Reported value = (queries * index_rows) / device_seconds_per_batch — the
proposal-scoring rate one chip sustains while answering query batches.

Prints ONE JSON line.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vfr_tpu.config import get_preset
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import embed_queries_multi, init_model_params
    from vfr_tpu.ops.topk import top_k_select
    from vfr_tpu.parallel.sharding import fused_corpus_distances
    from vfr_tpu.utils.timing import device_seconds_per_iter

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    V = 10_000 if on_tpu else 500
    P, d, S = 21, 128, 2
    Q = 128
    K = 100
    FEAT = 2048
    VOCAB = 4096

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    N = V * P
    m = jnp.asarray(rng.standard_normal((S, N, d)), jnp.float32)
    m_sq = jnp.sum(m * m, axis=-1)
    weights = jnp.asarray(cfg.model.stream_weights, jnp.float32)
    compute_dtype = model.compute_dtype

    base_tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32
    )
    lengths = jnp.asarray(
        rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32
    )

    def make_serve(method):
        def serve_batch(i, tokens):
            # every iteration serves a DIFFERENT query batch (token
            # perturbation defeats execution elision; per-iteration cost is
            # identical)
            toks = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
            qs = embed_queries_multi(params, model, toks, lengths,
                                     inference=True)
            D = fused_corpus_distances(qs, m, m_sq, weights, compute_dtype)
            dists, rows = top_k_select(-D, K, method,
                                       cfg.eval.approx_recall)
            return dists
        return serve_batch

    # serving_10k preset default: approx top-k (TPU PartialReduce,
    # recall_target 0.95).  BENCH_EXACT=1 also measures the exact-top-k
    # path (adds a second full compile, ~10 min cold on this relay).
    import os

    sec = device_seconds_per_iter(make_serve(cfg.eval.topk_method),
                                  base_tokens)
    sec_exact = None
    if os.environ.get("BENCH_EXACT") == "1" and cfg.eval.topk_method != "exact":
        sec_exact = device_seconds_per_iter(make_serve("exact"), base_tokens)
    elif cfg.eval.topk_method == "exact":
        sec_exact = sec

    scored_per_sec = Q * N / sec
    print(json.dumps({
        "metric": "proposals_scored_per_query_per_chip_per_sec",
        "value": round(scored_per_sec, 1),
        "unit": "proposals/s",
        "vs_baseline": round(scored_per_sec / 100_000.0, 3),
        "detail": {
            "backend": backend,
            "corpus_videos": V,
            "index_rows": N,
            "query_batch": Q,
            "topk": K,
            "topk_method": cfg.eval.topk_method,
            "approx_recall": cfg.eval.approx_recall,
            "batch_latency_ms": round(1e3 * sec, 3),
            "per_query_latency_us": round(1e6 * sec / Q, 2),
            **(
                {
                    "exact_topk_batch_latency_ms": round(1e3 * sec_exact, 3),
                    "exact_topk_proposals_per_sec": round(Q * N / sec_exact, 1),
                }
                if sec_exact is not None
                else {}
            ),
            "timing": "in-program loop, elision-proof (utils/timing.py)",
        },
    }))


if __name__ == "__main__":
    main()
