#!/usr/bin/env python
"""Serving-path throughput benchmark (BASELINE.json:5 target: >100k moment
proposals scored per query per chip per second).

Measures the full corpus-retrieval serving path on the cached
moment-embedding index of a 10k-video corpus (210k moments, two streams,
joint dim 128): query-batch GloVe->LSTM encode (Pallas VMEM-resident-weight
kernel) + fused two-stream distance kernel against all index rows + top-100,
end-to-end with block_until_ready.

Reported value = (queries * index_rows) / wall_seconds — i.e. how many
proposal scorings one chip sustains per second while answering queries at
batch rate; a single query's 210k-proposal search amortizes to value/Q
seconds.  vs_baseline = value / 100_000 (the spec floor).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vfr_tpu.config import get_preset
    from vfr_tpu.eval.corpus import MomentIndex, make_retriever
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # serving_10k scale on TPU; trimmed on CPU so CI stays fast
    V = 10_000 if on_tpu else 500
    P, d, S = 21, 128, 2
    Q = 128
    K = 100
    FEAT = 2048

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((4096, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    N = V * P
    index = MomentIndex(
        m=jnp.asarray(rng.standard_normal((S, N, d)), jnp.float32),
        m_sq=None,
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.zeros(P), np.ones(P)], -1).astype(np.float32), (V, 1)
        ),
        weights=jnp.asarray(cfg.model.stream_weights, jnp.float32),
    )
    index.m_sq = jnp.sum(index.m * index.m, axis=-1)

    tokens = jnp.asarray(
        rng.integers(1, 4096, size=(Q, cfg.data.max_query_len)), jnp.int32
    )
    lengths = jnp.asarray(rng.integers(4, cfg.data.max_query_len + 1, Q),
                          jnp.int32)

    retrieve = make_retriever(model, index, K)

    # warmup / compile
    for _ in range(3):
        dists, rows = retrieve(params, tokens, lengths)
        jax.block_until_ready((dists, rows))

    iters = 30 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        dists, rows = retrieve(params, tokens, lengths)
    jax.block_until_ready((dists, rows))
    dt = (time.perf_counter() - t0) / iters

    scored_per_sec = Q * N / dt
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
            "batch_latency_ms": round(1e3 * dt, 3),
            "per_query_latency_us": round(1e6 * dt / Q, 2),
        },
    }))


if __name__ == "__main__":
    main()
