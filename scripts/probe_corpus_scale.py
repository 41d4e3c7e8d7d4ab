"""Probe: serving scaling with corpus size (10k -> 100k videos).

The serving preset benches a 10k-video corpus (210k moments).  This probe
wall-clocks the production make_stream_retriever at 100k videos
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
from vfr_tpu.eval.corpus import MomentIndex
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params

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
    from vfr_tpu.eval.corpus import make_stream_retriever

    retr = make_stream_retriever(model, index, K,
                                 topk_method=cfg.eval.topk_method,
                                 approx_recall=cfg.eval.approx_recall,
                                 # at 2.1M rows the f32 carrier would hold
                                 # a 2.15 GB copy; keep the bf16 buffer
                                 carrier_dtype="bfloat16" if V > 50_000
                                 else "auto")
    # free the per-stream rows: the retriever holds the one-matmul carrier
    index.m, index.m_sq = None, None
    del m16, m_sq

    # wall-clock M-differencing through the ACTUAL stream retriever: one
    # dispatch scans M perturbed batches; execution is forced by fetching
    # the [M, Q, K] result; the M_small run cancels dispatch overhead.
    import time

    toks_np = np.asarray(base_tokens)
    lens_np = np.asarray(lengths)

    consume = jax.jit(lambda d, r: jnp.sum(d) + jnp.sum(r.astype(jnp.float32)))

    def run(M, salt):
        toks = (toks_np[None] + salt + np.arange(M)[:, None, None]
                ) % (VOCAB - 1) + 1
        lens = np.tile(lens_np[None], (M, 1))
        t0 = time.perf_counter()
        d, r = retr(params, jnp.asarray(toks.astype(np.int32)),
                    jnp.asarray(lens))
        # consume to ONE scalar on device: fetching the [M, Q, K] arrays
        # over the relay would swamp the measurement
        float(consume(d, r))
        return time.perf_counter() - t0

    print(f"timing V={V}...", file=sys.stderr, flush=True)
    M_small, M_big = 4, 36 if V > 50_000 else 100
    run(M_big, 0)     # compile + warm the M_big program (and `consume`)
    run(M_small, 0)   # ...and the M_small program, so no rep times a compile
    diffs = []
    for rep in range(3):
        t_small = run(M_small, 1000 * rep + 1)
        t_big = run(M_big, 1000 * rep + 500)
        diffs.append((t_big - t_small) / (M_big - M_small))
    sec = sorted(diffs)[1]
    out[f"V{V}"] = {
        "index_rows": N,
        "batch_latency_ms": round(1e3 * sec, 3),
        "per_query_rate": round(N / sec, 1),
        "aggregate_rate": round(Q * N / sec, 1),
    }
print(json.dumps(out, indent=1))
