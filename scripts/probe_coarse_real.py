#!/usr/bin/env python
"""Probe: growing-prefix decomposition of the REAL _coarse_fn at 2.1M
rows (CLI path measured 3.7 ms at C=1024 where the synthetic composed
pipeline predicts ~1.4-1.8)."""

import json
import os
import sys
import time

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
    from vfr_tpu.eval.coarse import build_coarse_index, _blockmax
    from vfr_tpu.eval.corpus import MomentIndex, _embed_query_streams
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.parallel.sharding import query_sq_const
    from vfr_tpu.utils.timing import device_seconds_per_iter

    cfg = get_preset("serving_10k")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)

    on_tpu = jax.default_backend() == "tpu"
    V = 100_000 if on_tpu else 200
    N = V * P
    blocks = []
    for s0 in range(0, N, 500_000):
        n = min(500_000, N - s0)
        blocks.append(jnp.asarray(
            rng.standard_normal((S, n, d)).astype(np.float32), jnp.bfloat16))
    m16 = jnp.concatenate(blocks, axis=1)
    del blocks
    m_sq = jnp.sum(m16.astype(jnp.float32) ** 2, axis=-1)
    index = MomentIndex(
        m=m16, m_sq=m_sq,
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1)),
        weights=np.asarray(cfg.model.stream_weights, np.float32),
    )
    coarse = build_coarse_index(index, d_coarse=32)
    index.m, index.m_sq = None, None
    del m16, m_sq

    tokens = jnp.asarray(
        rng.integers(1, VOCAB, size=(Q, cfg.data.max_query_len)), jnp.int32)
    lengths = jnp.asarray(
        rng.integers(4, cfg.data.max_query_len + 1, Q), jnp.int32)

    w = np.asarray(model.cfg.stream_weights, np.float32)
    sqrt_w = np.sqrt(w.astype(np.float64)).astype(np.float32)
    w_jnp = jnp.asarray(w)
    B = coarse.block_rows
    g = 8
    out = {"N": N, "g": g}

    def embed(i, toks):
        t = 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1)
        return _embed_query_streams(params, model, t, lengths, None)

    sec = device_seconds_per_iter(embed, tokens)
    out["1_embed_ms"] = round(1e3 * sec, 3)
    print(1, out["1_embed_ms"], flush=True)

    def p2(i, toks, m_low, msq_low):
        qs = embed(i, toks)
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)
        q_low = (q_t @ coarse.proj).astype(jnp.float32)
        return _blockmax(q_low, m_low, msq_low, B)

    sec = device_seconds_per_iter(
        p2, tokens, operands=(coarse.m_low, coarse.msq_low))
    out["2_plus_blockmax_ms"] = round(1e3 * sec, 3)
    print(2, out["2_plus_blockmax_ms"], flush=True)

    def p3(i, toks, m_low, msq_low):
        sb = p2(i, toks, m_low, msq_low)
        v, blk = jax.lax.top_k(sb, g)
        return v

    sec = device_seconds_per_iter(
        p3, tokens, operands=(coarse.m_low, coarse.msq_low))
    out["3_plus_topg_ms"] = round(1e3 * sec, 3)
    print(3, out["3_plus_topg_ms"], flush=True)

    def p4(i, toks, m_low, msq_low, m_blk):
        qs = embed(i, toks)
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)
        q_low = (q_t @ coarse.proj).astype(jnp.float32)
        sb = _blockmax(q_low, m_low, msq_low, B)
        _, blk = jax.lax.top_k(sb, g)
        mb = jnp.take(m_blk, blk, axis=0)
        return jnp.sum(mb.astype(jnp.float32), axis=(1, 2))

    sec = device_seconds_per_iter(
        p4, tokens, operands=(coarse.m_low, coarse.msq_low, coarse.m_blk))
    out["4_plus_gather_ms"] = round(1e3 * sec, 3)
    print(4, out["4_plus_gather_ms"], flush=True)

    D = coarse.row_dim

    def p5(i, toks, m_low, msq_low, m_blk, msq_blk):
        qs = embed(i, toks)
        q_t = jnp.concatenate(
            [qs[s] * sqrt_w[s] for s in range(S)], axis=-1)
        q_low = (q_t @ coarse.proj).astype(jnp.float32)
        sb = _blockmax(q_low, m_low, msq_low, B)
        _, blk = jax.lax.top_k(sb, g)
        mb = jnp.take(m_blk, blk, axis=0)
        mc = mb.reshape(Q, g * B, D)
        msq_c = jnp.take(msq_blk, blk, axis=0).reshape(Q, g * B)
        qc = jnp.concatenate(
            [2.0 * w_jnp[s] * qs[s] for s in range(S)], axis=-1)
        s_full = jnp.einsum("qd,qcd->qc", qc.astype(jnp.float32),
                            mc.astype(jnp.float32)) - msq_c
        vals, pos = jax.lax.top_k(s_full, K)
        cand_rows = (blk[:, :, None] * B
                     + jnp.arange(B)[None, None, :]).reshape(Q, g * B)
        rows = jnp.take_along_axis(cand_rows, pos, axis=1)
        dists = query_sq_const(qs, w_jnp)[:, None] - vals
        return dists

    sec = device_seconds_per_iter(
        p5, tokens, operands=(coarse.m_low, coarse.msq_low,
                              coarse.m_blk, coarse.msq_blk))
    out["5_full_ms"] = round(1e3 * sec, 3)
    print(5, out["5_full_ms"], flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
