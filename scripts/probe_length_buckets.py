"""Length-bucketed serving probe (round 5).

Every serving batch pays the encode recurrence at T = max_query_len (24)
regardless of the queries' true lengths — the padded steps are frozen-carry
no-ops that still run all T gate GEMMs.  `serve --length-buckets` routes
queries to per-bucket programs whose sequence axis is sliced to the bucket
(bit-identical results, tests/test_length_buckets.py), so a T=8 batch pays
8 recurrence steps.

This probe measures the steady-state per-batch device time of the FLAGSHIP
serving program (didemo_flagship: cosine fused score over a bf16
L2-normalized 210k-row index, fused mean-pool Pallas encode, bf16 compute
— the BENCH flagship_serving row) at T in {8, 16, 24}, Q=128, and derives
mixed-workload expectations for two length distributions:

  uniform_4_24 : the bench fixture's uniform[4, 24] lengths
  short_mean8  : every query <= 8 tokens (DiDeMo-like natural queries)

Writes artifacts/length_buckets.json.
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vfr_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp
import ml_dtypes as mld

from vfr_tpu.config import get_preset
from vfr_tpu.eval.corpus import MomentIndex, make_score_topk
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.utils.timing import device_seconds_per_iter

V, P, d, S = 10_000, 21, 128, 2
Q, K, FEAT, VOCAB = 128, 100, 2048, 4096
BUCKETS = (8, 16, 24)


def main():
    global Q
    if len(sys.argv) > 1:
        Q = int(sys.argv[1])
    cfg = get_preset("didemo_flagship")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(3), model, glove, FEAT)

    # cosine index: L2-normalized rows, bf16-quantized ON HOST (the jnp
    # round-trip would ship ~500 MB through the ~10 MB/s relay, DESIGN 40)
    N = V * P
    m32 = rng.standard_normal((S, N, d)).astype(np.float32)
    rows = m32 / (np.linalg.norm(m32, axis=-1, keepdims=True) + 1e-8)
    rows16 = rows.astype(mld.bfloat16).astype(np.float32)
    index = MomentIndex(
        m=jnp.asarray(rows16.astype(mld.bfloat16)),
        m_sq=jnp.asarray((rows16 ** 2).sum(-1)),
        video_row=np.repeat(np.arange(V, dtype=np.int32), P),
        prop_idx=np.tile(np.arange(P, dtype=np.int32), V),
        spans_sec=np.tile(
            np.stack([np.arange(P), np.arange(P) + 1], 1).astype(np.float32),
            (V, 1)),
        weights=np.asarray(cfg.model.stream_weights, np.float32),
    )
    retr = make_score_topk(model, index, K, topk_method="approx",
                           approx_recall=cfg.eval.approx_recall)

    out = {"Q": Q, "rows": N, "backend": jax.default_backend(),
           "config": "didemo_flagship bf16-compute, bf16 cosine index, "
                     "fused mean-pool encode"}
    t_ms = {}
    for T in BUCKETS:
        tokens = jnp.asarray(rng.integers(1, VOCAB, size=(Q, T)), jnp.int32)
        lengths = jnp.asarray(
            rng.integers(max(1, T - 7), T + 1, size=(Q,)), jnp.int32)

        def body(i, toks):
            dists, rws = retr(
                params, 1 + (toks + i.astype(jnp.int32)) % (VOCAB - 1),
                lengths)
            return dists

        sec = device_seconds_per_iter(body, tokens)
        t_ms[T] = 1e3 * sec
        out[f"batch_ms_T{T}"] = round(t_ms[T], 4)
        print(f"T={T}: {t_ms[T]:.4f} ms/batch", flush=True)

    # mixed-workload expectations: each query routes to the smallest bucket
    # >= its length; a batch of same-bucket queries pays that bucket's time
    def mix(shares):
        return round(sum(s * t_ms[T] for T, s in shares.items()), 4)

    lens = np.arange(4, 25)
    share = {8: float(np.mean(lens <= 8)),
             16: float(np.mean((lens > 8) & (lens <= 16))),
             24: float(np.mean(lens > 16))}
    out["uniform_4_24_ms"] = mix(share)
    out["short_mean8_ms"] = out["batch_ms_T8"]
    out["uniform_speedup_vs_T24"] = round(
        out["batch_ms_T24"] / out["uniform_4_24_ms"], 4)
    out["short_speedup_vs_T24"] = round(
        out["batch_ms_T24"] / out["batch_ms_T8"], 4)
    suffix = "" if Q == 128 else f"_q{Q}"
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
        f"length_buckets{suffix}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
