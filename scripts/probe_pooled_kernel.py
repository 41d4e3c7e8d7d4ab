"""Fused-pool serving kernel probe (round 5).

The flagship recipe (query_pool="mean") paid a measured ~5% serving premium
over serving_10k (BENCH: 0.443 vs 0.422 ms) — suspect stage: the Pallas
LSTM kernel streams every [B, H] step block to HBM and the masked mean
re-reads the [B, T, H] tensor (2*T*B*H*4 bytes of round-trip traffic,
~26 MB at Q=128/T=24/H=1024).  The fused-pool kernel
(ops/pallas/lstm_kernel.py::_kernel_pooled) accumulates the live-step sum
in VMEM scratch and emits the pooled [B, H] directly.

This probe times the flagship ENCODE stage (embed_queries_multi through the
serving kernel — the score stage is untouched by the change) three ways:

  unfused : pool="none" kernel + masked_mean_pool epilogue (the r4 program)
  fused   : pool="mean" kernel (the new program)
  last    : query_pool="last" for scale (the serving_10k encode)

Writes artifacts/pooled_kernel.json.
"""

import json
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.ops.lstm import masked_mean_pool
from vfr_tpu.ops.pallas.lstm_kernel import pallas_lstm
from vfr_tpu.utils.timing import device_seconds_per_iter

Q, FEAT, VOCAB = 128, 2048, 4000


def main():
    global Q
    if len(sys.argv) > 1:
        Q = int(sys.argv[1])
    cfg = get_preset("didemo_flagship")
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, FEAT)
    T = int(cfg.data.max_query_len)
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(Q, T)), jnp.int32)
    lengths = jnp.asarray(rng.integers(4, T + 1, size=(Q,)), jnp.int32)
    proj_w = params["query_proj"]["w"]
    proj_b = params["query_proj"]["b"]
    cdt = model.compute_dtype

    def perturb(i, tok):
        return 1 + (tok + i.astype(jnp.int32)) % (VOCAB - 1)

    def finish(h):
        q = (jnp.dot(h.astype(cdt), proj_w.astype(cdt),
                     preferred_element_type=jnp.float32) + proj_b)
        return jnp.sum(jnp.abs(q))

    def body_unfused(i, tok):
        x = jnp.take(params["embeddings"], perturb(i, tok), axis=0)
        _, hs = pallas_lstm(params["lstm"], x, lengths, cdt, pool="none")
        return finish(masked_mean_pool(hs, lengths))

    def body_fused(i, tok):
        x = jnp.take(params["embeddings"], perturb(i, tok), axis=0)
        _, pooled = pallas_lstm(params["lstm"], x, lengths, cdt, pool="mean")
        return finish(pooled)

    def body_last(i, tok):
        x = jnp.take(params["embeddings"], perturb(i, tok), axis=0)
        h_last, _ = pallas_lstm(params["lstm"], x, lengths, cdt, pool="none")
        return finish(h_last)

    out = {"Q": Q, "T": T, "H": int(cfg.model.lstm_hidden),
           "backend": jax.default_backend()}
    for name, body in [("unfused_mean", body_unfused),
                       ("fused_mean", body_fused),
                       ("last_pool", body_last)]:
        sec = device_seconds_per_iter(body, tokens)
        out[f"{name}_ms"] = round(1e3 * sec, 4)
        print(f"{name}: {1e3 * sec:.4f} ms", flush=True)
    out["fused_speedup"] = round(out["unfused_mean_ms"] / out["fused_mean_ms"],
                                 4)
    out["fused_vs_last"] = round(out["fused_mean_ms"] / out["last_pool_ms"], 4)
    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts" / \
        f"pooled_kernel_q{Q}.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
