"""Probe: bf16 compute_dtype for the TRAINING step (f32 params + f32 MXU
accumulation, bf16 matmul inputs).  All matmuls already route through
ModelConfig.compute_dtype; training presets run f32 today.  v5e bf16 MXU
peak is 4x the f32-effective peak, so if the step is MXU-bound this is the
single biggest training-throughput lever left.

Measures full fwd+bwd+adam math per step (didemo_fusion dims, B=64) with
token perturbation, f32 vs bf16, plus a loose gradient-direction sanity
check (cosine similarity of flattened grads).
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import loss_from_batch
from vfr_tpu.utils.timing import device_seconds_per_iter

B, T, C, F = 64, 24, 6, 2048
VOCAB = 1024


def build(compute_dtype, rnn_impl="fused"):
    cfg = get_preset("didemo_fusion")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype=compute_dtype,
                                       train_rnn_impl=rnn_impl))
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    return cfg, model, params


rng = np.random.default_rng(1)
batch_np = {
    "tokens": rng.integers(1, VOCAB, size=(B, T)).astype(np.int32),
    "lengths": rng.integers(4, T + 1, size=(B,)).astype(np.int32),
    "rgb": rng.standard_normal((B, C, F)).astype(np.float32),
    "flow": rng.standard_normal((B, C, F)).astype(np.float32),
    "target": rng.integers(0, 21, size=(B,)).astype(np.int32),
    "video_idx": np.arange(B, dtype=np.int32),
}


def step_body(cfg, model, params, opt, opt_state):
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def body(i, tokens):
        b = dict(batch)
        b["tokens"] = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_from_batch(p, model, cfg.train, b),
            has_aux=True)(params)
        updates, _ = opt.update(grads, opt_state, params)
        leaves = jax.tree.leaves(updates)
        return jnp.stack([jnp.sum(jnp.abs(l)) for l in leaves]) + loss
    return body


def grads_of(cfg, model, params):
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    @jax.jit
    def g(p):
        return jax.grad(
            lambda pp: loss_from_batch(pp, model, cfg.train, batch)[0])(p)
    return g(params)


out = {}
gvecs = {}
for dt in ("float32", "bfloat16"):
    cfg, model, params = build(dt)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    tokens0 = jnp.asarray(batch_np["tokens"])
    print(f"timing {dt}...", file=sys.stderr, flush=True)
    sec = device_seconds_per_iter(
        step_body(cfg, model, params, opt, opt_state), tokens0)
    out[f"step_ms_{dt}"] = round(1e3 * sec, 4)
    out[f"queries_per_sec_{dt}"] = round(B / sec, 1)
    g = grads_of(cfg, model, params)
    gvecs[dt] = np.concatenate(
        [np.asarray(l, np.float64).ravel() for l in jax.tree.leaves(g)])

a, b = gvecs["float32"], gvecs["bfloat16"]
out["grad_cosine_f32_vs_bf16"] = round(
    float((a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)), 6)
out["speedup"] = round(out["step_ms_float32"] / out["step_ms_bfloat16"], 3)
print(json.dumps(out, indent=1))
