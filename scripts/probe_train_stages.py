"""Probe: where the 0.455 ms train step goes (fwd / bwd / optimizer).

Prefix differencing with the elision-proof harness at didemo_fusion dims,
B=64: forward loss only; + gradients; + adam update math.  Completes the
training perf story (DESIGN 7d/13/14) with a stage table.
"""
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

cfg = get_preset("didemo_fusion")
model = build_model(cfg)
rng = np.random.default_rng(0)
glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
opt = make_optimizer(cfg.train)
opt_state = opt.init(params)

rngb = np.random.default_rng(1)
batch = {
    "tokens": jnp.asarray(rngb.integers(1, VOCAB, size=(B, T)), jnp.int32),
    "lengths": jnp.asarray(rngb.integers(4, T + 1, size=(B,)), jnp.int32),
    "rgb": jnp.asarray(rngb.standard_normal((B, C, F)), jnp.float32),
    "flow": jnp.asarray(rngb.standard_normal((B, C, F)), jnp.float32),
    "target": jnp.asarray(rngb.integers(0, 21, size=(B,)), jnp.int32),
    "video_idx": jnp.asarray(np.arange(B, dtype=np.int32)),
}


def with_tokens(i, tokens):
    b = dict(batch)
    b["tokens"] = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
    return b


def fwd(i, tokens):
    loss, aux = loss_from_batch(params, model, cfg.train, with_tokens(i, tokens))
    return loss


def fwd_bwd(i, tokens):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: loss_from_batch(p, model, cfg.train, with_tokens(i, tokens)),
        has_aux=True)(params)
    return jnp.stack([jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)])


def full(i, tokens):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: loss_from_batch(p, model, cfg.train, with_tokens(i, tokens)),
        has_aux=True)(params)
    updates, _ = opt.update(grads, opt_state, params)
    return jnp.stack([jnp.sum(jnp.abs(u)) for u in jax.tree.leaves(updates)])


toks = batch["tokens"]
sec_f = device_seconds_per_iter(fwd, toks)
sec_fb = device_seconds_per_iter(fwd_bwd, toks)
sec_all = device_seconds_per_iter(full, toks)
print(json.dumps({
    "fwd_ms": round(1e3 * sec_f, 4),
    "bwd_ms": round(1e3 * (sec_fb - sec_f), 4),
    "optimizer_ms": round(1e3 * (sec_all - sec_fb), 4),
    "total_ms": round(1e3 * sec_all, 4),
}, indent=1))
