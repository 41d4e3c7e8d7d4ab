"""Probe: where the 1.242 ms didemo_flagship train step goes.

Prefix differencing with the elision-proof harness at the exact
composition bench.py's flagship_train row measures (B=128, InfoNCE +
cosine + 8 mined hard negatives from device-resident banks + EMA 0.999):
forward loss only; + gradients; + adam update math; + EMA FMA; plus a
mining-off forward twin to isolate the hard-negative embed cost.

Output: one JSON stage table (committed as
artifacts/flagship_train_stages.json, cited by DESIGN 41).
"""
import dataclasses as dc
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vfr_tpu.config import get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import _ema_update, loss_from_batch
from vfr_tpu.utils.timing import device_seconds_per_iter

FEAT = 2048
VOCAB = 1024
V_BANK, HN = 256, 8

cfg = get_preset("didemo_flagship")
B = int(cfg.train.batch_size)
T = int(cfg.data.max_query_len)
model = build_model(cfg)
rng = np.random.default_rng(11)
glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
params = init_model_params(jax.random.PRNGKey(2), model, glove, FEAT)
opt = make_optimizer(cfg.train)
opt_state = opt.init(params)
ema0 = jax.tree.map(lambda x: x, params)
banks = {
    s: jnp.asarray(rng.standard_normal((V_BANK, 6, FEAT)), jnp.float32)
    for s in model.streams
}

batch = {
    "tokens": jnp.asarray(rng.integers(1, VOCAB, size=(B, T)), jnp.int32),
    "lengths": jnp.asarray(rng.integers(4, T + 1, size=(B,)), jnp.int32),
    "target": jnp.asarray(rng.integers(0, 21, size=(B,)), jnp.int32),
    "video_idx": jnp.asarray((np.arange(B) % V_BANK).astype(np.int32)),
    "hard_neg_video": jnp.asarray(
        rng.integers(0, V_BANK, size=(B, HN)), jnp.int32),
    "hard_neg_prop": jnp.asarray(
        rng.integers(0, 21, size=(B, HN)), jnp.int32),
}
batch_nomine = {k: v for k, v in batch.items()
                if not k.startswith("hard_neg")}


def with_tokens(i, tokens, base):
    b = dict(base)
    b["tokens"] = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
    return b


def fwd(i, tokens):
    loss, aux = loss_from_batch(params, model, cfg.train,
                                with_tokens(i, tokens, batch),
                                feature_banks=banks)
    return loss


def fwd_nomine(i, tokens):
    loss, aux = loss_from_batch(params, model, cfg.train,
                                with_tokens(i, tokens, batch_nomine),
                                feature_banks=banks)
    return loss


def fwd_bwd(i, tokens):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: loss_from_batch(p, model, cfg.train,
                                  with_tokens(i, tokens, batch),
                                  feature_banks=banks),
        has_aux=True)(params)
    return jnp.stack([jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)])


def fwd_bwd_opt(i, tokens):
    (loss, aux), grads = jax.value_and_grad(
        lambda p: loss_from_batch(p, model, cfg.train,
                                  with_tokens(i, tokens, batch),
                                  feature_banks=banks),
        has_aux=True)(params)
    updates, _ = opt.update(grads, opt_state, params)
    p2 = optax.apply_updates(params, updates)
    return jnp.stack(
        [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(p2)]) + loss


def full(i, tokens):
    # == bench.py's flagship_train body (the 1.242 ms program)
    (loss, aux), grads = jax.value_and_grad(
        lambda p: loss_from_batch(p, model, cfg.train,
                                  with_tokens(i, tokens, batch),
                                  feature_banks=banks),
        has_aux=True)(params)
    updates, _ = opt.update(grads, opt_state, params)
    p2 = optax.apply_updates(params, updates)
    ema2 = _ema_update(ema0, p2, cfg.train.ema_decay)
    return jnp.stack(
        [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(ema2)]) + loss


toks = batch["tokens"]
sec_f_nm = device_seconds_per_iter(fwd_nomine, toks)
sec_f = device_seconds_per_iter(fwd, toks)
sec_fb = device_seconds_per_iter(fwd_bwd, toks)
sec_fbo = device_seconds_per_iter(fwd_bwd_opt, toks)
sec_all = device_seconds_per_iter(full, toks)

n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
n_emb = int(np.prod(params["embeddings"].shape))
out = {
    "preset": "didemo_flagship",
    "batch": B,
    "hard_negatives": HN,
    "param_count": n_params,
    "frozen_embedding_params": n_emb,
    "fwd_nomine_ms": round(1e3 * sec_f_nm, 4),
    "fwd_ms": round(1e3 * sec_f, 4),
    "mining_fwd_ms": round(1e3 * (sec_f - sec_f_nm), 4),
    "bwd_ms": round(1e3 * (sec_fb - sec_f), 4),
    "optimizer_ms": round(1e3 * (sec_fbo - sec_fb), 4),
    "ema_ms": round(1e3 * (sec_all - sec_fbo), 4),
    "total_ms": round(1e3 * sec_all, 4),
}
print(json.dumps(out, indent=1))
