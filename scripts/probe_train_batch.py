"""Probe: training-step scaling with batch size (didemo_fusion dims).

The quality recipe trains at B=64; this measures the pure step compute
(fwd+bwd+adam, fused LSTM path, device-resident-style batch) at larger
batches to document the throughput ceiling of one v5e chip.  The [B,B,P]
cross-distance loss is O(B^2) — this probe shows where it starts to bite.
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

T, C, F = 24, 6, 2048
VOCAB = 1024

cfg = get_preset("didemo_fusion")
model = build_model(cfg)
rng = np.random.default_rng(0)
glove = rng.standard_normal((VOCAB, cfg.data.glove_dim)).astype(np.float32)
params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
opt = make_optimizer(cfg.train)
opt_state = opt.init(params)

out = {}
for B in (64, 128, 256, 512):
    rngb = np.random.default_rng(B)
    batch = {
        "tokens": jnp.asarray(rngb.integers(1, VOCAB, size=(B, T)), jnp.int32),
        "lengths": jnp.asarray(rngb.integers(4, T + 1, size=(B,)), jnp.int32),
        "rgb": jnp.asarray(rngb.standard_normal((B, C, F)), jnp.float32),
        "flow": jnp.asarray(rngb.standard_normal((B, C, F)), jnp.float32),
        "target": jnp.asarray(rngb.integers(0, 21, size=(B,)), jnp.int32),
        "video_idx": jnp.asarray(np.arange(B, dtype=np.int32)),
    }

    def body(i, tokens):
        b = dict(batch)
        b["tokens"] = 1 + (tokens + i.astype(jnp.int32)) % (VOCAB - 1)
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_from_batch(p, model, cfg.train, b),
            has_aux=True)(params)
        updates, _ = opt.update(grads, opt_state, params)
        return jnp.stack(
            [jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(updates)]) + loss

    print(f"timing B={B}...", file=sys.stderr, flush=True)
    sec = device_seconds_per_iter(body, batch["tokens"])
    out[f"B{B}"] = {"step_ms": round(1e3 * sec, 4),
                    "queries_per_sec": round(B / sec, 1)}
print(json.dumps(out, indent=1))
