"""Optimizer factory (SURVEY.md C12): optax chains from TrainConfig."""

from __future__ import annotations

import optax

from vfr_tpu.config import TrainConfig


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    if tcfg.optimizer == "adam":
        core = optax.adam(tcfg.learning_rate)
    elif tcfg.optimizer == "adamw":
        core = optax.adamw(tcfg.learning_rate, weight_decay=tcfg.weight_decay)
    elif tcfg.optimizer == "sgd":
        core = optax.sgd(tcfg.learning_rate, momentum=tcfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {tcfg.optimizer!r}")
    parts = []
    if tcfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(tcfg.grad_clip_norm))
    parts.append(core)
    return optax.chain(*parts)
