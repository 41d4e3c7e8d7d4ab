"""Optimizer factory (SURVEY.md C12): optax chains from TrainConfig."""

from __future__ import annotations

import optax

from vfr_tpu.config import TrainConfig


def make_schedule(tcfg: TrainConfig, total_steps: int = 0):
    base = tcfg.learning_rate
    if tcfg.lr_schedule == "constant":
        sched = optax.constant_schedule(base)
    elif tcfg.lr_schedule == "cosine":
        decay = max(total_steps - tcfg.warmup_steps, 1)
        sched = optax.cosine_decay_schedule(base, decay_steps=decay)
    elif tcfg.lr_schedule == "step":
        every = tcfg.lr_decay_steps or max(total_steps // 3, 1)
        sched = optax.exponential_decay(
            base, transition_steps=every, decay_rate=tcfg.lr_decay_rate,
            staircase=True,
        )
    else:
        raise ValueError(f"unknown lr_schedule {tcfg.lr_schedule!r}")
    if tcfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base, tcfg.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [tcfg.warmup_steps])
    return sched


def _decay_mask(params):
    """adamw weight decay is gradient-independent, so stop_gradient alone
    does not protect the frozen GloVe table — mask it out of decay.  The
    learnable log-temperature is a loss hyperparameter, not a weight;
    decaying it toward 0 would silently drag tau toward 1."""
    return {k: k not in ("embeddings", "log_tau") for k in params}


def make_optimizer(
    tcfg: TrainConfig, total_steps: int = 0, freeze_embeddings: bool = True
) -> optax.GradientTransformation:
    sched = make_schedule(tcfg, total_steps)
    if tcfg.optimizer == "adam":
        core = optax.adam(sched)
    elif tcfg.optimizer == "adamw":
        core = optax.adamw(
            sched, weight_decay=tcfg.weight_decay,
            mask=_decay_mask if freeze_embeddings else None,
        )
    elif tcfg.optimizer == "sgd":
        core = optax.sgd(sched, momentum=tcfg.momentum)
    else:
        raise ValueError(f"unknown optimizer {tcfg.optimizer!r}")
    parts = []
    if tcfg.grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(tcfg.grad_clip_norm))
    parts.append(core)
    return optax.chain(*parts)
