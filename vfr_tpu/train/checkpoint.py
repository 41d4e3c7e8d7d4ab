"""Checkpoint / resume (SURVEY.md C15, §5).

msgpack checkpoints via ``flax.serialization``: params + optimizer state +
step + the full experiment config JSON, one file per save, with a rolling
retention window.  ``--resume`` restores and continues; eval/serve restore
params only.  (Orbax is available in this image but a single-host research
checkpoint doesn't need async/multihost machinery — this is ~40 lines and
oracle-testable.)
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

from flax import serialization

from vfr_tpu.config import ExperimentConfig

_CKPT_RE = re.compile(r"ckpt_(\d+)\.msgpack$")


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params: Any,
    opt_state: Any,
    config: Optional[ExperimentConfig] = None,
    keep: int = 3,
    ema: Any = None,
    filename: Optional[str] = None,
) -> str:
    """``filename`` overrides the step-stamped name (used for the rolling
    ``best.msgpack``, TrainConfig.best_metric); named checkpoints sit
    outside the retention window and outside ``latest_checkpoint``'s view,
    so ``--resume`` always continues from the step-stamped latest."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "step": step,
        "params": params,
        "opt_state": opt_state,
        "config_json": config.to_json() if config else "",
    }
    if ema is not None:
        # Polyak average (TrainConfig.ema_decay): stored under its own key
        # ONLY when enabled, so ema-off checkpoints keep the original
        # format byte-layout and old checkpoints restore unchanged
        payload["ema"] = ema
    path = os.path.join(ckpt_dir, filename or f"ckpt_{step:08d}.msgpack")
    tmp = path + ".tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)
    except BaseException:
        # same contract as utils/io.atomic_savez: a failed write never
        # leaves a stray/partial temp next to the good checkpoint
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise
    if filename is None:
        _gc(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for fn in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(fn)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(ckpt_dir, fn), int(m.group(1))
    return best


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """The rolling best-val checkpoint written when TrainConfig.best_metric
    is set; None when the run didn't track one."""
    path = os.path.join(ckpt_dir, "best.msgpack")
    return path if os.path.exists(path) else None


def load_payload(path: str) -> dict:
    """ONE msgpack parse of a checkpoint file.  Every restore helper below
    accepts the parsed payload, so callers that need several trees from
    the same file (resume restores params + opt_state + config + ema;
    eval restores config + ema) parse it exactly once — at spec-scale
    checkpoints a second full parse doubles restore time and peak host
    memory (ADVICE r3; the r4 review found resume/eval still paying it
    through separate restore_ema/peek_config file reads)."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _config_of(payload: dict) -> Optional[ExperimentConfig]:
    cj = payload.get("config_json", "")
    return ExperimentConfig.from_json(cj) if cj else None


def peek_config(path: str) -> Optional[ExperimentConfig]:
    """Read the config stored in a checkpoint (no params template needed).
    Lets eval/serve build the structurally-correct template for
    checkpoints whose param tree depends on train config (e.g. the
    learnable log-temperature, train/loop.py::init_train_params) even
    when the caller's CLI flags don't mention it.  Callers that will
    also restore trees should use ``load_payload`` once and pass the
    payload through instead of calling this (it parses the whole file)."""
    return _config_of(load_payload(path))


def restore_ema(path: str, params_template: Any,
                payload: Optional[dict] = None) -> Any:
    """Restore the Polyak-averaged params stored by an ``ema_decay > 0``
    run.  Falls back to the RAW params when the checkpoint predates EMA (or
    was trained with it off) — resuming such a run re-seeds the average
    from the current weights, which is exactly the fresh-start semantics.

    The fallback is WARNED, not silent: the eval/serving path also calls
    this (train/loop.py::load_for_eval), and a checkpoint whose config
    says ema_decay > 0 but lacks the tree (mixed-version or truncated
    file) would otherwise serve raw weights while claiming the average
    (ADVICE r3).  Pass ``payload`` (from ``load_payload``) to reuse an
    already-parsed file."""
    raw = load_payload(path) if payload is None else payload
    if "ema" not in raw:
        import warnings

        warnings.warn(
            f"checkpoint {path} has no 'ema' tree; restoring RAW params "
            "instead of the Polyak average (expected only for checkpoints "
            "written before EMA was enabled)",
            stacklevel=2,
        )
        return serialization.from_state_dict(params_template, raw["params"])
    return serialization.from_state_dict(params_template, raw["ema"])


def restore_checkpoint(
    path: str, params_template: Any, opt_state_template: Any = None,
    payload: Optional[dict] = None,
) -> Tuple[int, Any, Any, Optional[ExperimentConfig]]:
    """Restore into the given pytree templates (shapes/dtypes from init).

    ONE msgpack parse (reusable via ``payload``): the file is deserialized
    once and each tree is restored into its template via
    ``from_state_dict``."""
    stored = load_payload(path) if payload is None else payload
    params = serialization.from_state_dict(params_template, stored["params"])
    opt_state = (
        serialization.from_state_dict(opt_state_template, stored["opt_state"])
        if opt_state_template is not None
        else stored["opt_state"]
    )
    return int(stored["step"]), params, opt_state, _config_of(stored)


def _gc(ckpt_dir: str, keep: int) -> None:
    entries = []
    for fn in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(fn)
        if m:
            entries.append((int(m.group(1)), fn))
    for _, fn in sorted(entries)[:-keep] if keep > 0 else []:
        os.remove(os.path.join(ckpt_dir, fn))
