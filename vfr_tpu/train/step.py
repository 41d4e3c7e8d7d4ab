"""The jitted train step: fwd + bwd + optax update in ONE compiled program.

Batch assembly stays on host (numpy gathers); everything below it — query
LSTM, moment pooling, the [B,B,P] cross-distance matmul, ranking loss,
autodiff, optimizer — is a single XLA computation (SURVEY.md §3.1).

``make_train_step(..., mesh=...)`` returns a data-parallel variant: the
batch is sharded over the mesh's "data" axis with replicated params;
jit + NamedSharding constraints make XLA insert the gradient psum over ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from vfr_tpu.config import TrainConfig
from vfr_tpu.models.mcn import Model, embed_moments, embed_queries_multi
from vfr_tpu.train.loss import compute_loss


def loss_from_batch(
    params: Dict, model: Model, tcfg: TrainConfig,
    batch: Dict[str, jnp.ndarray], dropout_rng=None,
    feature_banks: Optional[Dict[str, jnp.ndarray]] = None,
):
    if feature_banks is not None:
        # device-resident corpus features: the batch carries only video ids
        # and the gather happens in HBM — per-step H2D traffic is a few KB
        # of ids instead of MBs of (per-query duplicated) features
        feats = {
            s: jnp.take(feature_banks[s], batch["video_idx"], axis=0)
            for s in model.streams
        }
    else:
        feats = {s: batch[s] for s in model.streams}
    q = embed_queries_multi(
        params, model, batch["tokens"], batch["lengths"],
        dropout_rng=dropout_rng,
    )
    m = embed_moments(
        params, model, feats,
        tef=batch.get("tef"),
        context_mask=batch.get("context_mask"),
    )
    hard_m, hard_valid = None, None
    hv = batch.get("hard_neg_video")
    if hv is not None and feature_banks is not None:
        # mined hard negatives (train/hard_negatives.py): embed the mined
        # (video, proposal) pairs with CURRENT params from the device-
        # resident banks; gradients flow into the negatives as usual.
        #
        # Only the MINED proposal of each video is embedded: its pooling-
        # matrix row (and TEF row) are gathered so the pool-mix/TEF/bias
        # epilogue runs on [B*Hn, 1, .] instead of all P proposals per
        # mined video (VERDICT r2 #2 — at Charades P=64 the all-P variant
        # did 64x the epilogue work to keep one row).  The clip-projection
        # GEMM is P-independent either way (factored encoder, DESIGN 3).
        # Parity vs the embed-all-P-then-gather path:
        # tests/test_hard_negatives.py::test_mined_row_embedding_parity.
        hp = batch["hard_neg_prop"]
        B, Hn = hv.shape
        hv_safe = jnp.maximum(hv, 0).reshape(-1)
        hp_safe = jnp.maximum(hp, 0).reshape(-1).astype(jnp.int32)
        feats_h = {
            s: jnp.take(feature_banks[s], hv_safe, axis=0)
            for s in model.streams
        }
        pm_h = jnp.take(model.pool_matrix, hp_safe, axis=0)[:, None, :]
        tef_h = None
        if model.cfg.use_tef:
            if "video_tef" in feature_banks:
                # Charades window banks: per-video duration-normalized TEF
                # rides the banks dict under "video_tef" (train/loop.py
                # uploads it) — gather the mined video's row, then the
                # mined window's row
                tef_bank = jnp.take(
                    feature_banks["video_tef"], hv_safe, axis=0
                )                                            # [B*Hn, P, 2]
                tef_h = jnp.take_along_axis(
                    tef_bank, hp_safe[:, None, None], axis=1
                )                                            # [B*Hn, 1, 2]
            else:
                # DiDeMo: static proposal TEF table
                tef_h = jnp.take(model.tef, hp_safe, axis=0)[:, None, :]
        m_h = embed_moments(params, model, feats_h, tef=tef_h,
                            pool_matrix=pm_h)                # [B*Hn, 1, d]
        hard_m = {
            s: m_h[s][:, 0].reshape(B, Hn, -1)
            for s in model.streams
        }
        hard_valid = hv >= 0
    # temperature resolution (infonce): a scheduled per-step tau rides the
    # batch as an operand ("tau_now", train/loop.py anneal — zero
    # recompiles); else the learnable log_tau param; else tcfg.temperature
    if "tau_now" in batch:
        log_tau = jnp.log(batch["tau_now"].astype(jnp.float32))
    else:
        log_tau = params.get("log_tau")
    return compute_loss(
        model, tcfg, q, m,
        target=batch["target"],
        video_idx=batch["video_idx"],
        proposal_mask=batch.get("window_mask"),
        hard_moments=hard_m,
        hard_valid=hard_valid,
        log_tau=log_tau,
    )


def _ema_update(ema, params, decay: float):
    """One Polyak step: ema + (1-d)*(params - ema), element-wise over the
    whole tree (frozen leaves like the GloVe table are fixed points, so
    averaging them is exact, just redundant).  ``decay`` is a Python float
    baked into the program — a fixed decay never recompiles and a swept one
    costs one compile per value, like every other recipe constant."""
    if decay <= 0 or ema is None:
        return ema
    d = jnp.float32(decay)
    return jax.tree.map(lambda e, p: e + (1.0 - d) * (p - e), ema, params)


def make_train_step(
    model: Model,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    feature_banks: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Returns jitted ``train_step``.  Call arity follows ``tcfg.ema_decay``:

    * ``ema_decay == 0``: ``train_step(params, opt_state, batch) ->
      (params, opt_state, metrics)``.
    * ``ema_decay > 0``: ``train_step(params, opt_state, batch, ema) ->
      (params, opt_state, ema, metrics)`` — the Polyak-average tree is a
      required fourth argument (omitting it raises: silently training
      without the average a config asked for is the bug class ADVICE r3
      flagged).

    With ``mesh``, batch arrays are sharded over ``data_axis`` and
    params/optimizer state are replicated (DP over ICI).

    ``feature_banks`` (stream -> [V, C, F], device-resident) switches the
    step to id-gather mode: batches carry ``video_idx`` only and clip
    features never cross the host/device boundary after the one-time bank
    upload."""

    def _step(params, opt_state, ema, batch, dropout_rng, banks):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: loss_from_batch(p, model, tcfg, batch, dropout_rng,
                                      banks),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = _ema_update(ema, params, tcfg.ema_decay)
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, ema, aux

    if mesh is None:
        jitted = jax.jit(_step, donate_argnums=(0, 1, 2))
        banks = feature_banks
    else:
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        batch_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(data_axis)
        )
        jitted = jax.jit(
            _step,
            in_shardings=(repl, repl, repl, batch_sh, repl, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
        )
        banks = (
            jax.device_put(feature_banks, repl)
            if feature_banks is not None
            else None
        )

    def step(params, opt_state, batch, ema=None):
        _check_ema_arg(tcfg, ema)
        batch = dict(batch)
        dropout_rng = batch.pop("dropout_rng", None)
        params, opt_state, ema, aux = jitted(
            params, opt_state, ema, batch, dropout_rng, banks
        )
        if tcfg.ema_decay > 0:
            return params, opt_state, ema, aux
        return params, opt_state, aux

    return step


def _check_ema_arg(tcfg: TrainConfig, ema) -> None:
    """ema_decay > 0 makes the ema tree a REQUIRED call argument: with
    ema=None the update is a silent no-op (``_ema_update`` returns None)
    and a caller configured for averaging would train without it and get
    no signal (ADVICE r3)."""
    if tcfg.ema_decay > 0 and ema is None:
        raise ValueError(
            f"TrainConfig.ema_decay={tcfg.ema_decay} > 0 but no ema tree "
            "was passed to the train step; seed it from the initial params "
            "(ema = jax.tree.map(lambda x: x.copy(), params)) and thread "
            "the returned tree through every call"
        )


def make_train_multi_step(
    model: Model,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    feature_banks: Optional[Dict[str, jnp.ndarray]] = None,
):
    """K fused optimizer steps per dispatch: ``lax.scan`` over a stacked
    chunk of batches inside ONE compiled program.

    Why: per-program dispatch costs dominate this runtime (measured ~8 ms
    launch overhead vs ~0.5 ms of actual step compute at didemo_fusion
    scale); scanning K steps amortizes it K-fold.  Requires device-resident
    ``feature_banks`` so the scanned batch leaves are only ids/tokens.

    Returns ``multi_step(params, opt_state, chunk) -> (params, opt_state,
    aux_mean)`` where ``chunk`` is a batch dict with a leading step axis
    [K, B, ...] (optionally containing ``dropout_rng`` [K, 2]) and
    ``aux_mean`` averages the per-step metrics.  Distinct K values compile
    once each (jit shape cache)."""

    def _multi(params, opt_state, ema, chunk, rngs, banks):
        def body(carry, xs):
            p, s, e = carry
            batch, rng = xs
            (loss, aux), grads = jax.value_and_grad(
                lambda pp: loss_from_batch(pp, model, tcfg, batch, rng, banks),
                has_aux=True,
            )(p)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            e = _ema_update(e, p, tcfg.ema_decay)
            aux["grad_norm"] = optax.global_norm(grads)
            return (p, s, e), aux

        (params, opt_state, ema), auxs = jax.lax.scan(
            body, (params, opt_state, ema), (chunk, rngs)
        )
        aux_mean = jax.tree.map(lambda x: jnp.mean(x, axis=0), auxs)
        return params, opt_state, ema, aux_mean

    if mesh is None:
        jitted = jax.jit(_multi, donate_argnums=(0, 1, 2))
        banks = feature_banks
    else:
        repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        chunk_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, data_axis)
        )
        jitted = jax.jit(
            _multi,
            in_shardings=(repl, repl, repl, chunk_sh, repl, repl),
            out_shardings=(repl, repl, repl, repl),
            donate_argnums=(0, 1, 2),
        )
        banks = (
            jax.device_put(feature_banks, repl)
            if feature_banks is not None
            else None
        )

    def multi_step(params, opt_state, chunk, ema=None):
        _check_ema_arg(tcfg, ema)
        chunk = dict(chunk)
        rngs = chunk.pop("dropout_rng", None)   # [K, 2] or None, replicated
        params, opt_state, ema, aux = jitted(
            params, opt_state, ema, chunk, rngs, banks
        )
        if tcfg.ema_decay > 0:
            return params, opt_state, ema, aux
        return params, opt_state, aux

    # introspection handles (AOT lower/compile, startup probes)
    multi_step.jitted = jitted
    multi_step.banks = banks
    return multi_step
