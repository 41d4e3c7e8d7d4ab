"""Training driver (SURVEY.md C12 / §3.1): epochs, eval, checkpoint, resume.

Host does batch assembly + logging; each step is one compiled XLA program.
The prefetcher keeps ``prefetch_depth`` batches in flight (async H2D) so the
TPU never waits on the host (BASELINE.json:5).
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from vfr_tpu.config import ExperimentConfig
from vfr_tpu.data.loaders import DataBundle, load_datasets
from vfr_tpu.data.prefetch import Prefetcher
from vfr_tpu.eval.moment_eval import evaluate
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_multi_step
from vfr_tpu.utils.logging import MetricsLogger


def init_train_params(rng, model, glove, feature_dim, tcfg):
    """Model params + training-owned parameters.

    Adds the CLIP-style learnable log-temperature (``params["log_tau"]``,
    TrainConfig.learn_temperature) so the SAME template builds at train
    time and at checkpoint-restore time (flax.serialization restores into
    a structural template — eval/serve must construct the identical tree,
    which is why this lives here and both ``train`` and ``load_for_eval``
    call it)."""
    import jax.numpy as jnp

    params = init_model_params(rng, model, glove, feature_dim)
    if tcfg.loss_type == "infonce" and tcfg.learn_temperature:
        params["log_tau"] = jnp.log(jnp.float32(tcfg.temperature))
    return params


def train(
    cfg: ExperimentConfig,
    bundle: Optional[DataBundle] = None,
    resume: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None,
    logger: Optional[MetricsLogger] = None,
    device_banks: Optional[Dict[str, Dict]] = None,
) -> Tuple[Dict, Dict[str, float]]:
    """Run the full training loop; returns (params, final_eval_metrics).

    ``device_banks``: optional {"train": banks, "val": banks} of
    ALREADY-device-resident feature banks (data/features.banks_to_device).
    A caller that needs the banks after training (evaluate /
    corpus_evaluate / mining sweeps) builds them once and injects them —
    the loop then skips its own upload, and the caller's post-train evals
    skip re-shipping ~2 GB of features at spec scale (DESIGN 18).
    """
    tcfg = cfg.train
    if tcfg.best_metric and (
            tcfg.best_metric not in expected_eval_metrics(cfg.eval)):
        # fail BEFORE training: a typo'd metric surfacing at the first
        # eval can be hours into a spec-scale run (eval_every_epochs is
        # raised there precisely because eval is expensive)
        raise KeyError(
            f"best_metric {tcfg.best_metric!r} is not a metric this "
            f"EvalConfig produces; have "
            f"{sorted(expected_eval_metrics(cfg.eval))}")
    from vfr_tpu.config import infonce_tau_warning

    tau_msg = infonce_tau_warning(cfg)
    if tau_msg is not None:
        # warn BEFORE training, for the same reason best_metric validates
        # early: an off-band tau trains all the way into the measured
        # decay/collapse region before anyone sees a bad eval
        import warnings

        warnings.warn(tau_msg, stacklevel=2)
    if bundle is None:
        bundle = load_datasets(cfg.data)
    ds, val_ds = bundle.train, bundle.val
    model = build_model(cfg, dataset=ds)
    own_logger = logger is None
    if own_logger:
        path = tcfg.metrics_path or f"{tcfg.checkpoint_dir}/metrics.jsonl"
        logger = MetricsLogger(path)

    t_setup = time.perf_counter()
    params = init_train_params(
        jax.random.PRNGKey(tcfg.seed), model, bundle.glove,
        bundle.feature_dim, tcfg,
    )
    steps_per_epoch = tcfg.steps_per_epoch or max(
        1, math.ceil(ds.num_queries / tcfg.batch_size)
    )
    total_steps = steps_per_epoch * tcfg.num_epochs
    opt = make_optimizer(tcfg, total_steps)
    opt_state = opt.init(params)
    # Polyak average of the params (TrainConfig.ema_decay): a SEPARATE tree
    # updated inside the fused step; eval/checkpoint/serving read the
    # average, raw params keep training.  Deep-copied so the first donated
    # dispatch doesn't donate the same buffers twice.
    ema = (jax.tree.map(lambda x: x.copy(), params)
           if tcfg.ema_decay > 0 else None)
    start_step = 0
    best_val = float("-inf")   # best-checkpoint tracking (tcfg.best_metric)
    if resume:
        ckpt = latest_checkpoint(tcfg.checkpoint_dir)
        if ckpt:
            from vfr_tpu.train.checkpoint import load_payload, restore_ema

            # ONE msgpack parse of the checkpoint: params + opt_state +
            # ema all restore from the same payload (a per-tree file
            # re-read doubles restore time/memory at spec scale)
            payload = load_payload(ckpt)
            start_step, params, opt_state, _ = restore_checkpoint(
                ckpt, params, opt_state, payload=payload
            )
            if ema is not None:
                ema = restore_ema(ckpt, params, payload=payload)
            del payload
            logger.log("resume", start_step, {"checkpoint": ckpt})
            if tcfg.best_metric:
                # don't let a post-resume eval overwrite best.msgpack with
                # a worse value: recover the best-so-far from the log the
                # run actually writes (the logger's own path — an injected
                # logger may not live at <ckpt_dir>/metrics.jsonl)
                best_val = max(best_val, _best_from_log(
                    getattr(logger, "path", None)
                    or tcfg.metrics_path
                    or f"{tcfg.checkpoint_dir}/metrics.jsonl",
                    tcfg.best_metric))
                if best_val == float("-inf"):
                    import warnings

                    warnings.warn(
                        "resuming a best_metric run but no previous 'best' "
                        "record was found in the metrics log; the first "
                        "post-resume eval will (re)write best.msgpack even "
                        "if it is worse than the historical best",
                        stacklevel=2,
                    )

    # One-time feature upload: the whole corpus' clip features live in HBM
    # for the run; per-step batches carry video ids only (train/step.py).
    import jax.numpy as jnp

    bank_arrays = dict(ds.feature_banks())
    if hasattr(ds, "video_tef"):
        # Charades: per-video TEF bank so mined hard negatives re-embed
        # with the right duration normalization (train/step.py)
        bank_arrays["video_tef"] = ds.video_tef
    val_bank_arrays = dict(val_ds.feature_banks())
    t_banks = time.perf_counter()
    from vfr_tpu.data.features import banks_to_device

    if device_banks is not None:
        train_banks = device_banks["train"]
        val_banks = device_banks["val"]
        missing = set(bank_arrays) - set(train_banks)
        if missing:
            raise ValueError(
                f"injected device_banks['train'] missing keys {missing} "
                f"(Charades needs the video_tef bank — build from the "
                f"dataset's feature_banks() plus video_tef)")
    else:
        train_banks = banks_to_device(bank_arrays, cfg.data.bank_dtype)
        val_banks = banks_to_device(val_bank_arrays, cfg.data.bank_dtype)
    # block_until_ready so bank_upload_s captures the synchronous share of
    # the H2D enqueue.  NOTE: on the axon relay block_until_ready does NOT
    # force execution (DESIGN 19) — the deferred upload+compile backlog
    # drains into the FIRST chunk's step_ms, so read setup numbers as
    # host-side cost, not device truth.
    jax.block_until_ready((train_banks, val_banks))
    bank_mb = sum(
        int(v.nbytes)           # device-array nbytes = bytes shipped
        for d in (train_banks, val_banks) for v in d.values()
    ) / 1e6
    logger.log("setup", start_step, {
        "init_s": round(t_banks - t_setup, 3),
        "bank_upload_s": round(time.perf_counter() - t_banks, 3),
        "bank_mb": round(bank_mb, 3),
    })
    # K optimizer steps fuse into one dispatched program (lax.scan) —
    # program-launch overhead dominates wall time otherwise (train/step.py
    # make_train_multi_step).  Logging/fetch cadence = one chunk.
    K = tcfg.steps_per_call or max(1, min(tcfg.log_every_steps,
                                          steps_per_epoch))
    multi_step_fn = make_train_multi_step(
        model, tcfg, opt, mesh=mesh, feature_banks=train_banks
    )
    step = start_step
    final_metrics: Dict[str, float] = {}

    epoch0 = start_step // steps_per_epoch
    skip0 = start_step % steps_per_epoch   # mid-epoch resume: replay position
    # Per-step dropout keys: fold_in(run_key, absolute_step).  Unique across
    # (epoch, step, resume) by construction — the absolute step index is the
    # fold, so a resumed run sees the exact keys the original would have.
    # Derived on the host CPU backend in ONE vmapped dispatch per epoch (a
    # per-batch fold_in would pay a device dispatch each).
    use_dropout = cfg.model.query_dropout > 0
    if use_dropout:
        _cpu = jax.devices("cpu")[0]
        with jax.default_device(_cpu):
            _run_key = jax.random.PRNGKey(tcfg.seed)
    # temperature anneal (TrainConfig.temperature_final, DESIGN 29):
    # cosine ramp temperature -> temperature_final over all steps, shipped
    # per-step as a batch operand so the schedule never recompiles
    anneal_tau = None
    if tcfg.loss_type == "infonce" and tcfg.temperature_final > 0:
        if tcfg.learn_temperature:
            raise ValueError(
                "temperature_final and learn_temperature are mutually "
                "exclusive (scheduled tau would mask the learned one)")
        _t0, _tf, _T = tcfg.temperature, tcfg.temperature_final, total_steps

        def anneal_tau(abs_step, _t0=_t0, _tf=_tf, _T=_T):
            frac = min(max(abs_step / max(_T - 1, 1), 0.0), 1.0)
            return np.float32(_tf + 0.5 * (_t0 - _tf)
                              * (1.0 + math.cos(math.pi * frac)))

    # index-based hard inter-video negatives (train/hard_negatives.py):
    # re-mined every refresh from the CURRENT params' corpus index
    mined = None
    hn = tcfg.hard_negative_count
    for epoch in range(epoch0, tcfg.num_epochs):
        skip = skip0 if epoch == epoch0 else 0
        if hn > 0 and epoch >= tcfg.hard_negative_start_epoch and (
            mined is None
            or (epoch - tcfg.hard_negative_start_epoch)
            % max(tcfg.hard_negative_refresh_epochs, 1) == 0
        ):
            from vfr_tpu.train.hard_negatives import mine_hard_negatives

            t_mine = time.perf_counter()
            # device-resident banks: the refresh gathers clip features in
            # HBM instead of re-uploading ~100 MB/1k-videos per refresh.
            # Under a DP mesh the refresh's index scan is ICI-sharded over
            # the same devices (the "data" axis doubles as the refresh's
            # corpus axis) — mined pairs are bit-identical either way
            mined = mine_hard_negatives(params, model, ds, hn,
                                        feature_banks=train_banks,
                                        mesh=mesh)
            logger.log("mine", step, {
                "epoch": epoch, "count": hn,
                "mined_valid_frac": float((mined[0] >= 0).mean()),
                # wall cost of the refresh (index rebuild + full-trainset
                # retrieval) — the quality artifacts table this per epoch
                "refresh_s": round(time.perf_counter() - t_mine, 3),
            })
        if use_dropout:
            with jax.default_device(_cpu):
                epoch_keys = np.asarray(jax.vmap(
                    lambda s: jax.random.fold_in(_run_key, s)
                )(np.arange(epoch * steps_per_epoch,
                            (epoch + 1) * steps_per_epoch)))

        def _epoch_chunks(e=epoch, skip=skip, mined=mined):
            buf = []
            for i, b in enumerate(ds.train_batches(
                tcfg.batch_size, steps_per_epoch, seed=tcfg.seed + e,
                sample_targets=(tcfg.target_sampling == "sample"),
                with_features=False,
            )):
                if i < skip:
                    continue      # mid-epoch resume: same sampler order,
                                  # replay exactly the unseen tail
                if use_dropout:
                    b["dropout_rng"] = epoch_keys[i]
                if anneal_tau is not None:
                    b["tau_now"] = anneal_tau(e * steps_per_epoch + i)
                if mined is not None:
                    b["hard_neg_video"] = mined[0][b["query_idx"]]
                    b["hard_neg_prop"] = mined[1][b["query_idx"]]
                buf.append(b)
                if len(buf) == K:
                    yield _stack_chunk(buf)
                    buf = []
            if buf:
                yield _stack_chunk(buf)

        # Under a DP mesh the prefetcher places each chunk with the step's
        # input sharding (batch axis over "data", RNG keys replicated) so
        # the async H2D lands shards directly on their devices — without
        # this every chunk lands on device 0 and jit re-shards it per
        # dispatch, an extra copy on exactly the path prefetch exists to
        # hide (VERDICT r2 #5).
        chunk_sharding = None
        if mesh is not None:
            _repl = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())
            _batch_sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data"))

            def chunk_sharding(chunk):
                return {
                    k: (_repl if k in ("dropout_rng", "tau_now")
                        else _batch_sh)
                    for k in chunk
                }

        chunks = Prefetcher(_epoch_chunks, depth=tcfg.prefetch_depth,
                            sharding=chunk_sharding)
        # One fetch per chunk: a device->host scalar fetch costs ~100 ms of
        # relay round-trip here, and each dispatch ~8 ms — fusing K steps
        # per program and fetching once per chunk amortizes both.  The
        # logged metrics are chunk means; wall time between fetches is
        # honest throughput (the fetch drains the dispatch queue).
        t_last = time.perf_counter()
        try:
            for chunk in chunks:
                k = chunk["tokens"].shape[0]
                if ema is None:
                    params, opt_state, aux = multi_step_fn(
                        params, opt_state, chunk)
                else:
                    params, opt_state, ema, aux = multi_step_fn(
                        params, opt_state, chunk, ema)
                step += k
                loss = float(aux["loss"])        # forces execution
                now = time.perf_counter()
                dt = (now - t_last) / k
                rec = {
                    "epoch": epoch,
                    "loss": loss,
                    "loss_intra": float(aux["loss_intra"]),
                    "loss_inter": float(aux["loss_inter"]),
                    "train_r1": float(aux["train_r1"]),
                    "grad_norm": float(aux["grad_norm"]),
                    "step_ms": 1e3 * dt,
                    "queries_per_sec": tcfg.batch_size / max(dt, 1e-9),
                }
                if "tau" in aux:          # learnable temperature (DESIGN 29)
                    rec["tau"] = float(aux["tau"])
                logger.log("train", step, rec)
                t_last = now
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"loss diverged at step {step}: {loss}"
                    )
        finally:
            chunks.close()   # unblock the producer if we exit early

        if ((epoch + 1) % max(tcfg.eval_every_epochs, 1) == 0
                or epoch == tcfg.num_epochs - 1):
            metrics = evaluate(ema if ema is not None else params, model,
                               val_ds, cfg.eval, feature_banks=val_banks)
            logger.log("eval", step, metrics)
            final_metrics = metrics
            if tcfg.best_metric:
                if tcfg.best_metric not in metrics:
                    raise KeyError(
                        f"best_metric {tcfg.best_metric!r} is not an eval "
                        f"metric; have {sorted(metrics)}")
                val = float(metrics[tcfg.best_metric])
                if val > best_val:
                    best_val = val
                    save_checkpoint(tcfg.checkpoint_dir, step, params,
                                    opt_state, cfg, ema=ema,
                                    filename="best.msgpack")
                    logger.log("best", step, {
                        "metric": tcfg.best_metric, "value": val,
                        "epoch": epoch,
                    })
        if (epoch + 1) % tcfg.checkpoint_every_epochs == 0 or epoch == tcfg.num_epochs - 1:
            save_checkpoint(
                tcfg.checkpoint_dir, step, params, opt_state, cfg,
                keep=tcfg.keep_checkpoints, ema=ema,
            )

    if own_logger:
        logger.close()
    # serving/eval weights: the Polyak average when enabled (raw params can
    # be recovered from the checkpoint, which stores both)
    return (ema if ema is not None else params), final_metrics


def _best_from_log(path: str, metric: str) -> float:
    """Best-so-far value of ``metric`` from a metrics JSONL, tolerating a
    torn trailing line (a crashed run's partial write is exactly the state
    --resume exists for — it must not make resume itself crash)."""
    import json as _json

    best = float("-inf")
    if not os.path.exists(path):
        return best
    with open(path, encoding="utf-8") as f:
        for line in f:
            try:
                r = _json.loads(line)
            except ValueError:
                continue     # torn/partial record from an interrupted run
            if r.get("tag") == "best" and r.get("metric") == metric:
                best = max(best, float(r["value"]))
    return best


def expected_eval_metrics(ecfg) -> set:
    """The metric names evaluate() emits for this EvalConfig — used to
    validate TrainConfig.best_metric BEFORE training starts (a typo'd
    name failing at the first eval can be hours into a spec-scale run)."""
    names = {"mIoU", "num_queries"}
    for k in ecfg.recall_ks:
        for t in ecfg.tiou_thresholds:
            names.add(f"R@{k}_tiou{t}")   # same f-string as moment_eval.py
    if ecfg.protocol == "didemo_official":
        names |= {f"R@{k}_official" for k in ecfg.recall_ks}
        names.add("mIoU_official")
    return names


def load_for_eval(cfg: ExperimentConfig, bundle: Optional[DataBundle] = None,
                  prefer_best: bool = False):
    """Restore the latest checkpoint for eval/serving; returns
    (params, model, bundle).  ``prefer_best`` opens the rolling
    ``best.msgpack`` a ``best_metric`` run tracked (CLI ``--best``) and
    fails loudly when the run didn't track one — silently serving the
    last iterate when the user asked for the best would be the same bug
    class as the silent EMA fallback (ADVICE r3)."""
    if bundle is None:
        bundle = load_datasets(cfg.data)
    model = build_model(cfg, dataset=bundle.train)
    if prefer_best:
        from vfr_tpu.train.checkpoint import best_checkpoint

        ckpt = best_checkpoint(cfg.train.checkpoint_dir)
        if ckpt is None:
            raise FileNotFoundError(
                f"--best requested but {cfg.train.checkpoint_dir}/"
                "best.msgpack does not exist; train with "
                "--best-metric <eval metric> to track one"
            )
    else:
        ckpt = latest_checkpoint(cfg.train.checkpoint_dir)
    # the params TEMPLATE must structurally match what training saved
    # (flax restore-into-template); the checkpoint's own train config is
    # authoritative for training-owned params like log_tau, so eval/serve
    # need no extra CLI flags to open a learnable-temperature checkpoint.
    # ONE msgpack parse: the payload serves config-peek AND tree restore
    # (a peek_config + restore pair re-parses the whole file).
    tcfg_tmpl = cfg.train
    payload = None
    if ckpt:
        from vfr_tpu.train.checkpoint import load_payload, _config_of

        payload = load_payload(ckpt)
        cfg_ckpt = _config_of(payload)
        if cfg_ckpt is not None:
            tcfg_tmpl = cfg_ckpt.train
    params = init_train_params(
        jax.random.PRNGKey(cfg.train.seed), model, bundle.glove,
        bundle.feature_dim, tcfg_tmpl,
    )
    if ckpt:
        if getattr(tcfg_tmpl, "ema_decay", 0.0) > 0:
            # ema_decay run: the Polyak average IS the serving weights
            from vfr_tpu.train.checkpoint import restore_ema

            params = restore_ema(ckpt, params, payload=payload)
        else:
            _, params, _, _ = restore_checkpoint(ckpt, params, None,
                                                 payload=payload)
    return params, model, bundle

def _stack_chunk(batches):
    """Stack a list of batch dicts along a new leading step axis [K, ...]."""
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)
