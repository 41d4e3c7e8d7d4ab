"""Polyak parameter averaging (TrainConfig.ema_decay).

The EMA tree rides the fused multi-step scan's carry (train/step.py
``_ema_update``); eval/checkpoint/serving read the average while raw params
keep training.  Covered here:

* EMA math: the fused path's average equals a hand-rolled host-side
  ema + (1-d)*(p-e) over the per-step param trajectory.
* ema_decay=0 keeps the exact pre-EMA API (3-tuple returns) and program.
* Checkpoint round trip: ``save_checkpoint(ema=...)`` + ``restore_ema``
  recover the average; ``restore_checkpoint`` still opens the file
  (extra-key tolerance); ``load_for_eval`` serves the EMA weights.
* DP mesh: the EMA carry is replicated and matches single-device.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_ema,
    save_checkpoint,
)
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_multi_step, make_train_step

F, E = 24, 12
DECAY = 0.9


def _setup(ema_decay=DECAY):
    fix = make_didemo_fixture(num_videos=8, num_queries=32, feature_dim=F,
                              glove_dim=E, seed=4)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(1.0,)),
        train=TrainConfig(learning_rate=1e-2, margin=0.2,
                          ema_decay=ema_decay),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                       cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    return cfg, model, params, ds


def _tree_close(a, b, **kw):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_ema_matches_host_recurrence():
    cfg, model, params, ds = _setup()
    K = 4
    batches = list(ds.train_batches(8, K, seed=0, with_features=False))
    banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
    opt = make_optimizer(cfg.train)

    # host oracle: single steps, averaging the param trajectory by hand
    p1 = jax.tree.map(jnp.array, params)
    s1 = opt.init(p1)
    single = make_train_step(model, dataclasses.replace(cfg.train,
                                                        ema_decay=0.0),
                             opt, feature_banks=banks)
    ema_ref = jax.tree.map(np.asarray, params)
    for b in batches:
        p1, s1, _ = single(p1, s1, b)
        ema_ref = jax.tree.map(
            lambda e, p: e + (1.0 - DECAY) * (np.asarray(p) - e), ema_ref, p1)

    # fused path with the EMA in the scan carry
    p2 = jax.tree.map(jnp.array, params)
    s2 = opt.init(p2)
    e2 = jax.tree.map(jnp.array, params)
    multi = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    chunk = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    p2, s2, e2, aux = multi(p2, s2, chunk, e2)

    _tree_close(p1, p2, rtol=1e-5, atol=1e-6)
    _tree_close(ema_ref, e2, rtol=1e-5, atol=1e-6)
    # the average lags the trajectory — it must differ from the raw params
    flat_p = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(p2)])
    flat_e = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(e2)])
    assert not np.allclose(flat_p, flat_e)
    assert np.isfinite(float(aux["loss"]))


def test_ema_off_keeps_three_tuple_api():
    cfg, model, params, ds = _setup(ema_decay=0.0)
    batches = list(ds.train_batches(8, 2, seed=0, with_features=False))
    banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
    opt = make_optimizer(cfg.train)
    p = jax.tree.map(jnp.array, params)
    s = opt.init(p)
    multi = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    chunk = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    out = multi(p, s, chunk)
    assert len(out) == 3
    single = make_train_step(model, cfg.train, opt, feature_banks=banks)
    out1 = single(*[jax.tree.map(jnp.array, x) for x in (params,)],
                  opt.init(jax.tree.map(jnp.array, params)), batches[0])
    assert len(out1) == 3


def test_ema_checkpoint_round_trip(tmp_path):
    cfg, model, params, ds = _setup()
    ema = jax.tree.map(lambda x: x + 0.5, params)   # distinguishable
    opt = make_optimizer(cfg.train)
    s = opt.init(params)
    path = save_checkpoint(str(tmp_path), 7, params, s, cfg, ema=ema)

    tmpl = jax.tree.map(jnp.zeros_like, params)
    got = restore_ema(path, tmpl)
    _tree_close(ema, got, rtol=0, atol=0)
    # restore_checkpoint tolerates the extra "ema" key and returns RAW params
    step, raw, _, _ = restore_checkpoint(path, tmpl, s)
    assert step == 7
    _tree_close(params, raw, rtol=0, atol=0)

    # pre-EMA checkpoint: restore_ema falls back to the raw params
    path0 = save_checkpoint(str(tmp_path) + "/old", 3, params, s, cfg)
    _tree_close(params, restore_ema(path0, tmpl), rtol=0, atol=0)


def test_load_for_eval_serves_the_average(tmp_path):
    from vfr_tpu.data.loaders import DataBundle
    from vfr_tpu.train.loop import load_for_eval

    cfg, model, params, ds = _setup()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       checkpoint_dir=str(tmp_path)))
    ema = jax.tree.map(lambda x: x + 0.5, params)
    opt = make_optimizer(cfg.train)
    save_checkpoint(str(tmp_path), 7, params, opt.init(params), cfg, ema=ema)

    fix = make_didemo_fixture(num_videos=8, num_queries=32, feature_dim=F,
                              glove_dim=E, seed=4)
    bundle = DataBundle(ds, ds, fix.vocab, fix.glove, F, "synthetic")
    got, _, _ = load_for_eval(cfg, bundle=bundle)
    _tree_close(ema, got, rtol=0, atol=0)


def test_ema_dp_mesh_matches_single(devices8):
    from vfr_tpu.parallel.mesh import make_mesh

    cfg, model, params, ds = _setup()
    batches = list(ds.train_batches(16, 3, seed=1, with_features=False))
    banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
    opt = make_optimizer(cfg.train)
    chunk = jax.tree.map(lambda *xs: np.stack(xs), *batches)

    p1, e1 = (jax.tree.map(jnp.array, params) for _ in range(2))
    multi = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    p1, _, e1, _ = multi(p1, opt.init(p1), chunk, e1)

    mesh = make_mesh(("data",), devices=devices8)
    p2, e2 = (jax.tree.map(jnp.array, params) for _ in range(2))
    multi_dp = make_train_multi_step(model, cfg.train, opt, mesh=mesh,
                                     feature_banks=banks)
    p2, _, e2, _ = multi_dp(p2, opt.init(p2), chunk, e2)

    _tree_close(e1, e2, rtol=1e-4, atol=1e-5)
