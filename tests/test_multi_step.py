"""Fused multi-step == K sequential single steps, bit-for-bit params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_multi_step, make_train_step

F, E = 24, 12


def _setup(dropout=0.0, use_flow=False):
    fix = make_didemo_fixture(num_videos=8, num_queries=32, feature_dim=F,
                              glove_dim=E, seed=4, with_flow=use_flow)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=use_flow),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, query_dropout=dropout,
                          stream_weights=(0.5, 0.5) if use_flow else (1.0,)),
        train=TrainConfig(learning_rate=1e-2, margin=0.2),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    return cfg, model, params, ds


@pytest.mark.parametrize("dropout,use_flow", [(0.0, False), (0.3, True)])
def test_multi_step_matches_sequential(dropout, use_flow):
    cfg, model, params, ds = _setup(dropout, use_flow)
    K = 4
    batches = list(ds.train_batches(8, K, seed=0, with_features=False))
    if dropout > 0:
        for i, b in enumerate(batches):
            b["dropout_rng"] = np.asarray([7, i + 1], np.uint32)
    banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}

    opt = make_optimizer(cfg.train)

    # sequential singles (fresh copies: the jitted steps donate args)
    p1 = jax.tree.map(jnp.array, params)
    s1 = opt.init(p1)
    single = make_train_step(model, cfg.train, opt, feature_banks=banks)
    for b in batches:
        p1, s1, aux1 = single(p1, s1, b)

    # one fused call
    p2 = jax.tree.map(jnp.array, params)
    s2 = opt.init(p2)
    multi = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    chunk = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    p2, s2, aux_mean = multi(p2, s2, chunk)

    for k1, k2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=1e-5, atol=1e-6)
    assert np.isfinite(float(aux_mean["loss"]))


def test_multi_step_dp_mesh_matches(devices8):
    from vfr_tpu.parallel.mesh import make_mesh

    cfg, model, params, ds = _setup()
    K = 3
    batches = list(ds.train_batches(16, K, seed=1, with_features=False))
    banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
    opt = make_optimizer(cfg.train)

    p1 = jax.tree.map(jnp.array, params)
    s1 = opt.init(p1)
    multi = make_train_multi_step(model, cfg.train, opt, feature_banks=banks)
    chunk = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    p1, _, _ = multi(p1, s1, chunk)

    mesh = make_mesh(("data",), devices=devices8)
    p2 = jax.tree.map(jnp.array, params)
    s2 = opt.init(p2)
    multi_dp = make_train_multi_step(model, cfg.train, opt, mesh=mesh,
                                     feature_banks=banks)
    p2, _, _ = multi_dp(p2, s2, chunk)

    for k1, k2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                                   rtol=1e-4, atol=1e-5)
