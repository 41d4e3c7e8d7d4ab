"""Parity: factored moment encoder == direct implementation (all flag
combinations), including Charades per-video TEF and context masks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import embed_moments, init_model_params

F, E = 48, 16


@pytest.mark.parametrize("use_tef", [True, False])
@pytest.mark.parametrize("use_global", [True, False])
@pytest.mark.parametrize("use_flow", [True, False])
def test_factored_matches_direct(use_tef, use_global, use_flow):
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=use_flow),
        model=ModelConfig(
            joint_dim=24, lstm_hidden=16, use_tef=use_tef,
            use_global_context=use_global,
            stream_weights=(0.5, 0.5) if use_flow else (1.0,),
        ),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    rng = np.random.default_rng(1)
    B = 5
    feats = {"rgb": jnp.asarray(rng.standard_normal((B, 6, F)), jnp.float32)}
    if use_flow:
        feats["flow"] = jnp.asarray(rng.standard_normal((B, 6, F)), jnp.float32)

    direct = embed_moments(params, model, feats, impl="direct")
    fact = embed_moments(params, model, feats, impl="factored")
    for s in model.streams:
        np.testing.assert_allclose(
            np.asarray(fact[s]), np.asarray(direct[s]), rtol=1e-4, atol=1e-4
        )


def test_factored_matches_direct_with_batch_tef_and_mask():
    """Charades path: per-video TEF [B, P, 2] + context row mask."""
    P, C = 10, 8
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E),
        model=ModelConfig(joint_dim=24, lstm_hidden=16),
    )
    model = build_model(cfg)
    # swap in a custom pool matrix shape [P, C]
    rng = np.random.default_rng(2)
    pm = rng.random((P, C)).astype(np.float32)
    model = model._replace(pool_matrix=jnp.asarray(pm), tef=None)
    glove = rng.standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(1), model, glove, F)

    B = 4
    feats = {"rgb": jnp.asarray(rng.standard_normal((B, C, F)), jnp.float32)}
    tef = jnp.asarray(rng.random((B, P, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((B, C)) > 0.3)

    direct = embed_moments(params, model, feats, tef=tef, context_mask=mask,
                           impl="direct")
    fact = embed_moments(params, model, feats, tef=tef, context_mask=mask,
                         impl="factored")
    np.testing.assert_allclose(
        np.asarray(fact["rgb"]), np.asarray(direct["rgb"]), rtol=1e-4, atol=1e-4
    )


def test_grad_flows_through_factored():
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E),
        model=ModelConfig(joint_dim=16, lstm_hidden=16),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    feats = {"rgb": jnp.ones((2, 6, F), jnp.float32)}

    def loss(p):
        return jnp.sum(embed_moments(p, model, feats)["rgb"] ** 2)

    g = jax.grad(loss)(params)
    gw = np.asarray(g["moment_proj_rgb"]["w"])
    assert np.isfinite(gw).all() and np.abs(gw).max() > 0
