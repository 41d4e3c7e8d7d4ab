"""Trainable fused LSTM (custom VJP): value + gradient parity.

Three oracles (VERDICT r1 item 3):
  1. forward values vs the lax.scan twin;
  2. gradients (params AND inputs) vs scan autodiff;
  3. gradients vs torch-CPU autograd through torch.nn.LSTM with our params.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.lstm import (
    init_lstm_params,
    lstm_forward,
    lstm_forward_fused,
)

torch = pytest.importorskip("torch")


def _setup(num_layers=1, seed=0, B=4, T=9, E=12, H=16):
    params = init_lstm_params(jax.random.PRNGKey(seed), E, H, num_layers)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    lengths = np.array([T, 5, 1, 7], dtype=np.int32)[:B]
    return params, x, lengths, (B, T, E, H)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_forward_matches_scan(num_layers):
    params, x, lengths, _ = _setup(num_layers)
    h1, hs1 = lstm_forward(params, jnp.asarray(x), jnp.asarray(lengths))
    h2, hs2 = lstm_forward_fused(params, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_grads_match_scan_autodiff(num_layers):
    """Every gradient leaf (weights, biases, inputs) through BOTH outputs
    (h_last and the full hs sequence) must match scan autodiff."""
    params, x, lengths, (B, T, E, H) = _setup(num_layers, seed=3)
    rng = np.random.default_rng(3)
    w_h = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    w_hs = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    lengths_j = jnp.asarray(lengths)

    def make_loss(fn):
        def loss(params, x):
            h_last, hs = fn(params, x, lengths_j)
            return jnp.sum(h_last * w_h) + jnp.sum(hs * w_hs)
        return loss

    l1, g1 = jax.value_and_grad(make_loss(lstm_forward), argnums=(0, 1))(
        params, jnp.asarray(x))
    l2, g2 = jax.value_and_grad(make_loss(lstm_forward_fused), argnums=(0, 1))(
        params, jnp.asarray(x))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_grads_match_torch_autograd():
    """Independent oracle: torch autograd through nn.LSTM with our params,
    grads of sum(h_last * w) wrt all weights and the input."""
    params, x, lengths, (B, T, E, H) = _setup(num_layers=1, seed=5)
    rng = np.random.default_rng(5)
    w = rng.standard_normal((B, H)).astype(np.float32)

    # --- torch side
    m = torch.nn.LSTM(E, H, num_layers=1, batch_first=True)
    p0 = params["layer0"]
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p0["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p0["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p0["b"])))
        m.bias_hh_l0.zero_()
    xt = torch.from_numpy(x).requires_grad_(True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, lengths.tolist(), batch_first=True, enforce_sorted=False
    )
    _, (h_n, _) = m(packed)
    (h_n[-1] * torch.from_numpy(w)).sum().backward()

    # --- fused side
    def loss(params, x):
        h_last, _ = lstm_forward_fused(params, x, jnp.asarray(lengths))
        return jnp.sum(h_last * jnp.asarray(w))

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))
    g0 = g_params["layer0"]
    np.testing.assert_allclose(np.asarray(g0["w_ih"]),
                               m.weight_ih_l0.grad.numpy().T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0["w_hh"]),
                               m.weight_hh_l0.grad.numpy().T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0["b"]),
                               m.bias_ih_l0.grad.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), xt.grad.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_all_frozen_tail_gradient_is_zero():
    """Tokens beyond each length must receive zero input gradient."""
    params, x, lengths, (B, T, E, H) = _setup(num_layers=1, seed=7)

    def loss(x):
        h_last, _ = lstm_forward_fused(params, x, jnp.asarray(lengths))
        return jnp.sum(h_last ** 2)

    g_x = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    for b in range(B):
        np.testing.assert_array_equal(g_x[b, lengths[b]:], 0.0)
        if lengths[b] > 0:
            assert np.abs(g_x[b, : lengths[b]]).max() > 0


def test_train_step_parity_scan_vs_fused():
    """One full ranking-loss train step must produce identical params with
    either LSTM implementation (dispatch via ModelConfig.train_rnn_impl)."""
    import dataclasses

    from vfr_tpu.config import (
        DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params
    from vfr_tpu.train.optim import make_optimizer
    from vfr_tpu.train.step import make_train_step

    F, E = 32, 16
    fix = make_didemo_fixture(num_videos=8, num_queries=32, feature_dim=F,
                              glove_dim=E, seed=21)
    base = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16),
        train=TrainConfig(),
        eval=EvalConfig(),
    )
    outs = {}
    for impl in ("scan", "fused"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, train_rnn_impl=impl)
        )
        ds = DidemoDataset(fix.annotations, fix.rgb, None, fix.vocab, cfg.data)
        model = build_model(cfg)
        params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
        opt = make_optimizer(cfg.train)
        opt_state = opt.init(params)
        step = make_train_step(model, cfg.train, opt)
        for batch in ds.train_batches(batch_size=16, steps=3, seed=0):
            params, opt_state, aux = step(params, opt_state, batch)
        outs[impl] = (params, float(aux["loss"]))

    np.testing.assert_allclose(outs["scan"][1], outs["fused"][1], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs["scan"][0]),
                    jax.tree.leaves(outs["fused"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
