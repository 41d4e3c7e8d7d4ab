"""Trainable fused GRU (custom VJP): value + gradient parity.

Same oracle chain as tests/test_lstm_fused.py: forward vs the lax.scan
twin, gradients vs scan autodiff, gradients vs torch-CPU autograd through
torch.nn.GRU with our params (torch (r, z, n) layout with separate
b_ih/b_hh — the n-gate's r * (W_hn h + b_hn) term is the part a naive
derivation gets wrong).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.lstm import (
    gru_forward,
    gru_forward_fused,
    init_gru_params,
)

torch = pytest.importorskip("torch")


def _setup(num_layers=1, seed=0, B=4, T=9, E=12, H=16):
    params = init_gru_params(jax.random.PRNGKey(seed), E, H, num_layers)
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    lengths = np.array([T, 5, 1, 7], dtype=np.int32)[:B]
    return params, x, lengths, (B, T, E, H)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_forward_matches_scan(num_layers):
    params, x, lengths, _ = _setup(num_layers)
    h1, hs1 = gru_forward(params, jnp.asarray(x), jnp.asarray(lengths))
    h2, hs2 = gru_forward_fused(params, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hs1), np.asarray(hs2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_grads_match_scan_autodiff(num_layers):
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

    l1, g1 = jax.value_and_grad(make_loss(gru_forward), argnums=(0, 1))(
        params, jnp.asarray(x))
    l2, g2 = jax.value_and_grad(make_loss(gru_forward_fused), argnums=(0, 1))(
        params, jnp.asarray(x))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # rtol matches the torch-oracle test: the hand-written backward
    # reassociates f32 ops (e.g. dh*z + dgh@W^T vs scan's ordering)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)


def test_grads_match_torch_autograd():
    params, x, lengths, (B, T, E, H) = _setup(num_layers=1, seed=5)
    rng = np.random.default_rng(5)
    w = rng.standard_normal((B, H)).astype(np.float32)

    m = torch.nn.GRU(E, H, num_layers=1, batch_first=True)
    p0 = params["layer0"]
    with torch.no_grad():
        m.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p0["w_ih"]).T))
        m.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p0["w_hh"]).T))
        m.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p0["b_ih"])))
        m.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p0["b_hh"])))
    xt = torch.from_numpy(x).requires_grad_(True)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt, lengths.tolist(), batch_first=True, enforce_sorted=False
    )
    _, h_n = m(packed)
    (h_n[-1] * torch.from_numpy(w)).sum().backward()

    def loss(params, x):
        h_last, _ = gru_forward_fused(params, x, jnp.asarray(lengths))
        return jnp.sum(h_last * jnp.asarray(w))

    g_params, g_x = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))
    g0 = g_params["layer0"]
    np.testing.assert_allclose(np.asarray(g0["w_ih"]),
                               m.weight_ih_l0.grad.numpy().T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0["w_hh"]),
                               m.weight_hh_l0.grad.numpy().T,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0["b_ih"]),
                               m.bias_ih_l0.grad.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g0["b_hh"]),
                               m.bias_hh_l0.grad.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_x), xt.grad.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_frozen_tail_gradient_is_zero():
    params, x, lengths, (B, T, E, H) = _setup(num_layers=1, seed=7)

    def loss(x):
        h_last, _ = gru_forward_fused(params, x, jnp.asarray(lengths))
        return jnp.sum(h_last ** 2)

    g_x = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    for b in range(B):
        np.testing.assert_array_equal(g_x[b, lengths[b]:], 0.0)
        if lengths[b] > 0:
            assert np.abs(g_x[b, : lengths[b]]).max() > 0
