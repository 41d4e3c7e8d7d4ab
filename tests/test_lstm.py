"""LSTM parity vs torch-CPU (the independent oracle, SURVEY.md §4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.lstm import init_lstm_params, lstm_forward

torch = pytest.importorskip("torch")


def _torch_lstm_oracle(params, x, lengths, hidden, num_layers):
    """Run torch.nn.LSTM with OUR params; return h at each true last step."""
    B, T, E = x.shape
    m = torch.nn.LSTM(E, hidden, num_layers=num_layers, batch_first=True)
    with torch.no_grad():
        for layer in range(num_layers):
            p = params[f"layer{layer}"]
            getattr(m, f"weight_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["w_ih"]).T)
            )
            getattr(m, f"weight_hh_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["w_hh"]).T)
            )
            getattr(m, f"bias_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["b"]))
            )
            getattr(m, f"bias_hh_l{layer}").zero_()
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True,
            enforce_sorted=False,
        )
        _, (h_n, _) = m(packed)
    return h_n[-1].numpy()  # [B, H] last layer, true final step


@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_matches_torch(num_layers):
    rng = jax.random.PRNGKey(0)
    B, T, E, H = 4, 9, 12, 16
    params = init_lstm_params(rng, E, H, num_layers, forget_bias=1.0)
    x = np.random.default_rng(0).standard_normal((B, T, E)).astype(np.float32)
    lengths = np.array([9, 5, 1, 7], dtype=np.int32)

    h_last, hs = lstm_forward(params, jnp.asarray(x), jnp.asarray(lengths))
    expected = _torch_lstm_oracle(params, x, lengths, H, num_layers)
    np.testing.assert_allclose(np.asarray(h_last), expected, rtol=2e-5, atol=2e-5)
    assert hs.shape == (B, T, H)


def test_padding_invariance():
    """Extending pad length must not change h_last."""
    rng = jax.random.PRNGKey(1)
    B, E, H = 3, 8, 16
    params = init_lstm_params(rng, E, H)
    x_short = np.random.default_rng(1).standard_normal((B, 6, E)).astype(np.float32)
    lengths = np.array([6, 3, 4], dtype=np.int32)
    x_long = np.concatenate([x_short, np.zeros((B, 4, E), np.float32)], axis=1)

    h1, _ = lstm_forward(params, jnp.asarray(x_short), jnp.asarray(lengths))
    h2, _ = lstm_forward(params, jnp.asarray(x_long), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6)


def test_jit_and_grad():
    rng = jax.random.PRNGKey(2)
    B, T, E, H = 2, 5, 8, 12
    params = init_lstm_params(rng, E, H)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((B, T, E)),
                    dtype=jnp.float32)
    lengths = jnp.array([5, 3], dtype=jnp.int32)

    @jax.jit
    def loss_fn(p):
        h, _ = lstm_forward(p, x, lengths)
        return jnp.sum(h ** 2)

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    assert any(float(jnp.abs(t).max()) > 0 for t in flat)
