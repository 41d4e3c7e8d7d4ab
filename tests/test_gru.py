"""GRU query recurrence (BASELINE.json:5 'LSTM/GRU') vs torch-CPU oracle."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.lstm import gru_forward, init_gru_params

torch = pytest.importorskip("torch")


def _torch_gru_oracle(params, x, lengths, hidden, num_layers):
    B, T, E = x.shape
    m = torch.nn.GRU(E, hidden, num_layers=num_layers, batch_first=True)
    with torch.no_grad():
        for layer in range(num_layers):
            p = params[f"layer{layer}"]
            getattr(m, f"weight_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["w_ih"]).T))
            getattr(m, f"weight_hh_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["w_hh"]).T))
            getattr(m, f"bias_ih_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["b_ih"])))
            getattr(m, f"bias_hh_l{layer}").copy_(
                torch.from_numpy(np.asarray(p["b_hh"])))
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True,
            enforce_sorted=False)
        _, h_n = m(packed)
    return h_n[-1].numpy()


@pytest.mark.parametrize("num_layers", [1, 2])
def test_gru_matches_torch(num_layers):
    B, T, E, H = 4, 9, 12, 16
    params = init_gru_params(jax.random.PRNGKey(0), E, H, num_layers)
    x = np.random.default_rng(0).standard_normal((B, T, E)).astype(np.float32)
    lengths = np.array([9, 5, 1, 7], dtype=np.int32)
    h_last, hs = gru_forward(params, jnp.asarray(x), jnp.asarray(lengths))
    expected = _torch_gru_oracle(params, x, lengths, H, num_layers)
    np.testing.assert_allclose(np.asarray(h_last), expected, rtol=2e-5,
                               atol=2e-5)
    assert hs.shape == (B, T, H)


def test_gru_model_trains(tmp_path):
    from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=24, glove_dim=12, use_flow=False,
                        data_dir=str(tmp_path / "x"),
                        synthetic_num_videos=10, synthetic_num_queries=40),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, rnn_cell="gru"),
        train=TrainConfig(batch_size=10, num_epochs=6, learning_rate=3e-3,
                          margin=0.2, checkpoint_dir=str(tmp_path / "ck")),
    )
    _, metrics = train(cfg)
    assert metrics["R@1_tiou0.5"] > 0.2, metrics
