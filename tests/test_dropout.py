import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import embed_queries_multi, init_model_params

F, E = 24, 12


def _setup(rate):
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, query_dropout=rate),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(1, 30, (6, 8)), jnp.int32)
    lengths = jnp.asarray(np.full(6, 8, np.int32))
    return model, params, tokens, lengths


def test_dropout_changes_training_output_only():
    model, params, tokens, lengths = _setup(0.5)
    key = jnp.asarray([1, 2], jnp.uint32)
    q_train1 = embed_queries_multi(params, model, tokens, lengths,
                                   dropout_rng=key)
    q_train2 = embed_queries_multi(params, model, tokens, lengths,
                                   dropout_rng=jnp.asarray([3, 4], jnp.uint32))
    q_eval = embed_queries_multi(params, model, tokens, lengths)
    q_inf = embed_queries_multi(params, model, tokens, lengths,
                                inference=True, dropout_rng=key)
    # different keys -> different outputs; no key / inference -> deterministic
    # (allclose, not equal: the training path runs the fused custom-VJP LSTM
    # layout whose f32 reassociation differs from the scan twin by ~1 ulp)
    assert float(jnp.abs(q_train1 - q_train2).max()) > 1e-5
    np.testing.assert_allclose(np.asarray(q_eval), np.asarray(q_inf),
                               rtol=1e-4, atol=1e-6)


def test_zero_rate_is_identity():
    model, params, tokens, lengths = _setup(0.0)
    key = jnp.asarray([1, 2], jnp.uint32)
    q1 = embed_queries_multi(params, model, tokens, lengths, dropout_rng=key)
    q2 = embed_queries_multi(params, model, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_train_loop_with_dropout(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False,
                        data_dir=str(tmp_path / "x"),
                        synthetic_num_videos=8, synthetic_num_queries=32),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, query_dropout=0.3),
        train=TrainConfig(batch_size=8, num_epochs=4, learning_rate=3e-3,
                          margin=0.2, checkpoint_dir=str(tmp_path / "ck")),
    )
    _, metrics = train(cfg)
    assert np.isfinite(metrics["mIoU"])
