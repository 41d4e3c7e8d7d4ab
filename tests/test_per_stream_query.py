"""Per-stream query projections (MCN separately-trained-towers topology)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import (
    embed_moments,
    embed_queries,
    embed_queries_multi,
    fused_distances,
    init_model_params,
)

F, E = 32, 16


def _cfg(per_stream):
    return ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5),
                          per_stream_query_proj=per_stream),
    )


def test_param_shapes_and_multi_embed():
    cfg = _cfg(True)
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    assert "query_proj_rgb" in params and "query_proj_flow" in params
    assert "query_proj" not in params

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(1, 30, (4, 8)), jnp.int32)
    lengths = jnp.asarray(np.full(4, 8, np.int32))
    qs = embed_queries_multi(params, model, tokens, lengths)
    assert qs.shape == (2, 4, 16)
    # projections differ per stream
    assert float(jnp.abs(qs[0] - qs[1]).max()) > 1e-4
    with pytest.raises(ValueError):
        embed_queries(params, model, tokens, lengths)


def test_shared_multi_rows_identical():
    cfg = _cfg(False)
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((30, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(1, 30, (4, 8)), jnp.int32)
    lengths = jnp.asarray(np.full(4, 8, np.int32))
    qs = embed_queries_multi(params, model, tokens, lengths)
    np.testing.assert_array_equal(np.asarray(qs[0]), np.asarray(qs[1]))


def test_trains_end_to_end(tmp_path):
    import dataclasses

    from vfr_tpu.train.loop import train

    cfg = _cfg(True)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_num_videos=10,
                                 synthetic_num_queries=40,
                                 data_dir=str(tmp_path / "x")),
        train=TrainConfig(batch_size=10, num_epochs=6, learning_rate=3e-3,
                          margin=0.2, checkpoint_dir=str(tmp_path / "ck")),
    )
    _, metrics = train(cfg)
    assert metrics["R@1_tiou0.5"] > 0.2, metrics


def test_fused_distances_per_stream_q():
    cfg = _cfg(True)
    model = build_model(cfg)
    rng = np.random.default_rng(2)
    qs = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    m = {
        "rgb": jnp.asarray(rng.standard_normal((3, 21, 16)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((3, 21, 16)), jnp.float32),
    }
    D = np.asarray(fused_distances(model, qs, m))
    manual = 0.5 * ((np.asarray(qs[0])[:, None] - np.asarray(m["rgb"])) ** 2).sum(-1) \
           + 0.5 * ((np.asarray(qs[1])[:, None] - np.asarray(m["flow"])) ** 2).sum(-1)
    np.testing.assert_allclose(D, manual, rtol=1e-4, atol=1e-5)
