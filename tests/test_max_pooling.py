import numpy as np
import jax
import jax.numpy as jnp

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import embed_moments, init_model_params
from vfr_tpu.ops.proposals import didemo_proposals, temporal_endpoint_features

F, E = 32, 16


def test_max_pooling_matches_numpy():
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, pooling="max"),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((20, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, 6, F)).astype(np.float32)
    out = np.asarray(
        embed_moments(params, model, {"rgb": jnp.asarray(feats)})["rgb"]
    )

    spans = didemo_proposals(6)
    tef = temporal_endpoint_features(spans, 6)
    w = np.asarray(params["moment_proj_rgb"]["w"])
    b = np.asarray(params["moment_proj_rgb"]["b"])
    for i in range(3):
        for p, (s, e) in enumerate(spans):
            local = feats[i, s : e + 1].max(axis=0)
            x = np.concatenate([local, feats[i].mean(axis=0), tef[p]])
            np.testing.assert_allclose(out[i, p], x @ w + b, rtol=1e-4,
                                       atol=1e-4)


def test_max_pooling_trains(tmp_path):
    import dataclasses

    from vfr_tpu.config import TrainConfig
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=24, glove_dim=12, use_flow=False,
                        data_dir=str(tmp_path / "x"),
                        synthetic_num_videos=8, synthetic_num_queries=32),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, pooling="max"),
        train=TrainConfig(batch_size=8, num_epochs=5, learning_rate=3e-3,
                          margin=0.2, checkpoint_dir=str(tmp_path / "ck")),
    )
    _, metrics = train(cfg)
    assert metrics["R@1_tiou0.5"] > 0.15, metrics
