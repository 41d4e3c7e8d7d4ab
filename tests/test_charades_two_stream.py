"""Two-stream (RGB+flow) Charades-STA end-to-end (config #3 x #2 cross)."""

import numpy as np

from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig


def test_charades_fusion_trains_and_evals(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(
            dataset="charades_sta",
            data_dir=str(tmp_path / "none"),
            feature_dim=24, glove_dim=12, use_flow=True,
            max_windows=64,
            synthetic_num_videos=10, synthetic_num_queries=40,
        ),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5)),
        train=TrainConfig(batch_size=10, num_epochs=5, learning_rate=3e-3,
                          margin=0.2, checkpoint_dir=str(tmp_path / "ck")),
        eval=EvalConfig(eval_batch_size=16),
    )
    _, metrics = train(cfg)
    assert np.isfinite(metrics["mIoU"])
    assert metrics["R@5_tiou0.5"] > 0.2, metrics


def test_charades_fusion_corpus(tmp_path):
    import jax

    from vfr_tpu.data.charades import CharadesSTADataset
    from vfr_tpu.data.synthetic import make_charades_fixture
    from vfr_tpu.eval.corpus import corpus_evaluate
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params

    fix = make_charades_fixture(num_videos=8, num_queries=16, feature_dim=24,
                                glove_dim=12, with_flow=True, seed=9)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(dataset="charades_sta", feature_dim=24, glove_dim=12,
                        use_flow=True, max_windows=64),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5)),
        eval=EvalConfig(corpus_query_batch=8),
    )
    ds = CharadesSTADataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                            cfg.data)
    model = build_model(cfg, dataset=ds)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, 24)
    metrics = corpus_evaluate(params, model, ds, cfg.eval)
    assert metrics["num_queries"] == 16
    assert np.isfinite(metrics["corpus_video_R@5"])
