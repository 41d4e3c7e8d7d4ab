"""Corpus retrieval over the Charades window bank: invalid windows must be
unretrievable (the +inf |m|^2 sentinel path in build_moment_index)."""

import numpy as np
import jax
import pytest

from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.data.charades import CharadesSTADataset
from vfr_tpu.data.synthetic import make_charades_fixture
from vfr_tpu.eval.corpus import build_moment_index, corpus_evaluate, corpus_retrieval
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_step

F, E = 32, 16


@pytest.fixture(scope="module")
def trained():
    fix = make_charades_fixture(num_videos=12, num_queries=48, feature_dim=F,
                                glove_dim=E, seed=21)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(dataset="charades_sta", feature_dim=F, glove_dim=E,
                        use_flow=False, max_windows=64),
        model=ModelConfig(joint_dim=24, lstm_hidden=24),
        train=TrainConfig(learning_rate=3e-3, margin=0.2),
        eval=EvalConfig(corpus_query_batch=16, corpus_topk=10),
    )
    ds = CharadesSTADataset(fix.annotations, fix.rgb, None, fix.vocab, cfg.data)
    model = build_model(cfg, dataset=ds)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    step = make_train_step(model, cfg.train, opt)
    for batch in ds.train_batches(batch_size=16, steps=80, seed=0):
        params, opt_state, _ = step(params, opt_state, batch)
    return cfg, model, params, ds


def test_invalid_windows_never_retrieved(trained):
    cfg, model, params, ds = trained
    index = build_moment_index(params, model, ds)
    b = next(ds.eval_batches(16))
    _, rows = corpus_retrieval(params, model, index, b["tokens"],
                               b["lengths"], k=20)
    flat_valid = ds.window_mask.reshape(-1)
    assert flat_valid[rows.reshape(-1)].all(), (
        "retrieved an invalid (masked) window row"
    )


def test_charades_corpus_metrics(trained):
    cfg, model, params, ds = trained
    metrics = corpus_evaluate(params, model, ds, cfg.eval)
    assert metrics["num_queries"] == ds.num_queries
    assert metrics["corpus_video_R@5"] > 0.2, metrics
    assert 0 <= metrics["corpus_R@1_tiou0.7"] <= metrics["corpus_R@1_tiou0.5"]


def test_charades_corpus_sharded_matches(trained, devices8):
    from vfr_tpu.parallel.mesh import make_mesh

    cfg, model, params, ds = trained
    mesh = make_mesh(("corpus",), devices=devices8)
    m1 = corpus_evaluate(params, model, ds, cfg.eval)
    m2 = corpus_evaluate(params, model, ds, cfg.eval, mesh=mesh)
    for key in m1:
        np.testing.assert_allclose(m1[key], m2[key], rtol=1e-3, atol=1e-3,
                                   err_msg=key)
