"""Regression tests for the round-1 self-code-review findings."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig

F, E = 24, 12


def test_short_charades_video_gets_fallback_window():
    """Videos shorter than the smallest window scale must keep >=1 valid
    window (previously: all-False mask -> degenerate target + all-inf eval)."""
    from vfr_tpu.data.charades import CharadesSTADataset
    from vfr_tpu.data.glove import Vocab
    from vfr_tpu.data.features import FeatureStore

    vocab = Vocab(["cat"])
    rgb = FeatureStore({"vshort": np.ones((10, F), np.float32)})
    anns = [{"video": "vshort", "start": 1.0, "end": 6.0,
             "description": "cat", "duration": 8.0}]
    cfg = DataConfig(dataset="charades_sta", feature_dim=F,
                     window_scales=(12.0, 18.0, 24.0), max_windows=64)
    ds = CharadesSTADataset(anns, rgb, None, vocab, cfg)
    assert ds.window_mask[0].any()
    assert ds.window_mask[0, ds.target[0]]
    # fallback is the shortest real window
    w = ds.windows[ds.target[0]]
    assert w[1] - w[0] == pytest.approx(12.0)


def test_missing_flow_raises_loudly(tmp_path):
    import json

    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.data.synthetic import make_didemo_fixture

    fix = make_didemo_fixture(num_videos=4, num_queries=8, feature_dim=F,
                              glove_dim=E)
    d = tmp_path / "didemo"
    d.mkdir()
    (d / "train_data.json").write_text(json.dumps(fix.annotations))
    np.savez(d / "features_rgb.npz", **{v: fix.rgb[v] for v in fix.rgb.ids()})
    cfg = DataConfig(dataset="didemo", data_dir=str(d), feature_dim=F,
                     glove_dim=E, use_flow=True)
    with pytest.raises(FileNotFoundError, match="use_flow=True"):
        load_datasets(cfg)


def test_cosine_corpus_matches_brute_force():
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.eval.corpus import build_moment_index, corpus_retrieval
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import (
        embed_moments, embed_queries_multi, init_model_params,
    )

    fix = make_didemo_fixture(num_videos=6, num_queries=12, feature_dim=F,
                              glove_dim=E, seed=5)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, distance="cosine"),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, None, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    index = build_moment_index(params, model, ds)
    b = next(ds.eval_batches(8))
    _, rows = corpus_retrieval(params, model, index, b["tokens"],
                               b["lengths"], k=5)

    # brute force: cosine distance of raw (unnormalized) embeddings
    q = np.asarray(embed_queries_multi(params, model, b["tokens"],
                                       b["lengths"]))[0]
    m = np.asarray(
        embed_moments(params, model, {"rgb": jnp.asarray(ds.rgb_feats)})["rgb"]
    ).reshape(-1, 16)
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    mn = m / np.linalg.norm(m, axis=-1, keepdims=True)
    D = 1.0 - qn @ mn.T
    expect = np.argsort(D, axis=1)[:, :5]
    got_d = np.take_along_axis(D, rows, axis=1)
    exp_d = np.take_along_axis(D, expect, axis=1)
    np.testing.assert_allclose(np.sort(got_d, 1), np.sort(exp_d, 1),
                               rtol=1e-4, atol=1e-5)


def test_euclidean_multistream_corpus_rejected():
    from vfr_tpu.eval.corpus import MomentIndex, make_retriever
    from vfr_tpu.models.build import build_model

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=16, lstm_hidden=16, distance="euclidean",
                          stream_weights=(0.5, 0.5)),
    )
    model = build_model(cfg)
    index = MomentIndex(
        m=jnp.zeros((2, 8, 16)), m_sq=jnp.zeros((2, 8)),
        video_row=np.zeros(8, np.int32), prop_idx=np.zeros(8, np.int32),
        spans_sec=np.zeros((8, 2), np.float32), weights=jnp.ones(2),
    )
    with pytest.raises(NotImplementedError, match="euclidean"):
        make_retriever(model, index, k=3)


def test_adamw_does_not_decay_frozen_embeddings():
    import optax

    from vfr_tpu.train.optim import make_optimizer

    tcfg = TrainConfig(optimizer="adamw", weight_decay=0.1, learning_rate=1e-2)
    opt = make_optimizer(tcfg, 10)
    params = {
        "embeddings": jnp.ones((4, 3)),
        "query_proj": {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)},
    }
    grads = jax.tree.map(jnp.zeros_like, params)
    state = opt.init(params)
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # frozen table untouched by decay; trainable weights DO decay
    np.testing.assert_array_equal(np.asarray(new["embeddings"]),
                                  np.asarray(params["embeddings"]))
    assert float(jnp.abs(new["query_proj"]["w"] - 1.0).max()) > 0


def test_tie_break_smallest_proposal_index():
    from vfr_tpu.data.didemo import DidemoDataset
    from vfr_tpu.data.glove import Vocab
    from vfr_tpu.data.features import FeatureStore
    from vfr_tpu.ops.proposals import span_index

    vocab = Vocab(["cat"])
    rgb = FeatureStore({"v": np.ones((6, F), np.float32)})
    # inserted order puts (3,3) first; tie must still break to (0,0)
    anns = [{"video": "v", "description": "cat",
             "times": [[3, 3], [0, 0], [3, 3], [0, 0]]}]
    ds = DidemoDataset(anns, rgb, None, vocab,
                       DataConfig(feature_dim=F, glove_dim=E, use_flow=False))
    assert ds.target[0] == span_index((0, 0), 6) == 0


def test_direct_impl_accepts_batched_pool_matrix():
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import embed_moments, init_model_params

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False),
        model=ModelConfig(joint_dim=16, lstm_hidden=16),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((20, E)).astype(np.float32)
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    rng = np.random.default_rng(1)
    B, P, C = 3, 5, 6
    pm = jnp.asarray(rng.random((B, P, C)), jnp.float32)
    tef = jnp.asarray(rng.random((B, P, 2)), jnp.float32)
    feats = {"rgb": jnp.asarray(rng.standard_normal((B, C, F)), jnp.float32)}
    direct = embed_moments(params, model, feats, tef=tef, pool_matrix=pm,
                           impl="direct")
    fact = embed_moments(params, model, feats, tef=tef, pool_matrix=pm,
                         impl="factored")
    np.testing.assert_allclose(np.asarray(direct["rgb"]),
                               np.asarray(fact["rgb"]), rtol=1e-4, atol=1e-4)
