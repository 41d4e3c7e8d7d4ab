import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import ExperimentConfig, ModelConfig, DataConfig, get_preset
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import (
    cross_distances,
    embed_moments,
    embed_queries,
    fused_distances,
    init_model_params,
    moment_input_dim,
)
from vfr_tpu.ops.proposals import didemo_proposals, pooling_matrix, temporal_endpoint_features


F, E, D = 32, 16, 24   # feature, glove, joint dims


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=D, lstm_hidden=20,
                          stream_weights=(0.6, 0.4)),
    )
    model = build_model(cfg)
    glove = np.random.default_rng(0).standard_normal((50, E)).astype(np.float32)
    glove[0] = 0
    params = init_model_params(jax.random.PRNGKey(0), model, glove, F)
    return cfg, model, params


def _rand_batch(B=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "tokens": rng.integers(1, 50, size=(B, 10)).astype(np.int32),
        "lengths": rng.integers(1, 11, size=(B,)).astype(np.int32),
        "rgb": rng.standard_normal((B, 6, F)).astype(np.float32),
        "flow": rng.standard_normal((B, 6, F)).astype(np.float32),
    }


def test_shapes(setup):
    cfg, model, params = setup
    b = _rand_batch()
    q = embed_queries(params, model, b["tokens"], b["lengths"])
    m = embed_moments(params, model, {"rgb": b["rgb"], "flow": b["flow"]})
    assert q.shape == (5, D)
    assert m["rgb"].shape == (5, 21, D) and m["flow"].shape == (5, 21, D)
    Dst = fused_distances(model, q, m)
    assert Dst.shape == (5, 21)
    assert (np.asarray(Dst) >= 0).all()


def test_moment_encoder_matches_numpy_golden(setup):
    """Golden-parity oracle: independent numpy implementation (SURVEY §4.2)."""
    cfg, model, params = setup
    b = _rand_batch(seed=1)
    m = embed_moments(params, model, {"rgb": b["rgb"], "flow": b["flow"]})

    spans = didemo_proposals(6)
    P = pooling_matrix(spans, 6, "mean")
    tef = temporal_endpoint_features(spans, 6)
    for s in ("rgb", "flow"):
        w = np.asarray(params[f"moment_proj_{s}"]["w"])
        bias = np.asarray(params[f"moment_proj_{s}"]["b"])
        feats = b[s]
        expect = np.zeros((5, 21, D), np.float32)
        for i in range(5):
            local = P @ feats[i]                        # [21, F]
            glob = feats[i].mean(axis=0)                # [F]
            x = np.concatenate(
                [local, np.tile(glob, (21, 1)), tef], axis=-1
            )
            expect[i] = x @ w + bias
        np.testing.assert_allclose(np.asarray(m[s]), expect, rtol=1e-4, atol=1e-4)


def test_fused_distance_matches_manual(setup):
    cfg, model, params = setup
    b = _rand_batch(seed=2)
    q = np.asarray(embed_queries(params, model, b["tokens"], b["lengths"]))
    m = embed_moments(params, model, {"rgb": b["rgb"], "flow": b["flow"]})
    Dst = np.asarray(fused_distances(model, jnp.asarray(q), m))
    manual = 0.6 * ((q[:, None, :] - np.asarray(m["rgb"])) ** 2).sum(-1) \
           + 0.4 * ((q[:, None, :] - np.asarray(m["flow"])) ** 2).sum(-1)
    np.testing.assert_allclose(Dst, manual, rtol=1e-4, atol=1e-4)


def test_cross_distances_diag_equals_fused(setup):
    """cross_distances[b, b, :] must equal fused_distances[b, :]."""
    cfg, model, params = setup
    b = _rand_batch(seed=3)
    q = embed_queries(params, model, b["tokens"], b["lengths"])
    m = embed_moments(params, model, {"rgb": b["rgb"], "flow": b["flow"]})
    Dfull = np.asarray(cross_distances(model, q, m))       # [B, B, P]
    Ddiag = np.asarray(fused_distances(model, q, m))       # [B, P]
    np.testing.assert_allclose(
        Dfull[np.arange(5), np.arange(5)], Ddiag, rtol=1e-3, atol=1e-3
    )


def test_tef_and_context_flags():
    cfg = ModelConfig(use_tef=False, use_global_context=False)
    assert moment_input_dim(cfg, F) == F
    cfg = ModelConfig(use_tef=True, use_global_context=False)
    assert moment_input_dim(cfg, F) == F + 2
    cfg = ModelConfig(use_tef=True, use_global_context=True)
    assert moment_input_dim(cfg, F) == 2 * F + 2


def test_query_encoder_pad_invariance(setup):
    cfg, model, params = setup
    b = _rand_batch(seed=4)
    toks = b["tokens"].copy()
    lengths = np.full((5,), 6, np.int32)
    toks[:, 6:] = 0
    q1 = np.asarray(embed_queries(params, model, toks, lengths))
    toks2 = toks.copy()
    toks2[:, 6:] = 7  # garbage beyond length must not matter
    q2 = np.asarray(embed_queries(params, model, toks2, lengths))
    np.testing.assert_allclose(q1, q2, rtol=1e-5, atol=1e-6)


def test_presets_build():
    for name in ("didemo_rgb", "didemo_fusion", "corpus_didemo", "serving_10k"):
        model = build_model(get_preset(name))
        assert model.pool_matrix.shape == (21, 6)
        assert model.tef.shape == (21, 2)
