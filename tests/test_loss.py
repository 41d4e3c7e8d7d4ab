import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import DataConfig, ExperimentConfig, ModelConfig, TrainConfig
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import Model, init_model_params
from vfr_tpu.train.loss import ranking_loss
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_step


def _tiny_model(P=3, streams=("rgb",), weights=(1.0,)):
    cfg = ModelConfig(stream_weights=weights)
    pool = jnp.eye(P, 2)  # unused by ranking_loss
    return Model(cfg=cfg, streams=streams, pool_matrix=pool, tef=None)


def _numpy_loss(q, m, target, video_idx, margin, li, le, pmask=None,
                mode="same_span"):
    B, P, d = m.shape
    D = ((q[:, None, None, :] - m[None, :, :, :]) ** 2).sum(-1)  # [B,B',P]
    pos = D[np.arange(B), np.arange(B), target]
    if pmask is None:
        pmask = np.ones((B, P), bool)
    intra_terms, intra_n = 0.0, 0
    for b in range(B):
        for p in range(P):
            if p != target[b] and pmask[b, p]:
                intra_terms += max(0.0, margin + pos[b] - D[b, b, p])
                intra_n += 1
    inter_terms, inter_n = 0.0, 0
    for b in range(B):
        for b2 in range(B):
            if video_idx[b] == video_idx[b2]:
                continue
            if mode == "same_span":
                if pmask[b2, target[b]]:
                    inter_terms += max(0.0, margin + pos[b] - D[b, b2, target[b]])
                    inter_n += 1
            else:
                for p in range(P):
                    if pmask[b2, p]:
                        inter_terms += max(0.0, margin + pos[b] - D[b, b2, p])
                        inter_n += 1
    l_intra = intra_terms / max(intra_n, 1)
    l_inter = inter_terms / max(inter_n, 1)
    return li * l_intra + le * l_inter, l_intra, l_inter


@pytest.mark.parametrize("mode", ["same_span", "all_spans"])
def test_loss_matches_numpy_reference(mode):
    rng = np.random.default_rng(0)
    B, P, d = 4, 3, 5
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    target = np.array([0, 2, 1, 0], np.int32)
    video_idx = np.array([0, 1, 1, 2], np.int32)  # queries 1,2 share a video
    model = _tiny_model(P)
    tcfg = TrainConfig(margin=0.3, lambda_intra=1.0, lambda_inter=0.5,
                       inter_negatives=mode)
    loss, aux = ranking_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx),
    )
    exp, exp_intra, exp_inter = _numpy_loss(
        q, m, target, video_idx, 0.3, 1.0, 0.5, mode=mode
    )
    np.testing.assert_allclose(float(loss), exp, rtol=1e-4)
    np.testing.assert_allclose(float(aux["loss_intra"]), exp_intra, rtol=1e-4)
    np.testing.assert_allclose(float(aux["loss_inter"]), exp_inter, rtol=1e-4)


def test_loss_respects_proposal_mask():
    rng = np.random.default_rng(1)
    B, P, d = 3, 4, 5
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    target = np.array([0, 1, 2], np.int32)
    video_idx = np.arange(B, dtype=np.int32)
    pmask = np.array([
        [True, True, False, False],
        [True, True, True, False],
        [True, True, True, True],
    ])
    model = _tiny_model(P)
    tcfg = TrainConfig(margin=0.3, lambda_intra=1.0, lambda_inter=0.5)
    loss, _ = ranking_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx), jnp.asarray(pmask),
    )
    exp, _, _ = _numpy_loss(q, m, target, video_idx, 0.3, 1.0, 0.5, pmask=pmask)
    np.testing.assert_allclose(float(loss), exp, rtol=1e-4)


def test_same_video_queries_not_inter_negatives():
    """Two queries on the same video must contribute zero inter pairs."""
    rng = np.random.default_rng(2)
    B, P, d = 2, 3, 4
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    model = _tiny_model(P)
    tcfg = TrainConfig(margin=10.0, lambda_intra=0.0, lambda_inter=1.0)
    loss, aux = ranking_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(np.array([0, 1], np.int32)),
        jnp.asarray(np.array([7, 7], np.int32)),  # same video
    )
    assert float(aux["loss_inter"]) == 0.0


def test_perfect_embedding_zero_loss():
    """If gt moment == query and others are far, loss is 0."""
    d, P, B = 4, 3, 2
    q = np.stack([np.eye(d)[0], np.eye(d)[1]]).astype(np.float32)
    m = np.tile((10 + np.arange(P))[None, :, None], (B, 1, d)).astype(np.float32)
    target = np.array([0, 1], np.int32)
    m[0, 0] = q[0]
    m[1, 1] = q[1]
    model = _tiny_model(P)
    tcfg = TrainConfig(margin=0.1, lambda_intra=1.0, lambda_inter=1.0)
    loss, aux = ranking_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(np.array([0, 1], np.int32)),
    )
    assert float(loss) == 0.0
    assert float(aux["train_r1"]) == 1.0


def test_train_step_decreases_loss():
    """50 steps on a fixed tiny batch must reduce the loss (SURVEY §4.5)."""
    from vfr_tpu.data.synthetic import make_didemo_fixture
    from vfr_tpu.data.didemo import DidemoDataset

    F, E = 32, 16
    fix = make_didemo_fixture(num_videos=12, num_queries=48, feature_dim=F,
                              glove_dim=E, seed=3)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=32, lstm_hidden=32,
                          stream_weights=(0.5, 0.5)),
        train=TrainConfig(learning_rate=3e-3, margin=0.2),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    opt = make_optimizer(cfg.train)
    opt_state = opt.init(params)
    step = make_train_step(model, cfg.train, opt)

    losses = []
    for batch in ds.train_batches(batch_size=16, steps=50, seed=0):
        params, opt_state, aux = step(params, opt_state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert np.isfinite(losses).all()
