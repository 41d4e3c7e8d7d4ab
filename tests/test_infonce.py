"""InfoNCE objective (train/loss.py::infonce_loss, loss_type="infonce").

Golden parity vs a per-example numpy softmax implementation (SURVEY.md §4.2
convention), masking semantics (same-video rows, padded windows, invalid
mined negatives), the compute_loss dispatch, and an end-to-end train-step
smoke: the loss must fall and gradients must be finite.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vfr_tpu.config import ModelConfig, TrainConfig
from vfr_tpu.models.mcn import Model
from vfr_tpu.train.loss import compute_loss, infonce_loss, ranking_loss


def _tiny_model(P=3, streams=("rgb",), weights=(1.0,)):
    cfg = ModelConfig(stream_weights=weights)
    pool = jnp.eye(P, 2)  # unused by the losses
    return Model(cfg=cfg, streams=streams, pool_matrix=pool, tef=None)


def _numpy_infonce(q, m, target, video_idx, tau, li, le, pmask=None,
                   hard=None, hard_valid=None):
    B, P, d = m.shape
    D = ((q[:, None, None, :] - m[None, :, :, :]) ** 2).sum(-1)  # [B,B',P]
    if pmask is None:
        pmask = np.ones((B, P), bool)
    logits = -D / tau
    l_intra = 0.0
    l_inter = 0.0
    for b in range(B):
        pos = logits[b, b, target[b]]
        own = [logits[b, b, p] for p in range(P) if pmask[b, p]]
        l_intra += np.log(np.sum(np.exp(own))) - pos
        cand = []
        for b2 in range(B):
            if b2 != b and video_idx[b2] == video_idx[b]:
                continue   # other query on the SAME video: excluded
            cand += [logits[b, b2, p] for p in range(P) if pmask[b2, p]]
        if hard is not None:
            dh = ((q[b][None, :] - hard[b]) ** 2).sum(-1)        # [H]
            for h in range(hard.shape[1]):
                if hard_valid is None or hard_valid[b, h]:
                    cand.append(-dh[h] / tau)
        l_inter += np.log(np.sum(np.exp(cand))) - pos
    return li * l_intra / B + le * l_inter / B


def test_infonce_matches_numpy_reference():
    rng = np.random.default_rng(0)
    B, P, d = 4, 3, 5
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    target = np.array([0, 2, 1, 0], np.int32)
    video_idx = np.array([0, 1, 1, 2], np.int32)  # queries 1,2 share a video
    model = _tiny_model(P)
    tcfg = TrainConfig(loss_type="infonce", temperature=0.5,
                       lambda_intra=1.0, lambda_inter=0.7)
    loss, aux = infonce_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx),
    )
    exp = _numpy_infonce(q, m, target, video_idx, 0.5, 1.0, 0.7)
    np.testing.assert_allclose(float(loss), exp, rtol=1e-4)
    assert np.isfinite(float(aux["loss_intra"]))
    assert np.isfinite(float(aux["loss_inter"]))


def test_infonce_proposal_mask_and_hard_negatives():
    rng = np.random.default_rng(1)
    B, P, H, d = 3, 4, 2, 6
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    hard = rng.standard_normal((B, H, d)).astype(np.float32)
    hard_valid = np.array([[True, True], [True, False], [False, False]])
    pmask = np.ones((B, P), bool)
    pmask[1, 3] = False
    pmask[2, 2] = False
    target = np.array([0, 1, 3], np.int32)
    video_idx = np.array([0, 1, 2], np.int32)
    model = _tiny_model(P)
    tcfg = TrainConfig(loss_type="infonce", temperature=0.3,
                       lambda_intra=0.5, lambda_inter=1.0)
    loss, aux = infonce_loss(
        model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx),
        proposal_mask=jnp.asarray(pmask),
        hard_moments={"rgb": jnp.asarray(hard)},
        hard_valid=jnp.asarray(hard_valid),
    )
    exp = _numpy_infonce(q, m, target, video_idx, 0.3, 0.5, 1.0,
                         pmask=pmask, hard=hard, hard_valid=hard_valid)
    np.testing.assert_allclose(float(loss), exp, rtol=1e-4)
    # row 2 has no valid mined negative; the loss must still be finite
    assert np.isfinite(float(loss))
    # hard share metric lives in [0, 1]
    assert 0.0 <= float(aux["loss_hard"]) <= 1.0


def _numpy_inter_rev(q, m, target, video_idx, tau):
    """Reverse CE: each gt moment classifies its query.  Denominator over
    queries b' with b' == b or video(b') != video(b)."""
    B = q.shape[0]
    D = ((q[:, None, None, :] - m[None, :, :, :]) ** 2).sum(-1)
    logits = -D / tau
    total = 0.0
    for b in range(B):
        pos = logits[b, b, target[b]]
        cand = [logits[b2, b, target[b]] for b2 in range(B)
                if b2 == b or video_idx[b2] != video_idx[b]]
        total += np.log(np.sum(np.exp(cand))) - pos
    return total / B


def test_symmetric_infonce_matches_numpy_reference():
    """lambda_inter_rev adds the CLIP-style reverse direction: golden
    parity vs a per-example numpy implementation, including the
    same-video query exclusion."""
    rng = np.random.default_rng(4)
    B, P, d = 5, 3, 6
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    target = np.array([0, 2, 1, 0, 2], np.int32)
    video_idx = np.array([0, 1, 1, 2, 3], np.int32)
    model = _tiny_model(P)
    base = dict(loss_type="infonce", temperature=0.4,
                lambda_intra=1.0, lambda_inter=0.7)
    l0, aux0 = infonce_loss(
        model, TrainConfig(**base), jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx))
    l1, aux1 = infonce_loss(
        model, TrainConfig(lambda_inter_rev=0.5, **base),
        jnp.asarray(q), {"rgb": jnp.asarray(m)},
        jnp.asarray(target), jnp.asarray(video_idx))
    # off by default: identical loss, zero reverse term
    assert float(aux0["loss_inter_rev"]) == 0.0
    rev = _numpy_inter_rev(q, m, target, video_idx, 0.4)
    np.testing.assert_allclose(float(aux1["loss_inter_rev"]), rev, rtol=1e-4)
    np.testing.assert_allclose(float(l1), float(l0) + 0.5 * rev, rtol=1e-4)


def test_masked_proposals_never_enter_the_denominator():
    """Sending a masked proposal's embedding to +-inf must not change the
    loss — the softmax can only ignore it if the mask reached the logits."""
    rng = np.random.default_rng(2)
    B, P, d = 2, 3, 4
    q = rng.standard_normal((B, d)).astype(np.float32)
    m = rng.standard_normal((B, P, d)).astype(np.float32)
    pmask = np.array([[True, True, False], [True, True, True]])
    target = np.array([0, 2], np.int32)
    video_idx = np.array([0, 1], np.int32)
    model = _tiny_model(P)
    tcfg = TrainConfig(loss_type="infonce", temperature=1.0)

    m2 = m.copy()
    m2[0, 2] = 1e3   # would dominate the softmax if unmasked
    args = (jnp.asarray(target), jnp.asarray(video_idx))
    l1, _ = infonce_loss(model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m)},
                         *args, proposal_mask=jnp.asarray(pmask))
    l2, _ = infonce_loss(model, tcfg, jnp.asarray(q), {"rgb": jnp.asarray(m2)},
                         *args, proposal_mask=jnp.asarray(pmask))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_compute_loss_dispatch():
    rng = np.random.default_rng(3)
    B, P, d = 3, 3, 4
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    m = {"rgb": jnp.asarray(rng.standard_normal((B, P, d)).astype(np.float32))}
    target = jnp.asarray(np.array([0, 1, 2], np.int32))
    vid = jnp.asarray(np.array([0, 1, 2], np.int32))
    model = _tiny_model(P)
    lt, _ = compute_loss(model, TrainConfig(loss_type="triplet"),
                         q, m, target, vid)
    ln, _ = compute_loss(model, TrainConfig(loss_type="infonce"),
                         q, m, target, vid)
    le, _ = ranking_loss(model, TrainConfig(), q, m, target, vid)
    np.testing.assert_allclose(float(lt), float(le))
    assert float(ln) != float(lt)
    with pytest.raises(ValueError):
        compute_loss(model, TrainConfig(loss_type="nope"), q, m, target, vid)


def test_infonce_trains_end_to_end():
    """3 tiny epochs on the synthetic fixture (mining on for the last):
    the logged train loss falls and the final eval beats chance."""
    import dataclasses
    import json
    import tempfile

    from vfr_tpu.config import get_preset
    from vfr_tpu.train.loop import train

    base = get_preset("didemo_fusion")
    with tempfile.TemporaryDirectory() as td:
        cfg = dataclasses.replace(
            base,
            data=dataclasses.replace(
                base.data, data_dir="/nonexistent", feature_dim=32,
                synthetic_num_videos=16, synthetic_num_queries=128,
            ),
            train=dataclasses.replace(
                base.train, loss_type="infonce", temperature=0.2,
                num_epochs=3, batch_size=16, hard_negative_count=2,
                hard_negative_start_epoch=2, checkpoint_every_epochs=99,
                eval_every_epochs=99, checkpoint_dir=td,
                metrics_path=f"{td}/metrics.jsonl",
            ),
        )
        params, final_metrics = train(cfg)
        with open(f"{td}/metrics.jsonl") as f:
            train_recs = [json.loads(l) for l in f if '"train"' in l]
    losses = [r["loss"] for r in train_recs]
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert final_metrics["R@1_tiou0.5"] > 1.0 / 21
