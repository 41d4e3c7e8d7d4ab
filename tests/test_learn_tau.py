"""Learnable InfoNCE temperature (TrainConfig.learn_temperature,
train/loss.py log_tau + train/loop.py::init_train_params, DESIGN 29).

Covers: fixed-vs-learnable equivalence at init, gradient flow into
log_tau, the clamp floor, checkpoint round-trip through load_for_eval
WITHOUT the caller re-passing the flag (peek_config template fix), and
an end-to-end tiny train where tau actually moves.
"""

import dataclasses
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from vfr_tpu.config import ModelConfig, TrainConfig, get_preset
from vfr_tpu.models.mcn import Model
from vfr_tpu.train.loss import compute_loss, infonce_loss


def _tiny(P=3):
    cfg = ModelConfig(stream_weights=(1.0,))
    return Model(cfg=cfg, streams=("rgb",), pool_matrix=jnp.eye(P, 2),
                 tef=None)


def _batch(B=4, P=3, d=5, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    m = {"rgb": jnp.asarray(rng.standard_normal((B, P, d)).astype(np.float32))}
    target = jnp.asarray(rng.integers(0, P, B).astype(np.int32))
    vid = jnp.arange(B, dtype=jnp.int32)
    return q, m, target, vid


def test_log_tau_at_init_matches_fixed_temperature():
    model = _tiny()
    q, m, target, vid = _batch()
    tcfg = TrainConfig(loss_type="infonce", temperature=0.3)
    l_fixed, _ = infonce_loss(model, tcfg, q, m, target, vid)
    l_learn, aux = infonce_loss(model, tcfg, q, m, target, vid,
                                log_tau=jnp.log(jnp.float32(0.3)))
    np.testing.assert_allclose(float(l_fixed), float(l_learn), rtol=1e-6)
    np.testing.assert_allclose(float(aux["tau"]), 0.3, rtol=1e-6)


def test_gradient_flows_into_log_tau_and_clamp_floor_holds():
    model = _tiny()
    q, m, target, vid = _batch(seed=1)
    tcfg = TrainConfig(loss_type="infonce", temperature=0.1)

    def f(lt):
        loss, _ = infonce_loss(model, tcfg, q, m, target, vid, log_tau=lt)
        return loss

    g = jax.grad(f)(jnp.float32(np.log(0.1)))
    assert np.isfinite(float(g)) and float(g) != 0.0
    # below the clamp floor the gradient dies (clip), the loss stays finite
    _, aux = infonce_loss(model, tcfg, q, m, target, vid,
                          log_tau=jnp.float32(np.log(1e-6)))
    np.testing.assert_allclose(float(aux["tau"]), 5e-3, rtol=1e-5)


def test_compute_loss_drops_log_tau_for_triplet():
    model = _tiny()
    q, m, target, vid = _batch(seed=2)
    l1, _ = compute_loss(model, TrainConfig(loss_type="triplet"),
                         q, m, target, vid, log_tau=jnp.float32(0.0))
    l2, _ = compute_loss(model, TrainConfig(loss_type="triplet"),
                         q, m, target, vid)
    np.testing.assert_allclose(float(l1), float(l2))


def test_train_moves_tau_and_eval_reloads_without_the_flag():
    from vfr_tpu.train.loop import load_for_eval, train

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
                learn_temperature=True, num_epochs=3, batch_size=16,
                hard_negative_count=0, eval_every_epochs=99,
                checkpoint_every_epochs=99,   # loop still saves last epoch
                checkpoint_dir=td, metrics_path=f"{td}/metrics.jsonl",
            ),
        )
        params, final = train(cfg)
        assert "log_tau" in params
        tau_trained = float(jnp.exp(params["log_tau"]))
        assert np.isfinite(tau_trained)
        assert abs(tau_trained - 0.2) > 1e-4, "tau never moved"
        assert 5e-3 <= tau_trained <= 1.0
        # per-chunk metrics expose the learned tau
        recs = [json.loads(l) for l in open(f"{td}/metrics.jsonl")
                if '"train"' in l]
        assert any("tau" in r for r in recs)

        # eval-side reload builds the template from the CHECKPOINT's config
        # (cfg_eval deliberately omits learn_temperature)
        cfg_eval = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           learn_temperature=False))
        params2, model, _ = load_for_eval(cfg_eval)
        assert "log_tau" in params2
        np.testing.assert_allclose(float(params2["log_tau"]),
                                   float(params["log_tau"]), rtol=1e-6)


def test_anneal_schedule_rides_batches_and_reaches_final_tau():
    """temperature_final > 0: tau_now rides chunks as an operand, the
    logged tau falls from `temperature` toward `temperature_final`, and
    combining it with learn_temperature raises."""
    import pytest

    from vfr_tpu.train.loop import train

    base = get_preset("didemo_fusion")
    with tempfile.TemporaryDirectory() as td:
        cfg = dataclasses.replace(
            base,
            data=dataclasses.replace(
                base.data, data_dir="/nonexistent", feature_dim=32,
                synthetic_num_videos=16, synthetic_num_queries=256,
            ),
            train=dataclasses.replace(
                base.train, loss_type="infonce", temperature=0.2,
                temperature_final=0.05, num_epochs=4, batch_size=16,
                steps_per_call=4,
                hard_negative_count=0, eval_every_epochs=99,
                checkpoint_every_epochs=99, checkpoint_dir=td,
                metrics_path=f"{td}/metrics.jsonl",
            ),
        )
        train(cfg)
        recs = [json.loads(l) for l in open(f"{td}/metrics.jsonl")
                if '"train"' in l]
        taus = [r["tau"] for r in recs if "tau" in r]
        assert len(taus) >= 4
        # chunk means of a cosine ramp: strictly decreasing, inside range
        assert all(a > b for a, b in zip(taus, taus[1:])), taus
        assert taus[0] <= 0.2 + 1e-6 and taus[-1] >= 0.05 - 1e-6
        assert taus[0] - taus[-1] > 0.05, taus

        with pytest.raises(ValueError, match="mutually exclusive"):
            bad = dataclasses.replace(
                cfg, train=dataclasses.replace(
                    cfg.train, learn_temperature=True))
            train(bad)
