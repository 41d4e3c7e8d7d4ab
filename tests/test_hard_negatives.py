"""Index-based hard inter-video negative mining (BASELINE.json:5)."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.config import (
    DataConfig, EvalConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params
from vfr_tpu.train.hard_negatives import mine_hard_negatives
from vfr_tpu.train.optim import make_optimizer
from vfr_tpu.train.step import make_train_step

F, E = 32, 16


def _setup(num_videos=12, num_queries=48, seed=3):
    fix = make_didemo_fixture(num_videos=num_videos, num_queries=num_queries,
                              feature_dim=F, glove_dim=E, seed=seed)
    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5)),
        train=TrainConfig(),
        eval=EvalConfig(),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab, cfg.data)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    return cfg, model, params, ds


class TestMining:
    def test_shapes_and_no_own_video(self):
        cfg, model, params, ds = _setup()
        videos, props = mine_hard_negatives(params, model, ds, count=4)
        assert videos.shape == (ds.num_queries, 4) == props.shape
        assert (videos >= 0).all() and (props >= 0).all()   # 12 videos: plenty
        assert (props < ds.num_proposals).all()
        # the defining property: no mined row is from the query's own video
        assert (videos != ds.video_idx[:, None]).all()

    def test_mined_rows_are_the_nearest_wrong_video_rows(self):
        from vfr_tpu.eval.corpus import (
            _embed_query_streams,
            build_moment_index,
        )
        from vfr_tpu.parallel.sharding import fused_corpus_distances

        cfg, model, params, ds = _setup(num_videos=6, num_queries=12)
        videos, props = mine_hard_negatives(params, model, ds, count=3)
        index = build_moment_index(params, model, ds)
        b = next(ds.eval_batches(12, with_features=False))
        qs = _embed_query_streams(
            params, model, jnp.asarray(b["tokens"]),
            jnp.asarray(b["lengths"]), "scan",
        )
        D = np.asarray(fused_corpus_distances(qs, index.m, index.m_sq,
                                              index.weights))
        for i in range(12):
            wrong = index.video_row != ds.video_idx[i]
            order = np.argsort(D[i], kind="stable")
            expect = [r for r in order if wrong[r]][:3]
            got = (videos[i] * ds.num_proposals + props[i]).tolist()
            assert got == [int(r) for r in expect], (i, got, expect)

    def test_single_video_corpus_pads_minus_one(self):
        cfg, model, params, ds = _setup(num_videos=1, num_queries=4)
        videos, props = mine_hard_negatives(params, model, ds, count=3)
        assert (videos == -1).all() and (props == -1).all()

    def test_charades_mined_rows_are_valid_windows(self):
        """Charades window banks: every mined (video, prop) pair must be a
        VALID window of that video (invalid windows carry m_sq=+1e30 in the
        index and can never be retrieved) and never the query's own video."""
        from vfr_tpu.data.charades import CharadesSTADataset
        from vfr_tpu.data.synthetic import make_charades_fixture

        fix = make_charades_fixture(num_videos=8, num_queries=24,
                                    feature_dim=F, glove_dim=E, seed=1)
        dcfg = DataConfig(dataset="charades_sta", feature_dim=F, glove_dim=E,
                          use_flow=False)
        ds = CharadesSTADataset(fix.annotations, fix.rgb, None, fix.vocab,
                                dcfg)
        cfg = ExperimentConfig(
            name="t", data=dcfg,
            model=ModelConfig(joint_dim=16, lstm_hidden=16),
        )
        model = build_model(cfg, dataset=ds)
        params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
        videos, props = mine_hard_negatives(params, model, ds, count=3)
        assert (videos >= 0).all()
        assert (videos != ds.video_idx[:, None]).all()
        assert ds.window_mask[videos, props].all()

    def test_charades_train_loop_with_mining(self, tmp_path):
        from vfr_tpu.train.loop import train

        cfg = ExperimentConfig(
            name="t",
            data=DataConfig(
                dataset="charades_sta", data_dir=str(tmp_path / "x"),
                feature_dim=F, glove_dim=E, use_flow=False,
                synthetic_num_videos=8, synthetic_num_queries=32,
            ),
            model=ModelConfig(joint_dim=16, lstm_hidden=16),
            train=TrainConfig(
                batch_size=8, num_epochs=3, learning_rate=3e-3, margin=0.2,
                hard_negative_count=2, hard_negative_start_epoch=1,
                checkpoint_dir=str(tmp_path / "ck"),
            ),
            eval=EvalConfig(eval_batch_size=16),
        )
        _, metrics = train(cfg)
        assert np.isfinite(metrics["mIoU"])


class TestHardLoss:
    def test_hard_term_changes_loss_and_masks_invalid(self):
        cfg, model, params, ds = _setup()
        tcfg = dataclasses.replace(cfg.train, hard_negative_count=3)
        opt = make_optimizer(tcfg)
        banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
        step = make_train_step(model, tcfg, opt, feature_banks=banks)

        videos, props = mine_hard_negatives(params, model, ds, count=3)
        b = next(ds.train_batches(12, 1, seed=0, with_features=False))
        b_hard = dict(b)
        b_hard["hard_neg_video"] = videos[b["query_idx"]]
        b_hard["hard_neg_prop"] = props[b["query_idx"]]

        def fresh():
            p = jax.tree.map(jnp.array, params)   # step donates its args
            return p, opt.init(p)

        _, _, aux0 = step(*fresh(), dict(b))
        _, _, aux1 = step(*fresh(), b_hard)
        assert float(aux0["loss_hard"]) == 0.0
        assert float(aux1["loss_hard"]) > 0.0
        assert float(aux1["loss"]) > float(aux0["loss"])

        # -1 (invalid) entries are masked out of the mean
        b_pad = dict(b_hard)
        b_pad["hard_neg_video"] = np.concatenate(
            [b_hard["hard_neg_video"],
             np.full((12, 2), -1, np.int32)], axis=1)
        b_pad["hard_neg_prop"] = np.concatenate(
            [b_hard["hard_neg_prop"], np.full((12, 2), -1, np.int32)], axis=1)
        _, _, aux2 = step(*fresh(), b_pad)
        np.testing.assert_allclose(float(aux2["loss_hard"]),
                                   float(aux1["loss_hard"]), rtol=1e-5)


def test_train_loop_with_mining(tmp_path):
    from vfr_tpu.train.loop import train

    cfg = ExperimentConfig(
        name="t",
        data=DataConfig(
            data_dir=str(tmp_path / "x"), feature_dim=F, glove_dim=E,
            use_flow=False, synthetic_num_videos=10,
            synthetic_num_queries=40,
        ),
        model=ModelConfig(joint_dim=16, lstm_hidden=16),
        train=TrainConfig(
            batch_size=10, num_epochs=4, learning_rate=3e-3, margin=0.2,
            hard_negative_count=2, hard_negative_start_epoch=1,
            checkpoint_dir=str(tmp_path / "ck"),
        ),
        eval=EvalConfig(eval_batch_size=16),
    )
    _, metrics = train(cfg)
    assert np.isfinite(metrics["mIoU"])
    tags = [json.loads(l)["tag"]
            for l in open(os.path.join(cfg.train.checkpoint_dir,
                                       "metrics.jsonl"))]
    assert "mine" in tags
