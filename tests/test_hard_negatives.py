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

    def test_mesh_mining_matches_single_device(self, devices8):
        """The ICI-sharded refresh (index operands row-sharded, hierarchical
        sharded top-k scan) mines BIT-IDENTICAL (video, prop) pairs to the
        single-device refresh — exact top-k both ways, so any disagreement
        is a sharding bug, not float drift (VERDICT r3 missing #1)."""
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds = _setup(num_videos=13, num_queries=52)
        ref_v, ref_p = mine_hard_negatives(params, model, ds, count=4)
        # "data" axis name: the DP train loop reuses its mesh for the
        # refresh, so the corpus axis IS the data axis there
        mesh = make_mesh(("data",), devices=devices8)
        got_v, got_p = mine_hard_negatives(params, model, ds, count=4,
                                           mesh=mesh)
        np.testing.assert_array_equal(ref_v, got_v)
        np.testing.assert_array_equal(ref_p, got_p)

    def test_mesh_mining_charades(self, devices8):
        """Sharded refresh on the Charades window family: index rows pad
        to the mesh (invalid windows + pad rows share the 1e30 sentinel)
        and every mined pair is still a valid wrong-video window."""
        from vfr_tpu.data.charades import CharadesSTADataset
        from vfr_tpu.data.synthetic import make_charades_fixture
        from vfr_tpu.parallel.mesh import make_mesh

        fix = make_charades_fixture(num_videos=7, num_queries=21,
                                    feature_dim=F, glove_dim=E, seed=2)
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
        ref = mine_hard_negatives(params, model, ds, count=3)
        mesh = make_mesh(("data",))
        got = mine_hard_negatives(params, model, ds, count=3, mesh=mesh)
        np.testing.assert_array_equal(ref[0], got[0])
        np.testing.assert_array_equal(ref[1], got[1])
        v, p = got
        assert (v != ds.video_idx[:, None]).all()
        assert ds.window_mask[np.maximum(v, 0), np.maximum(p, 0)][v >= 0].all()

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


class TestMinedRowEmbedding:
    """The train step embeds ONLY the mined proposal of each mined video
    (gathered pooling-matrix/TEF rows, [B*Hn, 1, .]) — parity vs the
    embed-all-P-then-gather reference (VERDICT r2 #2)."""

    def test_mined_row_embedding_parity(self):
        from vfr_tpu.models.mcn import embed_moments

        cfg, model, params, ds = _setup()
        banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
        videos, props = mine_hard_negatives(params, model, ds, count=3)
        hv = jnp.asarray(videos[:8].reshape(-1))
        hp = jnp.asarray(props[:8].reshape(-1).astype(np.int32))
        feats = {s: jnp.take(banks[s], hv, axis=0) for s in model.streams}

        m_all = embed_moments(params, model, feats)          # [n, P, d]
        ref = {
            s: np.asarray(jnp.take_along_axis(
                m_all[s], hp[:, None, None], axis=1)[:, 0])
            for s in model.streams
        }
        pm_h = jnp.take(model.pool_matrix, hp, axis=0)[:, None, :]
        tef_h = jnp.take(model.tef, hp, axis=0)[:, None, :]
        m_new = embed_moments(params, model, feats, tef=tef_h,
                              pool_matrix=pm_h)              # [n, 1, d]
        for s in model.streams:
            np.testing.assert_allclose(np.asarray(m_new[s][:, 0]), ref[s],
                                       rtol=1e-6, atol=1e-6)

    def test_mined_row_embedding_parity_charades(self):
        """Same parity with the per-video duration-normalized TEF bank."""
        from vfr_tpu.data.charades import CharadesSTADataset
        from vfr_tpu.data.synthetic import make_charades_fixture
        from vfr_tpu.models.mcn import embed_moments

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
        videos, props = mine_hard_negatives(params, model, ds, count=2)
        hv = jnp.asarray(videos.reshape(-1))
        hp = jnp.asarray(props.reshape(-1).astype(np.int32))
        banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
        feats = {s: jnp.take(banks[s], hv, axis=0) for s in model.streams}
        video_tef = jnp.asarray(ds.video_tef)

        tef_all = jnp.take(video_tef, hv, axis=0)            # [n, P, 2]
        m_all = embed_moments(params, model, feats, tef=tef_all)
        ref = np.asarray(jnp.take_along_axis(
            m_all["rgb"], hp[:, None, None], axis=1)[:, 0])

        pm_h = jnp.take(model.pool_matrix, hp, axis=0)[:, None, :]
        tef_h = jnp.take_along_axis(tef_all, hp[:, None, None], axis=1)
        m_new = embed_moments(params, model, feats, tef=tef_h,
                              pool_matrix=pm_h)
        np.testing.assert_allclose(np.asarray(m_new["rgb"][:, 0]), ref,
                                   rtol=1e-6, atol=1e-6)

    def test_loss_parity_vs_all_p_reference(self):
        """Full loss through the NEW step path == loss computed with the old
        embed-all-P hard-negative gather."""
        from vfr_tpu.models.mcn import (
            embed_moments,
            embed_queries_multi,
        )
        from vfr_tpu.train.loss import ranking_loss
        from vfr_tpu.train.step import loss_from_batch

        cfg, model, params, ds = _setup()
        tcfg = dataclasses.replace(cfg.train, hard_negative_count=3)
        banks = {k: jnp.asarray(v) for k, v in ds.feature_banks().items()}
        videos, props = mine_hard_negatives(params, model, ds, count=3)
        b = next(ds.train_batches(12, 1, seed=0, with_features=False))
        b = dict(b)
        b["hard_neg_video"] = videos[b["query_idx"]]
        b["hard_neg_prop"] = props[b["query_idx"]]
        batch = {k: jnp.asarray(v) for k, v in b.items()}

        loss_new, _ = loss_from_batch(params, model, tcfg, batch,
                                      feature_banks=banks)

        # old-path reference: embed all P proposals of each mined video
        hv, hp = batch["hard_neg_video"], batch["hard_neg_prop"]
        B, Hn = hv.shape
        hv_safe = jnp.maximum(hv, 0).reshape(-1)
        hp_safe = jnp.maximum(hp, 0).reshape(-1).astype(jnp.int32)
        feats_h = {s: jnp.take(banks[s], hv_safe, axis=0)
                   for s in model.streams}
        m_h = embed_moments(params, model, feats_h)
        hard_m = {
            s: jnp.take_along_axis(
                m_h[s], hp_safe[:, None, None], axis=1)[:, 0].reshape(B, Hn, -1)
            for s in model.streams
        }
        feats = {s: jnp.take(banks[s], batch["video_idx"], axis=0)
                 for s in model.streams}
        q = embed_queries_multi(params, model, batch["tokens"],
                                batch["lengths"])
        m = embed_moments(params, model, feats)
        loss_old, _ = ranking_loss(
            model, tcfg, q, m, target=batch["target"],
            video_idx=batch["video_idx"], hard_moments=hard_m,
            hard_valid=hv >= 0,
        )
        np.testing.assert_allclose(float(loss_new), float(loss_old),
                                   rtol=1e-6)


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
