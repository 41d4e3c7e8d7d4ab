"""Online corpus growth (eval/live.py): append == rebuild, in place,
with ZERO retriever recompiles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vfr_tpu.config import (
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.synthetic import make_didemo_fixture
from vfr_tpu.eval.corpus import _JIT_CACHE, build_moment_index, make_retriever
from vfr_tpu.eval.live import (
    delta_corpus,
    live_append,
    load_delta_npz,
    make_live_index,
    make_live_retriever,
)
from vfr_tpu.models.build import build_model
from vfr_tpu.models.mcn import init_model_params

F, E = 32, 16


def _dataset(num_videos, seed, prefix="vid"):
    fix = make_didemo_fixture(num_videos=num_videos, num_queries=32,
                              feature_dim=F, glove_dim=E, seed=seed)
    cfg = ExperimentConfig(
        name="live",
        data=DataConfig(feature_dim=F, glove_dim=E, use_flow=True),
        model=ModelConfig(joint_dim=16, lstm_hidden=16,
                          stream_weights=(0.5, 0.5)),
        train=TrainConfig(),
        eval=EvalConfig(),
    )
    ds = DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                       cfg.data)
    if prefix != "vid":
        # re-key the corpus so two fixtures never collide on video ids
        ds.video_ids = [v.replace("vid", prefix) for v in ds.video_ids]
    return cfg, ds, fix


@pytest.fixture(scope="module")
def setup():
    cfg, ds, fix = _dataset(12, seed=0)
    model = build_model(cfg)
    params = init_model_params(jax.random.PRNGKey(0), model, fix.glove, F)
    _, ds2, _ = _dataset(5, seed=7, prefix="new")
    batch = next(ds.eval_batches(8))
    toks = jnp.asarray(batch["tokens"])
    lens = jnp.asarray(batch["lengths"])
    return cfg, model, params, ds, ds2, toks, lens


class TestLiveAppend:
    def test_append_matches_rebuild(self, setup):
        """After appending, retrieval over the live arena equals a
        from-scratch rebuild over the concatenated corpus — row ids
        included (appends preserve video order)."""
        cfg, model, params, ds, ds2, toks, lens = setup
        k = 10
        live = make_live_index(params, model, ds, capacity_videos=24)
        n = live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        assert n == 5 * ds.num_proposals
        retrieve = make_live_retriever(model, live, k,
                                       topk_method="exact")
        d_live, r_live = retrieve(params, toks, lens)

        # rebuild: one dataset holding both corpora in the same order
        import types

        both = types.SimpleNamespace(
            video_ids=list(ds.video_ids) + list(ds2.video_ids),
            rgb_feats=np.concatenate([ds.rgb_feats, ds2.rgb_feats]),
            flow_feats=np.concatenate([ds.flow_feats, ds2.flow_feats]),
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds,
        )
        index = build_moment_index(params, model, both,
                                   with_fingerprint=False)
        exact = make_retriever(model, index, k, topk_method="exact")
        d_ref, r_ref = exact(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(r_live),
                                      np.asarray(r_ref))
        np.testing.assert_allclose(np.asarray(d_live), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-6)
        # row -> (video, span) mapping agrees with the live metadata
        r = np.asarray(r_live)
        for row in r.ravel()[:20]:
            assert live.video_row[row] >= 0
            vid = live.video_ids[live.video_row[row]]
            assert vid == both.video_ids[index.video_row[row]]

    def test_zero_recompiles_across_appends(self, setup):
        """The retriever program compiles once; appends reuse it (the
        whole point of the capacity arena)."""
        cfg, model, params, ds, ds2, toks, lens = setup
        k, cap = 5, 30
        live = make_live_index(params, model, ds, capacity_videos=cap)
        retrieve = make_live_retriever(model, live, k,
                                       topk_method="exact")
        retrieve(params, toks, lens)
        from vfr_tpu.eval.corpus import make_operand_retriever

        fn = make_operand_retriever(model, live.weights, k,
                                    topk_method="exact")
        n_before = fn._cache_size()
        for i, seed in enumerate((20, 21, 22)):
            _, dsx, _ = _dataset(2, seed=seed, prefix=f"g{i}")
            live_append(live, params, model, ds, dsx.video_ids,
                        dsx.rgb_feats, dsx.flow_feats)
            d, r = retrieve(params, toks, lens)
            assert np.asarray(r).max() < live.used_rows
        assert fn._cache_size() == n_before

    def test_free_rows_guarded(self, setup):
        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=13)
        with pytest.raises(ValueError, match="exceeds capacity"):
            live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)

    def test_duplicate_video_rejected(self, setup):
        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=24)
        with pytest.raises(ValueError, match="already in the corpus"):
            live_append(live, params, model, ds, [ds.video_ids[0]],
                        ds.rgb_feats[:1], ds.flow_feats[:1])

    def test_pad_rows_unretrievable(self, setup):
        """k <= valid rows: no free-region row can ever surface."""
        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=64)
        retrieve = make_live_retriever(model, live, 10,
                                       topk_method="exact")
        _, rows = retrieve(params, toks, lens)
        assert np.asarray(rows).max() < live.used_rows

    def test_delta_npz_roundtrip(self, setup, tmp_path):
        cfg, model, params, ds, ds2, toks, lens = setup
        p = tmp_path / "delta.npz"
        np.savez(p, video_ids=np.asarray(ds2.video_ids),
                 rgb=ds2.rgb_feats, flow=ds2.flow_feats)
        vids, rgb, flow, durations = load_delta_npz(str(p))
        assert vids == list(ds2.video_ids) and durations is None
        live = make_live_index(params, model, ds, capacity_videos=24)
        n = live_append(live, params, model, ds, vids, rgb, flow)
        assert n == 5 * ds.num_proposals


class TestCharadesDelta:
    def test_charades_delta_matches_rebuild(self):
        from vfr_tpu.data.charades import CharadesSTADataset
        from vfr_tpu.data.synthetic import make_charades_fixture

        fix = make_charades_fixture(num_videos=8, num_queries=16,
                                    feature_dim=F, glove_dim=E, seed=1)
        cfg = ExperimentConfig(
            name="live-c",
            data=DataConfig(feature_dim=F, glove_dim=E, use_flow=False,
                            dataset="charades_sta"),
            model=ModelConfig(joint_dim=16, lstm_hidden=16,
                              stream_weights=(1.0,)),
            train=TrainConfig(),
            eval=EvalConfig(),
        )
        ds = CharadesSTADataset(fix.annotations, fix.rgb, None, fix.vocab,
                                cfg.data)
        model = build_model(cfg, dataset=ds)
        params = init_model_params(jax.random.PRNGKey(0), model,
                                   fix.glove, F)
        # delta = the last 3 videos of the same corpus re-badged as new
        delta_ids = [f"newc{i}" for i in range(3)]
        rgb = ds.rgb_feats[-3:]
        durations = ds.durations[-3:]

        live_base_ids = ds.video_ids[:5]
        # shrink the serving dataset to the first 5 videos
        import types

        base = types.SimpleNamespace(
            video_ids=live_base_ids,
            rgb_feats=ds.rgb_feats[:5],
            flow_feats=None,
            num_proposals=ds.num_proposals,
            windows=ds.windows,
            window_mask=ds.window_mask[:5],
            video_tef=ds.video_tef[:5],
            cfg=ds.cfg,
        )
        from vfr_tpu.eval.live import live_append, make_live_index

        live = make_live_index(params, model, base, capacity_videos=8)
        live_append(live, params, model, base, delta_ids, rgb,
                    durations=durations)

        full = types.SimpleNamespace(
            video_ids=live_base_ids + delta_ids,
            rgb_feats=ds.rgb_feats[np.r_[0:5, 5:8]],
            flow_feats=None,
            num_proposals=ds.num_proposals,
            windows=ds.windows,
            window_mask=ds.window_mask[np.r_[0:5, 5:8]],
            video_tef=ds.video_tef[np.r_[0:5, 5:8]],
            cfg=ds.cfg,
        )
        index = build_moment_index(params, model, full,
                                   with_fingerprint=False)
        batch = next(ds.eval_batches(8))
        toks = jnp.asarray(batch["tokens"])
        lens = jnp.asarray(batch["lengths"])
        exact = make_retriever(model, index, 5, topk_method="exact")
        ret = make_live_retriever(model, live, 5, topk_method="exact")
        d_ref, r_ref = exact(params, toks, lens)
        d_liv, r_liv = ret(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(r_liv), np.asarray(r_ref))
        np.testing.assert_allclose(np.asarray(d_liv), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-6)


class TestLiveServeCLI:
    def test_follow_live_add_control_line(self, tmp_path, capsys,
                                          monkeypatch):
        """End to end: `serve --follow --live-capacity-videos` answers a
        query, absorbs an `!add <delta.npz>` control line, and later
        queries can retrieve the appended videos."""
        import io
        import json

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()

        # delta: 4 new videos with features in the SERVING corpus's own
        # layout (didemo_rgb preset: [V, 6 clips, 2048] rgb)
        rng = np.random.default_rng(33)
        delta = tmp_path / "delta.npz"
        np.savez(delta,
                 video_ids=np.asarray([f"fresh{i:04d}" for i in range(4)]),
                 rgb=rng.standard_normal((4, 6, 2048)).astype(np.float32))
        stdin = (
            "w0001 w0002\n"
            f"!add {delta}\n"
            "w0003 w0004\n"
            f"!add {delta}\n"           # duplicate -> error ack, no crash
            "!remove fresh0001\n"
            "w0005 w0006\n"
        )
        monkeypatch.setattr("sys.stdin", io.StringIO(stdin))
        rc = main([
            "serve", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--queries", "-", "--follow", "--topk", "3",
            "--live-capacity-videos", "32",
        ])
        assert rc == 0
        recs = [json.loads(l) for l in
                capsys.readouterr().out.splitlines() if l.strip()]
        assert len(recs) == 6
        q1, ack, q2, ack2, ack3, q3 = recs
        assert q1["query"] == "w0001 w0002" and len(q1["results"]) == 3
        assert ack["added_rows"] == 4 * 21
        assert ack["num_videos"] == 17 + 4
        assert q2["query"] == "w0003 w0004" and len(q2["results"]) == 3
        assert "error" in ack2 and "already in the corpus" in ack2["error"]
        assert ack3["removed_rows"] == 21
        assert q3["query"] == "w0005 w0006" and len(q3["results"]) == 3
        assert all(r["video"] != "fresh0001" for r in q3["results"])
        # appended videos are actually retrievable: every result video id
        # must resolve, and the corpus now contains the fresh ids
        all_vids = {r["video"] for rec in (q1, q2) for r in rec["results"]}
        assert all(isinstance(v, str) and v for v in all_vids)


class TestLiveRemove:
    def test_removed_video_never_retrieved(self, setup):
        """Tombstoned rows can never surface; survivors keep their exact
        distances (compared against a rebuild WITHOUT the video)."""
        from vfr_tpu.eval.live import live_remove

        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=24)
        victim = ds.video_ids[3]
        n = live_remove(live, [victim])
        assert n == ds.num_proposals
        retrieve = make_live_retriever(model, live, 10,
                                       topk_method="exact")
        d_live, r_live = retrieve(params, toks, lens)
        got = np.asarray(r_live)
        assert not np.isin(got, np.nonzero(
            live.video_row == 3)[0]).any()

        # rebuild without the victim: same (video, prop, distance) sets
        import types

        keep = [i for i, v in enumerate(ds.video_ids) if v != victim]
        both = types.SimpleNamespace(
            video_ids=[ds.video_ids[i] for i in keep],
            rgb_feats=ds.rgb_feats[keep],
            flow_feats=ds.flow_feats[keep],
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds,
        )
        index = build_moment_index(params, model, both,
                                   with_fingerprint=False)
        exact = make_retriever(model, index, 10, topk_method="exact")
        d_ref, r_ref = exact(params, toks, lens)
        key_live = [
            {(live.video_ids[live.video_row[r]], int(live.prop_idx[r]),
              round(float(d), 4)) for r, d in zip(rq, dq)}
            for rq, dq in zip(got, np.asarray(d_live))
        ]
        key_ref = [
            {(both.video_ids[index.video_row[r]], int(index.prop_idx[r]),
              round(float(d), 4)) for r, d in zip(rq, dq)}
            for rq, dq in zip(np.asarray(r_ref), np.asarray(d_ref))
        ]
        assert key_live == key_ref

    def test_remove_unknown_video_raises(self, setup):
        from vfr_tpu.eval.live import live_remove

        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=24)
        with pytest.raises(ValueError, match="not in the corpus"):
            live_remove(live, ["nope"])


class TestArenaPersistence:
    def test_save_load_roundtrip_bit_exact(self, setup, tmp_path):
        from vfr_tpu.eval.live import live_remove, load_arena, save_arena

        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=24,
                               index_dtype="bfloat16")
        live_append(live, params, model, ds, ds2.video_ids,
                    ds2.rgb_feats, ds2.flow_feats)
        live_remove(live, [ds.video_ids[2]])
        p = save_arena(live, str(tmp_path / "arena"), params=params,
                       model=model)
        loaded = load_arena(p, params=params, model=model)
        np.testing.assert_array_equal(
            np.asarray(loaded.m_cat, np.float32),
            np.asarray(live.m_cat, np.float32))
        np.testing.assert_array_equal(np.asarray(loaded.msq_fused),
                                      np.asarray(live.msq_fused))
        assert loaded.video_ids == live.video_ids
        assert loaded.used_rows == live.used_rows
        r1 = make_live_retriever(model, live, 8, topk_method="exact")
        r2 = make_live_retriever(model, loaded, 8, topk_method="exact")
        d1, rows1 = r1(params, toks, lens)
        d2, rows2 = r2(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))

    def test_fingerprint_rejects_other_checkpoint(self, setup, tmp_path):
        from vfr_tpu.eval.live import load_arena, save_arena

        cfg, model, params, ds, ds2, toks, lens = setup
        live = make_live_index(params, model, ds, capacity_videos=24)
        p = save_arena(live, str(tmp_path / "arena"), params=params,
                       model=model)
        other = init_model_params(jax.random.PRNGKey(9), model,
                                  np.zeros((200, E), np.float32), F)
        with pytest.raises(ValueError, match="fingerprint mismatch"):
            load_arena(p, params=other, model=model)

    def test_daemon_save_then_boot_from_arena(self, tmp_path, capsys,
                                              monkeypatch):
        """`!save` snapshot -> restart with --live-arena: the second
        daemon answers identically without re-embedding."""
        import io
        import json

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()
        arena = tmp_path / "arena.npz"
        monkeypatch.setattr("sys.stdin", io.StringIO(
            f"w0001 w0002\n!save {arena}\n"))
        rc = main([
            "serve", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--queries", "-", "--follow", "--topk", "3",
            "--live-capacity-videos", "32",
        ])
        assert rc == 0
        recs = [json.loads(l) for l in
                capsys.readouterr().out.splitlines() if l.strip()]
        assert recs[1]["saved"] == str(arena)

        monkeypatch.setattr("sys.stdin", io.StringIO("w0001 w0002\n"))
        rc = main([
            "serve", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--queries", "-", "--follow", "--topk", "3",
            "--live-arena", str(arena),
        ])
        assert rc == 0
        recs2 = [json.loads(l) for l in
                 capsys.readouterr().out.splitlines() if l.strip()]
        assert recs2[0]["results"] == recs[0]["results"]


class TestShardedLiveArena:
    """Online growth composed with ICI corpus sharding: the arena's
    operands live row-sharded over an 8-device mesh; appends splice via
    the shard_map window write; retrieval is the hierarchical sharded
    top-k.  Everything is compared against the single-device arena."""

    def _mesh(self, devices8):
        from vfr_tpu.parallel.mesh import make_mesh

        return make_mesh(("corpus",), devices=devices8)

    def test_sharded_append_matches_single_device(self, setup, devices8):
        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = self._mesh(devices8)
        k = 10
        live_s = make_live_index(params, model, ds, capacity_videos=24,
                                 mesh=mesh)
        live_1 = make_live_index(params, model, ds, capacity_videos=24)
        for lv in (live_s, live_1):
            live_append(lv, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        r_s = make_live_retriever(model, live_s, k, topk_method="exact")
        r_1 = make_live_retriever(model, live_1, k, topk_method="exact")
        d_s, rows_s = r_s(params, toks, lens)
        d_1, rows_1 = r_1(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows_s),
                                      np.asarray(rows_1))
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_1),
                                   rtol=1e-5, atol=1e-6)

    def test_capacity_roundup_and_delta_split(self, setup, devices8):
        """capacity 13 videos * 21 rows = 273 -> padded to 280 (8 shards
        of 35); a 5-video delta (105 rows) exceeds one shard's 35-row
        block, so live_append must split it at video granularity -- and
        still match the single-device arena bit for bit."""
        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = self._mesh(devices8)
        live_s = make_live_index(params, model, ds, capacity_videos=18,
                                 mesh=mesh)
        assert live_s.capacity % 8 == 0
        assert live_s.capacity >= 18 * ds.num_proposals
        assert live_s.rows_per_shard * 8 == live_s.capacity
        # delta larger than one shard's row block forces the split path
        assert 5 * ds.num_proposals > live_s.rows_per_shard
        n = live_append(live_s, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        assert n == 5 * ds.num_proposals
        live_1 = make_live_index(params, model, ds, capacity_videos=18)
        live_append(live_1, params, model, ds, ds2.video_ids,
                    ds2.rgb_feats, ds2.flow_feats)
        r_s = make_live_retriever(model, live_s, 8, topk_method="exact")
        r_1 = make_live_retriever(model, live_1, 8, topk_method="exact")
        d_s, rows_s = r_s(params, toks, lens)
        d_1, rows_1 = r_1(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows_s),
                                      np.asarray(rows_1))

    def test_sharded_remove_and_zero_recompiles(self, setup, devices8):
        from vfr_tpu.eval.corpus import make_sharded_operand_retriever
        from vfr_tpu.eval.live import live_remove

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = self._mesh(devices8)
        live = make_live_index(params, model, ds, capacity_videos=32,
                               mesh=mesh)
        retrieve = make_live_retriever(model, live, 6, topk_method="exact")
        retrieve(params, toks, lens)
        fn = make_sharded_operand_retriever(model, live.weights, 6, mesh,
                                            topk_method="exact")
        n_before = fn._cache_size()
        for i, seed in enumerate((30, 31)):
            _, dsx, _ = _dataset(2, seed=seed, prefix=f"s{i}")
            live_append(live, params, model, ds, dsx.video_ids,
                        dsx.rgb_feats, dsx.flow_feats)
        victim = ds.video_ids[1]
        live_remove(live, [victim])
        d, rows = retrieve(params, toks, lens)
        got = np.asarray(rows)
        assert got.max() < live.used_rows
        assert not np.isin(got, np.nonzero(live.video_row == 1)[0]).any()
        # appends + remove reused the compiled retriever program
        assert fn._cache_size() == n_before

    def test_snapshot_is_mesh_portable(self, setup, devices8, tmp_path):
        """A single-device snapshot loads onto a mesh (capacity padded to
        the axis size with free rows) and retrieves identically."""
        from vfr_tpu.eval.live import load_arena, save_arena

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = self._mesh(devices8)
        live = make_live_index(params, model, ds, capacity_videos=13)
        assert live.capacity % 8 != 0   # forces the pad-on-load path
        p = save_arena(live, str(tmp_path / "arena"), params=params,
                       model=model)
        loaded = load_arena(p, params=params, model=model, mesh=mesh)
        assert loaded.capacity % 8 == 0
        assert loaded.mesh is mesh
        r_1 = make_live_retriever(model, live, 7, topk_method="exact")
        r_s = make_live_retriever(model, loaded, 7, topk_method="exact")
        d1, rows1 = r_1(params, toks, lens)
        ds_, rows_s = r_s(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows_s),
                                      np.asarray(rows1))
        # and the loaded sharded arena still grows
        live_append(loaded, params, model, ds, ds2.video_ids[:1],
                    ds2.rgb_feats[:1], ds2.flow_feats[:1])
        assert loaded.num_videos == live.num_videos + 1

    def test_sharded_snapshot_loads_single_device(self, setup, devices8,
                                                  tmp_path):
        """The other portability direction: a snapshot written FROM a
        row-sharded arena (np.asarray gathers the global array) loads on
        a single device and retrieves identically."""
        from vfr_tpu.eval.live import load_arena, save_arena
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = make_mesh(("corpus",), devices=devices8)
        live = make_live_index(params, model, ds, capacity_videos=16,
                               mesh=mesh)
        live_append(live, params, model, ds, ds2.video_ids[:2],
                    ds2.rgb_feats[:2], ds2.flow_feats[:2])
        p = save_arena(live, str(tmp_path / "arena_sh"), params=params,
                       model=model)
        loaded = load_arena(p, params=params, model=model)   # no mesh
        assert loaded.mesh is None
        assert loaded.capacity == live.capacity
        r_sh = make_live_retriever(model, live, 7, topk_method="exact")
        r_1 = make_live_retriever(model, loaded, 7, topk_method="exact")
        d_sh, rows_sh = r_sh(params, toks, lens)
        d_1, rows_1 = r_1(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows_sh),
                                      np.asarray(rows_1))
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_1),
                                   rtol=1e-5, atol=1e-6)

    def test_follow_sharded_live_cli_matches_unsharded(self, tmp_path,
                                                       capsys, monkeypatch):
        """`serve --follow --live-capacity-videos --shards 8`: the daemon
        boots the arena row-sharded over the corpus mesh, absorbs an
        `!add`, and answers every query exactly like the unsharded live
        daemon (hierarchical sharded top-k == single-device exact)."""
        import io
        import json

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()
        rng = np.random.default_rng(44)
        delta = tmp_path / "delta.npz"
        np.savez(delta,
                 video_ids=np.asarray([f"grow{i:04d}" for i in range(3)]),
                 rgb=rng.standard_normal((3, 6, 2048)).astype(np.float32))
        stdin = (f"w0001 w0002\n!add {delta}\nw0003 w0004\n"
                 "!remove grow0000\n!stats\n!compact\n!grow 40\nw0005\n")

        def run(extra):
            monkeypatch.setattr("sys.stdin", io.StringIO(stdin))
            rc = main([
                "serve", "--preset", "didemo_rgb",
                "--data-dir", str(tmp_path / "none"),
                "--checkpoint-dir", str(tmp_path / "ck"),
                "--queries", "-", "--follow", "--topk", "3",
                "--live-capacity-videos", "32", *extra,
            ])
            assert rc == 0
            return [json.loads(l) for l in
                    capsys.readouterr().out.splitlines() if l.strip()]

        plain = run([])
        sharded = run(["--shards", "8"])
        assert len(sharded) == len(plain) == 8
        assert sharded[1]["added_rows"] == plain[1]["added_rows"] == 3 * 21
        assert sharded[3]["removed_rows"] == plain[3]["removed_rows"] == 21
        assert sharded[4]["tombstoned_rows"] == 21
        assert sharded[4]["shards"] == 8 and plain[4]["shards"] == 1
        # sharded capacity was rounded up at boot; both reclaim the same
        assert sharded[5]["reclaimed_rows"] == plain[5]["reclaimed_rows"] == 21
        assert sharded[5]["num_videos"] == plain[5]["num_videos"]
        assert sharded[6]["capacity_rows"] % 8 == 0
        assert plain[6]["capacity_rows"] == 40 * 21
        for a, b in zip(sharded, plain):
            if "results" not in a:
                continue
            assert [ (r["video"], r["start"], r["end"]) for r in a["results"] ] \
                == [ (r["video"], r["start"], r["end"]) for r in b["results"] ]
            for ra, rb in zip(a["results"], b["results"]):
                assert abs(ra["distance"] - rb["distance"]) < 1e-4


class TestArenaMaintenance:
    """`live_compact` (reclaim tombstones, free ids, zero recompiles) and
    `live_grow` (capacity growth, ONE documented recompile), single-device
    and sharded, plus the !compact/!grow daemon control lines."""

    def test_compact_reclaims_frees_ids_and_matches_rebuild(self, setup):
        from types import SimpleNamespace

        from vfr_tpu.eval.live import live_compact, live_remove

        cfg, model, params, ds, ds2, toks, lens = setup
        k = 8
        live = make_live_index(params, model, ds, capacity_videos=24)
        v_base = live.num_videos          # the arena's actual base corpus
        live_append(live, params, model, ds, ds2.video_ids,
                    ds2.rgb_feats, ds2.flow_feats)
        victims = [ds.video_ids[2], ds.video_ids[7]]
        live_remove(live, victims)
        free_before = live.free_rows
        n = live_compact(live)
        assert n == 2 * ds.num_proposals
        assert live.free_rows == free_before + n
        assert live.num_videos == v_base + len(ds2.video_ids) - 2
        assert victims[0] not in live.video_ids
        # surviving rows pack to the front in original order -> the arena
        # is bit-identical (row ids included) to a fresh build over the
        # surviving corpus
        keep = [i for i in range(v_base) if i not in (2, 7)]
        surv = SimpleNamespace(
            video_ids=[ds.video_ids[i] for i in keep] + list(ds2.video_ids),
            rgb_feats=np.concatenate([ds.rgb_feats[keep], ds2.rgb_feats]),
            flow_feats=np.concatenate([ds.flow_feats[keep], ds2.flow_feats]),
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds,
        )
        fresh = make_live_index(params, model, surv, capacity_videos=24)
        r_live = make_live_retriever(model, live, k, topk_method="exact")
        r_ref = make_live_retriever(model, fresh, k, topk_method="exact")
        d1, rows1 = r_live(params, toks, lens)
        d2, rows2 = r_ref(params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                                   rtol=1e-5, atol=1e-6)
        # compaction freed the id: the removed video can be re-added
        live_append(live, params, model, ds, [victims[0]],
                    ds.rgb_feats[2:3], ds.flow_feats[2:3])
        assert live.num_videos == v_base + len(ds2.video_ids) - 1
        # and a no-op compact reports 0
        assert live_compact(live) == 0

    def test_compact_zero_retriever_recompiles(self, setup):
        from vfr_tpu.eval.corpus import make_operand_retriever
        from vfr_tpu.eval.live import live_compact, live_remove

        cfg, model, params, ds, ds2, toks, lens = setup
        k = 5
        live = make_live_index(params, model, ds, capacity_videos=20)
        retrieve = make_live_retriever(model, live, k, topk_method="exact")
        retrieve(params, toks, lens)
        fn = make_operand_retriever(model, live.weights, k,
                                    topk_method="exact")
        n_before = fn._cache_size()
        live_remove(live, [ds.video_ids[0]])
        live_compact(live)
        _, rows = retrieve(params, toks, lens)
        assert np.asarray(rows).max() < live.used_rows
        assert fn._cache_size() == n_before

    def test_grow_one_recompile_appends_beyond_old_capacity(self, setup):
        from types import SimpleNamespace

        from vfr_tpu.eval.corpus import make_operand_retriever
        from vfr_tpu.eval.live import live_grow

        cfg, model, params, ds, ds2, toks, lens = setup
        k = 6
        live = make_live_index(params, model, ds, capacity_videos=13)
        retrieve = make_live_retriever(model, live, k, topk_method="exact")
        retrieve(params, toks, lens)
        fn = make_operand_retriever(model, live.weights, k,
                                    topk_method="exact")
        n_before = fn._cache_size()
        with pytest.raises(ValueError, match="exceeds capacity"):
            live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        new_cap = live_grow(live, 20)
        assert new_cap == 20 * ds.num_proposals == live.capacity
        assert live.video_row.shape[0] == live.capacity
        live_append(live, params, model, ds, ds2.video_ids,
                    ds2.rgb_feats, ds2.flow_feats)
        d1, rows1 = retrieve(params, toks, lens)
        # exactly ONE new program: the capacity shape changed once
        assert fn._cache_size() == n_before + 1
        both = SimpleNamespace(
            video_ids=list(ds.video_ids) + list(ds2.video_ids),
            rgb_feats=np.concatenate([ds.rgb_feats, ds2.rgb_feats]),
            flow_feats=np.concatenate([ds.flow_feats, ds2.flow_feats]),
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds,
        )
        fresh = make_live_index(params, model, both, capacity_videos=20)
        d2, rows2 = make_live_retriever(model, fresh, k,
                                        topk_method="exact")(
            params, toks, lens)
        np.testing.assert_array_equal(np.asarray(rows1), np.asarray(rows2))
        # shrink is rejected, equal capacity is a no-op
        with pytest.raises(ValueError, match="cannot shrink"):
            live_grow(live, 5)
        assert live_grow(live, 20) == live.capacity

    def test_sharded_compact_and_grow_match_single_device(self, setup,
                                                          devices8):
        from vfr_tpu.eval.live import live_compact, live_grow, live_remove
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = make_mesh(("corpus",), devices=devices8)
        k = 7
        arenas = []
        for m in (mesh, None):
            live = make_live_index(params, model, ds, capacity_videos=16,
                                   mesh=m)
            live_remove(live, [ds.video_ids[1], ds.video_ids[4]])
            assert live_compact(live) == 2 * ds.num_proposals
            grown = live_grow(live, 24)
            assert grown % (1 if m is None else 8) == 0
            live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
            r = make_live_retriever(model, live, k, topk_method="exact")
            arenas.append(r(params, toks, lens))
        (d_s, rows_s), (d_1, rows_1) = arenas
        np.testing.assert_array_equal(np.asarray(rows_s),
                                      np.asarray(rows_1))
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_1),
                                   rtol=1e-4, atol=1e-5)

    def test_follow_compact_grow_control_lines(self, tmp_path, capsys,
                                               monkeypatch):
        """Daemon lifecycle: !remove -> !compact reclaims and reports, a
        too-big !add fails gracefully, !grow raises capacity, the same
        !add then succeeds, and queries keep answering throughout."""
        import io
        import json

        from vfr_tpu.cli import main

        rc = main([
            "train", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--batch-size", "12", "--epochs", "2",
        ])
        assert rc == 0
        capsys.readouterr()
        rng = np.random.default_rng(5)
        rgb4 = rng.standard_normal((4, 6, 2048)).astype(np.float32)
        delta = tmp_path / "delta.npz"
        np.savez(delta,
                 video_ids=np.asarray([f"grow{i:04d}" for i in range(4)]),
                 rgb=rgb4)
        delta3 = tmp_path / "delta3.npz"   # the first 3 ids again
        np.savez(delta3,
                 video_ids=np.asarray([f"grow{i:04d}" for i in range(3)]),
                 rgb=rgb4[:3])
        stdin = ("w0001 w0002\n"
                 f"!add {delta}\n"          # 4 videos > 1 free -> error ack
                 "!grow 21\n"               # capacity 18 -> 21 videos
                 f"!add {delta}\n"          # now fits exactly
                 "!remove grow0000 grow0001 grow0002\n"
                 "!compact\n"               # reclaims 3 slots + the ids
                 f"!add {delta3}\n"         # re-add proves ids were freed
                 "w0003 w0004\n")
        monkeypatch.setattr("sys.stdin", io.StringIO(stdin))
        rc = main([
            "serve", "--preset", "didemo_rgb",
            "--data-dir", str(tmp_path / "none"),
            "--checkpoint-dir", str(tmp_path / "ck"),
            "--queries", "-", "--follow", "--topk", "3",
            "--live-capacity-videos", "18",   # serving corpus: 17 videos
        ])
        assert rc == 0
        recs = [json.loads(l) for l in
                capsys.readouterr().out.splitlines() if l.strip()]
        assert len(recs) == 8
        assert "error" in recs[1]
        assert "exceeds capacity" in recs[1]["error"]
        assert recs[2]["capacity_rows"] == 21 * 21
        assert recs[3]["added_rows"] == 4 * 21
        assert recs[3]["num_videos"] == 17 + 4
        assert recs[4]["removed_rows"] == 3 * 21
        assert recs[5]["reclaimed_rows"] == 3 * 21
        assert recs[5]["num_videos"] == 18
        assert recs[6]["added_rows"] == 3 * 21
        assert recs[6]["num_videos"] == 21
        for rec in (recs[0], recs[7]):
            assert len(rec["results"]) == 3


class TestAppendAtomicity:
    """Code-review regression tests: a rejected append leaves the arena
    untouched (even when the sharded path would chunk the splice), small
    snapshots load onto larger meshes with append still working, and the
    retriever's k clamp follows capacity growth."""

    def test_oversized_sharded_append_is_atomic(self, setup, devices8):
        from vfr_tpu.eval.live import live_grow
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = make_mesh(("corpus",), devices=devices8)
        # capacity 11 videos over 8 shards -> free space for ~1 video
        live = make_live_index(params, model, ds, capacity_videos=11,
                               mesh=mesh)
        free_before = live.free_rows
        v_before = live.num_videos
        assert free_before < 5 * ds.num_proposals  # ds2 cannot fit
        with pytest.raises(ValueError, match="exceeds capacity"):
            live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        # NOTHING was partially applied
        assert live.free_rows == free_before
        assert live.num_videos == v_before
        assert not set(ds2.video_ids) & set(live.video_ids)
        # after growing, the SAME delta applies cleanly (ids not burned)
        live_grow(live, 24)
        n = live_append(live, params, model, ds, ds2.video_ids,
                        ds2.rgb_feats, ds2.flow_feats)
        assert n == 5 * ds.num_proposals
        assert live.num_videos == v_before + 5

    def test_small_snapshot_on_large_mesh_can_append(self, setup, devices8,
                                                     tmp_path):
        from types import SimpleNamespace

        from vfr_tpu.eval.live import load_arena, save_arena
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = make_mesh(("corpus",), devices=devices8)
        # 3-video arena: 63 rows < 8 shards * 21 rows/video
        small = SimpleNamespace(
            video_ids=list(ds.video_ids[:3]),
            rgb_feats=ds.rgb_feats[:3], flow_feats=ds.flow_feats[:3],
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds)
        live = make_live_index(params, model, small, capacity_videos=3)
        p = save_arena(live, str(tmp_path / "small"))
        loaded = load_arena(p, mesh=mesh)
        # capacity was padded so every shard can hold a whole video
        assert loaded.rows_per_shard >= loaded.rows_per_video
        assert loaded.capacity % 8 == 0
        n = live_append(loaded, params, model, ds, ds2.video_ids[:2],
                        ds2.rgb_feats[:2], ds2.flow_feats[:2])
        assert n == 2 * ds.num_proposals
        r = make_live_retriever(model, loaded, 5, topk_method="exact")
        _, rows = r(params, toks, lens)
        assert np.asarray(rows).max() < loaded.used_rows

    def test_topk_clamp_follows_grow(self, setup):
        from types import SimpleNamespace

        from vfr_tpu.eval.live import live_grow

        cfg, model, params, ds, ds2, toks, lens = setup
        one = SimpleNamespace(
            video_ids=list(ds.video_ids[:1]),
            rgb_feats=ds.rgb_feats[:1], flow_feats=ds.flow_feats[:1],
            num_proposals=ds.num_proposals,
            span_seconds=ds.span_seconds)
        live = make_live_index(params, model, one, capacity_videos=1)
        retrieve = make_live_retriever(model, live, 50,
                                       topk_method="exact")
        d, rows = retrieve(params, toks, lens)
        assert rows.shape[1] == 21          # clamped to boot capacity
        live_grow(live, 5)
        live_append(live, params, model, ds, ds2.video_ids[:4],
                    ds2.rgb_feats[:4], ds2.flow_feats[:4])
        d, rows = retrieve(params, toks, lens)
        assert rows.shape[1] == 50          # clamp followed the growth
        assert np.asarray(rows).max() < live.used_rows


class TestLifecycleFuzz:
    """Randomized add/remove/compact/grow sequences cross-checked against
    a from-scratch arena over the same active corpus after EVERY
    mutation — the live index's semantics are 'always equal to a rebuild'
    and this walks a long way into the state space the unit tests sample
    point-wise.  Runs single-device and row-sharded."""

    @pytest.mark.parametrize("shard", [False, True])
    def test_random_lifecycle_matches_rebuild(self, setup, devices8, shard):
        from types import SimpleNamespace

        from vfr_tpu.eval.live import live_compact, live_grow, live_remove
        from vfr_tpu.parallel.mesh import make_mesh

        cfg, model, params, ds, ds2, toks, lens = setup
        mesh = (make_mesh(("corpus",), devices=devices8) if shard
                else None)
        rng = np.random.default_rng(3 if shard else 2)
        P = ds.num_proposals
        k = 5

        # the active corpus as ordered (id, rgb_row, flow_row) triples —
        # the ground truth the arena must always equal a rebuild over
        active = [(v, ds.rgb_feats[i], ds.flow_feats[i])
                  for i, v in enumerate(ds.video_ids)]
        live = make_live_index(params, model, ds, capacity_videos=14,
                               mesh=mesh)
        next_id = 0

        def reference():
            shim = SimpleNamespace(
                video_ids=[v for v, _, _ in active],
                rgb_feats=np.stack([r for _, r, _ in active]),
                flow_feats=np.stack([f for _, _, f in active]),
                num_proposals=P, span_seconds=ds.span_seconds)
            ref = make_live_index(params, model, shim,
                                  capacity_videos=max(len(active), 1))
            return make_live_retriever(model, ref, k,
                                       topk_method="exact")

        def as_tuples(live_idx, d, rows):
            out = []
            for qi in range(d.shape[0]):
                out.append([
                    (live_idx.video_ids[int(live_idx.video_row[r])],
                     float(live_idx.spans_sec[r, 0]),
                     float(live_idx.spans_sec[r, 1]),
                     round(float(d[qi, j]), 4))
                    for j, r in enumerate(np.asarray(rows[qi]))])
            return out

        retrieve = make_live_retriever(model, live, k, topk_method="exact")
        for step in range(14):
            op = rng.choice(["add", "add", "remove", "compact", "grow"])
            if op == "add":
                nv = int(rng.integers(1, 3))
                vids = [f"fz{next_id + i:04d}" for i in range(nv)]
                rgb = rng.standard_normal((nv,) + ds.rgb_feats.shape[1:]
                                          ).astype(np.float32)
                flow = rng.standard_normal((nv,) + ds.flow_feats.shape[1:]
                                           ).astype(np.float32)
                if nv * P > live.free_rows:
                    before = (live.num_videos, live.used_rows)
                    with pytest.raises(ValueError,
                                       match="exceeds capacity"):
                        live_append(live, params, model, ds, vids, rgb,
                                    flow)
                    assert (live.num_videos, live.used_rows) == before
                    continue       # arena unchanged; skip the recheck
                live_append(live, params, model, ds, vids, rgb, flow)
                next_id += nv
                active.extend(zip(vids, rgb, flow))
            elif op == "remove" and len(active) > 2:
                vi = int(rng.integers(0, len(active)))
                vid = active[vi][0]
                if vid in {v for v, _, _ in active}:
                    live_remove(live, [vid])
                    active.pop(vi)
            elif op == "compact":
                live_compact(live)
            elif op == "grow":
                live_grow(live, live.capacity // P
                          + int(rng.integers(1, 4)))
            d_l, rows_l = retrieve(params, toks, lens)
            ref_retrieve = reference()
            d_r, rows_r = ref_retrieve(params, toks, lens)
            shim_ids = [v for v, _, _ in active]
            got = as_tuples(live, np.asarray(d_l), np.asarray(rows_l))
            # the reference arena has fresh contiguous rows, so its
            # row -> (video, span) map is first-principles:
            # video shim_ids[row // P], span spans[row % P]
            spans = np.asarray(ds.span_seconds)
            exp = []
            for qi in range(np.asarray(d_r).shape[0]):
                exp.append([
                    (shim_ids[int(r) // P],
                     float(spans[int(r) % P, 0]),
                     float(spans[int(r) % P, 1]),
                     round(float(np.asarray(d_r)[qi, j]), 4))
                    for j, r in enumerate(np.asarray(rows_r[qi]))])
            assert got == exp, f"divergence at step {step} after {op}"
