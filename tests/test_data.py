import numpy as np
import pytest

from vfr_tpu.config import DataConfig
from vfr_tpu.data.charades import CharadesSTADataset, parse_charades_lines
from vfr_tpu.data.didemo import DidemoDataset
from vfr_tpu.data.features import FeatureStore
from vfr_tpu.data.glove import Vocab, load_glove, synthetic_glove, tokenize
from vfr_tpu.data.synthetic import (
    charades_lines,
    make_charades_fixture,
    make_didemo_fixture,
)
from vfr_tpu.ops.tiou import tiou


class TestGlove:
    def test_tokenize(self):
        assert tokenize("The cat, sat!  on the MAT's edge") == [
            "the", "cat", "sat", "on", "the", "mat's", "edge",
        ]

    def test_vocab_roundtrip(self):
        v = Vocab(["cat", "dog", "cat"])
        assert len(v) == 4  # pad, unk, cat, dog
        ids, n = v.encode(["cat", "zebra", "dog"], max_len=5)
        assert n == 3
        np.testing.assert_array_equal(ids, [2, 1, 3, 0, 0])

    def test_empty_query_gets_unk(self):
        v = Vocab(["cat"])
        ids, n = v.encode([], max_len=4)
        assert n == 1 and ids[0] == 1

    def test_synthetic_glove_deterministic_padzero(self):
        v = Vocab(["cat", "dog"])
        g1 = synthetic_glove(v, 32)
        g2 = synthetic_glove(v, 32)
        np.testing.assert_array_equal(g1, g2)
        assert (g1[0] == 0).all()
        assert abs(np.linalg.norm(g1[2]) - 1.0) < 1e-5

    def test_load_real_glove_format(self, tmp_path):
        v = Vocab(["cat", "dog"])
        p = tmp_path / "glove.txt"
        vec = " ".join(["0.5"] * 8)
        p.write_text(f"cat {vec}\nbadline 1 2\n")
        table = load_glove(str(p), v, dim=8)
        np.testing.assert_allclose(table[v.stoi["cat"]], 0.5)
        # dog keeps synthetic vector; pad stays zero
        assert (table[0] == 0).all()
        assert abs(np.linalg.norm(table[v.stoi["dog"]]) - 1.0) < 1e-5


class TestFeatureStore:
    def test_npz_roundtrip(self, tmp_path):
        fs = FeatureStore({"a": np.ones((6, 8)), "b": np.zeros((3, 8))})
        path = str(tmp_path / "f.npz")
        fs.save_npz(path)
        fs2 = FeatureStore.load(path)
        assert len(fs2) == 2
        np.testing.assert_array_equal(fs2["a"], fs["a"])

    def test_npy_dir(self, tmp_path):
        np.save(tmp_path / "vidx.npy", np.ones((4, 8), np.float32))
        fs = FeatureStore.load(str(tmp_path))
        assert "vidx" in fs and fs["vidx"].shape == (4, 8)

    def test_get_padded(self):
        fs = FeatureStore({"a": np.ones((3, 8))})
        out = fs.get_padded("a", 6)
        assert out.shape == (6, 8)
        assert (out[:3] == 1).all() and (out[3:] == 0).all()


def _didemo_cfg(fix):
    return DataConfig(
        dataset="didemo",
        feature_dim=fix.meta["feature_dim"],
        glove_dim=fix.meta["glove_dim"],
        use_flow=fix.flow is not None,
    )


class TestDidemoDataset:
    @pytest.fixture(scope="class")
    def ds(self):
        fix = make_didemo_fixture(num_videos=8, num_queries=32, feature_dim=32,
                                  glove_dim=16, seed=0)
        return DidemoDataset(fix.annotations, fix.rgb, fix.flow, fix.vocab,
                             _didemo_cfg(fix))

    def test_shapes(self, ds):
        b = next(ds.train_batches(batch_size=4, steps=1, seed=0))
        assert b["tokens"].shape == (4, 24)
        assert b["rgb"].shape == (4, 6, 32)
        assert b["flow"].shape == (4, 6, 32)
        assert b["target"].shape == (4,)
        assert (b["target"] >= 0).all() and (b["target"] < 21).all()

    def test_eval_batches_cover_all_queries_once(self, ds):
        total = 0
        for b in ds.eval_batches(batch_size=5):
            assert b["valid"].shape == (5,)
            assert b["gt_spans"].shape == (5, 4, 2)
            total += int(b["valid"].sum())
        assert total == ds.num_queries

    def test_target_matches_gt_span(self, ds):
        # target proposal's seconds must coincide with the (agreeing)
        # annotators' span
        for i in range(ds.num_queries):
            sec = ds.span_seconds[ds.target[i]]
            assert ds.gt_mask[i, 0]
            np.testing.assert_allclose(sec, ds.gt_spans[i, 0])

    def test_train_batches_deterministic(self, ds):
        a = [b["target"] for b in ds.train_batches(8, 3, seed=1)]
        b = [b2["target"] for b2 in ds.train_batches(8, 3, seed=1)]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestCharadesDataset:
    @pytest.fixture(scope="class")
    def ds(self):
        fix = make_charades_fixture(num_videos=8, num_queries=24,
                                    feature_dim=32, glove_dim=16, seed=0)
        cfg = DataConfig(
            dataset="charades_sta",
            feature_dim=32,
            window_scales=(12.0, 18.0, 24.0),
            window_stride_ratio=0.25,
            max_windows=64,
            use_flow=False,
        )
        return CharadesSTADataset(fix.annotations, fix.rgb, None, fix.vocab, cfg)

    def test_parse_official_format(self):
        anns = parse_charades_lines(
            ["ABC123 1.5 12.0##person opens a door", ""]
        )
        assert anns[0]["video"] == "ABC123"
        assert anns[0]["start"] == 1.5 and anns[0]["end"] == 12.0
        assert anns[0]["description"] == "person opens a door"

    def test_fixture_lines_roundtrip(self):
        fix = make_charades_fixture(num_videos=2, num_queries=4,
                                    feature_dim=8, glove_dim=8)
        lines = charades_lines(fix.annotations)
        anns = parse_charades_lines(lines)
        assert anns[0]["video"] == fix.annotations[0]["video"]

    def test_shapes_and_masks(self, ds):
        b = next(ds.train_batches(batch_size=4, steps=1, seed=0))
        W = ds.num_proposals
        assert b["rgb"].shape == (4, 40, 32)
        assert b["window_mask"].shape == (4, W)
        assert b["tef"].shape == (4, W, 2)
        # target must be a valid window
        for i in range(4):
            assert b["window_mask"][i, b["target"][i]]

    def test_target_is_max_tiou_window(self, ds):
        for i in range(ds.num_queries):
            v = ds.video_idx[i]
            gt = ds.gt_spans[i, 0]
            ious = tiou(ds.windows, gt)
            ious = np.where(ds.window_mask[v], ious, -1.0)
            assert ious[ds.target[i]] == ious.max()
            assert ious[ds.target[i]] > 0.3  # bank covers the GT decently


class TestPrefetch:
    def test_device_put_prefetch_order(self):
        from vfr_tpu.data.prefetch import device_put_prefetch

        batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
        out = list(device_put_prefetch(iter(batches), depth=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])

    def test_threaded_prefetcher(self):
        from vfr_tpu.data.prefetch import Prefetcher

        batches = [{"x": np.full((2,), i, np.float32)} for i in range(7)]
        pf = Prefetcher(lambda: iter(batches), depth=2)
        out = list(pf)
        assert len(out) == 7
        np.testing.assert_array_equal(np.asarray(out[-1]["x"]), batches[-1]["x"])

    def test_threaded_prefetcher_propagates_errors(self):
        from vfr_tpu.data.prefetch import Prefetcher

        def gen():
            yield {"x": np.zeros(2, np.float32)}
            raise RuntimeError("boom")

        pf = Prefetcher(gen, depth=1)
        with pytest.raises(RuntimeError, match="boom"):
            list(pf)
