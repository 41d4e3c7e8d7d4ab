"""Real-file-layout loading: write the synthetic fixture to disk in the
documented real formats (JSON/npz/vfrf/glove.txt/charades txt) and load it
back through the exact code path real data would take."""

import json
import os

import numpy as np
import pytest

from vfr_tpu.config import DataConfig
from vfr_tpu.data.loaders import load_datasets
from vfr_tpu.data.packed import pack_features
from vfr_tpu.data.synthetic import (
    charades_lines,
    make_charades_fixture,
    make_didemo_fixture,
)


def _write_didemo(tmp_path, fix, packed=False):
    d = tmp_path / "didemo"
    os.makedirs(d, exist_ok=True)
    n_val = len(fix.annotations) // 5
    (d / "train_data.json").write_text(json.dumps(fix.annotations[:-n_val]))
    (d / "val_data.json").write_text(json.dumps(fix.annotations[-n_val:]))
    rgb_table = {v: fix.rgb[v] for v in fix.rgb.ids()}
    flow_table = {v: fix.flow[v] for v in fix.flow.ids()}
    if packed:
        pack_features(rgb_table, str(d / "features_rgb.vfrf"))
        pack_features(flow_table, str(d / "features_flow.vfrf"))
    else:
        np.savez(d / "features_rgb.npz", **rgb_table)
        np.savez(d / "features_flow.npz", **flow_table)
    # glove.txt with a couple of real vectors
    w0 = fix.vocab.itos[2]
    vec = " ".join(["0.25"] * fix.meta["glove_dim"])
    (d / "glove.txt").write_text(f"{w0} {vec}\n")
    return str(d)


@pytest.mark.parametrize("packed", [False, True])
def test_didemo_real_layout(tmp_path, packed):
    fix = make_didemo_fixture(num_videos=10, num_queries=40, feature_dim=32,
                              glove_dim=16, seed=0)
    d = _write_didemo(tmp_path, fix, packed=packed)
    cfg = DataConfig(dataset="didemo", data_dir=d, feature_dim=32,
                     glove_dim=16, use_flow=True)
    bundle = load_datasets(cfg)
    assert bundle.source == "real"
    assert bundle.train.num_queries == 32
    assert bundle.val.num_queries == 8
    b = next(bundle.train.train_batches(4, 1, seed=0))
    assert b["rgb"].shape == (4, 6, 32) and b["flow"].shape == (4, 6, 32)
    # glove.txt override applied to that word, pad row zero
    w0_id = bundle.vocab.stoi[fix.vocab.itos[2]]
    np.testing.assert_allclose(bundle.glove[w0_id], 0.25)
    assert (bundle.glove[0] == 0).all()


def test_charades_real_layout(tmp_path):
    fix = make_charades_fixture(num_videos=8, num_queries=24, feature_dim=32,
                                glove_dim=16, seed=0)
    d = tmp_path / "charades"
    os.makedirs(d, exist_ok=True)
    lines = charades_lines(fix.annotations)
    (d / "charades_sta_train.txt").write_text("\n".join(lines[:18]))
    (d / "charades_sta_test.txt").write_text("\n".join(lines[18:]))
    np.savez(d / "features_rgb.npz", **{v: fix.rgb[v] for v in fix.rgb.ids()})
    cfg = DataConfig(dataset="charades_sta", data_dir=str(d), feature_dim=32,
                     glove_dim=16, use_flow=False, max_windows=64)
    bundle = load_datasets(cfg)
    assert bundle.source == "real"
    assert bundle.train.num_queries == 18
    b = next(bundle.train.train_batches(4, 1, seed=0))
    assert b["rgb"].shape == (4, 40, 32)
    assert b["window_mask"].shape[0] == 4


def test_synthetic_fallback(tmp_path):
    cfg = DataConfig(dataset="didemo", data_dir=str(tmp_path / "nothing"),
                     feature_dim=24, glove_dim=12, use_flow=False,
                     synthetic_num_videos=6, synthetic_num_queries=18)
    bundle = load_datasets(cfg)
    assert bundle.source == "synthetic"
    assert bundle.train.num_queries + bundle.val.num_queries == 18
