"""Crash-safe persistence (VERDICT r3 weak #1): every bootable snapshot
(index, live arena, coarse operands) is written tmp + os.replace, so an
interrupted save leaves the PREVIOUS good file readable — the arena
snapshot is exactly what a `serve --live-arena` restart boots from."""

import os
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from vfr_tpu.utils.io import atomic_savez


def test_atomic_savez_roundtrip(tmp_path):
    p = atomic_savez(str(tmp_path / "x"), {"a": np.arange(5)})
    assert p.endswith(".npz") and os.path.exists(p)
    with np.load(p) as z:
        np.testing.assert_array_equal(z["a"], np.arange(5))
    assert not os.path.exists(p + ".tmp")


def test_atomic_savez_interrupted_keeps_previous(tmp_path, monkeypatch):
    path = str(tmp_path / "snap.npz")
    atomic_savez(path, {"a": np.array([1, 2, 3])})

    calls = {"n": 0}
    real_savez = np.savez

    def dying_savez(f, **arrays):
        # simulate a crash mid-write: half the payload lands, then death
        f.write(b"PK\x03\x04 truncated")
        raise MemoryError("simulated OOM mid-save")

    monkeypatch.setattr(np, "savez", dying_savez)
    with pytest.raises(MemoryError):
        atomic_savez(path, {"a": np.array([9, 9, 9])})
    monkeypatch.setattr(np, "savez", real_savez)

    # previous snapshot intact, no stray temp
    with np.load(path) as z:
        np.testing.assert_array_equal(z["a"], [1, 2, 3])
    assert not os.path.exists(path + ".tmp")


def _tiny_setup(tmp_path):
    import dataclasses

    import jax

    from vfr_tpu.config import ExperimentConfig, DataConfig, ModelConfig
    from vfr_tpu.data.loaders import load_datasets
    from vfr_tpu.models.build import build_model
    from vfr_tpu.models.mcn import init_model_params

    cfg = ExperimentConfig(
        name="tiny",
        data=DataConfig(data_dir=str(tmp_path / "nodata"), feature_dim=16,
                        glove_dim=8, synthetic_num_videos=6,
                        synthetic_num_queries=12),
        model=ModelConfig(joint_dim=8, lstm_hidden=8),
    )
    bundle = load_datasets(cfg.data)
    model = build_model(cfg, dataset=bundle.train)
    params = init_model_params(jax.random.PRNGKey(0), model, bundle.glove,
                               bundle.feature_dim)
    return params, model, bundle


def test_save_index_interrupted_keeps_previous(tmp_path, monkeypatch):
    from vfr_tpu.eval.corpus import build_moment_index, load_index, save_index

    params, model, bundle = _tiny_setup(tmp_path)
    index = build_moment_index(params, model, bundle.val)
    path = save_index(index, str(tmp_path / "idx"))
    good = load_index(path)

    def dying_savez(f, **arrays):
        f.write(b"garbage")
        raise KeyboardInterrupt  # the classic mid-save ^C

    monkeypatch.setattr(np, "savez", dying_savez)
    with pytest.raises(KeyboardInterrupt):
        save_index(index, path)
    monkeypatch.undo()

    again = load_index(path)
    np.testing.assert_array_equal(np.asarray(good.m), np.asarray(again.m))
    assert not os.path.exists(path + ".tmp")


def test_save_arena_interrupted_keeps_previous(tmp_path, monkeypatch):
    from vfr_tpu.eval.live import load_arena, make_live_index, save_arena

    params, model, bundle = _tiny_setup(tmp_path)
    ds = bundle.val
    live = make_live_index(params, model, ds,
                           capacity_videos=ds.rgb_feats.shape[0] + 2)
    path = save_arena(live, str(tmp_path / "arena"))
    n_videos_before = load_arena(path).num_videos

    def dying_savez(f, **arrays):
        raise MemoryError("simulated OOM mid-!save")

    monkeypatch.setattr(np, "savez", dying_savez)
    with pytest.raises(MemoryError):
        save_arena(live, path)
    monkeypatch.undo()

    assert load_arena(path).num_videos == n_videos_before
    assert not os.path.exists(path + ".tmp")


def test_save_coarse_interrupted_keeps_previous(tmp_path, monkeypatch):
    from vfr_tpu.eval.coarse import build_coarse_index, load_coarse, save_coarse
    from vfr_tpu.eval.corpus import build_moment_index

    params, model, bundle = _tiny_setup(tmp_path)
    index = build_moment_index(params, model, bundle.val)
    coarse = build_coarse_index(index, d_coarse=4)
    path = save_coarse(coarse, str(tmp_path / "coarse"))
    good = load_coarse(path, index)

    monkeypatch.setattr(
        np, "savez",
        lambda f, **a: (_ for _ in ()).throw(MemoryError("mid-save")))
    with pytest.raises(MemoryError):
        save_coarse(coarse, path)
    monkeypatch.undo()

    again = load_coarse(path, index)
    np.testing.assert_array_equal(np.asarray(good.m_low, np.float32),
                                  np.asarray(again.m_low, np.float32))


def test_tree_fingerprint_pins_values_shapes_dtypes():
    """The quality artifacts pin their serving weights by this hash
    instead of committing the ~100 MB checkpoint (VERDICT r4 #7): it must
    be deterministic and move on any value/shape/dtype change."""
    import numpy as np

    from vfr_tpu.utils.io import tree_fingerprint

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.ones(4, np.int32)}}
    fp = tree_fingerprint(tree)
    assert fp == tree_fingerprint(tree)                    # deterministic
    bumped = {"a": tree["a"] + 1e-3, "b": tree["b"]}
    assert tree_fingerprint(bumped) != fp                  # value-sensitive
    reshaped = {"a": tree["a"].reshape(3, 2), "b": tree["b"]}
    assert tree_fingerprint(reshaped) != fp                # shape-sensitive
    recast = {"a": tree["a"], "b": {"c": np.ones(4, np.float32)}}
    assert tree_fingerprint(recast) != fp                  # dtype-sensitive
