import numpy as np
import jax
import jax.numpy as jnp

from vfr_tpu.config import ExperimentConfig, get_preset
from vfr_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def _fake_state(seed):
    k = jax.random.PRNGKey(seed)
    params = {
        "w": jax.random.normal(k, (4, 3)),
        "nested": {"b": jnp.arange(3, dtype=jnp.float32)},
    }
    opt_state = {"mu": jax.tree.map(jnp.zeros_like, params), "count": jnp.int32(7)}
    return params, opt_state


def test_roundtrip(tmp_path):
    params, opt_state = _fake_state(0)
    cfg = get_preset("didemo_rgb")
    path = save_checkpoint(str(tmp_path), 123, params, opt_state, cfg)
    assert latest_checkpoint(str(tmp_path)) == path

    template_p, template_o = _fake_state(1)  # different values, same shapes
    step, p2, o2, cfg2 = restore_checkpoint(path, template_p, template_o)
    assert step == 123
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
    np.testing.assert_array_equal(
        np.asarray(o2["mu"]["nested"]["b"]),
        np.asarray(opt_state["mu"]["nested"]["b"]),
    )
    assert int(o2["count"]) == 7
    assert isinstance(cfg2, ExperimentConfig)
    assert cfg2.name == "didemo_rgb"


def test_retention_gc(tmp_path):
    params, opt_state = _fake_state(0)
    for step in (10, 20, 30, 40, 50):
        save_checkpoint(str(tmp_path), step, params, opt_state, keep=2)
    import os

    kept = sorted(f for f in os.listdir(tmp_path) if f.endswith(".msgpack"))
    assert kept == ["ckpt_00000040.msgpack", "ckpt_00000050.msgpack"]


def test_latest_on_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_restore_params_only(tmp_path):
    params, opt_state = _fake_state(0)
    path = save_checkpoint(str(tmp_path), 5, params, opt_state)
    template_p, _ = _fake_state(1)
    step, p2, _, _ = restore_checkpoint(path, template_p, None)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(params["w"]))
