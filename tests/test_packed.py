"""Packed VFRF feature store: native C++ reader vs numpy fallback parity."""

import numpy as np
import pytest

from vfr_tpu.data.packed import PackedFeatureStore, pack_features, _load_native


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    rng = np.random.default_rng(0)
    table = {
        f"vid{i:04d}": rng.standard_normal((6, 32)).astype(np.float32)
        for i in range(20)
    }
    table["short"] = rng.standard_normal((3, 32)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("vfrf") / "feat.vfrf")
    pack_features(table, path, rows=6)
    return table, path


def test_native_lib_builds():
    assert _load_native() is not None, "libvfrio.so failed to build/load"


@pytest.mark.parametrize("prefer_native", [True, False])
def test_roundtrip(packed, prefer_native):
    table, path = packed
    fs = PackedFeatureStore(path, prefer_native=prefer_native)
    if prefer_native:
        assert fs.backend == "native"
    assert len(fs) == 21
    assert fs.rows == 6 and fs.dim == 32
    np.testing.assert_allclose(fs["vid0007"], table["vid0007"], rtol=1e-6)
    # short video zero-padded on the static grid
    got = fs["short"]
    np.testing.assert_allclose(got[:3], table["short"], rtol=1e-6)
    assert (got[3:] == 0).all()
    assert "vid0000" in fs and "nope" not in fs
    with pytest.raises(KeyError):
        fs["nope"]
    fs.close()


@pytest.mark.parametrize("prefer_native", [True, False])
def test_gather_parity_and_oob(packed, prefer_native):
    table, path = packed
    fs = PackedFeatureStore(path, prefer_native=prefer_native)
    ids = sorted(table)
    idx = np.asarray([3, 0, 19, 3, -1, 20], np.int64)
    out = fs.gather(idx, threads=4)
    assert out.shape == (6, 6, 32)
    for i, v in enumerate(idx):
        if 0 <= v < 21:
            expect = np.zeros((6, 32), np.float32)
            arr = table[ids[v]]
            expect[: arr.shape[0]] = arr
            np.testing.assert_allclose(out[i], expect, rtol=1e-6)
        else:
            assert (out[i] == 0).all()
    fs.close()


def test_native_and_numpy_agree(packed):
    _, path = packed
    a = PackedFeatureStore(path, prefer_native=True)
    b = PackedFeatureStore(path, prefer_native=False)
    idx = np.arange(21, dtype=np.int64)
    np.testing.assert_array_equal(a.gather(idx), b.gather(idx))
    assert list(a.ids()) == list(b.ids())
    for v in list(a.ids())[:5]:
        assert a.find(v) == b.find(v)


def test_id_too_long(tmp_path):
    with pytest.raises(ValueError, match="too long"):
        pack_features({"x" * 70: np.zeros((2, 4), np.float32)},
                      str(tmp_path / "bad.vfrf"))
