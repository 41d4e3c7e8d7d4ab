import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vfr_tpu.ops.topk import hierarchical_top_k


@pytest.mark.parametrize("n,k,chunk", [
    (100, 5, 16), (2048, 100, 256), (10_000, 100, 1024),
    (999, 7, 64), (64, 64, 16), (50, 100, 16),
])
def test_matches_flat_topk(n, k, chunk):
    rng = np.random.default_rng(n + k)
    x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
    v1, i1 = hierarchical_top_k(x, k, chunk=chunk)
    v2, i2 = jax.lax.top_k(x, min(k, n))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    # indices must achieve the same values (ties may permute)
    got = np.take_along_axis(np.asarray(x), np.asarray(i1), axis=-1)
    np.testing.assert_allclose(np.sort(got, -1), np.sort(np.asarray(v2), -1),
                               rtol=1e-6)


def test_duplicates_across_chunks():
    x = np.zeros((1, 4096), np.float32)
    x[0, [5, 2000, 4090]] = 7.0
    v, i = hierarchical_top_k(jnp.asarray(x), 3, chunk=512)
    assert set(np.asarray(i)[0].tolist()) == {5, 2000, 4090}
    np.testing.assert_allclose(np.asarray(v)[0], 7.0)


def test_jit_and_3d():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 5000)), jnp.float32)
    f = jax.jit(lambda x: hierarchical_top_k(x, 10, chunk=512))
    v, i = f(x)
    assert v.shape == (2, 3, 10) and i.shape == (2, 3, 10)
    v2, _ = jax.lax.top_k(x, 10)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), rtol=1e-6)
