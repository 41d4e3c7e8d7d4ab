import numpy as np

from vfr_tpu.ops.tiou import tiou, tiou_matrix


def test_hand_computed_cases():
    assert tiou([0, 10], [0, 10]) == 1.0
    assert tiou([0, 10], [10, 20]) == 0.0
    assert tiou([0, 10], [5, 15]) == 5.0 / 15.0
    assert tiou([0, 10], [20, 30]) == 0.0  # disjoint, gap
    np.testing.assert_allclose(tiou([0, 4], [2, 4]), 0.5)


def test_zero_length():
    assert tiou([5, 5], [5, 5]) == 0.0
    assert tiou([5, 5], [0, 10]) == 0.0


def test_broadcast():
    a = np.array([[0, 10], [10, 20]], dtype=np.float32)
    b = np.array([5, 15], dtype=np.float32)
    out = tiou(a, b)
    np.testing.assert_allclose(out, [5 / 15, 5 / 15])


def test_matrix():
    a = np.array([[0, 10], [10, 20]], dtype=np.float32)
    b = np.array([[0, 10], [5, 15], [18, 20]], dtype=np.float32)
    M = tiou_matrix(a, b)
    assert M.shape == (2, 3)
    np.testing.assert_allclose(M[0], [1.0, 5 / 15, 0.0])
    np.testing.assert_allclose(M[1], [0.0, 5 / 15, 0.2])


def test_jnp_backend():
    import jax.numpy as jnp

    a = jnp.array([[0.0, 10.0]])
    b = jnp.array([[5.0, 15.0]])
    out = tiou_matrix(a, b, xp=jnp)
    np.testing.assert_allclose(np.asarray(out), [[5 / 15]], rtol=1e-6)


def test_symmetry_random():
    rng = np.random.default_rng(0)
    s = rng.uniform(0, 50, size=(100,))
    d = rng.uniform(0.1, 30, size=(100,))
    a = np.stack([s, s + d], axis=-1)
    s2 = rng.uniform(0, 50, size=(100,))
    d2 = rng.uniform(0.1, 30, size=(100,))
    b = np.stack([s2, s2 + d2], axis=-1)
    np.testing.assert_allclose(tiou(a, b), tiou(b, a), rtol=1e-6)
    v = tiou(a, b)
    assert (v >= 0).all() and (v <= 1).all()
