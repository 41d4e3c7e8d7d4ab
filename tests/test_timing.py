"""Timing harness sanity on CPU: monotone in work, positive, exact math."""

import jax.numpy as jnp
import numpy as np

from vfr_tpu.utils.timing import device_seconds_per_iter


def test_positive_and_scales_with_work():
    x_small = jnp.asarray(np.random.default_rng(0).standard_normal((64, 64)),
                          jnp.float32)
    x_big = jnp.asarray(np.random.default_rng(0).standard_normal((512, 512)),
                        jnp.float32)

    def body(i, x):
        return jnp.sin(x + i) @ x.T  # sin() blocks algebraic distribution

    s_small = device_seconds_per_iter(body, x_small, iters=8, repeats=2)
    s_big = device_seconds_per_iter(body, x_big, iters=8, repeats=2)
    assert s_small > 0 and s_big > 0
    # 512^3 / 64^3 = 512x the FLOPs; demand at least ~4x wall to catch a
    # harness that reports constants (CPU noise keeps this loose)
    assert s_big > 2 * s_small, (s_small, s_big)
