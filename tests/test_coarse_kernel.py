"""Parity tests for the stage-1 coarse block-max Pallas kernel.

The CPU harness runs the kernel in interpret mode (Mosaic compiles on TPU
only); the jnp twin ``coarse_blockmax_reference`` is both the oracle and
the lowering the retriever uses off-TPU, so kernel == twin == hand math is
the full correctness chain.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vfr_tpu.ops.pallas.coarse_kernel import (
    coarse_blockmax,
    coarse_blockmax_reference,
)


def _case(N, Q, d_c, seed=0, n_invalid=0):
    rng = np.random.default_rng(seed)
    m = jnp.asarray(
        rng.standard_normal((N, d_c)).astype(np.float32), jnp.bfloat16)
    msq = jnp.asarray(np.sum(np.asarray(m, np.float32) ** 2, -1))
    if n_invalid:
        msq = msq.at[-n_invalid:].set(1e30)
    q = jnp.asarray(rng.standard_normal((Q, d_c)).astype(np.float32))
    return q, m, msq


class TestCoarseBlockmax:
    @pytest.mark.parametrize("N,Q,d_c,B,bn", [
        (4096, 16, 32, 128, 2048),
        (5000, 37, 24, 128, 1024),    # ragged N, ragged Q
        (1024, 128, 8, 64, 512),      # small blocks
        (256, 4, 16, 128, 256),       # single tile
    ])
    def test_matches_reference(self, N, Q, d_c, B, bn):
        q, m, msq = _case(N, Q, d_c)
        got = coarse_blockmax(q, m, msq, block_rows=B, block_n=bn)
        ref = coarse_blockmax_reference(q, m, msq, block_rows=B)
        assert got.shape == ref.shape == (Q, -(-N // B))
        # f32 accumulation order differs between the interpret-mode dot
        # and XLA's; bf16 products are exact, sums are not
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_matches_hand_math(self):
        """Twin == explicit per-row scores max'd per block."""
        q, m, msq = _case(1000, 9, 12, seed=3)
        B = 128
        qb = np.asarray(q.astype(jnp.bfloat16), np.float32)   # twin casts q
        s = (2.0 * qb @ np.asarray(m, np.float32).T
             - np.asarray(msq)[None, :])
        G = -(-1000 // B)
        s = np.pad(s, ((0, 0), (0, G * B - 1000)),
                   constant_values=-np.inf)
        ref = coarse_blockmax_reference(q, m, msq, block_rows=B)
        np.testing.assert_allclose(
            np.asarray(ref), s.reshape(9, G, B).max(-1), rtol=1e-5)

    def test_invalid_rows_never_win(self):
        """A block whose rows are ALL invalid scores <= -1e29 (stage-1
        selection can only pick it after every real block)."""
        q, m, msq = _case(512, 8, 16, n_invalid=128)
        got = coarse_blockmax(q, m, msq, block_rows=128, block_n=512)
        assert np.all(np.asarray(got)[:, -1] <= -1e29)
        assert np.all(np.asarray(got)[:, :-1] > -1e29)
